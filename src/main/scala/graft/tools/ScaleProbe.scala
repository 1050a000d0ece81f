package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Stage-by-stage timing probe for the MinHash candidate path at scale —
  * isolates signature computation, banding, the band self-join, distinct,
  * and the exact-Jaccard verify join so regressions can be attributed to
  * one stage instead of guessed at from the end-to-end number.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/graft_scale/documents_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs -> $r")
      r
    }

    val docs = spark.read.parquet(docsPath).select("doc_id", "text")

    val sh = Dedup.withShingles(docs, "text", 3)
    timed("shingles_pass") {
      sh.agg(sum(size(col("shingles")))).head().getLong(0)
    }
    val sigs = Dedup.withMinHashSignature(sh, 64)
    timed("sig_pass") {
      sigs.agg(sum(element_at(col("minhash_sig"), 1))).head().getLong(0)
    }
    val banded = Dedup.withBands(sigs, 64, 16)
      .select(col("doc_id").as("id"), col("band.band_id").as("band_id"),
              col("band.band_hash").as("band_hash"))
      .persist()
    timed("banded_count") { banded.count() }
    timed("bucket_stats") {
      banded.groupBy("band_id", "band_hash").count()
        .agg(max("count"), avg("count"), count(lit(1))).head().toString
    }
    val a = banded.alias("a")
    val b = banded.alias("b")
    val raw = a.join(b,
      col("a.band_id") === col("b.band_id") &&
      col("a.band_hash") === col("b.band_hash") &&
      col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    timed("raw_pairs") { raw.count() }
    val cand = raw.distinct().persist()
    timed("distinct_pairs") { cand.count() }
    val sigsKeyed = sigs.select(col("doc_id").as("id"), col("minhash_sig")).persist()
    val prefiltered = cand
      .join(sigsKeyed.select(col("id").as("id_a"), col("minhash_sig").as("sig_a")), "id_a")
      .join(sigsKeyed.select(col("id").as("id_b"), col("minhash_sig").as("sig_b")), "id_b")
      .filter(graft.functions.SigAgreement.col(col("sig_a"), col("sig_b")) >= 0.3)
      .select("id_a", "id_b")
      .persist()
    timed("prefilter") { prefiltered.count() }
    val shv = Dedup.withShingles(docs, "text", 3)
      .select(col("doc_id").as("id"), array_distinct(col("shingles")).as("sh"))
      .persist()
    timed("sh_materialize") { shv.count() }
    timed("verify_join") {
      prefiltered
        .join(shv.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(shv.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("jaccard",
          graft.functions.JaccardSim.col(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
        .count()
    }
    timed("verify_join_pruned_shingles") {
      // shingle ONLY docs referenced by surviving pairs (semi-join prune):
      // at real-corpus candidate rates this is the scale form — most docs
      // never appear in any candidate pair and are never shingled twice
      val ids = prefiltered.select(col("id_a").as("id"))
        .union(prefiltered.select(col("id_b").as("id"))).distinct()
      val shp = Dedup.withShingles(
          docs.join(ids, docs("doc_id") === ids("id"), "left_semi"), "text", 3)
        .select(col("doc_id").as("id"), array_distinct(col("shingles")).as("sh"))
      prefiltered
        .join(shp.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(shp.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("jaccard",
          graft.functions.JaccardSim.col(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
        .count()
    }
    timed("fat_bucket_sample") {
      val fat = banded.groupBy("band_id", "band_hash").count()
        .filter(col("count") > 100).limit(1)
      val docsIn = banded.join(fat, Seq("band_id", "band_hash"))
        .select("id").limit(3)
      docsIn.join(docs, docsIn("id") === docs("doc_id"))
        .select(substring(col("text"), 1, 80).as("t")).collect().mkString(" | ")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.QualityFilter

/** Stage-by-stage timing probe for the classifier quality-filter path at
  * scale — isolates sample featurization, the LR fit, corpus
  * featurization, literal-coefficient scoring, and the Pareto lottery so
  * an end-to-end regression can be attributed to one stage.
  */
object QualityProbe {
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

    timed("corpus_featurize_only") {
      graft.ops.Selection.hashedNgramFeatureVectors(docs, "text", "doc_id")
        .agg(sum(element_at(col("fv"), 1))).head().getLong(0)
    }
    val model = timed("train") {
      QualityFilter.trainQualityModel(
        docs.filter(col("doc_id") % 1000 === 0),
        docs.filter(col("doc_id") % 1000 === 1), "text", "doc_id")
    }
    val scored = QualityFilter.scoreQuality(docs, "text", "doc_id", model)
    timed("score_pass") {
      scored.agg(sum(col("quality_prob"))).head().getDouble(0)
    }
    timed("lottery_count") {
      QualityFilter.paretoLotteryKeep(scored, "quality_prob", "doc_id").count()
    }
    timed("simple_filter_count") {
      scored.filter(col("quality_prob") > 0.5).count()
    }
    val pinned = scored.localCheckpoint()
    timed("lottery_on_checkpointed") {
      QualityFilter.paretoLotteryKeep(pinned, "quality_prob", "doc_id").count()
    }
    val uOnly = docs.select(col("doc_id"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("double") / lit(math.pow(16.0, 15))).as("u"))
    timed("md5_conv_only") {
      uOnly.agg(sum(col("u"))).head().getDouble(0)
    }
    spark.stop()
  }
}

package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

class IncrementalNearDedupSpec extends SparkSuite {
  import spark.implicits._

  private def mkCorpus(r: Range): Seq[(Long, String)] = r.map { i =>
    val words = (0 until 18).map(w => s"w${(i * 5 + w * 7) % 37}").mkString(" ")
    (i.toLong, if (i % 7 == 0) words + " near dup tail" else words)
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"inc_dedup_$tag").toString + "/sigs"

  test("N ingested batches == one full-corpus run (pairs and jaccard)") {
    val all = mkCorpus(0 until 220)
    val batches = Seq(all.slice(0, 80), all.slice(80, 150), all.slice(150, 220))
    val inc = new IncrementalNearDedup(spark, tmpDir("fold"), minJaccard = 0.5)
    val got = batches
      .map(b => inc.ingest(b.toDF("doc_id", "text"), "text", "doc_id"))
      .map(_.select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet)
    // batches report disjoint pair sets (old-old never re-reported)
    assert(got(0).intersect(got(1)).isEmpty && got(1).intersect(got(2)).isEmpty)
    val full = Dedup.minHashCandidates(all.toDF("doc_id", "text"),
        "text", "doc_id", minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.reduce(_ union _) === full)
    assert(full.nonEmpty)
    // the maintained table holds every ingested signature exactly once
    assert(inc.corpusSignatures.get.count() === 220L)
  }

  test("a provided corpusSize eliminates the full-corpus count job") {
    // candidates must be identical with and without the provided count,
    // and the corpusSize run must launch strictly fewer Spark jobs —
    // the all.count() job is gone (the count only steers the cap-skip /
    // prefilter booleans, which 300 docs resolve the same way)
    val docs = mkCorpus(0 until 300).toDF("doc_id", "text")
    val sigsOld = Dedup.signatureTable(
      docs.filter(col("doc_id") < 200), "text", "doc_id").persist()
    val sigsNew = Dedup.signatureTable(
      docs.filter(col("doc_id") >= 200), "text", "doc_id").persist()
    try {
      val sc = spark.sparkContext
      def countJobs(group: String)(run: => Unit): Int = {
        sc.setJobGroup(group, group)
        try run finally sc.clearJobGroup()
        sc.statusTracker.getJobIdsForGroup(group).length
      }
      // materialize both persisted inputs up front — otherwise whichever
      // variant runs first pays the cache-fill jobs and the comparison
      // measures caching, not the count
      sigsOld.count(); sigsNew.count()
      var withSize: Set[(Long, Long)] = Set.empty
      var without: Set[(Long, Long)] = Set.empty
      val jobsWithout = countJobs("inc-counted") {
        without = Dedup.incrementalCandidates(sigsOld, sigsNew)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      }
      val jobsWith = countJobs("inc-known-size") {
        withSize = Dedup.incrementalCandidates(sigsOld, sigsNew,
            corpusSize = Some(300L))
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      }
      assert(withSize === without)
      assert(withSize.nonEmpty)
      assert(jobsWith < jobsWithout,
        s"expected fewer jobs with corpusSize ($jobsWith vs $jobsWithout)")
    } finally { sigsOld.unpersist(); sigsNew.unpersist() }
  }

  test("streaming front end folds micro-batches into the maintained table") {
    val input = MemoryStream[(Long, String)](spark)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val inc = new IncrementalNearDedup(spark, tmpDir("stream"), minJaccard = 0.5)
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(inc.sink("text", "doc_id") { (pairs: DataFrame, _: Long) =>
        collected ++= pairs.select("id_a", "id_b").as[(Long, Long)].collect()
      })
      .start()
    try {
      val all = mkCorpus(0 until 120)
      input.addData(all.slice(0, 60)); q.processAllAvailable()
      input.addData(all.slice(60, 120)); q.processAllAvailable()
      val full = Dedup.minHashCandidates(all.toDF("doc_id", "text"),
          "text", "doc_id", minJaccard = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(collected.toSet === full)
      assert(inc.corpusSignatures.get.count() === 120L)
    } finally q.stop()
  }

  test("retrying a crashed batch overwrites its own epoch (no orphan growth)") {
    // the batch epoch dir is content-derived: the same documents land in
    // the same dirs, so a crash-retry (or an accidental double ingest)
    // replaces rather than duplicates — table counts and the maintained
    // corpusSize stay exact
    val all = mkCorpus(0 until 120)
    val sigDir = tmpDir("retry")
    val inc = new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5)
    inc.ingest(all.slice(0, 60).toDF("doc_id", "text"), "text", "doc_id").count()
    inc.ingest(all.slice(60, 120).toDF("doc_id", "text"), "text", "doc_id").count()
    // "retry" batch 2 on a fresh incarnation
    new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5)
      .ingest(all.slice(60, 120).toDF("doc_id", "text"), "text", "doc_id").count()
    val sigs = new IncrementalNearDedup(spark, sigDir).corpusSignatures.get
    assert(sigs.count() === 120L)
    assert(sigs.select("id").distinct().count() === 120L)
  }

  test("a flat pre-epoch signature table fails fast with migration guidance") {
    val dir = tmpDir("legacy")
    // simulate the old layout: part files at the table root
    Dedup.signatureTable(mkCorpus(0 until 10).toDF("doc_id", "text"),
      "text", "doc_id").write.parquet(dir)
    val e = intercept[IllegalStateException] {
      new IncrementalNearDedup(spark, dir)
        .ingest(mkCorpus(10 until 20).toDF("doc_id", "text"), "text", "doc_id")
    }
    assert(e.getMessage.contains("flat (pre-epoch) signature table"))
    assert(e.getMessage.contains("epoch=legacy"))
  }

  test("an orphan banded epoch (crash between writes) cannot lose pairs") {
    // a crash between ingestInto's two writes leaves the BANDED table
    // with an epoch the signature table lacks (the safe order); the
    // retried batch must still produce exactly the clean-fold pairs —
    // ghost candidates from the orphan rows die in the verify lookup,
    // and the duplicate banded rows collapse in the candidates distinct
    val all = mkCorpus(0 until 120)
    val sigDir = tmpDir("orphan")
    val inc = new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5)
    val p1 = inc.ingest(all.slice(0, 60).toDF("doc_id", "text"),
        "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // simulate the crashed ingest of batch 2: banded written, sigs not
    val sigs2 = Dedup.signatureTable(
      all.slice(60, 120).toDF("doc_id", "text"), "text", "doc_id")
    Dedup.withBands(sigs2.select("id", "minhash_sig"), 64, 16)
      .select(col("id"), col("band.band_id").as("band_id"),
        col("band.band_hash").as("band_hash"))
      .write.parquet(s"${sigDir}_banded/epoch=crashed")
    // retry with a fresh instance (a real restart)
    val p2 = new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5)
      .ingest(all.slice(60, 120).toDF("doc_id", "text"), "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = Dedup.minHashCandidates(all.toDF("doc_id", "text"),
        "text", "doc_id", minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((p1 union p2) === full)
    assert(new IncrementalNearDedup(spark, sigDir)
      .corpusSignatures.get.count() === 120L)
  }

  test("legacy migration: banded rows are backfilled, legacy pairs found") {
    // the documented flat-table migration moves part files into
    // epoch=legacy/ — which has NO banded rows. reconcileEpochs must
    // backfill them at the next ingest, or every later fold's bandedOld
    // silently lacks the legacy corpus and new-vs-legacy pairs are
    // permanently missed (the exact failure the write-order comment
    // warns about, introduced by the migration guidance itself)
    val all = mkCorpus(0 until 180)
    val sigDir = tmpDir("migrate")
    Dedup.signatureTable(all.slice(0, 60).toDF("doc_id", "text"),
      "text", "doc_id").write.parquet(s"$sigDir/epoch=legacy")
    val inc = new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5)
    val got2 = inc.ingest(all.slice(60, 120).toDF("doc_id", "text"),
        "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // first post-migration ingest must have backfilled the legacy epoch
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"${sigDir}_banded/epoch=legacy")))
    // SECOND fold is where the pre-fix bug bit: bandedOld existed but
    // lacked the legacy epoch, so batch-3-vs-legacy pairs vanished
    val got3 = inc.ingest(all.slice(120, 180).toDF("doc_id", "text"),
        "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = Dedup.minHashCandidates(all.toDF("doc_id", "text"),
        "text", "doc_id", minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val legacyInternal = Dedup.minHashCandidates(
        all.slice(0, 60).toDF("doc_id", "text"), "text", "doc_id",
        minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((got2 union got3) === (full diff legacyInternal))
    // the migrated corpus genuinely exercises cross-epoch pairs
    assert((full diff legacyInternal).exists(p => p._1 < 60 && p._2 >= 120),
      "fixture must contain batch-3-vs-legacy pairs")
  }

  test("an abandoned orphan banded epoch is deleted at the next ingest") {
    // a crashed batch that is never retried leaves banded rows with no
    // matching signatures; before reconcileEpochs they inflated
    // fat-bucket counts (silently capping healthy buckets) until an
    // operator deleted the dir by hand
    val all = mkCorpus(0 until 120)
    val sigDir = tmpDir("abandon")
    val inc = new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5)
    inc.ingest(all.slice(0, 60).toDF("doc_id", "text"), "text", "doc_id").count()
    val sigs2 = Dedup.signatureTable(
      all.slice(60, 120).toDF("doc_id", "text"), "text", "doc_id")
    Dedup.withBands(sigs2.select("id", "minhash_sig"), 64, 16)
      .select(col("id"), col("band.band_id").as("band_id"),
        col("band.band_hash").as("band_hash"))
      .write.parquet(s"${sigDir}_banded/epoch=crashed")
    // a DIFFERENT batch arrives; the abandoned orphan must be gone after
    new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5)
      .ingest(mkCorpus(200 until 230).toDF("doc_id", "text"),
        "text", "doc_id").count()
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"${sigDir}_banded/epoch=crashed")))
    // banded epochs now exactly mirror signature epochs
    val sigEpochs = new java.io.File(sigDir).listFiles()
      .filter(_.getName.startsWith("epoch=")).map(_.getName).toSet
    val bandedEpochs = new java.io.File(s"${sigDir}_banded").listFiles()
      .filter(_.getName.startsWith("epoch=")).map(_.getName).toSet
    assert(bandedEpochs === sigEpochs)
  }

  test("a replayed epoch is not double-counted in fat-bucket sizing") {
    // replay folds against tables that already hold the delta's rows;
    // before the epoch exclusion the delta's banded rows counted TWICE,
    // so a bucket with true size in (max/2, max] was falsely capped and
    // the replayed fold silently dropped its pairs
    val sigDir = tmpDir("replaycap")
    val inc = new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5,
      maxBucketSize = 4)
    inc.ingest(mkCorpus(0 until 20).toDF("doc_id", "text"),
      "text", "doc_id").count()
    // 3 near-identical docs: bucket size 3 <= 4 passes clean; doubled
    // to 6 it would be capped
    val trio = Seq(100L, 101L, 102L).map(i =>
      (i, (0 until 18).map(w => s"z${w * 3 % 11}").mkString(" ") + s" v$i"))
    val first = inc.ingest(trio.toDF("doc_id", "text"), "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(first.toSet === Set((100L, 101L), (100L, 102L), (101L, 102L)))
    // replay on a fresh incarnation (same docs -> same epoch dir)
    val replayed = new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5,
        maxBucketSize = 4)
      .ingest(trio.toDF("doc_id", "text"), "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(replayed.toSet === first.toSet,
      "replayed fold must report exactly the first attempt's pairs")
    assert(replayed.length === replayed.toSet.size,
      "replayed fold must not emit duplicate pair rows")
  }

  test("checkpointed restart + epoch replay keep the fold exactly-once") {
    val all = mkCorpus(0 until 120)
    val sigDir = tmpDir("recover")
    val ckpt = java.nio.file.Files
      .createTempDirectory("inc_dedup_ckpt").toString
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String)](spark)
    def startQuery(inc: IncrementalNearDedup) =
      input.toDF().toDF("doc_id", "text").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(inc.sink("text", "doc_id") { (pairs: DataFrame, _: Long) =>
          collected ++= pairs.select("id_a", "id_b").as[(Long, Long)].collect()
        })
        .start()
    // first incarnation folds batch 1, then the query is killed
    val q1 = startQuery(new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5))
    input.addData(all.slice(0, 60)); q1.processAllAvailable(); q1.stop()
    // process restart: a FRESH instance resumes from the checkpoint and
    // folds only the unprocessed batch
    val inc2 = new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5)
    val q2 = startQuery(inc2)
    try {
      input.addData(all.slice(60, 120)); q2.processAllAvailable()
      val full = Dedup.minHashCandidates(all.toDF("doc_id", "text"),
          "text", "doc_id", minJaccard = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(collected.toSet === full)
      assert(inc2.corpusSignatures.get.count() === 120L)
      // crash-between-write-and-commit: foreachBatch REDELIVERS an epoch.
      // The epoch-dir overwrite makes the table write idempotent — a
      // fresh incarnation re-folding the last epoch must not grow the
      // table (pairs are at-least-once by contract; the TABLE is the
      // exactly-once surface)
      val inc3 = new IncrementalNearDedup(spark, sigDir, minJaccard = 0.5)
      val lastEpochId = 1L
      inc3.sink("text", "doc_id")((_, _) => ())(
        all.slice(60, 120).toDF("doc_id", "text"), lastEpochId)
      assert(inc3.corpusSignatures.get.count() === 120L)
      assert(inc3.corpusSignatures.get.select("id").distinct().count() === 120L)
    } finally q2.stop()
  }
}

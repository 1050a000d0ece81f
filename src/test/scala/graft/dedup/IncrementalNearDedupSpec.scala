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
}

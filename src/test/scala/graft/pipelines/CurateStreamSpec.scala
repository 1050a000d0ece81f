package graft.pipelines

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite

class CurateStreamSpec extends SparkSuite {
  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and then runs far away " * 5

  test("curateStream keeps good docs, filters bad ones, dedups within watermark") {
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val kept = TrainingDataPipeline.curateStream(
      stream, "text", "doc_id", "ts", watermark = "10 seconds")
    val query = kept.writeStream.format("memory").queryName("cs")
      .outputMode(OutputMode.Append).start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    input.addData(
      (1L, goodText, t(1)),
      (2L, "tiny", t(2)),            // fails length
      (3L, goodText + " tail", t(3)),
      (4L, goodText, t(4)))          // exact dup of 1 within watermark
    query.processAllAvailable()
    query.stop()
    val ids = spark.table("cs").select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 3L))
    // annotations survive onto the kept stream
    val cols = spark.table("cs").columns.toSet
    assert(Set("lang_pred", "quality_score", "n_ws_tokens", "content_hash")
      .subsetOf(cols))
  }

  test("curateStream honors the Gopher repetition thresholds") {
    // r4 ADVICE: the streaming path silently ignored
    // maxDupWordFrac/maxTopBigramFrac. A doc made of one repeated word
    // must now be dropped when the dup-word gate is configured.
    // all-distinct words: dup-word fraction 0 (goodText itself is a 5x
    // repeat and would rightly fail a 0.3 dup-word gate)
    val varied = (0 until 40).map(i => s"alpha$i beta$i").mkString(" ")
    val repetitive = ("spam " * 80).trim + " filler tail so length passes"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val query = TrainingDataPipeline.curateStream(
        stream, "text", "doc_id", "ts", watermark = "10 seconds",
        cfg = TrainingDataPipeline.Config(maxDupWordFrac = 0.3))
      .writeStream.format("memory").queryName("cs3")
      .outputMode(OutputMode.Append).start()
    input.addData(
      (1L, varied, new java.sql.Timestamp(1000)),
      (2L, repetitive, new java.sql.Timestamp(2000)))
    query.processAllAvailable()
    query.stop()
    val kept = spark.table("cs3").select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
    // and the same config drops it in the batch path (shared gate)
    val batch = TrainingDataPipeline.curate(
        Seq((1L, varied), (2L, repetitive)).toDF("doc_id", "text"),
        "text", "doc_id",
        TrainingDataPipeline.Config(maxDupWordFrac = 0.3))
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(batch === Set(1L))
  }

  test("streaming decisions agree with the batch front end") {
    val docs = Seq(
      (1L, goodText), (2L, "x"), (3L, goodText + " more words here"))
      .toDF("doc_id", "text")
    // the streaming front end intentionally omits near-dedup (a corpus
    // self-join is a batch compaction concern), so compare against the
    // batch decisions modulo the near_dup reason
    val batchKept = TrainingDataPipeline.curate(docs, "text", "doc_id")
      .filter(col("keep") || col("drop_reason") === "near_dup")
      .select("doc_id").as[Long].collect().toSet

    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val query = TrainingDataPipeline.curateStream(
        stream, "text", "doc_id", "ts", watermark = "10 seconds")
      .writeStream.format("memory").queryName("cs2")
      .outputMode(OutputMode.Append).start()
    input.addData((1L, goodText, new java.sql.Timestamp(1000)),
      (2L, "x", new java.sql.Timestamp(2000)),
      (3L, goodText + " more words here", new java.sql.Timestamp(3000)))
    query.processAllAvailable()
    query.stop()
    val streamKept = spark.table("cs2").select("doc_id").as[Long].collect().toSet
    assert(streamKept === batchKept)
  }
}

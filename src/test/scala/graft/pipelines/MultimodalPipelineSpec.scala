package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.multimodal.PngCodec

/** Image-text curation contracts: reason precedence, near-dup cluster
  * survivor rule, mixed-format decode, end-to-end through WebDataset
  * shards. */
class MultimodalPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def png(seed: Int, w: Int = 8, h: Int = 8): Array[Byte] =
    PngCodec.encode(PngCodec.Image(w, h, 3,
      Array.tabulate(w * h * 3)(i => ((seed * 31 + i * 7) % 256).toByte)))

  private def sample(key: Long, img: Array[Byte], caption: String)
      : (Long, Map[String, Array[Byte]]) =
    (key, (Option(img).map("png" -> _).toMap ++
      Option(caption).map(c => "txt" -> c.getBytes("UTF-8")).toMap))

  test("reason precedence and the near-dup survivor rule") {
    val good = png(1)
    val rows = Seq(
      sample(1L, good, "a fine caption"),            // keep
      sample(2L, good, "duplicate of one"),          // near_dup of 1
      sample(3L, png(2), "another good sample"),     // keep
      sample(4L, null, "no image here"),             // image_missing
      sample(5L, "junk".getBytes("UTF-8"), "bad bytes"), // decode_failed
      sample(6L, png(3, 2, 2), "tiny image"),        // too_small
      sample(7L, png(4), null),                      // caption_missing
      sample(8L, png(5), "hi"))                      // caption_short
      .toDF("key", "files")
    val out = MultimodalPipeline.curateImageText(spark, rows)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(4), Option(r.getString(5)))).toMap
    assert(out(1L) == (true, None))
    assert(out(2L) == (false, Some("near_dup"))) // min key 1 survives
    assert(out(3L) == (true, None))
    assert(out(4L) == (false, Some("image_missing")))
    assert(out(5L) == (false, Some("decode_failed")))
    assert(out(6L) == (false, Some("too_small")))
    assert(out(7L) == (false, Some("caption_missing")))
    assert(out(8L) == (false, Some("caption_short")))
  }

  test("gated-out images never join the near-dup leg") {
    // two identical TINY images: both drop as too_small, and their
    // identical hashes must not resurrect as near_dup
    val tiny = png(9, 2, 2)
    val rows = Seq(sample(1L, tiny, "caption one"),
      sample(2L, tiny, "caption two")).toDF("key", "files")
    val out = MultimodalPipeline.curateImageText(spark, rows)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out(1L) == "too_small" && out(2L) == "too_small")
  }

  test("end to end through WebDataset tar shards") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mmcurate").toString
    val docs = (0L until 12L).map { id =>
      // ids 10, 11 are byte-identical copies of 0 and 1
      val seed = if (id >= 10) (id - 10).toInt else id.toInt
      sample(id, png(seed), s"caption text for sample $id")
    }
    graft.sources.TarIO.writeWebDatasetShards(
      docs.map { case (k, f) => (k.toString, f) }.toDF("key", "files"),
      dir, nShards = 3)
    val samples = graft.sources.TarIO.readWebDataset(spark, dir)
    val audit = MultimodalPipeline.curateImageText(spark, samples)
    assert(audit.count() == 12)
    val dropped = audit.filter(!col("keep"))
      .collect().map(r => (r.getLong(0), r.getString(5))).toSet
    assert(dropped == Set((10L, "near_dup"), (11L, "near_dup")))
  }
}

package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.multimodal.Multimodal

/** End-to-end IMAGE-TEXT curation — the multimodal twin of
  * [[TrainingDataPipeline.curate]]: a WebDataset-shaped frame of
  * (numeric key, files map) samples goes through decode gates, caption
  * gates, and perceptual near-dup clustering, with a per-sample
  * decision audit (the curate discipline: every drop is a named,
  * ordered reason — `image_missing` → `decode_failed` → `too_small` →
  * `caption_missing` → `caption_short` → `near_dup`; survivors keep
  * `reason` NULL).
  *
  * Shapes (the families composed, nothing new and wide): decode is the
  * map-side [[Multimodal.decodeImages]] codec boundary (payloads never
  * shuffle); near-dup candidates ride the BANDED pHash join
  * ([[Multimodal.imageNearDups]] — complete at Hamming ≤ 3 by
  * pigeonhole, never all-pairs) restricted to gate SURVIVORS (the
  * exact-dedup-first ordering of the text pipeline applied to pixels);
  * clusters collapse by min-label propagation
  * ([[Dedup.connectedComponents]]) and the smallest key survives.
  *
  * Keys must be numeric (the WebDataset `000123` convention) — the
  * near-dup cluster survivor rule needs a total order that DuckDB and
  * Spark agree on.
  */
object MultimodalPipeline {

  /** Curate (key, files) image-text samples; returns the audit frame
    * `(key, width, height, n_caption_chars, keep, reason)` — one row
    * per input sample, filter `keep` for the survivor set. */
  def curateImageText(spark: SparkSession, samples: DataFrame,
                      keyCol: String = "key", filesCol: String = "files",
                      imageExt: String = "png", captionExt: String = "txt",
                      minWidth: Int = 4, minHeight: Int = 4,
                      minCaptionChars: Int = 5,
                      maxHamming: Int = 3): DataFrame = {
    val base = samples.select(
      col(keyCol).cast("long").as("key"),
      element_at(col(filesCol), imageExt).as("__img"),
      element_at(col(filesCol), captionExt).cast("string").as("__caption"))

    val decoded = Multimodal.decodeImages(spark, base, "key", "__img")
      .select(col("key"), col("width"), col("height"), col("phash"))
    val gated = base.join(decoded, "key")
      .withColumn("n_caption_chars",
        coalesce(length(col("__caption")), lit(0)).cast("long"))
      .withColumn("__gate_reason",
        when(col("__img").isNull, "image_missing")
          .when(col("phash").isNull, "decode_failed")
          .when(col("width") < minWidth || col("height") < minHeight,
            "too_small")
          .when(col("__caption").isNull, "caption_missing")
          .when(col("n_caption_chars") < minCaptionChars, "caption_short"))
      .localCheckpoint() // decode once; the near-dup leg re-reads it

    // near-dup clustering over gate survivors only
    val survivors = gated.filter(col("__gate_reason").isNull)
      .select(col("key"), col("phash"))
    val pairs = Multimodal.imageNearDups(survivors, "key",
        hashCol = "phash", maxHamming = maxHamming)
      .select(col("media_id_a").as("id_a"), col("media_id_b").as("id_b"))
    val comps = Dedup.connectedComponents(pairs) // (id, component=min id)
    val dupDropped = comps.filter(col("id") =!= col("component"))
      .select(col("id").as("key"), lit("near_dup").as("__dup_reason"))

    gated.join(dupDropped, Seq("key"), "left")
      .select(col("key"), col("width"), col("height"),
        col("n_caption_chars"),
        coalesce(col("__gate_reason"), col("__dup_reason")).as("reason"))
      .withColumn("keep", col("reason").isNull)
      .select("key", "width", "height", "n_caption_chars", "keep", "reason")
  }
}

package graft.text

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
  * pretraining-example generator: token spans are replaced by sentinel
  * tokens in the INPUT sequence, and the TARGET sequence lists each
  * sentinel followed by the tokens it hid, terminated by a final
  * sentinel. `<extra_id_0> … <extra_id_N>` follow the T5 convention.
  *
  * Masking is DETERMINISTIC and replay-stable (the [[graft.ops.Sampling]]
  * discipline — no `rand()`): every decision derives from
  * `md5(seed:doc:position)` — a span starts at an eligible position
  * when the hash clears `corruptRate / meanSpanLen`, and its length is
  * `1 + (md5(...:len) mod (2·meanSpanLen − 1))` (uniform, mean
  * `meanSpanLen`), truncated at the document end. Spans never overlap:
  * positions inside a span are ineligible, and adjacent spans merge
  * into one sentinel (the T5 behavior). Re-running any partition of
  * any corpus replays the identical masking, so a crashed pipeline
  * resumes without drift.
  *
  * Map-only in the scan — one `Dataset.map`, no shuffle, no UDF
  * registry; both output sequences are `array<string>`. The
  * reconstruction identity (inputs with each sentinel re-expanded to
  * its target span ≡ the original tokens) is pinned by the oracle and
  * tests — a masking bug cannot survive it.
  */
object SpanCorruption {

  /** md5(tag) → non-negative Long from the first 8 bytes. */
  private def h64(tag: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(tag.getBytes(UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v & Long.MaxValue
  }

  /** Corrupt one token sequence: (inputs, targets). */
  def corruptTokens(tokens: Array[String], seed: Long, docKey: String,
                    corruptRate: Double, meanSpanLen: Int)
      : (Array[String], Array[String]) = {
    require(corruptRate > 0 && corruptRate < 1, "corruptRate in (0,1)")
    require(meanSpanLen >= 1, "meanSpanLen >= 1")
    val startThreshold = (corruptRate / meanSpanLen * (1L << 32)).toLong
    val inputs = scala.collection.mutable.ArrayBuffer.empty[String]
    val targets = scala.collection.mutable.ArrayBuffer.empty[String]
    var sentinel = 0
    var i = 0
    var lastSpanEnd = -1 // position right after the previous span, or -1
    val n = tokens.length
    while (i < n) {
      val starts =
        (h64(s"$seed:$docKey:$i") % (1L << 32)) < startThreshold
      if (starts) {
        val len = 1 + (h64(s"$seed:$docKey:$i:len") %
          (2L * meanSpanLen - 1)).toInt
        val end = math.min(n, i + len)
        if (i == lastSpanEnd) {
          // Adjacent span: contiguous noise tokens are ONE span in T5
          // (noise_span_to_unique_sentinel assigns sentinels per
          // contiguous noise run) — extend the previous sentinel's
          // targets, emit no new input sentinel.
          var j = i
          while (j < end) { targets += tokens(j); j += 1 }
        } else {
          val tag = s"<extra_id_$sentinel>"
          inputs += tag
          targets += tag
          var j = i
          while (j < end) { targets += tokens(j); j += 1 }
          sentinel += 1
        }
        lastSpanEnd = end
        i = end
      } else {
        inputs += tokens(i)
        i += 1
      }
    }
    targets += s"<extra_id_$sentinel>" // the terminator sentinel
    (inputs.toArray, targets.toArray)
  }

  /** Per-document corruption frame:
    * `(idCol, inputs array<string>, targets array<string>, n_spans)`. */
  def corruptDocs(spark: SparkSession, docs: DataFrame, tokensCol: String,
                  idCol: String, seed: Long, corruptRate: Double = 0.15,
                  meanSpanLen: Int = 3): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(tokensCol))
      .as[(Long, Array[String])]
      .map { case (id, toks) =>
        val t = if (toks == null) Array.empty[String] else toks
        val (in, tgt) = corruptTokens(t, seed, id.toString,
          corruptRate, meanSpanLen)
        (id, in, tgt, tgt.count(_.startsWith("<extra_id_")) - 1)
      }
      .toDF(idCol, "inputs", "targets", "n_spans")
  }

  /** Re-expand every sentinel in `inputs` with its `targets` span —
    * the reconstruction identity's executable half (tests + oracle
    * pin `reconstruct(corrupt(x)) == x`). */
  def reconstruct(inputs: Array[String], targets: Array[String])
      : Array[String] = {
    val spans = scala.collection.mutable.Map.empty[String, Array[String]]
    var cur: String = null
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    targets.foreach { t =>
      if (t.startsWith("<extra_id_")) {
        if (cur != null) spans(cur) = buf.toArray
        cur = t; buf.clear()
      } else buf += t
    }
    if (cur != null) spans(cur) = buf.toArray
    inputs.flatMap { t =>
      if (t.startsWith("<extra_id_")) spans.getOrElse(t, Array.empty)
      else Array(t)
    }
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * Everything is built from codegen'd Catalyst expressions (length /
  * replace / position / arithmetic) — no UDFs — so the scan stays inside
  * one whole-stage-codegen span and scales linearly with input bytes.
  */
object TextAnalysis {

  /** Whitespace-token count via length arithmetic (robust across engines,
    * no regex): tokens = spaces + 1 for single-space-separated text.
    */
  def nWords(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1).cast("long")

  private def nSpaces(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", ""))).cast("long")

  /** Per-document surface statistics. */
  def textStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      nWords(t).as("n_words"),
      (length(regexp_replace(t, " ", "")).cast("double") / nWords(t)).as("avg_word_len"))
  }

  /** Token counting: exact whitespace tokens plus a BPE-ish estimate
    * (chars/4 is the standard subword heuristic for Latin text).
    */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      nWords(t).as("n_ws_tokens"),
      ceil(length(t) / lit(4.0)).cast("long").as("n_bpe_est"))
  }

  /** Stopword-hit language ID: cheap n-gram-free heuristic — count hits of
    * high-frequency function words and threshold. At 100 TB this is a pure
    * map-side scan; a real model would broadcast per-language n-gram
    * tables and score the same way.
    */
  val enStopwords: Seq[String] = Seq(" the ", " and ", " of ")

  def langId(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hits = enStopwords
      .map(s => when(instr(col(textCol), s) > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    docs.select(
      col(idCol),
      hits.as("en_hits"),
      when(hits >= 2, "en").otherwise("other").as("lang_pred"))
  }

  /** Composite quality score from surface ratios (length, punctuation
    * density, word shape) — the usual first-pass filter before expensive
    * model-based scoring.
    */
  def qualityScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val nc = length(t).cast("double")
    val words = nWords(t).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "\\.", ""))).cast("double")
    val punctRatio = punct / nc
    val avgWordLen = (nc - nSpaces(t).cast("double")) / words
    val lengthScore = when(nc >= 200 && nc <= 100000, lit(1.0))
      .otherwise(nc / lit(200.0))
    val score = lengthScore * lit(0.5) +
      when(avgWordLen >= 3 && avgWordLen <= 10, lit(0.3)).otherwise(lit(0.0)) +
      when(punctRatio <= 0.1, lit(0.2)).otherwise(lit(0.0))
    docs.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      words.cast("long").as("n_words"),
      punctRatio.as("punct_ratio"),
      avgWordLen.as("avg_word_len"),
      score.as("quality_score"))
  }

  /** Content fingerprint of the normalized document (case/whitespace
    * insensitive md5) — the exact-dedup key that survives formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", "")))

  def fingerprints(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fingerprint"))
}

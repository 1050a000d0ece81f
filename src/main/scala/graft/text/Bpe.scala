package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: corpus-trained merges, native
  * distributed encoding — the real-tokenizer upgrade over the
  * whitespace/regex token counting in [[TextAnalysis]] (sequence packing
  * and token budgeting are only as good as the token counts they use).
  *
  * Training follows the classic word-frequency formulation (Sennrich et
  * al. 2016): the corpus collapses to a (word, count) table — ONE
  * distributed shuffle, the same scale shape as [[TextAnalysis.buildVocab]]
  * — and the merge loop runs driver-side over that bounded table
  * (`maxWords` caps it; the frequency tail adds no merges, the same
  * bounded-model argument as k-means centroids and the DSIR k-bucket
  * models). Merges are deterministic: ties on pair frequency break
  * lexicographically.
  *
  * Encoding is a native codegen expression ([[graft.functions.BpeEncode]])
  * carrying the merge ranks as a reference object — map-only inside the
  * scan, no joins, no UDF, no driver participation; usable on batch and
  * streaming frames alike.
  */
object Bpe {

  /** A trained tokenizer: merge pairs in priority order. The end-of-word
    * sentinel `</w>` is attached to each word's last symbol before
    * merging, per the classic formulation (so "low" as a whole word and
    * "low" as a prefix of "lower" are distinct merge contexts).
    *
    * `byteLevel = true` is the GPT-2 discipline ([[ByteLevel]]): words
    * pass through the byte↔unicode bijection before merging, so the
    * base alphabet is CLOSED at 256 symbols — any input (emoji, CJK
    * unseen at train time) encodes losslessly with zero UNKs, and
    * [[decodeTokens]] restores the exact bytes.
    */
  final case class BpeModel(merges: Array[(String, String)],
                            byteLevel: Boolean = false) {
    @transient private lazy val ranks =
      graft.functions.BpeEncode.rankMap(merges)
    /** tokens of `word` (no whitespace) under this model, driver-side —
      * the same algorithm the native expression runs; exposed for tests
      * and ad-hoc use.
      */
    def encodeWord(word: String): Seq[String] =
      graft.functions.BpeEncode.encodeWord(
        if (byteLevel) ByteLevel.encode(word) else word, ranks).toSeq
  }

  /** Train on the corpus' word-frequency table.
    *
    * @param numMerges merges to learn (vocab ≈ bytes + numMerges)
    * @param maxWords  driver-side word-table cap (top by count, then
    *                  word — deterministic); 0 = uncapped
    * @param minCount  drop words rarer than this before training
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 50000, minCount: Long = 1L,
            byteLevel: Boolean = false): BpeModel = {
    require(numMerges > 0, "numMerges must be positive")
    val counts = docs
      .select(explode(TextAnalysis.spaceTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    val capped =
      if (maxWords > 0)
        counts.orderBy(col("n").desc, col("word")).limit(maxWords)
      else counts
    // byte-level maps the BOUNDED word table, not the corpus (the
    // bijection is injective, so mapped counts never collide)
    val table = capped.collect().map(r =>
      ((if (byteLevel) ByteLevel.encode(r.getString(0)) else r.getString(0)),
        r.getLong(1)))
    BpeModel(trainOnTable(table, numMerges), byteLevel)
  }

  /** The classic merge loop over a (word, count) table — driver-side,
    * O(numMerges × table). Symbols start as per-character strings with
    * `</w>` glued to the last; each round merges the most frequent
    * adjacent pair (count-desc, then pair-lexicographic for determinism).
    */
  private[text] def trainOnTable(table: Array[(String, Long)],
                                 numMerges: Int): Array[(String, String)] = {
    // mutable words-as-symbol-arrays with counts
    var words: Array[(Array[String], Long)] = table.map { case (w, c) =>
      val chars = w.toCharArray.map(_.toString)
      if (chars.nonEmpty) chars(chars.length - 1) += "</w>"
      (chars, c)
    }.filter(_._1.nonEmpty)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) round = numMerges
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        round += 1
      }
    }
    merges.toArray
  }

  /** Tokens of every document as `array<string>`, map-only in the scan. */
  def tokensCol(model: BpeModel, text: Column): Column =
    graft.functions.BpeEncode.col(text, model.merges, countOnly = false,
      byteLevel = model.byteLevel)

  /** BPE token COUNT per document — the cheap path for token budgeting /
    * sequence packing (no token array materialized).
    */
  def tokenCountCol(model: BpeModel, text: Column): Column =
    graft.functions.BpeEncode.col(text, model.merges, countOnly = true,
      byteLevel = model.byteLevel)

  /** Reassemble a token stream to the original DE-SPACED text — the
    * executable half of the losslessness identity (`</w>` marks word
    * ends; byte-level tokens pass back through the [[ByteLevel]]
    * inverse). Oracles/tests pin `decodeTokens(encode(x)) ==
    * x.replaceAll(" +", "")`. */
  def decodeTokens(model: BpeModel, tokens: Seq[String]): String = {
    // the sentinel is always token-FINAL (glued to the last symbol,
    // merges only concatenate) — stripSuffix, never a global replace,
    // so literal "</w>" text survives
    val joined = tokens.map(_.stripSuffix("</w>")).mkString("")
    if (model.byteLevel) ByteLevel.decode(joined) else joined
  }

  /** Per-document encoding frame: `(idCol, bpe_tokens, n_bpe_tokens)`. */
  def encodeDocs(docs: DataFrame, textCol: String, idCol: String,
                 model: BpeModel): DataFrame =
    docs.select(col(idCol),
      tokensCol(model, col(textCol)).as("bpe_tokens"),
      tokenCountCol(model, col(textCol)).cast("long").as("n_bpe_tokens"))
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer — the third production tokenizer family next to
  * [[Bpe]] and [[Unigram]] (BERT's tokenizer; Schuster & Nakajima 2012,
  * the likelihood-scored variant the HuggingFace tokenizers library
  * documents).
  *
  * Training differs from BPE in exactly one place: instead of merging
  * the most FREQUENT adjacent pair, each round merges the pair with the
  * highest LIKELIHOOD score `freq(ab) / (freq(a) × freq(b))` — the pair
  * whose merge most improves a unigram language model over the symbol
  * stream. Same scale shape as [[Bpe.train]]: the corpus collapses to a
  * (word, count) table in ONE distributed shuffle and the merge loop
  * runs driver-side over that bounded table. Scores compare by exact
  * BigInt cross-multiplication (no float ties); residual ties break
  * lexicographically.
  *
  * Non-initial subwords carry the `##` continuation prefix. Inference is
  * NOT the merge replay (BPE's rule) but greedy longest-match-first
  * (MaxMatch): the longest vocabulary prefix wins at every position, and
  * a word with no valid segmentation becomes one `unk` token — see
  * [[graft.functions.WpEncode]], the native codegen expression that
  * encodes map-only inside the scan.
  */
object WordPiece {

  /** A trained tokenizer: the vocabulary (alphabet + merged pieces,
    * `##`-prefixed continuations), the unknown-word token, and the
    * word-length cap beyond which a word maps straight to `unk` (BERT
    * ships 100 — longest-match over pathological words is quadratic, so
    * production WordPiece caps it).
    */
  final case class WpModel(vocab: Array[String], unk: String = "[UNK]",
                           maxCharsPerWord: Int = 100) {
    @transient private lazy val vs = graft.functions.WpEncode.vocabSet(vocab)
    /** tokens of `word` (no whitespace) under this model, driver-side —
      * the same algorithm the native expression runs; exposed for tests
      * and ad-hoc use.
      */
    def encodeWord(word: String): Seq[String] =
      graft.functions.WpEncode.encodeWord(word, vs, unk, maxCharsPerWord).toSeq
  }

  /** Train on the corpus' word-frequency table.
    *
    * @param vocabSize total vocabulary target (alphabet + merges; the
    *                  loop stops early when no pair remains)
    * @param maxWords  driver-side word-table cap (top by count, then
    *                  word — deterministic); 0 = uncapped
    * @param minCount  drop words rarer than this before training
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            maxWords: Int = 50000, minCount: Long = 1L,
            unk: String = "[UNK]", maxCharsPerWord: Int = 100): WpModel = {
    require(vocabSize > 0, "vocabSize must be positive")
    val counts = docs
      .select(explode(TextAnalysis.spaceTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    val capped =
      if (maxWords > 0)
        counts.orderBy(col("n").desc, col("word")).limit(maxWords)
      else counts
    val table = capped.collect().map(r => (r.getString(0), r.getLong(1)))
    WpModel(trainOnTable(table, vocabSize), unk, maxCharsPerWord)
  }

  /** The likelihood-scored merge loop over a (word, count) table —
    * driver-side, O(rounds × table). Symbols start as the first
    * character plain and every later character `##`-prefixed; each round
    * merges the pair maximizing `freq(ab) / (freq(a) × freq(b))`
    * (BigInt-exact comparison, then pair-lexicographic), appending the
    * merged piece to the vocabulary until `vocabSize` is reached.
    */
  private[text] def trainOnTable(table: Array[(String, Long)],
                                 vocabSize: Int): Array[String] = {
    var words: Array[(Array[String], Long)] = table.map { case (w, c) =>
      val syms = new Array[String](w.length)
      var i = 0
      while (i < w.length) {
        syms(i) = if (i == 0) String.valueOf(w.charAt(i))
                  else "##" + w.charAt(i)
        i += 1
      }
      (syms, c)
    }.filter(_._1.nonEmpty)
    // the alphabet enters the vocabulary first, sorted for determinism
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    words.flatMap(_._1).distinct.sorted.foreach(vocab += _)
    var continue = vocab.size < vocabSize
    while (continue) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCounts.update(syms(i), symCounts.getOrElse(syms(i), 0L) + c)
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        // argmax of c/(fa·fb): exact cross-multiplied comparison
        var best: (String, String) = null
        var bestC = BigInt(0); var bestD = BigInt(1)
        pairCounts.foreach { case ((a, b), c) =>
          val d = BigInt(symCounts(a)) * BigInt(symCounts(b))
          val cb = BigInt(c)
          if (best == null) { best = (a, b); bestC = cb; bestD = d }
          else {
            val cmp = (cb * bestD).compare(bestC * d)
            if (cmp > 0 || (cmp == 0 &&
                (a < best._1 || (a == best._1 && b < best._2)))) {
              best = (a, b); bestC = cb; bestD = d
            }
          }
        }
        val joined = best._1 + best._2.stripPrefix("##")
        vocab += joined
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
        continue = vocab.size < vocabSize
      }
    }
    vocab.toArray
  }

  /** Tokens of every document as `array<string>`, map-only in the scan. */
  def tokensCol(model: WpModel, text: Column): Column =
    graft.functions.WpEncode.col(text, model.vocab, countOnly = false,
      unk = model.unk, maxCharsPerWord = model.maxCharsPerWord)

  /** WordPiece token COUNT per document — the cheap path for token
    * budgeting / sequence packing (no token array materialized).
    */
  def tokenCountCol(model: WpModel, text: Column): Column =
    graft.functions.WpEncode.col(text, model.vocab, countOnly = true,
      unk = model.unk, maxCharsPerWord = model.maxCharsPerWord)

  /** Reassemble a token stream to DE-SPACED text by stripping the `##`
    * continuation prefix. `unk` tokens decode to the literal unk string,
    * so the round-trip identity holds exactly on UNK-free encodings;
    * [[consistent]] is the identity that holds on EVERY encoding.
    */
  def decodeTokens(tokens: Seq[String]): String =
    tokens.map(t => if (t.startsWith("##")) t.substring(2) else t).mkString

  /** The per-document encode identity that holds even with UNKs: walk
    * the original words and the token stream together — every word is
    * either spelled exactly by its pieces or consumed by exactly one
    * `unk` token — and both must exhaust together. A word's FIRST piece
    * is taken verbatim (it may itself begin with a literal `##` when
    * the word does — the surface-form ambiguity the published
    * convention shares); every later piece must carry the `##`
    * continuation prefix, which is stripped.
    */
  def consistent(words: Seq[String], tokens: Seq[String],
                 model: WpModel): Boolean = {
    val toks = tokens.toIndexedSeq
    var ti = 0
    val it = words.iterator
    while (it.hasNext) {
      val w = it.next()
      if (w.nonEmpty) {
        if (ti >= toks.length) return false
        if (toks(ti) == model.unk) ti += 1
        else {
          val sb = new StringBuilder
          var first = true
          var ok = true
          while (ok && sb.length < w.length) {
            if (ti >= toks.length) ok = false
            else {
              val t = toks(ti)
              if (first) { sb.append(t); first = false; ti += 1 }
              else if (t.startsWith("##")) { sb.append(t.substring(2)); ti += 1 }
              else ok = false
            }
          }
          if (!ok || sb.toString != w) return false
        }
      }
    }
    ti == toks.length
  }

  /** Per-document encoding frame: `(idCol, wp_tokens, n_wp_tokens)`. */
  def encodeDocs(docs: DataFrame, textCol: String, idCol: String,
                 model: WpModel): DataFrame =
    docs.select(col(idCol),
      tokensCol(model, col(textCol)).as("wp_tokens"),
      tokenCountCol(model, col(textCol)).cast("long").as("n_wp_tokens"))
}

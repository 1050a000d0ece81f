package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer (Kudo 2018, the SentencePiece
  * `unigram` algorithm — the OTHER major subword family next to
  * [[Bpe]]: where BPE composes greedily bottom-up, unigram starts from
  * a large seed vocabulary and PRUNES, and encoding picks the globally
  * most probable segmentation by Viterbi instead of replaying merges).
  *
  * Training follows the [[Bpe]] scale shape exactly: the corpus
  * collapses to a (word, count) table — ONE distributed shuffle — and
  * EM + pruning run driver-side over that bounded table (`maxWords`
  * caps it; the same bounded-model argument as the BPE merge loop and
  * k-means centroids). Per round: an E-step computes expected piece
  * counts by forward-backward over each word's segmentation lattice,
  * the M-step renormalizes, and the vocabulary shrinks by `pruneFrac`
  * (lowest expected count first — the Kudo §3.2 loss-based ranking
  * reduces to expected count when removal alternatives are
  * near-uniform; a documented simplification) until `vocabSize` holds.
  * Single characters are never pruned, so any trained-alphabet text
  * segments losslessly; characters outside the training alphabet
  * encode through a floor-scored UNK fallback — still lossless.
  *
  * Encoding is a native codegen expression
  * ([[graft.functions.UnigramEncode]]) carrying the piece→log-prob
  * table as a reference object — map-only in the scan, no UDF, no
  * joins, streamable; Viterbi ties break deterministically (fewer
  * pieces, then the longer trailing piece).
  */
object Unigram {

  /** A trained tokenizer: piece → log probability (natural log),
    * single chars of the training alphabet all present.
    *
    * `byteFallback = true` is the SentencePiece `--byte_fallback`
    * discipline: characters outside the training alphabet emit their
    * UTF-8 bytes as `<0xNN>` pieces (surrogate pairs reunited first)
    * instead of floor-scored raw-char UNKs — so ANY input encodes
    * with ZERO out-of-vocabulary tokens and [[decodeTokens]] restores
    * the exact text. `vocabPieces` lists the full closed vocabulary
    * (trained pieces + the 256 byte pieces) for artifact export. */
  final case class UnigramModel(pieces: Array[(String, Double)],
                                maxPieceLen: Int,
                                byteFallback: Boolean = false) {
    @transient lazy val unkScore: Double =
      graft.functions.UnigramEncode.unkScoreOf(pieces)
    @transient private lazy val scores =
      graft.functions.UnigramEncode.scoreMap(pieces)
    def encodeWord(word: String): Seq[String] =
      graft.functions.UnigramEncode.encodeWordFb(
        word, scores, maxPieceLen, unkScore, byteFallback).toSeq
    /** The closed vocabulary: trained pieces, plus (with byteFallback)
      * the 256 byte pieces at a floor score below every real piece. */
    def vocabPieces: Array[(String, Double)] =
      if (!byteFallback) pieces
      else pieces ++ graft.functions.UnigramEncode.BytePieces
        .map(_ -> (unkScore - 10.0))
  }

  /** Reassemble a token stream to the original DE-SPACED text — the
    * executable half of the losslessness identity: `<0xNN>` runs map
    * back through UTF-8, every other piece passes verbatim.
    *
    * The model-aware overload is the CORRECT decoder: a TRAINED piece
    * that literally spells `<0x41>` stays verbatim (byte pieces are a
    * namespace decision, not a shape — SentencePiece resolves this by
    * piece id); the model-less overload assumes every well-formed
    * `<0xNN>` is a byte piece (fine for streams from byteFallback
    * models whose corpus lacks such literals) and passes MALFORMED
    * lookalikes (`<0xzg>`) through verbatim rather than crashing. */
  def decodeTokens(tokens: Seq[String], model: UnigramModel): String = {
    val trained: String => Boolean =
      if (!model.byteFallback) _ => true
      else {
        val set = model.pieces.iterator.map(_._1).toSet
        set.contains _
      }
    decodeWith(tokens, t => !trained(t))
  }

  def decodeTokens(tokens: Seq[String]): String =
    decodeWith(tokens, _ => true)

  private def isByteShape(t: String): Boolean =
    t.length == 6 && t.startsWith("<0x") && t.endsWith(">") &&
      t.substring(3, 5).forall(c =>
        (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F'))

  private def decodeWith(tokens: Seq[String],
                         byteEligible: String => Boolean): String = {
    val sb = new java.lang.StringBuilder()
    val buf = new java.io.ByteArrayOutputStream()
    def flush(): Unit = if (buf.size() > 0) {
      sb.append(new String(buf.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      buf.reset()
    }
    tokens.foreach { t =>
      if (isByteShape(t) && byteEligible(t))
        buf.write(Integer.parseInt(t.substring(3, 5), 16))
      else { flush(); sb.append(t) }
    }
    flush()
    sb.toString
  }

  /** Train on the corpus' word-frequency table (one shuffle; the
    * table, EM and pruning are driver-side bounded work).
    *
    * @param vocabSize   target piece count (floor: the alphabet size)
    * @param maxWords    word-table cap (top by count then word)
    * @param maxPieceLen longest candidate piece
    * @param seedFactor  seed vocabulary = seedFactor × vocabSize
    * @param emIters     EM rounds between prunes
    * @param pruneFrac   fraction of prunable pieces dropped per round
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            maxWords: Int = 50000, minCount: Long = 1L,
            maxPieceLen: Int = 8, seedFactor: Int = 4,
            emIters: Int = 2, pruneFrac: Double = 0.25,
            byteFallback: Boolean = false): UnigramModel = {
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
    trainOnTable(table, vocabSize, maxPieceLen, seedFactor, emIters,
      pruneFrac)._1.copy(byteFallback = byteFallback)
  }

  /** Driver-side EM + prune loop. Returns (model, per-E-step corpus
    * log-likelihoods — non-decreasing within each EM block, exposed
    * for the monotonicity test). Deterministic: candidates, probability
    * sums and prunes all traverse in sorted order. */
  private[text] def trainOnTable(table: Array[(String, Long)],
                                 vocabSize: Int, maxPieceLen: Int = 8,
                                 seedFactor: Int = 4, emIters: Int = 2,
                                 pruneFrac: Double = 0.25)
      : (UnigramModel, Seq[Double]) = {
    // words beyond 32 chars are dropped from TRAINING only (URLs, hex
    // blobs — no subword signal worth their lattice cost, and the
    // linear-domain forward-backward would underflow; SentencePiece
    // caps input length the same way). ENCODING handles any length —
    // Viterbi sums log-probs.
    val words = table.filter(w => w._1.nonEmpty && w._1.length <= 32)
    require(words.nonEmpty, "unigram: empty word table")

    // ---- seed: all substrings up to maxPieceLen, weighted by count --
    val cand = scala.collection.mutable.HashMap.empty[String, Double]
    words.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          cand.update(p, cand.getOrElse(p, 0.0) + c)
          l += 1
        }
        i += 1
      }
    }
    val chars = cand.keysIterator.filter(_.length == 1).toArray.sorted
    val multi = cand.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize * seedFactor - chars.length))
      .map(_._1).sorted
    // piece set, always sorted for deterministic float traversals
    var pieces: Array[String] = (chars ++ multi).sorted
    var probs: Map[String, Double] = {
      val tot = pieces.iterator.map(cand(_)).sum
      pieces.iterator.map(p => p -> cand(p) / tot).toMap
    }

    val logliks = scala.collection.mutable.ArrayBuffer.empty[Double]

    /** One E-step: (expected counts, corpus log-likelihood). */
    def eStep(): (scala.collection.mutable.HashMap[String, Double], Double) = {
      val exp = scala.collection.mutable.HashMap.empty[String, Double]
      var ll = 0.0
      words.foreach { case (w, c) =>
        val n = w.length
        val alpha = new Array[Double](n + 1); alpha(0) = 1.0
        val beta = new Array[Double](n + 1); beta(n) = 1.0
        var j = 1
        while (j <= n) {
          var i = math.max(0, j - maxPieceLen)
          var a = 0.0
          while (i < j) {
            val p = probs.getOrElse(w.substring(i, j), 0.0)
            if (p > 0) a += alpha(i) * p
            i += 1
          }
          alpha(j) = a
          j += 1
        }
        var i0 = n - 1
        while (i0 >= 0) {
          var j2 = math.min(n, i0 + maxPieceLen)
          var b = 0.0
          while (j2 > i0) {
            val p = probs.getOrElse(w.substring(i0, j2), 0.0)
            if (p > 0) b += p * beta(j2)
            j2 -= 1
          }
          beta(i0) = b
          i0 -= 1
        }
        val z = alpha(n)
        require(z > 0, s"unigram: word '$w' has no segmentation " +
          "(single chars must never be pruned)")
        ll += c * math.log(z)
        // expected counts per occurrence
        var s2 = 0
        while (s2 < n) {
          var e2 = s2 + 1
          val eMax = math.min(n, s2 + maxPieceLen)
          while (e2 <= eMax) {
            val piece = w.substring(s2, e2)
            val p = probs.getOrElse(piece, 0.0)
            if (p > 0) {
              val occ = alpha(s2) * p * beta(e2) / z
              if (occ > 0) exp.update(piece, exp.getOrElse(piece, 0.0) + c * occ)
            }
            e2 += 1
          }
          s2 += 1
        }
      }
      (exp, ll)
    }

    def mStep(exp: scala.collection.mutable.HashMap[String, Double]): Unit = {
      // sums in sorted-piece order (float determinism); single chars
      // are floored so every word keeps a nonzero segmentation (the
      // lossless contract) and the 32-char lattice can never underflow
      val tot = pieces.iterator.map(p => exp.getOrElse(p, 0.0)).sum
      probs = pieces.iterator.map { p =>
        val raw = exp.getOrElse(p, 0.0) / tot
        p -> (if (p.length == 1) math.max(raw, 1e-9) else raw)
      }.toMap
    }

    var lastExp = scala.collection.mutable.HashMap.empty[String, Double]
    var continueLoop = true
    while (continueLoop) {
      var it = 0
      while (it < emIters) {
        val (exp, ll) = eStep()
        logliks += ll
        mStep(exp)
        lastExp = exp
        it += 1
      }
      val nMulti = pieces.count(_.length > 1)
      val target = math.max(vocabSize - chars.length,
        nMulti - math.max(1, (nMulti * pruneFrac).toInt))
      if (nMulti <= math.max(0, vocabSize - chars.length)) continueLoop = false
      else {
        // prune lowest-expected-count multi-char pieces (ties: longer
        // piece pruned first, then lexicographic — deterministic)
        val keepMulti = pieces.iterator.filter(_.length > 1).toArray
          .sortBy(p => (-lastExp.getOrElse(p, 0.0), p.length, p))
          .take(math.max(0, target))
        pieces = (chars ++ keepMulti).sorted
        val tot = pieces.iterator.map(p => lastExp.getOrElse(p, 1e-12)).sum
        probs = pieces.iterator
          .map(p => p -> math.max(lastExp.getOrElse(p, 1e-12), 1e-12) / tot)
          .toMap
      }
    }
    // final normalization pass so probabilities reflect the pruned set
    val (expF, llF) = eStep()
    logliks += llF
    mStep(expF)
    val model = pieces.iterator
      .map(p => p -> math.log(math.max(probs(p), 1e-300))).toArray
    (UnigramModel(model, maxPieceLen), logliks.toSeq)
  }

  /** Tokens of every document as `array<string>`, map-only in the scan. */
  def tokensCol(model: UnigramModel, text: Column): Column =
    graft.functions.UnigramEncode.col(text, model.pieces, model.maxPieceLen,
      countOnly = false, byteFallback = model.byteFallback)

  /** Unigram token COUNT per document (no array materialized). */
  def tokenCountCol(model: UnigramModel, text: Column): Column =
    graft.functions.UnigramEncode.col(text, model.pieces, model.maxPieceLen,
      countOnly = true, byteFallback = model.byteFallback)

  /** Per-document encoding frame: `(idCol, uni_tokens, n_uni_tokens)`. */
  def encodeDocs(docs: DataFrame, textCol: String, idCol: String,
                 model: UnigramModel): DataFrame =
    docs.select(col(idCol),
      tokensCol(model, col(textCol)).as("uni_tokens"),
      tokenCountCol(model, col(textCol)).cast("long").as("n_uni_tokens"))
}

package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WHOLE-DOCUMENT sequence packing — the bin-packing alternative to
  * [[TextAnalysis.packSequences]]' greedy stream-cut. Stream-cut wastes
  * nothing to padding (documents straddle the cuts) but fragments
  * documents across sequences; trainers that need every document whole
  * inside one sequence (no cross-document attention leakage without
  * block masks, RAG/SFT samples) pay PADDING instead, and the packing
  * strategy decides how much. This module provides:
  *
  *   - [[packEfficiency]]: the exact token-waste ledger of four
  *     strategies on the same corpus — greedy stream-cut (zero pad,
  *     counted straddles), NEXT-FIT-DECREASING, BEST-FIT-DECREASING
  *     (Johnson's classic heuristics on the per-length histogram), and
  *     the production HYBRID (stream-cut only the oversized documents,
  *     NFD-pack the rest whole).
  *   - [[packWholeDocs]]: a distributed whole-document ASSIGNMENT
  *     (doc piece → sequence id + offset) under next-fit-decreasing,
  *     chosen because its per-piece placement has a CLOSED FORM from
  *     per-length-class constants: the driver folds the ≤ maxTokens-row
  *     length histogram once, broadcasts the class table, and every
  *     piece computes its (seq, offset) arithmetically — no sequential
  *     state ever touches the data path, the 100 TB shape. (Best-fit's
  *     tighter packing needs per-bin lineage with no closed per-piece
  *     form; its WASTE is still accounted exactly in packEfficiency —
  *     measured on this corpus the two differ by well under 1% of
  *     sequences — so the assignment rides the closed-form heuristic.)
  *
  * Documents longer than `maxTokens` split into full-size pieces plus a
  * remainder piece first (the [[TextAnalysis.chunkDocs]] arithmetic),
  * so every piece fits a sequence; `(doc, piece)` identifies output
  * rows. The histogram solve is exact integer arithmetic — the
  * `pack_efficiency` DuckDB oracle replays both folds (a recursive CTE
  * over length classes for next-fit; over the class × capacity grid
  * for best-fit) and every ledger integer must match.
  */
object Packing {

  /** Per-class constants of the next-fit-decreasing fold (driver-side,
    * ≤ maxTokens rows): processing classes by length DESC, `rIn` is the
    * open bin's remaining capacity entering the class, `binsBefore` the
    * bins opened so far. Within the class, piece rank j (0-based, by
    * (doc, piece)) places:
    *   j <  t0           → bin binsBefore-1, offset (B - rIn) + j*c
    *   j >= t0, j2=j-t0  → bin binsBefore + j2/q, offset (j2 % q)*c
    * with t0 = min(k, rIn/c) pieces absorbed by the open bin and
    * q = B/c pieces per fresh bin. */
  final case class NfdClass(c: Long, k: Long, rIn: Long, binsBefore: Long,
                            t0: Long, q: Long)

  /** Fold the length histogram under next-fit-decreasing; returns the
    * per-class table and the total bin count. */
  def nfdFold(hist: Seq[(Long, Long)], maxTokens: Long)
      : (Seq[NfdClass], Long) = {
    var r = 0L; var bins = 0L
    val classes = hist.sortBy(-_._1).map { case (c, k) =>
      val t0 = math.min(k, r / c)
      val q = maxTokens / c
      val row = NfdClass(c, k, r, bins, t0, q)
      val k2 = k - t0
      if (k2 > 0) {
        val nb = (k2 + q - 1) / q
        val lastDocs = k2 - (nb - 1) * q
        bins += nb
        r = maxTokens - lastDocs * c
      } else r -= t0 * c
      row
    }
    (classes, bins)
  }

  /** Fold the length histogram under best-fit-decreasing (capacity
    * histogram state: for each class, existing capacities are consumed
    * tightest-first; a bin entered at capacity r absorbs r/c pieces —
    * its remainder stays below every other fitting capacity — so each
    * (class, capacity) step is closed-form). Returns the bin count. */
  def bfdFold(hist: Seq[(Long, Long)], maxTokens: Long): Long = {
    val B = maxTokens.toInt
    val caps = new Array[Long](B) // caps(i) = bins with remaining i, 1..B-1
    var bins = 0L
    hist.sortBy(-_._1).foreach { case (cL, kIn) =>
      val c = cL.toInt
      var k = kIn
      var r = c
      while (r < B && k > 0) {
        if (caps(r) > 0) {
          val q = (r / c).toLong
          val b = caps(r)
          if (k >= b * q) {
            caps(r) = 0
            val nr = r - (q * c).toInt
            if (nr > 0) caps(nr) += b
            k -= b * q
          } else {
            val f = k / q
            val rem = k % q
            caps(r) = b - f - (if (rem > 0) 1 else 0)
            val nrf = r - (q * c).toInt
            if (f > 0 && nrf > 0) caps(nrf) += f
            val nrp = r - (rem * c).toInt
            if (rem > 0 && nrp > 0) caps(nrp) += 1
            k = 0
          }
        }
        r += 1
      }
      if (k > 0) { // open fresh bins
        val q = (B / c).toLong
        val full = k / q
        val rem = k % q
        bins += full + (if (rem > 0) 1 else 0)
        val nrf = B - (q * c).toInt
        if (full > 0 && nrf > 0) caps(nrf) += full
        val nrp = B - (rem * c).toInt
        if (rem > 0 && nrp > 0) caps(nrp) += 1
      }
    }
    bins
  }

  /** Documents → packable PIECES `(doc, piece, len)`: full-size pieces
    * then the remainder; zero-token documents drop. */
  def pieces(docs: DataFrame, idCol: String, nTokensCol: String,
             maxTokens: Long): DataFrame = {
    val n = col(nTokensCol).cast("long")
    docs.filter(n > 0)
      .select(col(idCol).as("doc"), n.as("__n"),
        explode(sequence(lit(0L),
          expr(s"(cast(`$nTokensCol` as bigint) + ${maxTokens - 1}) " +
            s"div $maxTokens") - 1)).as("piece"))
      .select(col("doc"), col("piece"),
        when(col("piece") < expr(s"__n div $maxTokens"), maxTokens)
          .otherwise(col("__n") % maxTokens).as("len"))
  }

  /** The collected length histogram of [[pieces]] — at most `maxTokens`
    * rows by construction (piece lengths are 1..maxTokens), the one
    * bounded collect this module makes. */
  private def histogram(p: DataFrame): Seq[(Long, Long)] =
    p.groupBy(col("len")).agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** Whole-document packing assignment under next-fit-decreasing:
    * `(doc, piece, len, seq_id, start_in_seq)` — every piece whole
    * inside one sequence, sequences 0-based in bin-open order. One
    * shuffle (the per-class rank window); placement itself is
    * arithmetic against the broadcast class table. */
  /** Largest accepted sequence length: the histogram folds allocate
    * O(maxTokens) driver state (bfdFold a dense capacity array), so an
    * absurd value (a token COUNT passed where a sequence LENGTH goes)
    * must refuse loudly instead of allocating gigabytes or overflowing
    * the array size. 16M tokens covers every published context length
    * with an order of magnitude to spare. */
  val MaxSeqTokens: Long = 1L << 24

  private def checkMaxTokens(maxTokens: Long): Unit = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(maxTokens <= MaxSeqTokens,
      s"maxTokens=$maxTokens exceeds the $MaxSeqTokens sequence-length " +
        "bound — the packing folds hold O(maxTokens) driver state; a " +
        "value this large is almost certainly a corpus token count " +
        "passed where the per-sequence length belongs")
  }

  def packWholeDocs(docs: DataFrame, idCol: String, nTokensCol: String,
                    maxTokens: Long): DataFrame = {
    checkMaxTokens(maxTokens)
    val spark = docs.sparkSession
    val p = pieces(docs, idCol, nTokensCol, maxTokens).localCheckpoint()
    val (classes, _) = nfdFold(histogram(p), maxTokens)
    import spark.implicits._
    val cls = broadcast(classes.toDF())
    val ranked = p.withColumn("__j",
      row_number().over(Window.partitionBy(col("len"))
        .orderBy(col("doc"), col("piece"))).cast("long") - 1)
    ranked.join(cls, col("len") === col("c"))
      .select(col("doc"), col("piece"), col("len"),
        when(col("__j") < col("t0"), col("binsBefore") - 1)
          .otherwise(col("binsBefore") +
            expr("(__j - t0) div q"))
          .as("seq_id"),
        when(col("__j") < col("t0"),
            lit(maxTokens) - col("rIn") + col("__j") * col("len"))
          .otherwise(pmod(col("__j") - col("t0"), col("q")) * col("len"))
          .as("start_in_seq"))
  }

  /** The exact token-waste ledger of four packing strategies on one
    * corpus — one row per strategy:
    * `(strategy, n_seqs, pad_tokens, n_straddles, n_pieces,
    * total_tokens)`. Stream-cut pads only the final sequence but
    * straddles documents; the whole-document strategies pad
    * (`n_seqs * maxTokens - total`) and never straddle; the HYBRID
    * (`hybrid_stream_nfd` — what production trainers usually run)
    * stream-cuts ONLY the documents longer than `maxTokens`
    * (contiguously, so only oversized documents straddle) and packs
    * every document that fits whole under next-fit-decreasing. */
  def packEfficiency(docs: DataFrame, idCol: String, nTokensCol: String,
                     maxTokens: Long): DataFrame = {
    checkMaxTokens(maxTokens)
    val spark = docs.sparkSession
    val p = pieces(docs, idCol, nTokensCol, maxTokens).localCheckpoint()
    val hist = histogram(p)
    val total = hist.map { case (c, k) => c * k }.sum
    val nPieces = hist.map(_._2).sum
    val (_, nfdBins) = nfdFold(hist, maxTokens)
    val bfdBins = bfdFold(hist, maxTokens)
    val streamSeqs = (total + maxTokens - 1) / maxTokens
    // straddles: documents crossing stream cuts (pieces are irrelevant
    // to the stream strategy — it packs the raw document stream)
    def straddlesOf(d: DataFrame): Long = {
      val r = TextAnalysis.packSequences(d, idCol, nTokensCol, maxTokens)
        .agg(sum(col("n_seqs") - 1).as("s")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val straddles = straddlesOf(docs)
    // hybrid: documents longer than maxTokens stream CONTIGUOUSLY
    // (their remainders co-pack inside the big stream — zero pad
    // except its final sequence), everything that fits packs whole
    // under next-fit-decreasing; only the oversized documents straddle
    val n = col(nTokensCol).cast("long")
    val bigTotal = {
      val r = docs.filter(n > maxTokens).agg(sum(n).as("t")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val bigSeqs = (bigTotal + maxTokens - 1) / maxTokens
    val bigStraddles = straddlesOf(docs.filter(n > maxTokens))
    val smallHist = docs.filter(n > 0 && n <= maxTokens)
      .groupBy(n.as("len")).agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (_, smallBins) = nfdFold(smallHist, maxTokens)
    def row(st: String, seqs: Long, strad: Long) =
      (st, seqs, seqs * maxTokens - total, strad, nPieces, total)
    import spark.implicits._
    Seq(row("stream", streamSeqs, straddles),
        row("nextfit_dec", nfdBins, 0L),
        row("bestfit_dec", bfdBins, 0L),
        row("hybrid_stream_nfd", bigSeqs + smallBins, bigStraddles))
      .toDF("strategy", "n_seqs", "pad_tokens", "n_straddles",
        "n_pieces", "total_tokens")
  }
}

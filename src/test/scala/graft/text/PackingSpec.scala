package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Whole-document bin packing (text/Packing.scala): the NFD/BFD
  * histogram folds, the closed-form distributed assignment, and the
  * three-strategy efficiency ledger. */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  private val B = 64L

  /** Brute-force reference folds over an explicit piece list. */
  private def nfdBrute(lens: Seq[Long]): Long = {
    var bins = 0L; var r = 0L
    lens.sorted.reverse.foreach { c =>
      if (c <= r) r -= c
      else { bins += 1; r = B - c }
    }
    bins
  }
  private def bfdBrute(lens: Seq[Long]): Long = {
    val open = scala.collection.mutable.ArrayBuffer.empty[Long]
    lens.sorted.reverse.foreach { c =>
      // tightest remaining capacity that fits, else a new bin
      val fits = open.zipWithIndex.filter(_._1 >= c)
      if (fits.isEmpty) open += (B - c)
      else {
        val (_, i) = fits.minBy(_._1)
        open(i) -= c
      }
    }
    open.size.toLong
  }

  test("nfdFold and bfdFold match per-piece brute-force references") {
    val rnd = new scala.util.Random(11)
    (0 until 20).foreach { _ =>
      val lens = Seq.fill(200 + rnd.nextInt(300))(1L + rnd.nextInt(64))
      val hist = lens.groupBy(identity).map { case (c, xs) =>
        (c, xs.size.toLong) }.toSeq
      val (_, nfd) = Packing.nfdFold(hist, B)
      val bfd = Packing.bfdFold(hist, B)
      assert(nfd === nfdBrute(lens))
      assert(bfd === bfdBrute(lens))
      val lb = (lens.sum + B - 1) / B
      assert(lb <= bfd && bfd <= nfd, s"bounds: $lb <= $bfd <= $nfd")
    }
  }

  test("bestfit strictly beats nextfit on the classic interleaved case") {
    // 40,40,24,24: NFD opens 3 bins (the 24s can't reach bin1's 24-slack
    // once bin2 is current); BFD fills both 24-slacks -> 2 bins
    val hist = Seq((40L, 2L), (24L, 2L))
    assert(Packing.nfdFold(hist, B)._2 === 3L)
    assert(Packing.bfdFold(hist, B) === 2L)
  }

  test("packWholeDocs: pieces tile their sequences with no overlap or overflow") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 300L).map(i => (i, 1L + rnd.nextInt(150))).toDF("id", "n")
    val got = Packing.packWholeDocs(docs, "id", "n", B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // every positive-length doc is fully covered by its pieces
    val byDoc = got.groupBy(_._1)
    docs.collect().foreach { r =>
      val (id, n) = (r.getLong(0), r.getLong(1))
      assert(byDoc(id).map(_._3).sum === n, s"doc $id length coverage")
    }
    // within each sequence: ranges sorted by start are contiguous from 0
    // (NFD fills left-to-right) and never exceed maxTokens
    got.groupBy(_._4).foreach { case (seq, rows) =>
      val spans = rows.map(r => (r._5, r._5 + r._3)).sortBy(_._1)
      assert(spans.head._1 === 0L, s"seq $seq starts at 0")
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) =>
          assert(e1 === s2, s"seq $seq contiguous")
        case _ =>
      }
      assert(spans.last._2 <= B, s"seq $seq within capacity")
    }
    // the assignment's sequence count equals the fold's ledger row
    val ledger = Packing.packEfficiency(docs, "id", "n", B)
      .filter(col("strategy") === "nextfit_dec")
      .select("n_seqs").head().getLong(0)
    assert(got.map(_._4).distinct.length.toLong === ledger)
  }

  test("packEfficiency ledger: integer identities and strategy ordering") {
    val docs = (1L to 200L).map(i => (i, (i % 97) + 1)).toDF("id", "n")
    val rows = Packing.packEfficiency(docs, "id", "n", B)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val (total, pieces) = (rows("stream")._5, rows("stream")._4)
    rows.foreach { case (st, (seqs, pad, strad, p2, t2)) =>
      assert(p2 === pieces && t2 === total)
      assert(pad === seqs * B - total, s"$st pad identity")
      if (st != "stream" && st != "hybrid_stream_nfd")
        assert(strad === 0L, s"$st never straddles")
    }
    assert(rows("stream")._1 === (total + B - 1) / B)
    assert(rows("bestfit_dec")._1 <= rows("nextfit_dec")._1)
    assert(rows("stream")._1 <= rows("bestfit_dec")._1)
    // docs longer than B split: doc of length 97+1? max n = 97 -> pieces
    // exceed doc count
    assert(pieces > 200L)
  }

  test("hybrid row: oversized docs stream contiguously, the rest pack NFD") {
    val lens = (1L to 200L).map(i => (i % 97) + 1)
    val docs = lens.zipWithIndex.map { case (n, i) => (i + 1L, n) }
      .toDF("id", "n")
    val rows = Packing.packEfficiency(docs, "id", "n", B)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // brute reference: the > B docs stream as one contiguous run, the
    // rest fold NFD
    val bigs = lens.filter(_ > B)
    val bigSeqs = (bigs.sum + B - 1) / B
    val smallBins = nfdBrute(lens.filter(l => l > 0 && l <= B))
    val (seqs, pad, strad) = rows("hybrid_stream_nfd")
    assert(seqs === bigSeqs + smallBins)
    assert(pad === seqs * B - lens.sum)
    // straddles: replay the cumulative cut count over the big docs in
    // id order (the stream discipline)
    var cm = 0L; var expect = 0L
    bigs.foreach { n => cm += n; expect += (cm - 1) / B - (cm - n) / B }
    assert(strad === expect && strad > 0L)
    // the hybrid can never beat the pure stream's zero-pad lower bound
    assert(rows("stream")._1 <= seqs)
  }

  test("zero-length docs drop; single long doc chunks exactly") {
    val docs = Seq((1L, 0L), (2L, 200L)).toDF("id", "n")
    val p = Packing.pieces(docs, "id", "n", B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p.forall(_._1 == 2L))
    assert(p.map(_._3).sorted.toSeq === Seq(8L, 64L, 64L, 64L))
  }
}

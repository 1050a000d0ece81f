package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** FIM (fill-in-the-middle) transformation: deterministic replay,
  * PSM/SPM shapes, the reconstruction identity across every cut-point
  * edge, rate bands, and the map-only Spark surface. */
class InfillSpec extends SparkSuite {
  import spark.implicits._

  private val toks = "the quick brown fox jumps over the lazy dog"
    .split(" ")

  test("deterministic: same seed+doc replays the identical example") {
    val a = Infill.fimTokens(toks, 7L, "d1", fimRate = 1.0, spmRate = 0.5)
    val b = Infill.fimTokens(toks, 7L, "d1", fimRate = 1.0, spmRate = 0.5)
    assert(a._1 == b._1 && a._2.sameElements(b._2))
    val c = Infill.fimTokens(toks, 8L, "d1", fimRate = 1.0, spmRate = 0.5)
    assert(!(a._2.sameElements(c._2)), "seed must move the cuts")
  }

  test("PSM and SPM shapes carry the three sentinels in order") {
    // force each mode via spmRate 0/1
    val (m1, psm) = Infill.fimTokens(toks, 7L, "d1", 1.0, spmRate = 0.0)
    assert(m1 == "psm")
    assert(psm(0) == Infill.Prefix)
    assert(psm.indexOf(Infill.Suffix) > 0)
    assert(psm.indexOf(Infill.Middle) > psm.indexOf(Infill.Suffix))
    val (m2, spm) = Infill.fimTokens(toks, 7L, "d1", 1.0, spmRate = 1.0)
    assert(m2 == "spm")
    assert(spm(0) == Infill.Prefix && spm(1) == Infill.Suffix)
    // token MASS is conserved: 9 tokens + 3 sentinels
    assert(psm.length == toks.length + 3 && spm.length == toks.length + 3)
  }

  test("reconstruction identity across every cut edge, both modes") {
    // sweep docKeys so the order-normalized cuts hit empty prefix,
    // empty middle, empty suffix, and full-width spans
    for (k <- 0 until 200; spmRate <- Seq(0.0, 1.0)) {
      val (mode, out) =
        Infill.fimTokens(toks, 11L, s"doc$k", 1.0, spmRate)
      assert(mode != "ar")
      assert(Infill.reconstruct(out).sameElements(toks),
        s"doc$k spmRate=$spmRate: ${out.mkString(" ")}")
    }
    // tiny and empty docs
    assert(Infill.reconstruct(
      Infill.fimTokens(Array("a", "b"), 1L, "t", 1.0, 0.0)._2)
      .sameElements(Array("a", "b")))
    val (mAr, ar) = Infill.fimTokens(Array("solo"), 1L, "t", 1.0, 0.5)
    assert(mAr == "ar" && ar.sameElements(Array("solo")),
      "below minTokens passes through")
  }

  test("rate bands: fimRate selects ~half, spmRate splits the selected") {
    val n = 2000
    val modes = (0 until n).map(i =>
      Infill.fimTokens(toks, 3L, s"d$i", fimRate = 0.5, spmRate = 0.5)._1)
    val ar = modes.count(_ == "ar")
    val spm = modes.count(_ == "spm")
    val fim = n - ar
    assert(math.abs(fim - n / 2) < n / 10, s"fim=$fim of $n")
    assert(math.abs(spm - fim / 2) < n / 10, s"spm=$spm of fim=$fim")
  }

  test("fimDocs is map-only and round-trips the corpus") {
    val docs = (1L to 50L)
      .map(i => (i, (0 until (i % 7 + 2).toInt).map(j => s"w$j").toArray))
      .toDF("doc_id", "tokens")
    val out = Infill.fimDocs(docs, "tokens", "doc_id", seed = 5L,
      fimRate = 0.7, spmRate = 0.5)
    assert(out.count() == 50)
    val joined = out.join(docs, Seq("doc_id"))
      .as[(Long, String, Array[String], Array[String])].collect()
    joined.foreach { case (id, mode, fim, orig) =>
      assert(Infill.reconstruct(fim).sameElements(orig), s"doc $id ($mode)")
      if (mode == "ar") assert(fim.sameElements(orig))
      else assert(fim.length == orig.length + 3)
    }
    // no shuffle: a map-only plan has no exchange below the scan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

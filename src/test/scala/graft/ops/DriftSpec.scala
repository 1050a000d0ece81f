package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Snapshot distribution drift (ops/Drift): exact-rational TV distance,
  * edge bins, identity and disjoint extremes, null handling. */
class DriftSpec extends SparkSuite {
  import spark.implicits._

  private def tv(a: Seq[Long], b: Seq[Long], lo: Long = 0, width: Long = 10,
                 nBins: Int = 5): (Long, Long, Long, Long) = {
    val r = Drift.tvDistance(a.toDF("v"), b.toDF("v"), "v", lo, width, nBins)
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("identical snapshots have zero drift") {
    val xs = Seq(1L, 5L, 23L, 47L, 12L, 5L)
    val (na, nb, num, den) = tv(xs, xs)
    assert(na == 6 && nb == 6 && num == 0L && den == 72L)
  }

  test("disjoint snapshots reach TV = 1 exactly") {
    val (_, _, num, den) = tv(Seq(1L, 2L, 3L), Seq(31L, 32L, 33L, 34L))
    assert(num == den) // 1 as a rational
  }

  test("hand-computed drift: one value moved one bin") {
    // a: bins {0:2, 1:1}; b: bins {0:1, 1:2}; Na=Nb=3
    // TV = (|2*3-1*3| + |1*3-2*3|) / (2*3*3) = 6/18 = 1/3
    val (_, _, num, den) = tv(Seq(1L, 2L, 15L), Seq(1L, 15L, 16L))
    assert(num * 3 == den)
  }

  test("under/overflow edge bins catch out-of-range values") {
    val bins = Drift.binDrift(
      Seq(-5L, 3L, 100L).toDF("v"), Seq(3L).toDF("v"), "v", 0, 10, 5)
      .orderBy("bin").collect()
    assert(bins.map(_.getLong(0)).toSeq == Seq(-1L, 0L, 5L))
    assert(bins.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L), (1L, 1L), (1L, 0L)))
  }

  test("nulls are excluded from both counts") {
    val a = Seq(Some(1L), None, Some(15L)).toDF("v")
    val b = Seq(Some(1L), Some(15L)).toDF("v")
    val r = Drift.tvDistance(a, b, "v", 0, 10, 5).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 && r.getLong(2) == 0L)
  }

  test("drift verdict thresholds on the rational without floats") {
    val (_, _, num, den) = tv(Seq(1L, 2L, 15L), Seq(1L, 15L, 16L))
    assert(num * 100 > den * 30) // TV = 1/3 > 30%
    assert(num * 100 <= den * 34) // and <= 34%
  }
}

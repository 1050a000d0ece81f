package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("pointInInterval matches brute force, incl. overlapping intervals") {
    val pts = (0L until 300L).map(p => (p, (p * 53) % 997)).toDF("pid", "p")
    val ivs = (0L until 40L).map { i =>
      val s = (i * 71) % 900
      (i, s, s + 1 + (i * 13) % 150) // spans 1..150, many overlap
    }.toDF("iid", "s", "e")

    for (w <- Seq(1L, 32L, 64L, 1024L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e",
          keys = Nil, bucketWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted
      val want = for {
        (pid, p) <- (0L until 300L).map(p => (p, (p * 53) % 997))
        (iid, s, e) <- (0L until 40L).map { i =>
          val s = (i * 71) % 900; (i, s, s + 1 + (i * 13) % 150)
        }
        if p >= s && p < e
      } yield (pid, iid)
      assert(got.toSeq === want.sorted, s"bucketWidth=$w")
    }
  }

  test("pointInInterval respects equality keys") {
    val pts = Seq(("a", 5L, 1L), ("b", 5L, 2L)).toDF("k", "p", "pid")
    val ivs = Seq(("a", 0L, 10L, 10L), ("b", 6L, 10L, 20L)).toDF("k", "s", "e", "iid")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", Seq("k"), 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L))) // b's point is outside b's interval
  }

  test("intervalOverlap emits each overlapping pair exactly once") {
    val as = (0L until 60L).map { i =>
      val s = (i * 37) % 500; (i, s, s + 1 + (i * 11) % 90)
    }
    val bs = (0L until 50L).map { i =>
      val s = (i * 43) % 500; (i, s, s + 1 + (i * 7) % 60)
    }
    val a = as.toDF("a_id", "a_s", "a_e")
    val b = bs.toDF("b_id", "b_s", "b_e")
    for (w <- Seq(1L, 16L, 64L, 4096L)) {
      val got = RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e",
          keys = Nil, bucketWidth = w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      val want = for {
        (ai, s1, e1) <- as; (bi, s2, e2) <- bs
        if s1 < e2 && s2 < e1
      } yield (ai, bi)
      // exact multiset equality: no duplicates from multi-bucket co-occurrence
      assert(got.sorted.toSeq === want.sorted, s"bucketWidth=$w")
    }
  }

  test("degenerate and empty intervals never match") {
    val pts = Seq(5L).toDF("p")
    val ivs = Seq((1L, 5L, 5L), (2L, 6L, 4L)).toDF("iid", "s", "e")
    assert(RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", Nil, 8L).count() === 0)
  }

  test("physical plan is an equi-join, never a nested loop or cartesian") {
    val pts = (0L until 100L).map(p => (p, p % 97)).toDF("pid", "p")
    val ivs = (0L until 10L).map(i => (i, i * 10, i * 10 + 25)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", Nil, 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("hybrid long/short path matches the pure bucketed result") {
    val pts = (0L until 500L).map(p => (p, (p * 31) % 2000)).toDF("pid", "p")
    // mixed spans: mostly short, a few spanning most of the domain
    val ivs = (0L until 30L).map { i =>
      val s = (i * 67) % 1800
      val span = if (i % 9 == 0) 1500L else 1 + (i * 13) % 40
      (i, s, s + span)
    }.toDF("iid", "s", "e")
    val plain = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", Nil, 16L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val hybrid = RangeJoin.pointInIntervalHybrid(pts, ivs, "p", "s", "e",
        Nil, 16L, longSpanBuckets = 8)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(hybrid === plain)
    assert(hybrid.nonEmpty)
  }

  test("overlap hybrid matches the pure bucketed result on skewed spans") {
    val as = (0L until 80L).map { i =>
      val s = (i * 37) % 3000
      // every 11th interval is super-wide (the skew term the hybrid removes)
      val span = if (i % 11 == 0) 2500L else 1 + (i * 13) % 50
      (i, s, s + span)
    }
    val bs = (0L until 70L).map { i =>
      val s = (i * 43) % 3000
      val span = if (i % 13 == 0) 2800L else 1 + (i * 7) % 60
      (i, s, s + span)
    }
    val a = as.toDF("a_id", "a_s", "a_e")
    val b = bs.toDF("b_id", "b_s", "b_e")
    val want = (for {
      (ai, s1, e1) <- as; (bi, s2, e2) <- bs
      if s1 < e2 && s2 < e1
    } yield (ai, bi)).sorted
    for (lsb <- Seq(1, 4, 64)) {
      val got = RangeJoin.intervalOverlapHybrid(a, b, "a_s", "a_e", "b_s", "b_e",
          keys = Nil, bucketWidth = 16L, longSpanBuckets = lsb)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      // exact multiset equality: the three hybrid paths neither drop nor
      // double-count any pair (incl. long x long)
      assert(got === want, s"longSpanBuckets=$lsb")
    }
  }

  test("overlap hybrid respects keys and skips empty intervals") {
    val a = Seq(("a", 0L, 1000L, 1L), ("a", 5L, 10L, 2L), ("b", 5L, 5L, 3L))
      .toDF("k", "a_s", "a_e", "a_id")
    val b = Seq(("a", 8L, 12L, 10L), ("b", 0L, 1000L, 11L), ("a", 900L, 901L, 12L))
      .toDF("k", "b_s", "b_e", "b_id")
    val got = RangeJoin.intervalOverlapHybrid(a, b, "a_s", "a_e", "b_s", "b_e",
        Seq("k"), 16L, longSpanBuckets = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // a_id=3 is empty [5,5) -> never matches even against b's wide 11
    assert(got === Set((1L, 10L), (2L, 10L), (1L, 12L)))
  }

  test("hybrid with keys and boundary-length intervals stays exact") {
    val pts = Seq(("a", 10L, 1L), ("a", 100L, 2L), ("b", 100L, 3L)).toDF("k", "p", "pid")
    val ivs = Seq(
      ("a", 0L, 16L, 10L),     // short
      ("a", 0L, 1000L, 11L),   // long
      ("b", 90L, 106L, 12L),   // exactly spanLimit boundary (16*1 = 16)
      ("b", 101L, 200L, 13L))  // no match
      .toDF("k", "s", "e", "iid")
    val got = RangeJoin.pointInIntervalHybrid(pts, ivs, "p", "s", "e",
        Seq("k"), 16L, longSpanBuckets = 1)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 11L), (3L, 12L)))
  }
}

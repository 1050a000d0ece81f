package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Gaps-and-islands coalescing (ops/Intervals): merge semantics incl.
  * touching/contained/duplicate intervals, minGap tolerance, gap
  * complement, per-key independence, plan shape (no keyless window). */
class IntervalsSpec extends SparkSuite {
  import spark.implicits._

  private def islands(rows: Seq[(String, Long, Long)], minGap: Long = 0)
      : Seq[(String, Long, Long, Long, Long)] =
    Intervals.coalesceIntervals(
        rows.toDF("k", "s", "e").repartition(5), Seq("k"), "s", "e", minGap)
      .orderBy("k", "island")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("overlapping, touching, contained, and disjoint intervals") {
    val got = islands(Seq(
      ("a", 0L, 10L), ("a", 5L, 20L), // overlap -> one island
      ("a", 20L, 30L), // touching merges at minGap 0
      ("a", 22L, 25L), // contained
      ("a", 50L, 60L), // disjoint -> new island
      ("b", 0L, 1L))) // other key independent
    assert(got == Seq(
      ("a", 0L, 0L, 30L, 4L),
      ("a", 1L, 50L, 60L, 1L),
      ("b", 0L, 0L, 1L, 1L)))
  }

  test("minGap bridges small gaps; duplicates count into n_merged") {
    val rows = Seq(("k", 0L, 10L), ("k", 0L, 10L), ("k", 13L, 20L))
    assert(islands(rows) == Seq(
      ("k", 0L, 0L, 10L, 2L), ("k", 1L, 13L, 20L, 1L)))
    assert(islands(rows, minGap = 5) == Seq(("k", 0L, 0L, 20L, 3L)))
  }

  test("gaps are the island complement") {
    val got = Intervals.gaps(
        Seq(("k", 0L, 10L), ("k", 30L, 40L), ("k", 35L, 50L), ("k", 90L, 91L))
          .toDF("k", "s", "e"), Seq("k"), "s", "e")
      .orderBy("gap_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("k", 10L, 30L), ("k", 50L, 90L)))
    // single island -> no gaps
    assert(Intervals.gaps(Seq(("k", 0L, 10L)).toDF("k", "s", "e"),
      Seq("k"), "s", "e").count() == 0L)
  }

  test("matches a brute-force merge oracle on random interval sets") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 400).map { i =>
      val s = rnd.nextInt(500).toLong
      (s"k${i % 6}", s, s + 1 + rnd.nextInt(40))
    }
    // brute force: per key, sort and sweep
    def bruteIslands(iv: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
      val sorted = iv.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      for ((s, e) <- sorted) {
        if (out.nonEmpty && s <= out.last._2)
          out(out.size - 1) = (out.last._1, math.max(out.last._2, e),
            out.last._3 + 1)
        else out += ((s, e, 1L))
      }
      out.toSeq
    }
    val got = islands(rows)
    rows.groupBy(_._1).foreach { case (k, iv) =>
      val expected = bruteIslands(iv.map(t => (t._2, t._3)))
      val mine = got.filter(_._1 == k).map(t => (t._3, t._4, t._5))
      assert(mine == expected, s"key $k")
    }
  }

  test("a keyless call is refused (single-partition window guard)") {
    val ex = intercept[IllegalArgumentException](
      Intervals.coalesceIntervals(
        Seq(("k", 0L, 1L)).toDF("k", "s", "e"), Nil, "s", "e"))
    assert(ex.getMessage.contains("key"))
  }

  test("windows partition by the key, never globally") {
    val plan = Intervals.coalesceIntervals(
        Seq(("k", 0L, 1L)).toDF("k", "s", "e"), Seq("k"), "s", "e")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(s"), plan)
    assert(plan.contains("windowspecdefinition(k"), plan)
  }
}

package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.AsOfJoin

class AsOfMergeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("matches the bucketed as-of join on random-ish keyed data") {
    val left = (1L to 400L).map(i =>
      ((i % 7).toString, (i * 37) % 1000, i)).toDF("k", "t", "id")
    val right = (0L until 60L).map(i =>
      ((i % 7).toString, i * 16 + 3, i)).toDF("k", "rt", "pidx")

    val merge = AsOfMergeJoin.backward(left, right, "t", "rt",
        keys = Seq("k"), rightCols = Seq("pidx"))
      .select("id", "pidx", "rt")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val bucketed = AsOfJoin.backward(left, right, "t", "rt",
        keys = Seq("k"), bucketWidth = 64L, rightCols = Seq("pidx"))
      .select("id", "pidx", "rt")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(merge === bucketed)
  }

  test("left rows before any right row carry nulls; boundaries match exactly") {
    val left = Seq(("a", 5L, 1L), ("a", 10L, 2L), ("a", 15L, 3L), ("b", 10L, 4L))
      .toDF("k", "t", "id")
    val right = Seq(("a", 10L, 100L), ("a", 15L, 150L)).toDF("k", "rt", "v")
    val out = AsOfMergeJoin.backward(left, right, "t", "rt", Seq("k"), Seq("v"))
      .select("id", "v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out === Map(1L -> -1L, 2L -> 100L, 3L -> 150L, 4L -> -1L))
  }

  test("NULL times match nothing, in both directions (parity with AsOfJoin.backward)") {
    // null right times must never be returned as matches (they'd read as
    // epoch 0 through getLong), and null left times must carry nulls
    val left = Seq(("a", Some(5L), 1L), ("a", None, 2L), ("a", Some(50L), 3L))
      .toDF("k", "t", "id")
    val right = Seq(("a", None: Option[Long], 999L), ("a", Some(10L), 100L))
      .toDF("k", "rt", "v")
    val back = AsOfMergeJoin.backward(left, right, "t", "rt", Seq("k"), Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // id=1 (t=5): no right row <= 5 with non-null time -> null (NOT the
    // null-time row 999); id=2 (t=null): null; id=3 (t=50): pulse at 10
    assert(back === Map(1L -> -1L, 2L -> -1L, 3L -> 100L))
    val fwd = AsOfMergeJoin.forward(left, right, "t", "rt", Seq("k"), Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // forward: id=1 (t=5) -> first right >= 5 is 10; id=2 null; id=3 none
    assert(fwd === Map(1L -> 100L, 2L -> -1L, 3L -> -1L))
  }

  test("heavy-tailed gaps: correct across an idle span no bucket width likes") {
    // one pulse, then 10 hours of silence, then a burst — the bucketed
    // formulation must explode ~36k 1s-buckets for the idle interval;
    // the merge walk has no such term
    val pulses = (Seq(0L) ++ (36000L to 36010L)).zipWithIndex
      .map { case (t, i) => ("r", t * 1000000L, i.toLong) }
      .toDF("k", "rt", "pidx")
    val evs = Seq(("r", 1L, 1L), ("r", 18000L * 1000000L, 2L),
      ("r", 36005L * 1000000L + 1, 3L)).toDF("k", "t", "id")
    val out = AsOfMergeJoin.backward(evs, pulses, "t", "rt", Seq("k"), Seq("pidx"))
      .select("id", "pidx").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 6L))
  }

  test("plans as the custom exec node with merge-friendly children") {
    val left = (1L to 100L).map(i => ((i % 3).toString, i, i)).toDF("k", "t", "id")
    val right = (1L to 10L).map(i => ((i % 3).toString, i * 7, i)).toDF("k", "rt", "p")
    val df = AsOfMergeJoin.backward(left, right, "t", "rt", Seq("k"), Seq("p"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    df.collect() // and it executes
  }

  test("downstream operators compose on top of the custom node") {
    val left = (1L to 200L).map(i => ((i % 5).toString, i * 3, i)).toDF("k", "t", "id")
    val right = (1L to 20L).map(i => ((i % 5).toString, i * 25, i)).toDF("k", "rt", "p")
    val agg = AsOfMergeJoin.backward(left, right, "t", "rt", Seq("k"), Seq("p"))
      .groupBy("k").agg(count(col("p")).as("n_matched"), count(lit(1)).as("n"))
      .orderBy("k")
    val rows = agg.collect()
    assert(rows.map(_.getLong(2)).sum === 200L)
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2)))
  }

  test("self-lineage: right side derived from the left frame binds correctly") {
    // regression: shared lineage used to let DeduplicateRelations re-bind
    // the right key to the LEFT subtree (then column pruning broke exec)
    val ev = (1L to 300L).map(i =>
      (i, i % 9, (i * 31) % 500, if (i % 4 == 0) "click" else "view"))
      .toDF("event_id", "user_id", "t", "event_type")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("t").as("ct"))
      .agg(max(col("event_id")).as("click_id"))
    val got = AsOfMergeJoin.backward(
        ev.select("event_id", "user_id", "t"), clicks,
        "t", "ct", Seq("user_id"), Seq("click_id"))
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // brute-force reference
    val cl = (1L to 300L).filter(_ % 4 == 0)
      .map(i => (i % 9, (i * 31) % 500, i))
      .groupBy(p => (p._1, p._2)).map { case (k, vs) => (k._1, k._2, vs.map(_._3).max) }.toSeq
    val want = (1L to 300L).map { i =>
      val (u, t) = (i % 9, (i * 31) % 500)
      val m = cl.filter(c => c._1 == u && c._2 <= t)
      i -> (if (m.isEmpty) -1L
            else m.maxBy(c => (c._2, c._3))._3)
    }.toMap
    assert(got === want)
  }

  test("forward as-of attaches the earliest right row at-or-after, per key") {
    val left = (1L to 300L).map(i =>
      ((i % 6).toString, (i * 41) % 700, i)).toDF("k", "t", "id")
    val rs = (0L until 40L).map(i => ((i % 6).toString, (i * 53) % 700, i))
    val right = rs.toDF("k", "rt", "pidx")
    val got = AsOfMergeJoin.forward(left, right, "t", "rt",
        keys = Seq("k"), rightCols = Seq("pidx"))
      .select("id", "pidx")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val want = (1L to 300L).map { i =>
      val (k, t) = ((i % 6).toString, (i * 41) % 700)
      val m = rs.filter(r => r._1 == k && r._2 >= t)
      i -> (if (m.isEmpty) -1L
            // earliest rt; ties on rt resolve to the last in sort order —
            // make the expectation deterministic by unique (k, rt) below
            else m.minBy(r => (r._2, r._3))._3)
    }.toMap
    // keep only keys with unique (k, rt) pairs in this dataset: rs has
    // collisions when (i*53)%700 repeats within a key — dedup them the
    // same way both sides would
    val dupFree = rs.groupBy(r => (r._1, r._2)).forall(_._2.size == 1)
    assume(dupFree, "test data must have unique (k, rt)")
    assert(got === want)
  }
}

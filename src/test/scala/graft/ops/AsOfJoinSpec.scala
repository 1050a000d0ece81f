package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("backward as-of attaches latest right row at or before left time") {
    val left = Seq(
      (1L, 5L), (2L, 10L), (3L, 14L), (4L, 15L), (5L, 99L), (6L, 3L))
      .toDF("id", "t")
    val right = Seq((10L, 100L), (15L, 150L), (40L, 400L)).toDF("rt", "payload")

    val out = AsOfJoin.backward(left, right,
      leftTime = "t", rightTime = "rt", keys = Nil,
      bucketWidth = 7L, rightCols = Seq("payload"))
      .select("id", "payload", "rt")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    assert(out === Set(
      (1L, -1L, -1L),    // t=5 before first pulse
      (2L, 100L, 10L),   // exact boundary t == rt matches
      (3L, 100L, 10L),
      (4L, 150L, 15L),   // next boundary
      (5L, 400L, 40L),   // open-ended last interval
      (6L, -1L, -1L)))
  }

  test("keys partition the timelines independently") {
    val left = Seq(("a", 10L, 1L), ("b", 10L, 2L)).toDF("k", "t", "id")
    val right = Seq(("a", 5L, 50L), ("b", 9L, 90L)).toDF("k", "rt", "payload")
    val out = AsOfJoin.backward(left, right, "t", "rt", Seq("k"), 4L, Seq("payload"))
      .select("id", "payload").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 50L), (2L, 90L)))
  }

  test("keyed last intervals cap at each key's own max left time") {
    // key 'a' lives near t=0, key 'b' near t=10^12. A GLOBAL cap would
    // explode a's last interval onto ~10^12 width-1 buckets (this test
    // would not finish); the per-key cap bounds it at a's own max.
    val far = 1000000000000L
    val left = Seq(("a", 5L, 1L), ("b", far + 5L, 2L)).toDF("k", "t", "id")
    val right = Seq(("a", 1L, 10L), ("b", far + 1L, 20L)).toDF("k", "rt", "v")
    val out = AsOfJoin.backward(left, right, "t", "rt", Seq("k"),
        bucketWidth = 1L, rightCols = Seq("v"))
      .select("id", "v").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 10L, 2L -> 20L))
  }

  test("right side derived from the left frame joins without self-join ambiguity") {
    // pulse timelines are usually EXTRACTED from the event frame itself;
    // the per-key cap join must not trip the ambiguous-self-join check
    val ev = Seq(("a", 5L, 1L, "click"), ("a", 9L, 2L, "x"), ("a", 20L, 3L, "x"))
      .toDF("k", "t", "id", "typ")
    val pulses = EventTime.derivePulseTimes(ev, "typ", "t", "click",
        runKeys = Seq("k"), tieBreak = Seq("id"))
      .select("k", "pulse_time", "pulse_index")
    val out = AsOfJoin.backward(ev.select("k", "id", "t"), pulses,
        leftTime = "t", rightTime = "pulse_time",
        keys = Seq("k"), bucketWidth = 8L, rightCols = Seq("pulse_index"))
      .select("id", "pulse_index").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("checkpointed right side (LogicalRDD reusing exprIds) joins cleanly") {
    // a localCheckpoint'd pulse frame keeps the original attribute ids;
    // without the internal re-alias the keyed cap join reads as an
    // ambiguous self-join and analysis fails
    val ev = Seq(("a", 5L, 1L, "click"), ("a", 9L, 2L, "x"), ("a", 20L, 3L, "x"))
      .toDF("k", "t", "id", "typ")
    val pulses = EventTime.derivePulseTimes(ev, "typ", "t", "click",
        runKeys = Seq("k"), tieBreak = Seq("id"))
      .select("k", "pulse_time", "pulse_index")
      .localCheckpoint()
    val out = AsOfJoin.backward(ev.select("k", "id", "t"), pulses,
        leftTime = "t", rightTime = "pulse_time",
        keys = Seq("k"), bucketWidth = 8L, rightCols = Seq("pulse_index"))
      .select("id", "pulse_index").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("matches a brute-force reference on random-ish data") {
    val ls = (1L to 200L).map(i => (i, (i * 37) % 1000))
    val rs = (0L until 25L).map(i => (i * 40 + 3, i))
    val left = ls.toDF("id", "t")
    val right = rs.toDF("rt", "pidx")
    val out = AsOfJoin.backward(left, right, "t", "rt", Nil, 64L, Seq("pidx"))
      .select("id", "pidx")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val expected = ls.map { case (id, t) =>
      val m = rs.filter(_._1 <= t)
      id -> (if (m.isEmpty) -1L else m.maxBy(_._1)._2)
    }.toMap
    assert(out === expected)
  }
}

package graft.ops

import graft.SparkSuite

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  // u1 completes all three in order; u2 clicks BEFORE their first view
  // (must not count as step 2); u3 views only; u4 never views (omitted)
  private def events = Seq(
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    (2L, 50L, "click"), (2L, 60L, "view"), (2L, 70L, "purchase"),
    (3L, 80L, "view"),
    (4L, 90L, "purchase")).toDF("user_id", "ts", "event_type")

  test("userSteps: strictly sequential step times, stalls are NULL") {
    val out = Funnel.userSteps(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "step_1_ts", "step_2_ts", "step_3_ts")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(out === Seq(
      (1L, Some(10L), Some(20L), Some(30L)),
      // u2: click at 50 precedes the first view (60) -> step 2 stalls,
      // even though a purchase (70) exists
      (2L, Some(60L), None, None),
      (3L, Some(80L), None, None)))
  }

  test("counts: one row per step with strictly decreasing user counts") {
    val out = Funnel.counts(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select("step", "step_type", "n_users")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "view", 3L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("maxGaps: conversions outside the per-transition window stall") {
    // u1: click 10 units after view (gap edge, inclusive), purchase 100
    // after click; u5: click 11 after view — one unit past the window
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 120L, "purchase"),
      (5L, 10L, "view"), (5L, 21L, "click"), (5L, 22L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.userSteps(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGaps = Seq(10L, 100L))
      .orderBy("user_id")
      .select("user_id", "step_1_ts", "step_2_ts", "step_3_ts")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(out === Seq(
      (1L, Some(10L), Some(20L), Some(120L)),   // both gaps at the edge
      // u5 stalls at click — a lapsed window is never revived by the
      // later purchase
      (5L, Some(10L), None, None)))
    val counts = Funnel.counts(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGaps = Seq(10L, 100L))
      .select("step", "n_users").as[(Long, Long)].collect().toSeq
    assert(counts === Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("counts: a step name containing a quote stays data") {
    val ev = Seq((1L, 10L, "add'l view"), (1L, 20L, "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.counts(ev, "user_id", "ts", "event_type",
        Seq("add'l view", "click"))
      .select("step", "step_type", "n_users")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "add'l view", 1L), (2L, "click", 1L)))
  }

  test("same-timestamp step events match at-or-after semantics") {
    val ev = Seq((1L, 10L, "view"), (1L, 10L, "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.userSteps(ev, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .select("step_1_ts", "step_2_ts")
      .as[(Option[Long], Option[Long])].head()
    assert(out === ((Some(10L), Some(10L))))
  }
}

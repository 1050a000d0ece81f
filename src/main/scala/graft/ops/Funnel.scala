package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — the classic product
  * query the reference's event tables feed (events_by_time buckets are
  * its coarse cousin): for an ordered step sequence (e.g. view -> click
  * -> purchase), each user's step-i time is the EARLIEST event of step
  * i's type at-or-after their step-(i-1) time. Strictly sequential
  * semantics, one row per user who completed step 1.
  *
  * Scale shape: one filtered aggregation per step, each keyed on the
  * user column — partition the event lake by user (or bucket it) and
  * every join below is co-located; nothing here is a window over the
  * full stream, so no step funnels into one reducer. Step events are
  * filtered BEFORE each join/agg, so the per-step shuffle carries only
  * that step's type. At k steps the cost is k filtered-agg shuffles of
  * strictly shrinking row counts.
  *
  * Reference anchor: spark_events_by_time_parquet.py's per-bank interval
  * counts (SURVEY §2.2) answer "how many events"; this answers the
  * sequenced "how many users progressed" — the composition the reference
  * leaves to its users.
  */
object Funnel {

  /** Per-user funnel times: `(userCol, step_1_ts, ..., step_k_ts)` —
    * step_i_ts NULL once the user stalls. Users with no step-1 event are
    * omitted (they are the complement of the funnel's first count).
    *
    * @param steps ordered event-type values, length >= 1
    */
  def userSteps(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("step_1_ts"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"step_${i}_ts"
      val cur = s"step_${i + 1}_ts"
      // earliest event of this step's type at-or-after the user's
      // previous step time: filter the step's events, join on user,
      // conditional min. The join is keyed on the user column only —
      // equi-join, broadcast/co-located at scale, never a range join.
      val stepEvents = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__t"))
      val carry = (1 to i).map(j => col(s"step_${j}_ts"))
      acc.join(stepEvents, Seq(userCol), "left")
        .groupBy(col(userCol) +: carry: _*)
        .agg(min(when(col("__t") >= col(prev), col("__t"))).as(cur))
    }
  }

  /** Funnel counts: one row per step, `(step, step_type, n_users)` —
    * n_users = users whose step-i time exists (strictly sequential).
    * All step counts come from ONE aggregation over [[userSteps]]
    * (count skips NULLs), then stack() pivots the single row to
    * per-step rows — a per-step agg would recompute the whole join
    * chain k times.
    */
  def counts(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    val per = userSteps(events, userCol, tsCol, typeCol, steps)
    val aggs = steps.indices.map(i =>
      count(col(s"step_${i + 1}_ts")).as(s"__n${i + 1}"))
    val stacked = steps.zipWithIndex
      .map { case (s, i) => s"${i + 1}L, '$s', __n${i + 1}" }
      .mkString(", ")
    per.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${steps.size}, $stacked) AS (step, step_type, n_users)"))
      .orderBy("step")
  }
}

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
    * @param maxGaps optional per-transition conversion windows, one per
    *                step AFTER the first (size `steps.size - 1`): step i
    *                must occur within `maxGaps(i-2)` time units of step
    *                i-1 ("purchase within 7 days of click"). Units are
    *                the NUMERIC `tsCol`'s own (e.g. microseconds for an
    *                epoch-µs column). Empty = unbounded (the default).
    *                A user who converts only outside the window stalls at
    *                that step — later events never revive a lapsed step.
    */
  def userSteps(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, steps: Seq[String],
                maxGaps: Seq[Long] = Nil): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(maxGaps.isEmpty || maxGaps.size == steps.size - 1,
      s"maxGaps must have one entry per transition (${steps.size - 1}), " +
        s"got ${maxGaps.size}")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("step_1_ts"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"step_${i}_ts"
      val cur = s"step_${i + 1}_ts"
      // earliest event of this step's type at-or-after the user's
      // previous step time (and inside the transition window, when one
      // is configured — one extra predicate in the same conditional
      // min): filter the step's events, join on user, conditional min.
      // The join is keyed on the user column only — equi-join,
      // broadcast/co-located at scale, never a range join.
      val inWindow = maxGaps.lift(i - 1) match {
        case Some(gap) => col("__t") >= col(prev) &&
          col("__t") <= col(prev) + lit(gap)
        case None => col("__t") >= col(prev)
      }
      val stepEvents = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__t"))
      val carry = (1 to i).map(j => col(s"step_${j}_ts"))
      acc.join(stepEvents, Seq(userCol), "left")
        .groupBy(col(userCol) +: carry: _*)
        .agg(min(when(inWindow, col("__t"))).as(cur))
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
             typeCol: String, steps: Seq[String],
             maxGaps: Seq[Long] = Nil): DataFrame = {
    val per = userSteps(events, userCol, tsCol, typeCol, steps, maxGaps)
    val aggs = steps.indices.map(i =>
      count(col(s"step_${i + 1}_ts")).as(s"__n${i + 1}"))
    // per-step rows via typed lit() structs, not an interpolated stack()
    // string — a step value containing a quote must stay data, not SQL
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit((i + 1).toLong).as("step"), lit(s).as("step_type"),
        col(s"__n${i + 1}").as("n_users"))
    }
    per.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("__s"))
      .select(col("__s.step").as("step"), col("__s.step_type").as("step_type"),
        col("__s.n_users").as("n_users"))
      .orderBy("step")
  }
}

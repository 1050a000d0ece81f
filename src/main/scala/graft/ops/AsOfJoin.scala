package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row attach the most recent right row
  * with `rightTime <= leftTime` (within the same partition keys).
  *
  * The reference correlates detector events to accelerator pulses this way
  * (each event belongs to the latest pulse at or before it; the correlation
  * is consumed in reference scripts/spark_events_by_time_parquet.py:205).
  * Spark has no built-in as-of join, so this implements one with a
  * *bucketed interval join* that stays shuffle-friendly at 100 TB:
  *
  *  1. Turn the right side into intervals [t_i, t_{i+1}) via `lead` over a
  *     window partitioned by the join keys (never a global sort — each
  *     partition, e.g. one experiment run, sorts independently).
  *  2. Explode each interval onto the fixed-width time buckets it spans.
  *  3. Equi-join left rows on (keys, bucket) — an ordinary shuffled hash /
  *     sort-merge join — and keep the single interval covering the row.
  *
  * Compared to the naive alternatives: a global `Window.orderBy` over the
  * union collapses to one partition and dies at scale; a broadcast
  * nested-loop range join is O(|L| * |R|) per executor. Here the shuffle
  * key is (keys, bucket), the explosion factor is ~(interval span /
  * bucketWidth), and both sides prune columns before the shuffle. All time
  * arithmetic is integral (`div`), safe for epoch-nanos beyond 2^53.
  */
object AsOfJoin {

  /** @param left         rows to enrich
    * @param right        timeline rows (e.g. pulses); unique per
    *                     (keys, rightTime)
    * @param leftTime     left epoch column name (any integral unit)
    * @param rightTime    right epoch column name (same unit as leftTime)
    * @param keys         equality keys joined alongside time (e.g. run_id);
    *                     empty keys mean one global timeline — only sound
    *                     when the right side is small
    * @param bucketWidth  bucket size in time units; pick ~the typical gap
    *                     between right rows so the explosion factor stays
    *                     near 1
    * @param rightCols    right columns to carry onto the left rows
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      keys: Seq[String],
      bucketWidth: Long,
      rightCols: Seq[String]): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")

    // Cap the open-ended last interval at the max left time so it explodes
    // onto a bounded bucket range. CRITICAL that the cap is PER KEY when
    // keys are present: capping at the global max makes every key's last
    // interval span to the end of the whole corpus timeline — with 1000
    // run timelines laid end to end, each run's final pulse would explode
    // onto (global span / bucketWidth) buckets, ~700M rows at 100M events
    // (measured as a task-failure blowup before this fix). The per-key max
    // is one aggregate of the left side, one row per key.
    // Rename the cap frame's key columns through toDF: the right side is
    // often DERIVED FROM the left frame (pulse timelines extracted from
    // the same event stream), so a usingColumns join here would be an
    // ambiguous self-join — fresh aliases give the cap side its own
    // attribute ids.
    val capKeys = keys.map(k => s"__cap_$k")
    val maxLeft =
      if (keys.isEmpty) left.agg(max(col(leftTime)).as("__t_max"))
      else left.groupBy(keys.map(col): _*).agg(max(col(leftTime)).as("__t_max"))
        .toDF(capKeys :+ "__t_max": _*)

    val carried = (rightCols :+ rightTime).distinct.filterNot(keys.contains)
    // Re-alias the pruned right side through toDF: every downstream
    // reference then binds to FRESH attribute ids, so a right frame that
    // shares lineage or exprIds with `left` (pulse timelines derived from
    // the event frame itself, or a checkpointed frame whose LogicalRDD
    // reuses the original ids) can never trip the analyzer's
    // ambiguous-self-join check — the same isolation AsOfMergeJoin does
    // with explicit Alias nodes.
    val prunedCols = (keys ++ carried).distinct
    val pruned = right.select(prunedCols.map(col): _*).toDF(prunedCols: _*)
    // interval end = next timeline entry. With keys the lead windows over
    // each key's partition; keyless (one global timeline) it would collapse
    // to a single partition, so use the range-partitioned global lead.
    val withEnd =
      if (keys.isEmpty)
        Ranking.globalLead(pruned, rightTime, Seq(col(rightTime)), "__t_end")
      else {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(rightTime))
        pruned.withColumn("__t_end", lead(col(rightTime), 1).over(w))
      }
    val capped =
      if (keys.isEmpty) withEnd.crossJoin(broadcast(maxLeft))
      else withEnd.join(maxLeft, // AQE broadcasts when small
        keys.zip(capKeys).map { case (k, c) => withEnd(k) === maxLeft(c) }
          .reduce(_ && _),
        "left").drop(capKeys: _*)
    val intervals = capped
      .withColumn("__t_end", coalesce(col("__t_end"), col("__t_max") + 1))
      .drop("__t_max")
      // drop intervals starting after every left row (nothing to cover)
      .filter(col(rightTime) < col("__t_end"))
      .withColumn("__bucket", explode(expr(
        s"sequence(`$rightTime` div $bucketWidth, (__t_end - 1) div $bucketWidth)")))

    val lb = left.withColumn("__bucket", expr(s"`$leftTime` div $bucketWidth"))

    val joinCond = (keys :+ "__bucket")
      .map(k => lb(k) === intervals(k))
      .reduce(_ && _) &&
      intervals(rightTime) <= lb(leftTime) && lb(leftTime) < intervals("__t_end")

    lb.join(intervals, joinCond, "left")
      .select(left.columns.toIndexedSeq.map(lb.apply) ++ carried.map(intervals.apply): _*)
  }
}

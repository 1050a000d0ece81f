package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands over per-key interval sets — detector live/dead
  * windows, session spans, crawl-coverage stretches: coalesce
  * overlapping (or near-adjacent) intervals into islands, or emit the
  * complementary gaps.
  *
  * Scale shape: per-KEY windows only (a key's intervals sort within its
  * partition; keys parallelize — the `EventTime.sessionizeBatch`
  * argument; RankingSpec's no-single-partition-window rule holds). The
  * island id is the classic running count of break points: an interval
  * starts a new island iff its start exceeds the running max end of
  * everything before it (plus `minGap` tolerance), and the running max
  * uses a ROWS UNBOUNDED PRECEDING..1 PRECEDING frame — one window
  * pass, no self-join, no explode.
  */
object Intervals {

  /** Coalesced islands: `(keys..., island, start, end, n_merged)` —
    * `island` is the 0-based per-key island index in time order.
    * Intervals whose start is within `minGap` of the running max end
    * merge (so `minGap = 0` merges touching intervals; negative never
    * merges adjacent, only true overlaps). Ordering ties break on
    * (start, end) — deterministic for any input. */
  def coalesceIntervals(df: DataFrame, keys: Seq[String],
                        startCol: String, endCol: String,
                        minGap: Long = 0L): DataFrame = {
    require(keys.nonEmpty,
      "need at least one key column (a keyless global timeline would " +
        "plan a single-partition window; add a constant key knowingly)")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islanded = df
      .withColumn("__brk",
        when(col(startCol) > prevMax + minGap, 1L).otherwise(0L))
      .withColumn("island", sum(col("__brk")).over(w))
    islanded
      .groupBy((keys.map(col) :+ col("island")): _*)
      .agg(
        min(col(startCol)).as("start"),
        max(col(endCol)).as("end"),
        count(lit(1)).as("n_merged"))
  }

  /** The complement: gaps BETWEEN a key's islands —
    * `(keys..., gap_start, gap_end)` where gap_start/gap_end are the
    * island boundary points (end of island i, start of island i+1).
    * Uses the same per-key ordering; a key with one island emits no
    * gap. `minGap` is forwarded so gaps are those the coalesce kept. */
  def gaps(df: DataFrame, keys: Seq[String],
           startCol: String, endCol: String,
           minGap: Long = 0L): DataFrame = {
    val islands = coalesceIntervals(df, keys, startCol, endCol, minGap)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("island"))
    islands
      .withColumn("__next_start", lead(col("start"), 1).over(w))
      .filter(col("__next_start").isNotNull)
      .select((keys.map(col) :+
        col("end").as("gap_start") :+
        col("__next_start").as("gap_end")): _*)
  }
}

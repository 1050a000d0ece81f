package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the "what is actually in this 100 TB
  * table" step that gates every downstream pipeline decision (null
  * handling, join-key viability, partition-column choice, dictionary
  * candidates).
  *
  * The whole profile is ONE aggregation over ONE scan: every per-column
  * statistic (non-null count, distinct, min, max) is an aggregate
  * expression in a single `agg`, and the wide 1-row result is exploded
  * driver-free into the tidy one-row-per-column shape. Nothing is
  * collected; column count, not row count, bounds the result.
  *
  * Distinct counts come in two flavors:
  *  - `approx_count_distinct` (HLL++, default `rsd` 5%): mergeable,
  *    map-side partial, O(k) memory per column — the 100 TB path.
  *  - exact `count_distinct` (opt-IN via `exactDistinct = true`): Spark
  *    plans n distinct aggregates via Expand, multiplying the shuffled
  *    row count by the number of profiled columns — fine at audit/verify
  *    scale, deliberate at corpus scale. When off, `n_distinct` is NULL
  *    and only the sketch estimate is reported.
  *
  * The `profile_table` driver entry runs the exact flavor and pins the
  * sketch against the exact value as a relative-error bound boolean
  * (`approx_ok`), so the HLL path's honesty is itself oracle-checked.
  */
object Profiling {

  /** Profile `cols` of `df` in one pass: one output row per column (named `col_name`; `column` is a reserved word in several engines) —
    * `(col_name, n_rows, n_null, n_distinct, n_distinct_approx, min_value,
    * max_value)`. Min/max are rendered as strings so heterogeneous
    * column types coexist in one tidy relation (atomic types only; cast
    * semantics are Spark's). Column order of the output follows `cols`.
    */
  def profileTable(
      df: DataFrame,
      cols: Seq[String],
      exactDistinct: Boolean = false,
      approxRsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        (if (exactDistinct) count_distinct(col(c))
         else lit(null).cast("long")).as(s"__d_$c"),
        approx_count_distinct(col(c), approxRsd).as(s"__a_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val perCol = explode(array(cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"__n_$c").as("n_nonnull"),
      col(s"__d_$c").as("n_distinct"),
      col(s"__a_$c").as("n_distinct_approx"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value"))): _*))
    wide.select(col("__rows"), perCol.as("p"))
      .select(
        col("p.col_name").as("col_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col("p.n_nonnull")).as("n_null"),
        col("p.n_distinct").as("n_distinct"),
        col("p.n_distinct_approx").as("n_distinct_approx"),
        col("p.min_value").as("min_value"),
        col("p.max_value").as("max_value"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering so that files
  * written from the sorted frame have narrow per-file min/max ranges on
  * EVERY participating column — the standard lakehouse trick (Delta
  * OPTIMIZE ZORDER BY, Iceberg sort orders) that turns parquet footer
  * stats into multi-column scan pruning at 100 TB.
  *
  * The z-value is built as a STATIC expression tree of shifts and ORs
  * (one term per bit per column, unrolled at plan time) — no
  * higher-order-function lambdas, so the whole computation stays inside
  * whole-stage codegen; the identical arithmetic runs on the DuckDB
  * oracle, making the operator exactly checkable cross-engine.
  */
object Layout {

  /** Interleave the low `bitsPerCol` bits of the given non-negative
    * integral columns into a single BIGINT Morton code. Column i's bit b
    * lands at position `b * n + i` (column 0 owns the least significant
    * lane). Total bits must fit a signed long.
    *
    * Callers map raw values into [0, 2^bitsPerCol) first — for skewed or
    * unbounded domains use [[zRank]] (quantile ranks) instead of raw
    * values.
    */
  def zValue(cols: Seq[Column], bitsPerCol: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bitsPerCol > 0 && bitsPerCol * cols.size <= 62,
      s"bitsPerCol * n must fit a signed long, got ${bitsPerCol * cols.size}")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bitsPerCol
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** The same interleave as SQL text (for the DuckDB oracle): identical
    * shift/OR arithmetic over the given column expressions.
    */
  def zValueSql(cols: Seq[String], bitsPerCol: Int): String = {
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bitsPerCol
    } yield s"((($c >> $b) & 1) << ${b * n + i})"
    terms.mkString(" | ")
  }

  /** Add a `__z` Morton code over quantile RANKS of the given columns:
    * each column is mapped to its ntile bucket in [0, 2^bitsPerCol)
    * (equi-depth, so skewed or unbounded domains still spread over the
    * full bit lane), then interleaved. Ranks come from
    * [[Ranking.globalNtile]] — a RANGE-partitioned global order, never a
    * one-partition window. `idCol` breaks rank ties deterministically.
    */
  def withZRank(df: DataFrame, cols: Seq[String], idCol: String,
                bitsPerCol: Int): DataFrame = {
    require(cols.nonEmpty, "withZRank needs at least one column")
    val buckets = 1 << bitsPerCol
    val ranked = cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      Ranking.globalNtile(acc, buckets, Seq(col(c), col(idCol)), s"__zr$i")
    }
    ranked.withColumn("__z",
      zValue(cols.indices.map(i => col(s"__zr$i") - 1), bitsPerCol))
      .drop(cols.indices.map(i => s"__zr$i"): _*)
  }

  /** Cluster the frame by the Morton code of `cols` (raw integral values,
    * caller-bounded domains): range-partition + sort by `__z` so a
    * partition-per-file write yields narrow min/max footer ranges on all
    * `cols` at once. The range partitioning is the only shuffle.
    */
  def zOrderBy(df: DataFrame, cols: Seq[String], bitsPerCol: Int,
               numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__z", zValue(cols.map(col), bitsPerCol))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}

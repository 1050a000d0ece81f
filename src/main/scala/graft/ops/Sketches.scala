package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable, mergeable distinct-count sketches (Datasketches HLL via
  * Spark's `hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`).
  *
  * The point at 100 TB is the MERGE algebra, not the one-shot estimate
  * (`approx_count_distinct` already does that): a sketch TABLE — one
  * binary row per (group, epoch) — is a materialized aggregate that
  * answers corpus-wide distinct questions WITHOUT re-scanning the
  * corpus. Appending a day's crawl means sketching the delta only and
  * unioning bytes; dashboard-side cost is proportional to the sketch
  * table (KBs), never the data. Same maintained-table discipline as
  * [[graft.dedup.IncrementalNearDedup]] and
  * [[graft.ann.IncrementalIvfIndex]], applied to aggregation state.
  *
  * Determinism note (pinned by SketchesSpec): HLL REGISTERS are
  * order-independent, but a single un-merged sketch's estimate rides
  * the order-sensitive HIP accumulator. [[hllMergeEstimate]] therefore
  * goes through `hll_union_agg` — the union drops HIP and estimates
  * from registers alone — so a merged estimate is a pure function of
  * the value SET, stable across partitionings, replays, and engines.
  * The incremental fold always merges (>= 1 epoch sketches), so its
  * estimates inherit the stability.
  *
  * Reference behavior anchor: the reference engine's approx aggregates
  * are one-shot (SURVEY §2.5 sketch_stats); the persisted/mergeable
  * form is a builder-brief scale addition.
  */
object Sketches {

  /** Per-group HLL sketch table `(groupCols..., hll binary)` — one
    * aggregation, map-side partials, KB-sized output.
    */
  def hllSketchTable(df: DataFrame, valueCol: String,
                     groupCols: Seq[String], lgK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("hll"))
  }

  /** Merge sketch rows back to per-group estimates
    * `(groupCols..., n_distinct_est)`. Accepts any union of
    * [[hllSketchTable]] outputs (multiple epochs, shards, engines —
    * sketches with differing lgK merge to the coarser precision).
    *
    * The self-`hll_union` looks redundant but is what PINS the
    * determinism contract: a union of a SINGLE sketch keeps that
    * sketch's HIP accumulator, whose estimate depends on the order
    * values arrived (so the same data sketched under a different
    * partitioning could report a different count — measured: 7286 vs
    * 7355 on identical 7321-distinct input). Unioning the merged
    * sketch with itself marks it out-of-order, which drops HIP and
    * forces the composite estimator — a pure function of the
    * (order-independent) registers. Registers are unchanged by the
    * self-union, so accuracy is identical; only the estimator choice
    * stabilizes.
    */
  def hllMergeEstimate(sketches: DataFrame,
                       groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    sketches.groupBy(groupCols.map(col): _*)
      .agg(expr("hll_union_agg(hll, true)").as("__u"))
      .select(groupCols.map(col) :+
        expr("hll_sketch_estimate(hll_union(__u, __u))")
          .as("n_distinct_est"): _*)
  }

  /** Per-group QUANTILE sketch table `(groupCols..., qsk binary)` — the
    * distribution-shape leg of the sketch algebra
    * ([[graft.functions.QuantileSketch]]: GK summaries, rank error
    * ≤ ε·n, KB rows). Same maintained-table shape as [[hllSketchTable]].
    */
  def quantileSketchTable(df: DataFrame, valueCol: String,
                          groupCols: Seq[String],
                          eps: Double = 0.001): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.QuantileSketch.sketch(col(valueCol), eps).as("qsk"))
  }

  /** Merge quantile-sketch rows back to per-group quantiles at `phis`
    * `(groupCols..., quantiles array<double>)`. NOTE the returned
    * values are bound-guaranteed, not replay-deterministic: GK merge
    * results depend on the (nondeterministic) partial-merge tree, so
    * two runs may return different values within the same ±ε·n rank
    * bound — downstream comparisons must compare RANK BOUNDS, never
    * raw values (the `sketch_quantile_epoch` oracle shape).
    */
  def quantileMergeEstimate(sketches: DataFrame, groupCols: Seq[String],
                            phis: Seq[Double],
                            eps: Double = 0.001): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    sketches.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.QuantileSketch
        .mergeQuantiles(col("qsk"), phis, eps).as("quantiles"))
  }
}

/** Maintained distinct-count sketch table for an append-only corpus:
  * each [[ingest]] folds one batch in by sketching the DELTA only and
  * appending its per-group sketch rows as an `epoch=<content-hash>`
  * partition dir; [[estimate]] unions all epochs register-wise. The
  * corpus is never re-scanned after its first sketch.
  *
  * Crash/replay semantics match [[graft.dedup.IncrementalNearDedup]]:
  * the epoch dir is derived from the batch's id-set fingerprint, so a
  * crashed-and-retried ingest overwrites its own partial write instead
  * of double-counting — and because HLL union is idempotent on
  * duplicate sketches, even a duplicated epoch would not move the
  * estimate (union semantics, not sum semantics: the one aggregate
  * where at-least-once is automatically exactly-once).
  */
final class IncrementalDistinct(
    spark: SparkSession,
    path: String,
    groupCols: Seq[String],
    lgK: Int = 12) {

  require(groupCols.nonEmpty, "need at least one group column")

  private def fs = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Sketch one batch and fold it into the table. Returns the epoch dir
    * name (diagnostic; stable for the same id set).
    */
  def ingest(batch: DataFrame, valueCol: String, idCol: String): String = {
    val p31 = 2147483647L
    val h = pmod(xxhash64(col(idCol)), lit(p31))
    val fp = batch.agg(count(lit(1)), min(h), max(h), sum(h),
      sum(pmod(h * h, lit(p31)))).head()
    val key = (0 until 5).map(i => if (fp.isNullAt(i)) "x" else fp.get(i))
      .mkString(":")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
    val epochDir = s"epoch=batch-$hex"
    Sketches.hllSketchTable(batch, valueCol, groupCols, lgK)
      .write.mode("overwrite").parquet(s"$path/$epochDir")
    epochDir
  }

  /** Per-group distinct estimates over everything ingested so far. The
    * scan reads the (tiny) sketch table only.
    */
  def estimate(): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    require(fs.exists(p), s"no sketches ingested yet at $path")
    Sketches.hllMergeEstimate(
      spark.read.parquet(path).select((groupCols :+ "hll").map(col): _*),
      groupCols)
  }
}

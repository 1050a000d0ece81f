package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution drift between two corpus snapshots — the governance
  * companion of `Dedup.corpusDiff`: diff tells you WHICH documents
  * changed, drift tells you whether the corpus STATISTICS moved (a new
  * crawl skewing short, a source rebalance shifting languages) before
  * retraining on it.
  *
  * Substrate: fixed-width integer bins (the `q_histogram` arithmetic,
  * under/overflow in dedicated edge bins) and total-variation distance
  * as an EXACT RATIONAL —
  *   TV = ½ Σ_b |c_a(b)/N_a − c_b(b)/N_b|
  *      = Σ_b |c_a(b)·N_b − c_b(b)·N_a| / (2·N_a·N_b)
  * — integer numerator/denominator, no float anywhere, so the verdict
  * is bit-identical across engines (the `snapshot_drift` oracle). The
  * BIGINT cross-products bound the per-snapshot row count at ~3·10^9;
  * beyond that, drift per shard and average (the numerators are
  * additive over disjoint shard unions of equal proportions).
  *
  * Scale shape: one aggregation per snapshot (map-side partials,
  * ≤ nBins+2 output rows each), then a full-outer join of two
  * bin-count frames that never exceed the bin count. The corpus is
  * scanned once per side; nothing row-sized shuffles.
  */
object Drift {

  /** Per-bin counts from both snapshots plus the per-bin TV numerator:
    * `(bin, n_a, n_b, drift_num)` where bin −1/`nBins` are the
    * under/overflow bins and `drift_num = |n_a·N_b − n_b·N_a|`. */
  def binDrift(a: DataFrame, b: DataFrame, valueCol: String,
               lo: Long, width: Long, nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0)
    def binned(df: DataFrame) = df
      .select(when(col(valueCol).isNull, lit(null))
        .when(col(valueCol) < lo, lit(-1L))
        .when(col(valueCol) >= lo + width * nBins, lit(nBins.toLong))
        .otherwise(expr(s"CAST(`$valueCol` - $lo AS BIGINT) div $width"))
        .as("bin"))
      .filter(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val ca = binned(a)
    val cb = binned(b)
    // totals ride a broadcast single-row frame, so the whole computation
    // stays LAZY — nothing runs until the caller acts (unlike an eager
    // scalar collect at construction time)
    val totals = ca.agg(coalesce(sum("n"), lit(0L)).as("__na"))
      .crossJoin(cb.agg(coalesce(sum("n"), lit(0L)).as("__nb")))
    ca.withColumnRenamed("n", "n_a")
      .join(cb.withColumnRenamed("n", "n_b"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(totals))
      .withColumn("drift_num",
        abs(col("n_a") * col("__nb") - col("n_b") * col("__na")))
      .drop("__na", "__nb")
  }

  /** The snapshot-level verdict: `(n_a, n_b, tv_num, tv_den)` with
    * TV distance = tv_num / tv_den exactly (0 ≤ TV ≤ 1; tv_den =
    * 2·N_a·N_b). Callers threshold on the rational:
    * `tv_num * 100 > tv_den * maxDriftPct`. */
  def tvDistance(a: DataFrame, b: DataFrame, valueCol: String,
                 lo: Long, width: Long, nBins: Int): DataFrame =
    binDrift(a, b, valueCol, lo, width, nBins)
      .agg(
        sum(col("n_a")).as("n_a"),
        sum(col("n_b")).as("n_b"),
        coalesce(sum(col("drift_num")), lit(0L)).as("tv_num"))
      .select(col("n_a"), col("n_b"), col("tv_num"),
        (col("n_a") * col("n_b") * 2).as("tv_den"))
}

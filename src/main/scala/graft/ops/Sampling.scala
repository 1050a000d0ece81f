package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for dataset mixing — the "sample source A at
  * 30%, source B at 100%" step every training-data pipeline runs.
  *
  * No rand(): the inclusion decision hashes the row's stable id (md5,
  * uniform in its hex space) and compares against a per-stratum
  * threshold. The same row is therefore kept or dropped identically
  * across retries, executors, and engines — a replayed or resumed job
  * produces the same mixture, and downstream incremental consumers never
  * see rows flip in and out.
  */
object Sampling {

  /** Hex-threshold for a rate in [0, 1]: first 8 hex chars of the md5
    * must sort below this string.
    */
  private def hexThreshold(rate: Double): String = {
    val clamped = math.max(0.0, math.min(1.0, rate))
    // rate 1.0 must include md5 prefix "ffffffff" itself: 'g' sorts after
    // every hex digit, making the < comparison all-inclusive
    if (clamped >= 1.0) "g0000000"
    else f"${math.round(clamped * 0xffffffffL)}%08x"
  }

  /** Per-row sampling predicate: md5(id) prefix below the stratum's
    * threshold (string comparison on lowercase hex is order-correct).
    */
  def includeExpr(idCol: Column, stratumCol: Column,
                  rates: Map[String, Double], defaultRate: Double): Column = {
    val byStratum = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(stratumCol === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    substring(md5(idCol.cast("string")), 1, 8) < byStratum
  }

  /** Keep each stratum at its configured rate. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame =
    df.filter(includeExpr(col(idCol), col(stratumCol), rates, defaultRate))
}

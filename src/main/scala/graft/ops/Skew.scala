package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. AQE's skew-join handling covers sort-merge
  * joins at runtime; these cover the two cases it does not: skewed
  * aggregation keys and skewed broadcast-ineligible joins where the salt
  * must be planned in.
  */
object Skew {

  /** Two-phase (salted) count/sum aggregation for heavily skewed keys:
    * phase 1 aggregates on (keys, salt) spreading a hot key over
    * `saltBuckets` reducers, phase 2 merges the partials on the real keys.
    * The salt is derived from a row-unique column so it is deterministic
    * (no rand(), replay-safe).
    *
    * @param sums columns to sum (pre-aggregated map-side both phases)
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      uniqueCol: String,
      saltBuckets: Int,
      sums: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(saltBuckets)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        sums.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("n"),
        sums.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }

  /** Salted join for a skewed large side against a small-but-not-broadcast
    * side: large rows get a deterministic salt in [0, saltFactor); the
    * small side is replicated across all salts, so each hot join key is
    * served by `saltFactor` reducers instead of one.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      uniqueCol: String,
      saltFactor: Int): DataFrame = {
    val l = large.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(saltFactor)))
    val s = small.withColumn("__salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
      .withColumn("__salt", col("__salt").cast("long"))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }
}

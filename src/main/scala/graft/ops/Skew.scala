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

  /** The DIAGNOSTIC that feeds the mitigations above: per-key frequency
    * audit of a prospective shuffle key. One row per top-`topK` key
    * (count desc, key asc — deterministic), each carrying the corpus
    * totals and two derived dials:
    *
    *  - `skew_ratio_pct` = `floor(cnt * n_keys * 100 / n_rows)` — this
    *    key's share of rows as a percentage of the MEAN key's share
    *    (100 = perfectly uniform; 10000 = the key is 100x the mean, a
    *    shuffle on it puts 100x the average load on one reducer);
    *  - `suggested_salt` = `ceil(cnt / targetRowsPerTask)` — the salt
    *    factor [[saltedJoin]] / [[saltedSumCount]] need so no reducer
    *    sees more than ~`targetRowsPerTask` rows of this key.
    *
    * Integer arithmetic throughout (engine-portable; the `skew_audit`
    * driver entry compares it against a SQL rederivation). Scale shape:
    * one map-side-combined groupBy on the key (the count frame is
    * |keys|-sized, far below the input), a tiny global aggregate
    * broadcast back onto the top-k — no corpus-sized shuffle beyond the
    * count itself, which is the cheapest possible probe of the key you
    * were ABOUT to shuffle on anyway. Run it on a sample for a quick
    * look; counts scale linearly so `suggested_salt` just needs the
    * matching `targetRowsPerTask` scale-down.
    */
  def skewAudit(
      df: DataFrame,
      keyCol: String,
      topK: Int = 10,
      targetRowsPerTask: Long = 1000000L): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    require(targetRowsPerTask >= 1, "targetRowsPerTask must be >= 1")
    // the |keys|-sized count frame feeds BOTH the global stats aggregate
    // and the top-k pick — persist (lazy) so the corpus-sized groupBy
    // scan runs once when the audit executes, not once per consumer
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val stats = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    // integer `div` end to end: exact at any count magnitude, and the
    // same value any engine's integer floor-division produces
    counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(stats))
      .select(col("key").cast("string").as("key"), col("cnt"),
        col("n_rows"), col("n_keys"),
        expr("(cnt * n_keys * 100L) div n_rows").as("skew_ratio_pct"),
        expr(s"(cnt + ${targetRowsPerTask - 1}L) div ${targetRowsPerTask}L")
          .as("suggested_salt"))
  }
}

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

  /** Deterministic train/val/test (or any k-way) split assignment: the
    * md5 fraction of `keyCol` lands each row in one named bucket, with
    * bucket widths proportional to the weights (normalized — pass
    * `(train,8),(val,1),(test,1)` or fractions, same result). The same
    * hash-threshold construction as [[stratified]], so assignment is
    * replay-stable and engine-portable, and a row's split never depends
    * on what other rows exist (corpus growth doesn't reshuffle history).
    *
    * LEAKAGE-SAFE SPLITS: hash a GROUP key, not the row id — e.g. the
    * near-dup cluster representative from
    * [[graft.dedup.Dedup.connectedComponents]] (so a duplicate pair can
    * never straddle train/test), a domain, or an author. Every member of
    * a group shares the group key's hash and therefore the split.
    */
  def splitExpr(keyCol: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    require(splits.map(_._1).distinct.size == splits.size,
      "split names must be unique")
    val total = splits.map(_._2).sum
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val prefix = substring(md5(keyCol.cast("string")), 1, 8)
    // last bucket is the otherwise-branch: its threshold is 1.0 and must
    // capture every remaining prefix exactly
    splits.init.zip(cum.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), c), acc) =>
        when(prefix < lit(hexThreshold(c)), name).otherwise(acc)
    }
  }

  /** [[splitExpr]] as a frame transformation: adds `asCol`. */
  def assignSplit(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  asCol: String = "split"): DataFrame =
    df.withColumn(asCol, splitExpr(col(keyCol), splits))

  /** Deterministic UPsampling for mixing rates above 1.0 (e.g. "2.3
    * epochs of source A"): every row gets `floor(rate)` copies, plus one
    * more when its md5 fraction lands below the fractional remainder —
    * the same hash-threshold trick as [[stratified]], so replays emit
    * identical copies. Output carries a 0-based `copyCol` so downstream
    * consumers (e.g. sequence packing in (id, copy) order) stay
    * deterministic; expected multiplicity is exactly `rate`.
    *
    * Rates below 1.0 degenerate correctly (0 or 1 copies — equivalent to
    * [[stratified]] filtering). The explode fans out executor-side; no
    * shuffle.
    */
  def upsampled(df: DataFrame, idCol: String, rate: Double,
                copyCol: String = "copy"): DataFrame = {
    require(rate >= 0.0, "rate must be non-negative")
    val whole = math.floor(rate).toLong
    val frac = rate - whole
    val extra = when(
      substring(md5(col(idCol).cast("string")), 1, 8) < lit(hexThreshold(frac)),
      lit(1L)).otherwise(lit(0L))
    df.withColumn("__copies", lit(whole) + extra)
      .filter(col("__copies") > 0)
      .withColumn(copyCol, explode(expr("sequence(0L, __copies - 1)")))
      .drop("__copies")
  }

  /** Cluster-balanced (diversity-preserving) downsampling: keep at most
    * `cap` members of each cluster, chosen by the seeded md5 order with
    * an id tie-break — the DataComp/SemDeDup-adjacent recipe for capping
    * over-represented regions of a corpus (boilerplate families, topic
    * mega-clusters, head domains) without touching the tail. Any
    * cluster column works: a near-dup component
    * ([[graft.dedup.Dedup.connectedComponents]]), a k-means cell
    * ([[graft.ann.Similarity]] assignment), a domain, a language.
    *
    * Deterministic like everything here (no rand(): the seeded hash
    * picks the same survivors on every replay, and adding rows to OTHER
    * clusters never changes a cluster's selection). The window
    * partitions by cluster — many bounded partitions, never a global
    * sort; clusters at or under the cap pass through whole.
    */
  def clusterCapped(df: DataFrame, idCol: String, clusterCol: String,
                    cap: Int, seed: String): DataFrame = {
    require(cap > 0, "cap must be positive")
    import org.apache.spark.sql.expressions.Window
    val rank = row_number().over(
      Window.partitionBy(col(clusterCol)).orderBy(
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))),
        col(idCol)))
    df.withColumn("__cr", rank).filter(col("__cr") <= cap).drop("__cr")
  }

  /** Deterministic FIXED-SIZE global sample: the `k` rows with the
    * smallest `md5(seed:id)` — eval-subset carving, debug slices,
    * human-review draws. Scalable rank via
    * [[Ranking.globalRowNumber]] (range-partitioned sort, never a
    * single-partition window); replay-stable like everything here.
    *
    * Contract contrast with [[stratified]]: rate-based sampling is
    * GROWTH-STABLE (a row's inclusion never depends on other rows);
    * a fixed-size sample is rank-based, so corpus growth can evict
    * previously-sampled rows. Pick by whether downstream needs a stable
    * set or an exact count.
    */
  def fixedSizeSample(df: DataFrame, idCol: String, k: Long,
                      seed: String): DataFrame = {
    require(k > 0, "sample size must be positive")
    Ranking.globalRowNumber(df,
        Seq(Shuffling.shuffleKey(seed, col(idCol)), col(idCol)), "__fs_rank")
      .filter(col("__fs_rank") <= k)
      .drop("__fs_rank")
  }

  // ----------------------------------- temperature-scaled source mixing

  /** Temperature-scaled mixing rates (the mT5/XLM-R α-smoothing
    * standard): sample stratum `i` with probability
    * `q_i = p_i^α / Σ_j p_j^α` where `p_i = n_i / N`, realized as a
    * per-stratum expected multiplicity `r_i = q_i · N / n_i` so the
    * mixed corpus keeps the original total size in expectation
    * (`Σ n_i·r_i = N`). `α = 1` is the identity (natural proportions);
    * `α = 0` flattens to uniform strata; between, head strata shrink
    * and tail strata upsample — the multilingual/source-rebalancing
    * knob every large training mix turns.
    *
    * Driver-side arithmetic over the bounded per-stratum count table
    * (one row per source/language — the k-means-centroids bounded-model
    * argument). Rates above 1 mean upsampling (epochs of a small
    * stratum), below 1 subsampling; feed them to
    * [[upsampledByStratum]] / [[stratified]].
    */
  def temperatureRates(counts: Seq[(String, Long)],
                       alpha: Double): Map[String, Double] = {
    require(counts.nonEmpty, "need at least one stratum")
    require(counts.forall(_._2 > 0), "stratum counts must be positive")
    require(alpha >= 0.0, "alpha must be non-negative")
    val n = counts.map(_._2).sum.toDouble
    val qs = counts.map { case (s, c) => (s, math.pow(c / n, alpha)) }
    val z = qs.map(_._2).sum
    val byStratum = counts.toMap
    qs.map { case (s, q) => s -> (q / z) * n / byStratum(s) }.toMap
  }

  /** [[upsampled]] with PER-STRATUM rates — one pass, no per-source
    * scans: the whole-copies count and the fractional-copy lottery
    * threshold are when-chains over the (bounded) stratum set. Same
    * md5 determinism contract as [[upsampled]]; the lottery seeds on
    * (stratum, id) so a document appearing under two strata draws
    * independently.
    *
    * NULL stratum rows take `defaultRate` — the same tolerant contract
    * as [[stratified]]/[[includeExpr]] for unlisted strata — with the
    * lottery seed pinning null to an explicit `"__null"` token so the
    * draw stays (stratum, id)-keyed rather than degrading to id-only.
    * (The temperature mixers sit on the STRICT side instead: they
    * fail fast on null strata, because there a silent default rate
    * would corrupt the computed mixture.)
    */
  def upsampledByStratum(df: DataFrame, idCol: String, stratumCol: String,
                         rates: Map[String, Double], defaultRate: Double = 1.0,
                         copyCol: String = "copy"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0.0),
      "rates must be non-negative")
    def whole(r: Double) = math.floor(r).toLong
    def fracThreshold(r: Double) = hexThreshold(r - math.floor(r))
    val wholeCol = rates.foldLeft(lit(whole(defaultRate))) {
      case (acc, (s, r)) => when(col(stratumCol) === s, lit(whole(r))).otherwise(acc)
    }
    val thrCol = rates.foldLeft(lit(fracThreshold(defaultRate))) {
      case (acc, (s, r)) =>
        when(col(stratumCol) === s, lit(fracThreshold(r))).otherwise(acc)
    }
    val seedStratum = coalesce(col(stratumCol).cast("string"), lit("__null"))
    val extra = when(
      substring(md5(concat_ws(":", seedStratum,
        col(idCol).cast("string"))), 1, 8) < thrCol, lit(1L)).otherwise(lit(0L))
    df.withColumn("__copies", wholeCol + extra)
      .filter(col("__copies") > 0)
      .withColumn(copyCol, explode(expr("sequence(0L, __copies - 1)")))
      .drop("__copies")
  }

  /** Driver-side per-stratum counts for the temperature mixers. Fails
    * FAST on a null stratum (routine in crawl data — lang=null) instead
    * of NPE-ing mid-plan or silently zero-rating those rows: the caller
    * decides whether null means "fill", "filter", or "own stratum".
    */
  private def stratumCounts(df: DataFrame, stratumCol: String): Seq[(String, Long)] = {
    val rows = df.groupBy(stratumCol).count().collect()
    require(!rows.exists(_.isNullAt(0)),
      s"null values in stratum column '$stratumCol' — fill them (e.g. " +
        "coalesce to an 'unknown' stratum) or filter them before mixing")
    rows.map(r => (r.get(0).toString, r.getLong(1))).toSeq
  }

  /** One-call temperature mix: count strata (one bounded aggregate),
    * derive [[temperatureRates]], apply [[upsampledByStratum]]. */
  /** Token-budget mixing: keep each stratum's rows in deterministic
    * `orderCol` order until the NEXT row would push the stratum's
    * cumulative `nTokensCol` past its budget — "take the first B tokens
    * of every source", the mixing form a fixed training-token recipe
    * uses (vs [[temperatureMix]]'s rate-based form). A row is kept iff
    * its INCLUSIVE running token sum stays <= the budget, so one
    * over-long head doc can close a stratum immediately (deliberate:
    * budgets are hard caps, not targets).
    *
    * The running sum is [[Ranking.keyedRunningSum]], NOT a
    * `PARTITION BY stratum` window — the latter funnels each source
    * through one reducer, the classic 100 TB straggler. The audit
    * column `as` (the inclusive cumulative) stays on survivors.
    */
  def tokenBudgetMix(df: DataFrame, stratumCol: String, nTokensCol: String,
                     orderCol: Column, budgetPerStratum: Long,
                     as: String = "cum_tokens"): DataFrame = {
    require(budgetPerStratum >= 0, "budget must be >= 0")
    graft.ops.Ranking.keyedRunningSum(
        df, stratumCol, nTokensCol, Seq(orderCol), as)
      .filter(col(as) <= budgetPerStratum)
  }

  def temperatureMix(df: DataFrame, idCol: String, stratumCol: String,
                     alpha: Double, copyCol: String = "copy"): DataFrame =
    upsampledByStratum(df, idCol, stratumCol,
      temperatureRates(stratumCounts(df, stratumCol), alpha),
      defaultRate = 1.0, copyCol)

  /** α = 0.5 temperature mix on a PURE INTEGER substrate — the
    * cross-engine-replayable instance (general α needs `pow`, whose
    * final-ulp behavior varies by libm; √ is the one common temperature
    * with an exact integer form). Per stratum:
    *
    *   w_i   = isqrt(N · 10^12 / n_i)        (≈ 10^6 · √(N/n_i))
    *   r_i   = w_i·N / Σ_j n_j·w_j           (exact rational, Σ n_i·r_i ≈ N)
    *   keep: copies = ⌊r_i⌋ + [m < (16^15 · (num_i mod den)) div den]
    *
    * with `m` the md5 15-hex-digit integer of `stratum:id` — every
    * quantity an integer, every division a floor division, so any two
    * engines (and any two libms) produce the same mixed multiset. The
    * BigInt driver math never overflows; per-row literals fit in BIGINT
    * (⌊r⌋ small, threshold < 16^15).
    */
  def temperatureMixSqrt(df: DataFrame, idCol: String, stratumCol: String,
                         copyCol: String = "copy"): DataFrame = {
    val counts = stratumCounts(df, stratumCol).sortBy(_._1)
    require(counts.nonEmpty, "need at least one stratum")
    def isqrt(x: BigInt): BigInt = {
      require(x >= 0)
      if (x < 2) x
      else {
        // Newton from a double seed; converges in a few steps and the
        // loop invariant (g decreasing past the root) makes it exact
        var g = BigInt(math.sqrt(x.doubleValue).toLong) + 2
        var prev = BigInt(-1)
        while (g * g > x && g != prev) { prev = g; g = (g + x / g) / 2 }
        while ((g + 1) * (g + 1) <= x) g += 1
        g
      }
    }
    val bigN = BigInt(counts.map(_._2).sum)
    val scale = BigInt(10).pow(12)
    val weights = counts.map { case (s, c) => (s, BigInt(c), isqrt(bigN * scale / c)) }
    val den = weights.map { case (_, c, w) => c * w }.sum
    val hex15 = BigInt(16).pow(15)
    val params = weights.map { case (s, _, w) =>
      val num = w * bigN
      (s, (num / den).toLong, ((hex15 * (num % den)) / den).toLong)
    }
    val wholeCol = params.foldLeft(lit(0L)) { case (acc, (s, wl, _)) =>
      when(col(stratumCol) === s, lit(wl)).otherwise(acc)
    }
    val thrCol = params.foldLeft(lit(0L)) { case (acc, (s, _, t)) =>
      when(col(stratumCol) === s, lit(t)).otherwise(acc)
    }
    val m = conv(substring(md5(concat_ws(":", col(stratumCol).cast("string"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    df.withColumn("__copies", wholeCol + when(m < thrCol, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn(copyCol, explode(expr("sequence(0L, __copies - 1)")))
      .drop("__copies")
  }
}

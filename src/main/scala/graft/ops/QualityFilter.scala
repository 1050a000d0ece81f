package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering — the GPT-3-style companion to
  * [[Selection]]'s DSIR importance weights (Brown et al. 2020, appendix
  * A: a logistic-regression quality classifier trained
  * positive=curated-reference vs negative=raw-crawl, then a Pareto
  * "lottery" keep so the kept set is quality-TILTED, not quality-
  * truncated — hard thresholding collapses the tail diversity the
  * lottery deliberately preserves).
  *
  * Scale shape: features are the SAME native hashed n-gram count vectors
  * the DSIR scale path uses ([[graft.functions.HashedBucketCounts]] —
  * map-only, inside the scan). Training runs on the labeled sample
  * (positives + negatives — small by construction: the curated reference
  * set is the scarce resource), and the FITTED model collapses to k+1
  * literal doubles, so corpus scoring is a static codegen dot product
  * with ZERO shuffles and ZERO MLlib machinery in the hot path — the
  * same literal-coefficient trick as
  * [[Selection.importanceLogWeightsFromVectors]] (a `model.transform`
  * over the corpus would drag a Vector UDT conversion through every
  * row). The lottery uses an md5-derived uniform, so keep decisions are
  * replay-stable ([[Sampling]]'s determinism argument): re-running the
  * filter on the same corpus keeps the same documents.
  */
object QualityFilter {

  /** A fitted quality model: `k+1` doubles — driver-safe by the same
    * argument as DSIR's k-bucket models and k-means centroids. */
  final case class QualityModel(
      intercept: Double,
      coefficients: Array[Double],
      ngram: Int,
      buckets: Int)

  private def featureVectors(docs: DataFrame, textCol: String,
                             idCol: String, n: Int, buckets: Int): DataFrame =
    Selection.hashedNgramFeatureVectors(docs, textCol, idCol, n, buckets)

  /** Fit the classifier: `positives` = in-domain/curated docs,
    * `negatives` = raw-crawl sample. Both are labeled samples, NOT the
    * corpus — keep them modest (the model is k+1 numbers; more sample
    * past a point buys nothing).
    */
  def trainQualityModel(positives: DataFrame, negatives: DataFrame,
                        textCol: String, idCol: String,
                        ngram: Int = 2, buckets: Int = 64,
                        maxIter: Int = 50, regParam: Double = 1e-4): QualityModel = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    // coalesce(1) + localCheckpoint BEFORE the fit: the optimizer runs
    // one job PER ITERATION over this frame, so (a) without lineage
    // truncation every iteration re-runs the upstream scans/filters that
    // produced the samples, and (b) with the parent's partitioning each
    // iteration schedules one micro-task per upstream partition (50
    // iterations x 64 partitions = 3200 tasks of pure overhead). The
    // samples are bounded by contract — one materialized block is the
    // right shape.
    val labeled = featureVectors(positives, textCol, idCol, ngram, buckets)
        .select(lit(1.0).as("label"), col("fv"))
      .unionByName(
        featureVectors(negatives, textCol, idCol, ngram, buckets)
          .select(lit(0.0).as("label"), col("fv")))
      .select(col("label"),
        array_to_vector(expr("transform(fv, x -> CAST(x AS DOUBLE))"))
          .as("features"))
      .coalesce(1)
      .localCheckpoint()
    val fit = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(labeled)
    QualityModel(fit.intercept, fit.coefficients.toArray, ngram, buckets)
  }

  /** Native dot product, NOT a per-bucket Add chain: a depth-k column
    * reduce gets substituted whole into any downstream filter predicate
    * and pushes the stage past the JIT method limit — see
    * [[graft.functions.DotLiteral]] for the measured cliff.
    */
  private def logit(model: QualityModel, fv: Column): Column =
    graft.functions.DotLiteral.col(fv, model.coefficients) +
      lit(model.intercept)

  /** quality_prob = sigmoid(w·fv(text) + b) as ONE pure column
    * expression (native shingles → native bucket counts → native dot
    * product): usable on batch frames AND verbatim on streaming frames —
    * the literal-model collapse is what makes trained-model inference
    * per-row streamable.
    */
  def qualityProbCol(model: QualityModel, text: Column): Column = {
    val fv = graft.functions.HashedBucketCounts.col(
      graft.functions.WordShingles.col(text, model.ngram), model.buckets)
    lit(1.0) / (lit(1.0) + exp(-logit(model, fv)))
  }

  /** Score every document map-only: `(idCol, quality_prob)` — the plan
    * has no Exchange and no MLlib operators (PlanAuditSpec-style
    * assertion in QualityFilterSpec).
    */
  def scoreQuality(docs: DataFrame, textCol: String, idCol: String,
                   model: QualityModel): DataFrame =
    docs.select(col(idCol),
      qualityProbCol(model, col(textCol)).as("quality_prob"))

  /** The Brown-et-al keep decision as a pure per-row predicate: keep iff
    * `score > 1 - pareto(alpha)`, with the Pareto draw derived from an
    * md5 uniform on the id (inverse CDF: `(1-u)^(-1/alpha) - 1`), so the
    * decision is deterministic per id. Higher `alpha` = stricter (the
    * GPT-3 run used alpha = 9). Low-score docs still survive at low
    * rate — the point of the lottery — and a score >= 1 always keeps.
    */
  def lotteryKeepExpr(score: Column, id: Column, alpha: Double): Column = {
    require(alpha > 0, "alpha must be positive")
    // md5 uniform in [0, 1): top 15 hex digits / 16^15 (same construction
    // as Sampling.stratified — replay-stable, no rand())
    val u = conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(math.pow(16.0, 15))
    val pareto = pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)
    score > lit(1.0) - pareto
  }

  /** [[lotteryKeepExpr]] over a scored frame. */
  def paretoLotteryKeep(scored: DataFrame, scoreCol: String, idCol: String,
                        alpha: Double = 9.0): DataFrame =
    scored.filter(lotteryKeepExpr(col(scoreCol), col(idCol), alpha))

  /** [[lotteryKeepExpr]] in EXACT integer arithmetic for scores
    * quantized to hundredths (`scorePct` = integer percent, score =
    * scorePct/100) and integer `alpha`. The float rule
    * `score > 1 - ((1-u)^(-1/alpha) - 1)` with `u = m/16^15` (m = the
    * md5 uniform's 15-hex-digit integer) is, for positive terms,
    * algebraically the pure integer comparison
    *
    *   (16^15 - m) * (200 - scorePct)^alpha  <  16^15 * 100^alpha
    *
    * — no `pow`, no libm, bit-identical on every engine/host by
    * construction (final-ulp `pow` differences across libm builds are
    * real, and a 1e-6 boundary guard demonstrably does not survive
    * them). To stay inside DECIMAL(38,0) (the left product can reach
    * 2^60 * 200^9 ~ 5.9e38) the comparison is evaluated division-first:
    * for positive integers A, B, R:  A*B < R  ⟺  A <= (R-1) div B.
    * `A = 16^15 - m` and the quotient both fit in a BIGINT; only
    * `B = (200 - scorePct)^alpha` (< 5.2e20) needs decimal width.
    *
    * Same decision set as [[lotteryKeepExpr]] up to that function's
    * float rounding; exact agreement away from ulp boundaries is pinned
    * by QualityFilterSpec.
    */
  /** 16^15 = 2^60 — the md5-uniform's denominator; fits in a Long. */
  private val Hex15 = 1152921504606846976L

  /** The integer substrate of the exact lottery, surfaced as columns:
    * `m` = the 15-hex-digit md5 uniform as a BIGINT, `a = 16^15 - m`,
    * and `quotient = (16^15*100^alpha - 1) div (200-scorePct)^alpha`
    * (a BIGINT — IntegralDivide's result type; only the intermediate
    * power needs decimal width). The keep decision is `a <= quotient`.
    */
  private def lotteryParts(scorePct: Column, id: Column,
                           alpha: Int): (Column, Column, Column) = {
    val m = conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")
    val a = lit(Hex15) - m
    val base = (lit(200L) - scorePct.cast("long")).cast("decimal(38,0)")
    val bPow = (1 until alpha).foldLeft(base)((acc, _) => acc * base)
    val rMinus1 = lit(new java.math.BigDecimal(
      (BigInt(16).pow(15) * BigInt(100).pow(alpha) - 1).bigInteger))
    // IntegralDivide ("div") returns BIGINT — floor division, exact
    (m, a, call_function("div", rMinus1, bPow).cast("long"))
  }

  def lotteryKeepExactExpr(scorePct: Column, id: Column, alpha: Int = 9): Column = {
    require(alpha >= 1 && alpha <= 9,
      "integer alpha in [1, 9] (the keep threshold (200-k)^alpha must stay < 10^38)")
    val (_, a, quotient) = lotteryParts(scorePct, id, alpha)
    val keep = a <= quotient
    // Domain guard, enforced per row: the division-first identity needs
    // B > 0 (scorePct <= 100 keeps 200-k >= 100), and the most likely
    // misuse — passing the SIBLING API's 0..1 float score — would
    // cast('long') truncate to 0/1 and silently drop almost everything.
    // The integrality check (value == its truncation) catches fractional
    // scores like 0.57 that are otherwise "in range". Fail loudly
    // instead of deciding wrongly — EXCEPT for NULL scores, which
    // propagate as a NULL predicate (row drops in a filter), matching
    // lotteryKeepExpr's behavior for unscorable docs.
    val inDomain = scorePct >= 0 && scorePct <= 100 &&
      scorePct.cast("double") === scorePct.cast("long").cast("double")
    when(scorePct.isNull, lit(null).cast("boolean"))
      .when(inDomain, keep)
      .otherwise(raise_error(lit(
        "lotteryKeepExactExpr: scorePct must be an INTEGER PERCENT in " +
          "[0, 100] (fractional or out-of-range value seen — if you " +
          "have a 0..1 float score, use lotteryKeepExpr or quantize to " +
          "integer hundredths first)")))
  }

  /** [[lotteryKeepExactExpr]] over a frame scored in integer percent. */
  def paretoLotteryKeepExact(scored: DataFrame, scorePctCol: String,
                             idCol: String, alpha: Int = 9): DataFrame =
    scored.filter(lotteryKeepExactExpr(col(scorePctCol), col(idCol), alpha))

  /** The exact lottery with its whole integer substrate surfaced, one
    * row per input doc, every column BIGINT:
    * `(id, k, m, quotient, kept)` where `k` is the integer-percent
    * score, `m` the 15-hex-digit md5 uniform,
    * `quotient = (16^15*100^alpha − 1) div (200−k)^alpha`, and
    * `kept ∈ {0,1}` is `16^15 − m <= quotient` — the same decision as
    * [[lotteryKeepExactExpr]] (shared construction, not a re-derivation).
    * This is the cross-engine audit surface: a compare over it contains
    * no float, no decimal, and no filtered set, so any engine divergence
    * names the exact column (uniform vs threshold vs decision) and the
    * exact rows where it happens. Map-only codegen — per-row streamable
    * at any corpus size. Domain contract as [[lotteryKeepExactExpr]];
    * NULL scores yield NULL m/quotient/kept rather than dropping rows.
    */
  def paretoLotteryDiagnostics(scored: DataFrame, scorePctCol: String,
                               idCol: String, alpha: Int = 9): DataFrame = {
    require(alpha >= 1 && alpha <= 9,
      "integer alpha in [1, 9] (the keep threshold (200-k)^alpha must stay < 10^38)")
    val k = col(scorePctCol)
    val (m, a, quotient) = lotteryParts(k, col(idCol), alpha)
    val inDomain = k >= 0 && k <= 100 &&
      k.cast("double") === k.cast("long").cast("double")
    val guard = when(k.isNull, lit(null).cast("long"))
      .when(inDomain, lit(0L))
      .otherwise(raise_error(lit(
        "paretoLotteryDiagnostics: scorePct must be an INTEGER PERCENT " +
          "in [0, 100]")))
    scored.select(
      // id passes through UNCAST: the lottery itself keys on
      // md5(id-as-string) so the API is id-type-generic — a long cast
      // here would null (or, under ANSI, kill) string-id frames that
      // every sibling lottery entry point accepts
      col(idCol),
      (k.cast("long") + guard).as("k"),
      (m + guard).as("m"),
      (quotient + guard).as("quotient"),
      (when(a <= quotient, 1L).otherwise(0L) + guard).as("kept"))
  }
}

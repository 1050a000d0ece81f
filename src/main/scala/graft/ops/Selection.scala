package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data selection for training corpora: DSIR-style importance resampling
  * (hashed n-gram features; Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"). A raw corpus is scored
  * against a small TARGET corpus (the distribution you want more of) by
  * the log-likelihood ratio of per-document hashed-feature counts under
  * the target vs source unigram-of-buckets models, then the top fraction
  * is kept.
  *
  * Scale shape: feature extraction is one native-shingle scan + one
  * (id, bucket) partial-agg shuffle; the two bucket distributions are k
  * rows each (k = buckets, driver-safe by construction) and broadcast
  * into the scoring join; selection is a deterministic md5-threshold OR
  * exact top-N via [[Ranking.globalRowNumber]] — nothing here funnels
  * into one partition.
  *
  * The feature hash is md5-derived (portable), so feature counts are
  * oracle-exact cross-engine; the log-ratio itself is pinned by
  * ScalaTest (ln differs in final ulps across engines).
  */
object Selection {

  /** Per-document hashed n-gram feature counts: `(idCol, bucket, n)` —
    * bucket = md5(word n-gram) mod `buckets`. Shingles come from the
    * native [[graft.functions.WordShingles]] pass (docs shorter than n
    * tokens collapse to one whole-doc shingle, matching the expression's
    * documented semantics).
    */
  def hashedNgramFeatures(docs: DataFrame, textCol: String, idCol: String,
                          n: Int = 2, buckets: Int = 64): DataFrame = {
    require(n > 0 && buckets > 0, "need n > 0 and buckets > 0")
    docs
      .select(col(idCol),
        explode(graft.functions.WordShingles.col(col(textCol), n)).as("__g"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("__g")), 1, 15), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Corpus-level bucket distribution of a feature frame: `(bucket,
    * total)` over all documents — k rows, one partial-agg shuffle.
    */
  def bucketTotals(features: DataFrame): DataFrame =
    features.groupBy("bucket").agg(sum(col("n")).as("total"))

  /** DSIR importance log-weight per document:
    * `sum_b n_b * (ln p_target(b) - ln p_source(b))`, with add-one
    * smoothing on both k-bucket models. `target`/`source` are
    * [[bucketTotals]] frames (tiny — they broadcast into the join).
    * Returns `(idCol, log_weight)`.
    */
  def importanceLogWeights(docFeatures: DataFrame, target: DataFrame,
                           source: DataFrame, buckets: Int,
                           idCol: String): DataFrame = {
    // densify each model over ALL k buckets so a bucket absent from the
    // totals frame carries its smoothed floor ln(1/(grand+k)) instead of
    // a null — the feature join below is then always matched
    def model(totals: DataFrame, p: String): DataFrame = {
      val grand = totals.agg(coalesce(sum(col("total")), lit(0L)))
        .head().getLong(0)
      totals.sparkSession.range(buckets).select(col("id").as("bucket"))
        .join(totals, Seq("bucket"), "left")
        .select(col("bucket"),
          log((coalesce(col("total"), lit(0L)) + 1).cast("double") /
            lit((grand + buckets).toDouble)).as(p))
    }
    docFeatures
      .join(broadcast(model(target, "__lpt")), Seq("bucket"))
      .join(broadcast(model(source, "__lps")), Seq("bucket"))
      .select(col(idCol),
        (col("n") * (col("__lpt") - col("__lps"))).as("__w"))
      .groupBy(col(idCol))
      .agg(sum(col("__w")).as("log_weight"))
  }

  /** Keep the `fraction` highest-log-weight documents (deterministic:
    * weight desc, then id asc via [[Ranking.globalRowNumber]] — no
    * single-partition window). Returns the selected `(idCol,
    * log_weight)` rows.
    *
    * The input is materialized first (localCheckpoint): this function
    * consumes `weights` TWICE (the sizing count, then the rank pass), and
    * a lazy upstream — the whole featurize+score pipeline — would run
    * end to end for each (measured: select_top 44 s vs weights 26 s at
    * 2M docs before the truncation). The weight frame itself is tiny
    * (one id + one double per doc).
    */
  def selectTopFraction(weights: DataFrame, idCol: String,
                        fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction in (0, 1]")
    val w = weights.localCheckpoint()
    val n = w.count()
    val keep = math.max(1L, math.ceil(n * fraction).toLong)
    Ranking.globalRowNumber(w,
        Seq(col("log_weight").desc, col(idCol)), "__rn")
      .filter(col("__rn") <= keep)
      .select(col(idCol), col("log_weight"))
  }

  /** SCALE PATH featurization: the same md5-bucket counts as
    * [[hashedNgramFeatures]] but as one fixed-width vector per document,
    * computed inside the scan by the native
    * [[graft.functions.HashedBucketCounts]] expression — map-only, no
    * (id, bucket) shuffle (67M shuffled rows at 2M docs in the row
    * form). Returns `(idCol, fv array<long> of length buckets)`.
    */
  def hashedNgramFeatureVectors(docs: DataFrame, textCol: String,
                                idCol: String, n: Int = 2,
                                buckets: Int = 64): DataFrame = {
    require(n > 0 && buckets > 0, "need n > 0 and buckets > 0")
    docs.select(col(idCol),
      graft.functions.HashedBucketCounts.col(
        graft.functions.WordShingles.col(col(textCol), n), buckets).as("fv"))
  }

  /** Corpus bucket totals from the vector form: `buckets` columnar sums,
    * partial-aggregated map-side — no explode. Output matches
    * [[bucketTotals]] (zero-count buckets omitted).
    */
  def bucketTotalsFromVectors(vecFeatures: DataFrame,
                              buckets: Int): DataFrame = {
    val sums = (0 until buckets).map(i =>
      sum(col("fv").getItem(i)).as(s"__s$i"))
    val row = vecFeatures.agg(sums.head, sums.tail: _*)
    row.select(posexplode(array((0 until buckets).map(i =>
        coalesce(col(s"__s$i"), lit(0L))): _*)).as(Seq("bucket", "total")))
      .filter(col("total") > 0)
      .select(col("bucket").cast("long").as("bucket"), col("total"))
  }

  /** DSIR log-weights from the vector form: the per-bucket log-ratio
    * model collapses to a LITERAL coefficient array (k doubles — k-bucket
    * models are driver-safe by the same argument as k-means centroids),
    * so scoring is a static codegen sum `Σ_b fv[b] * (ln p_t(b) − ln
    * p_s(b))` with ZERO joins and ZERO shuffles — compare
    * [[importanceLogWeights]]' broadcast-join + per-doc re-aggregation,
    * whose (id, bucket) shuffle is the row-form cost this path deletes.
    * Same add-one smoothing; same output `(idCol, log_weight)`.
    */
  def importanceLogWeightsFromVectors(vecFeatures: DataFrame,
                                      target: DataFrame, source: DataFrame,
                                      buckets: Int, idCol: String): DataFrame = {
    def logModel(totals: DataFrame): Array[Double] = {
      val m = totals.collect().map(r =>
        r.getLong(0).toInt -> r.getLong(1)).toMap
      val grand = m.values.sum
      Array.tabulate(buckets)(b =>
        math.log((m.getOrElse(b, 0L) + 1).toDouble / (grand + buckets)))
    }
    val lpt = logModel(target)
    val lps = logModel(source)
    // native dot product, NOT a per-bucket Add chain: a depth-k column
    // reduce gets substituted whole into any downstream filter predicate
    // and pushes that stage past the JIT method limit — see
    // graft.functions.DotLiteral for the measured cliff
    vecFeatures.select(col(idCol),
      graft.functions.DotLiteral.col(col("fv"),
        Array.tabulate(buckets)(b => lpt(b) - lps(b))).as("log_weight"))
  }
}

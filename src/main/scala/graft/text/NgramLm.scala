package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model perplexity filtering (Wenzek et al.
  * 2020): score every document by the cross-entropy of a bigram LM
  * trained on a curated reference corpus, then gate on it — the
  * "perplexity filter" between heuristic quality scores and a trained
  * classifier ([[graft.ops.QualityFilter]]) in the standard pipeline.
  *
  * Model substrate is EXACT integer counts over the engine's canonical
  * space-run tokenizer, extracted by the native codegen
  * [[graft.functions.WordShingles]] expression with n=2 (gram string
  * `"w1 w2"` — tokens never contain spaces, so the join key needs no
  * re-splitting; a document with fewer than two tokens emits one
  * SPACE-LESS fallback shingle, which is exactly the non-bigram marker):
  * `c2(gram)` = bigram occurrences in the reference, `c1(w1)` =
  * occurrences of `w1` in context position (= Σ_w2 c2 — self-consistent
  * by construction, so the two tables can never disagree), `V` = distinct
  * reference tokens. Per-document score is the add-one-smoothed mean
  * negative log-likelihood `ce = -avg(ln((c2+1)/(c1+V)))` over the
  * document's bigrams (unseen context ⇒ c2=c1=0 ⇒ uniform 1/V mass);
  * `perplexity = exp(ce)`.
  *
  * Scale shape: the reference corpus is the scarce curated resource, so
  * the model tables are bounded and BROADCAST — scoring is one native
  * shingle fan-out inside the scan, two broadcast hash joins, and one
  * partial-aggregated groupBy on the doc id. Nothing corpus-sized ever
  * shuffles on a token key.
  */
object NgramLm {

  /** Fitted bigram LM: two bounded count frames + the vocab size.
    * `bigrams` is keyed by the gram string `(g, c2)`; `contexts` by the
    * first token `(w1, c1)`.
    */
  final case class Model(bigrams: DataFrame, contexts: DataFrame,
                         vocabSize: Long)

  private def grams(text: Column): Column =
    graft.functions.WordShingles.col(text, 2)

  /** Train on the reference corpus. `minCount` prunes rare bigrams from
    * the model (their mass falls back to the smoothing floor) — the
    * standard way to bound a broadcast model's size; context counts are
    * computed BEFORE pruning so probabilities stay properly normalized
    * against the full reference.
    */
  def train(reference: DataFrame, textCol: String,
            minCount: Long = 1L): Model = {
    val pairs = reference
      .select(explode(grams(col(textCol))).as("g"))
      .filter(col("g").contains(" ")) // drop the sub-2-token fallback shingle
    val bigrams = pairs.groupBy("g")
      .agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    val contexts = pairs
      .groupBy(substring_index(col("g"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("c1"))
    val v = reference
      .select(explode(TextAnalysis.spaceTokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")))
      .head().getLong(0)
    Model(bigrams, contexts, v)
  }

  /** Score every document: `(idCol, n_bigrams, n_oov_bigrams,
    * cross_entropy, perplexity)`. Documents with fewer than two tokens
    * keep a row with `n_bigrams = 0` and NULL scores (the same
    * per-document contract encodeDocs keeps). `n_oov_bigrams` counts
    * pairs absent from the model — the integer-exact OOV signal that
    * needs no float comparison.
    */
  def score(docs: DataFrame, textCol: String, idCol: String,
            model: Model): DataFrame = {
    require(model.vocabSize > 0, "model must have a non-empty vocabulary")
    // the fallback shingle of a short doc keeps its row through the
    // grouping but is never counted as a bigram (no space = no pair)
    val pairs = docs
      .select(col(idCol), explode_outer(grams(col(textCol))).as("g"))
      .withColumn("__is_pair", col("g").isNotNull && col("g").contains(" "))
      .join(broadcast(model.bigrams), Seq("g"), "left")
      .join(broadcast(model.contexts
          .withColumnRenamed("w1", "__ctx")),
        substring_index(col("g"), " ", 1) === col("__ctx"), "left")
    val logp = log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
      (coalesce(col("c1"), lit(0L)) + model.vocabSize).cast("double"))
    pairs
      .select(col(idCol),
        when(col("__is_pair"), logp).as("__lp"),
        when(col("__is_pair") && col("c2").isNull, lit(1L)).as("__oov"))
      .groupBy(idCol)
      .agg(count(col("__lp")).as("n_bigrams"),
        coalesce(sum(col("__oov")), lit(0L)).as("n_oov_bigrams"),
        (-avg(col("__lp"))).as("cross_entropy"))
      .withColumn("perplexity", exp(col("cross_entropy")))
  }

  /** The EXACT integer substrate of [[score]]: `(idCol, n_bigrams,
    * n_oov_bigrams, sum_num, sum_den)` where `sum_num = Σ (c2+1)` and
    * `sum_den = Σ (c1+V)` over the document's bigrams — the numerators
    * and denominators of every smoothed probability the cross-entropy
    * averages, summed as plain integers. Any model-lookup discrepancy
    * (wrong count, missed OOV, tokenizer drift) perturbs these sums, so
    * they pin the scoring join cross-engine-exactly with no libm in the
    * compare; the float `ln`/`avg` on top is [[score]]'s job (ScalaTest-
    * pinned). Short docs keep their row with NULL sums, mirroring
    * [[score]]'s NULL cross_entropy contract.
    */
  def scoreCounts(docs: DataFrame, textCol: String, idCol: String,
                  model: Model): DataFrame = {
    require(model.vocabSize > 0, "model must have a non-empty vocabulary")
    val pairs = docs
      .select(col(idCol), explode_outer(grams(col(textCol))).as("g"))
      .withColumn("__is_pair", col("g").isNotNull && col("g").contains(" "))
      .join(broadcast(model.bigrams), Seq("g"), "left")
      .join(broadcast(model.contexts
          .withColumnRenamed("w1", "__ctx")),
        substring_index(col("g"), " ", 1) === col("__ctx"), "left")
    pairs
      .select(col(idCol),
        when(col("__is_pair"),
          coalesce(col("c2"), lit(0L)) + 1L).as("__num"),
        when(col("__is_pair"),
          coalesce(col("c1"), lit(0L)) + model.vocabSize).as("__den"),
        when(col("__is_pair") && col("c2").isNull, lit(1L)).as("__oov"))
      .groupBy(idCol)
      .agg(count(col("__num")).as("n_bigrams"),
        coalesce(sum(col("__oov")), lit(0L)).as("n_oov_bigrams"),
        sum(col("__num")).as("sum_num"),
        sum(col("__den")).as("sum_den"))
  }

  /** Keep documents whose cross-entropy is at most `maxCrossEntropy`
    * (lower = more reference-like; CCNet's "head" slice). Documents too
    * short to have bigrams pass iff `keepShort` — a length gate is a
    * different stage's job.
    */
  def filterByPerplexity(docs: DataFrame, textCol: String, idCol: String,
                         model: Model, maxCrossEntropy: Double,
                         keepShort: Boolean = true): DataFrame = {
    val scored = score(docs, textCol, idCol, model)
      .filter(col("cross_entropy") <= maxCrossEntropy ||
        (if (keepShort) col("cross_entropy").isNull else lit(false)))
      .select(idCol)
    docs.join(scored, Seq(idCol), "left_semi")
  }
}

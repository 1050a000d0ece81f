package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over the document corpus: inverted index (postings),
  * TF-IDF weighting, and BM25 top-k search — the query-side complement
  * to the curation operators (dedup/quality filter corpora; retrieval
  * FINDS things in them: contamination forensics, eval-set sourcing,
  * targeted corpus slicing by keyword).
  *
  * Spark-first shape: the inverted index is one explode + one
  * `(term, doc_id)` aggregation — the only corpus-wide shuffle in the
  * family, with map-side partials. Everything query-side joins AGAINST
  * the (tiny, broadcast) query-term set, so serving cost scales with
  * the query terms' posting lists, never the corpus. At 100 TB the
  * postings table is built once per corpus snapshot and persisted
  * partitioned/bucketed by `term` (the same build-once/query-many shape
  * as [[graft.dedup.Dedup.signatureTable]] and
  * [[graft.ann.Similarity.ivfIndex]]); scoring a query batch then
  * prunes to the probed terms' buckets at the scan.
  *
  * Tokenization matches the corpus convention everywhere else in graft
  * (space-run split, empties dropped) so df/tf here agree with
  * `TextAnalysis.tokenCounts` and the dedup shinglers.
  *
  * Reference behavior anchor: the reference engine has no text-retrieval
  * surface (SURVEY §2.5 builder-brief additions); semantics follow
  * Robertson/Sparck-Jones BM25 in the Lucene non-negative-idf form.
  */
object Retrieval {

  private def toks(c: Column): Column =
    filter(split(c, " "), x => x =!= "")

  /** Build the inverted index: `(postings, stats)` where postings is
    * `(term, doc_id, tf, dl)` (dl = the document's token count, carried
    * through the aggregation so scoring never re-joins a lengths table)
    * and stats is the single-row `(n_docs, n_tokens)` frame every
    * scoring call broadcasts.
    */
  def buildIndex(docs: DataFrame, textCol: String, idCol: String)
      : (DataFrame, DataFrame) = {
    val base = docs
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__t"))
      .withColumn("dl", size(col("__t")).cast("long"))
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("__t")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("n_tokens"))
    (postings, stats)
  }

  /** Corpus-wide document frequency per term (one aggregate over the
    * postings — each posting row is one (term, doc) incidence).
    */
  def docFrequencies(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /** TF-IDF weights for every posting: `(doc_id, term, tf, df, tfidf)`
    * with `tfidf = tf * ln(n_docs / df)`. The df join shuffles on
    * `term` — the same key the postings aggregation just produced, so
    * AQE/bucketing reuses the layout.
    */
  def tfidf(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val (postings, stats) = buildIndex(docs, textCol, idCol)
    postings
      .join(docFrequencies(postings), Seq("term"))
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("tfidf"))
  }

  /** TF-IDF on an exact integer substrate:
    * `(doc_id, term, tf, df, w)` with
    * `w = tf * ((1e6 * n_docs) div df)` — a parts-per-million rational
    * idf proxy (monotone in `n_docs/df`, like `ln` of it) computed with
    * integer multiply/divide only, so any two engines produce the SAME
    * bits from the same corpus. This is the cross-engine-replayable
    * weighting for reproducible pipelines; [[tfidf]] keeps the classic
    * `ln` form for ranking quality work (pinned by RetrievalSpec, which
    * also asserts the two orderings agree on df-distinct terms).
    */
  def tfidfExact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val (postings, stats) = buildIndex(docs, textCol, idCol)
    postings
      .join(docFrequencies(postings), Seq("term"))
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * expr("(1000000L * n_docs) div df")).as("w"))
  }

  /** Per-(query, doc, term) BM25 contributions on an exact integer
    * substrate — every engine computes identical bits, so summed scores
    * and the resulting ranking replay exactly across engines/libms:
    *
    *   idf_ppm    = (1e6 * (2N - 2df + 1)) div (2df + 1)
    *                  [≈ 1e6 * (N - df + 0.5)/(df + 0.5), the BM25 idf
    *                   argument as an exact rational in ppm]
    *   tfnorm_ppm = (1e6 * 22 * tf * S) div (10*S*tf + 3*S + 9*dl*N)
    *                  [tf*(k1+1)/(tf + k1*((1-b) + b*(dl*N)/S)) with
    *                   k1=1.2, b=0.75, both sides scaled by 10*S]
    *   s_int      = idf_ppm * tfnorm_ppm
    *
    * The `ln` in classic BM25 is a monotone squash of the idf rational;
    * dropping it changes relative term weighting (rare terms weigh
    * heavier here) but keeps a valid deterministic relevance order.
    * [[bm25TermScores]] remains the float Robertson form. Plan shape is
    * identical to the float path: query terms broadcast into postings,
    * df over the narrowed frame broadcast back, stats a broadcast
    * scalar — nothing corpus-sized shuffles.
    *
    * Range: the inner product `1e6*22*tf*n_tokens` exceeds Long once
    * `tf*n_tokens` passes ~4.2e11 (likewise `1e6*n_docs*…` in
    * [[tfidfExact]]). The session runs ANSI mode (Spark 4 default, not
    * disabled in [[graft.Tables.configure]]), so overflow THROWS rather
    * than silently wrapping — pinned by RetrievalSpec's overflow test.
    * Corpora near that envelope should move the substrate to
    * DECIMAL(38,0) ppm.
    */
  def bm25TermScoresExact(
      postings: DataFrame,
      stats: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String): DataFrame = {
    val qt = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(toks(col(queryTextCol)))).as("term"))
    val probedTerms = qt.select("term").distinct()
    val narrowed = postings.join(broadcast(probedTerms), Seq("term"))
    val dfT = narrowed.groupBy("term").agg(count(lit(1)).as("df"))
    narrowed
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), col("term"),
        (expr("(1000000L * (2L*n_docs - 2L*df + 1L)) div (2L*df + 1L)") *
          expr("""(1000000L * 22L * tf * n_tokens) div
                  (10L*n_tokens*tf + 3L*n_tokens + 9L*dl*n_docs)"""))
          .as("s_int"))
  }

  /** Top-k by the exact integer BM25 scores: `(query_id, doc_id,
    * score_q, rank)` — the reduction is plain integer sum (order-free),
    * rank by (score desc, doc_id).
    */
  def bm25TopKExact(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int): DataFrame = {
    val (postings, stats) = buildIndex(docs, textCol, idCol)
    bm25TermScoresExact(postings, stats, queries, queryIdCol, queryTextCol)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("s_int")).as("score_q"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_q").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Per-(query, doc, term) BM25 contributions
    * `(query_id, doc_id, term, s)` — the scoring substrate, exposed so
    * callers (and the cross-engine oracle) can control the reduction:
    *
    *   s = ln(1 + (N - df + 0.5)/(df + 0.5))
    *       * tf*(k1+1) / (tf + k1*((1-b) + b*(dl*N)/S))
    *
    * (`dl/avgdl` written as `(dl*N)/S` — one exact integer product and
    * one correctly-rounded division, instead of dividing by a derived
    * avgdl double). Duplicate query terms count once (short-query BM25
    * convention). Plan shape: the query-term set broadcasts into the
    * postings (narrowing them to the probed terms), the per-term df
    * table is an aggregate of that narrowed frame (tiny, broadcast
    * back), and stats is a broadcast scalar — nothing corpus-sized
    * shuffles on the query path.
    */
  def bm25TermScores(
      postings: DataFrame,
      stats: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val qt = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(toks(col(queryTextCol)))).as("term"))
    val probedTerms = qt.select("term").distinct()
    val narrowed = postings.join(broadcast(probedTerms), Seq("term"))
    val dfT = narrowed.groupBy("term").agg(count(lit(1)).as("df"))
    val N = col("n_docs").cast("double")
    val S = col("n_tokens").cast("double")
    val tf = col("tf").cast("double")
    val dl = col("dl")
    val idf = log(lit(1.0) +
      (N - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfNorm = (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) +
        lit(b) * ((dl * col("n_docs")).cast("double") / S)))
    narrowed
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), col("term"),
        (idf * tfNorm).as("s"))
  }

  /** BM25 document scores `(query_id, doc_id, score)`. The per-doc sum
    * folds the term contributions in SORTED TERM ORDER (IEEE addition
    * is order-sensitive; a fixed fold order makes scores replay-stable
    * and cross-engine comparable). The fold lambda is interpreted, but
    * runs over arrays bounded by the query length — never corpus-sized.
    */
  def bm25Scores(
      postings: DataFrame,
      stats: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    bm25TermScores(postings, stats, queries, queryIdCol, queryTextCol, k1, b)
      .groupBy("query_id", "doc_id")
      .agg(expr("""aggregate(array_sort(collect_list(struct(term, s))),
                   CAST(0 AS DOUBLE), (acc, x) -> acc + x.s)""").as("score"))

  /** Top-k BM25 search: `(query_id, doc_id, score, rank)`, rank dense
    * in each query by (score desc, doc_id) — deterministic total order.
    * The window partitions by query_id (many small partitions, never a
    * single global one).
    */
  def bm25TopK(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val (postings, stats) = buildIndex(docs, textCol, idCol)
    bm25Scores(postings, stats, queries, queryIdCol, queryTextCol, k1, b)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis

/** One catalog entry: a named query over the driver's testdata paired
  * (where SQL-expressible) with a DuckDB oracle. Top-level — NOT nested
  * in [[QueryCatalog]] — so that [[Headline]] and [[graft.Bench]] can
  * construct/consume entries without class-initializing the full
  * catalog object (r13 verdict: headline warmup time tracked catalog
  * size, not plans, because Bench forced the whole registry's init).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** part of the benchmark headline set */
    bench: Boolean = false)

/** Helpers shared by [[Headline]] (the fixed 17-query bench set) and
  * [[QueryCatalog]] (the full registry): table loading, the exact-money
  * decimal discipline, µs event-time arithmetic, and the DuckDB-dialect
  * oracle generators that mirror graft's Scala-side text/dedup
  * semantics (see the cross-engine determinism rules on QueryCatalog).
  */
private[queries] object QueryShared {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact money arithmetic: double -> DECIMAL(18,2). */
  def dec(c: Column): Column = c.cast("decimal(18,2)")
  def sumd(c: Column): Column = sum(dec(c)).cast("double")

  // Event-time arithmetic runs in MICROSECONDS: DuckDB (the oracle) reads
  // `ts` as a µs-precision TIMESTAMP (`epoch_us(ts)`), so the Spark side
  // must land on the same integer µs whatever dtype the parquet writer
  // used — Tables.tsMicros adapts per loaded schema (int64-nanos,
  // TIMESTAMP, or TIMESTAMP_NTZ).
  val UsPerHour = 3600L * 1000 * 1000
  val UsPerDay = 24L * UsPerHour

  def eventsUs(s: SparkSession, d: String): DataFrame =
    Tables.eventsUs(s, d)

  // -------- DuckDB-oracle generators for the text/dedup family ----------
  // These mirror graft's Scala-side semantics in DuckDB's dialect so even
  // the LSH paths get EXACT oracles instead of rows-only checks:
  //  - shingling matches WordShingles byte-for-byte on ASCII corpora
  //    (tokens = space-run splits; <n tokens -> one shingle; "" -> ['']);
  //  - trigram counts use the replace trick — every profile trigram is
  //    non-self-overlapping (no s[0]==s[2]), so the non-overlapping count
  //    equals langIdNgramCols' lookahead regexp_count;
  //  - per-language double sums replay the same left-assoc reduce order,
  //    making IEEE addition bit-identical across engines.

  /** `words` list column -> word n-gram shingle list (DuckDB lambdas). */
  def duckShingleList(n: Int): String =
    s"""CASE WHEN len(words)=0 THEN ['']
            WHEN len(words)<$n THEN [array_to_string(words,' ')]
            ELSE list_transform(generate_series(1,len(words)-${n - 1}),
                                i -> array_to_string(words[i:i+${n - 1}],' ')) END"""

  val DuckWords = "list_filter(string_split(text,' '), w -> w <> '')"

  /** Per-language trigram score select-list over a `lt` (lowered text)
    * column, matching langIdNgramCols' grouping and reduce order.
    */
  def duckLangScoreCols: String = {
    val byLang = TextAnalysis.defaultTrigramProfiles.groupBy(_._1).toSeq.sortBy(_._1)
    byLang.map { case (lang, entries) =>
      val terms = entries.map { case (_, tri, w) =>
        val esc = tri.replace("'", "''")
        s"CAST((LENGTH(lt) - LENGTH(replace(lt, '$esc', ''))) / ${tri.length} AS DOUBLE) * $w"
      }.mkString(" + ")
      s"($terms) AS s_$lang"
    }.mkString(", ")
  }

  def duckLangNames: Seq[String] =
    TextAnalysis.defaultTrigramProfiles.map(_._1).distinct.sorted

  /** Unnest-the-scores + argmax fragment: struct `greatest` ties break to
    * the lexicographically largest language, like the Scala side.
    */
  def duckLangBestSql(scoredRel: String): String = {
    val structs = duckLangNames
      .map(l => s"{'score': s_$l, 'lang': '$l'}").mkString(", ")
    s"""SELECT * EXCLUDE (s), s.lang AS best_lang, s.score AS best_score FROM (
          SELECT *, unnest([$structs]) AS s FROM $scoredRel) __u
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY s.score DESC, s.lang DESC) = 1"""
  }

  /** The quality-score expression verbatim from the quality_score oracle. */
  val DuckQuality = """
      (CASE WHEN LENGTH(text) >= 200 AND LENGTH(text) <= 100000 THEN CAST(1.0 AS DOUBLE)
            ELSE LENGTH(text) / CAST(200.0 AS DOUBLE) END) * 0.5
      + CASE WHEN (CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
                   / (LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1)) >= 3
               AND (CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
                   / (LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1)) <= 10
             THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
      + CASE WHEN (CAST(LENGTH(text) - LENGTH(replace(text, '.', '')) AS DOUBLE) / LENGTH(text)) <= 0.1
             THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"""
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ann.Similarity
import graft.dedup.Dedup
import graft.ops.{AsOfJoin, EventTime}
import graft.text.TextAnalysis
import graft.queries.QueryShared._

/** Every operator from SURVEY.md §2 as a named query over the driver's
  * testdata, paired (where SQL-expressible) with a DuckDB oracle.
  *
  * Cross-engine determinism rules used throughout — violating any of these
  * turns a correct operator into a hash mismatch:
  *  - money/double sums go through DECIMAL(18,2) (exact in both engines,
  *    order-independent) and only then cast to double;
  *  - averages = exact decimal sum cast to double, divided by the count
  *    (single IEEE division, deterministic);
  *  - event times stay integral epoch-nanos end to end (`div`, `//`);
  *  - every result has a total ORDER BY with unique tie-break;
  *  - integer outputs are cast to BIGINT on both sides (Spark length() is
  *    int, DuckDB's is BIGINT).
  */
object QueryCatalog {

  /** Aliases for source/test compatibility — the case class itself is
    * top-level (see QueryShared.scala) so Bench/Headline never force
    * this 6k-line object's init. */
  type QueryDef = graft.queries.QueryDef
  val QueryDef = graft.queries.QueryDef

  /** The MJPEG/AVI oracle fixture shared by video_decode and
    * video_frames: per doc an AVI of 2-4 quality-100 4:2:0 block-
    * constant JPEG frames whose planes follow (id, frame) formulas the
    * SQL oracles replay. One definition — the Scala side and both SQL
    * strings must agree on these formulas. */
  private def mjpegOracleBlobs(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.{AviCodec, JpegCodec}
    import s.implicits._
    t(s, d, "documents").select(col("doc_id")).as[Long]
      .map { id =>
        val w = 32; val h = 16
        val frames = (0 until (2 + (id % 3)).toInt).map { f =>
          val yP = Array.tabulate(w * h) { i =>
            val bx = (i % w) / 8; val by = (i / w) / 8
            (((id * 13 + f * 37 + bx * 17 + by * 29) % 216) + 20).toInt
          }
          val cbP = Array.tabulate(w * h) { i =>
            val mx = (i % w) / 16
            (((id * 7 + f * 5 + mx * 31) % 200) + 28).toInt
          }
          val crP = Array.tabulate(w * h) { i =>
            val mx = (i % w) / 16
            (((id * 11 + f * 3 + mx * 23) % 200) + 30).toInt
          }
          JpegCodec.encodePlanes(Array(yP, cbP, crP), w, h,
            quality = 100, subsample420 = true)
        }
        (id, AviCodec.encodeMjpeg(frames, w, h, usPerFrame = 40000L))
      }.toDF("doc_id", "content")
  }

  /** The turns-frame synthesis shared by the chat_* oracles: a
    * deterministic multi-turn conversation per document — arithmetic on
    * `srcCol` picks the shape (src%2 → leading system turn, src%3 →
    * 1-3 user/assistant pairs), content is 4-word slices of the source
    * text (fallback 'ok'+t when the text runs out). The SQL oracles
    * replay the same arithmetic; ONE definition — the Scala side and
    * every chat_* SQL string must agree on these formulas. `keyCol` is
    * the conversation key (differs from `srcCol` only in chat_dedup's
    * planted-duplicate synthesis, where the donor's conversation is
    * rebuilt under the copy's key).
    */
  private def chatTurns(df: DataFrame, keyCol: String, srcCol: String,
                        textCol: String): DataFrame = {
    val src = col(srcCol)
    val base = df.select(col(keyCol).as("doc_id"),
      TextAnalysis.spaceTokens(col(textCol)).as("ws"),
      when(pmod(src, lit(2)) === 0, 1).otherwise(0).as("sys"),
      ((pmod(src, lit(3)) + 1) * 2).cast("int").as("nn"))
    base.select(col("doc_id"), col("ws"), col("sys"), col("nn"),
        explode(sequence(lit(0), col("nn") + col("sys") - 1)).as("k"))
      .withColumn("t", (col("k") - col("sys")).cast("int"))
      .withColumn("role",
        when(col("k") === 0 && col("sys") === 1, "system")
          .when(pmod(col("t"), lit(2)) === 0, "user")
          .otherwise("assistant"))
      .withColumn("content",
        when(col("role") === "system", lit("be helpful"))
          .otherwise({
            val c = array_join(
              slice(col("ws"), col("t") * 4 + 1, lit(4)), " ")
            when(c === "", concat(lit("ok"), col("t").cast("string")))
              .otherwise(c)
          }))
      .withColumn("total", (col("nn") + col("sys")).cast("int"))
      .select(col("doc_id"), col("k").cast("int").as("idx"),
        col("role"), col("content"), col("sys"), col("total"))
  }

  /** The DuckDB twin of [[chatTurns]] as CTE text; the caller's prior
    * CTE `d0` must provide (key, src, text). */
  private val chatTurnsSql: String = """
    base AS (
      SELECT key AS doc_id,
        list_filter(string_split(text, ' '), w -> w <> '') AS ws,
        CASE WHEN src % 2 = 0 THEN 1 ELSE 0 END AS sys,
        CAST((src % 3 + 1) * 2 AS INTEGER) AS nn
      FROM d0),
    t0 AS (
      SELECT doc_id, ws, sys, nn + sys AS total,
        CAST(u.k AS INTEGER) AS k, CAST(u.k - sys AS INTEGER) AS t
      FROM base, UNNEST(range(0, nn + sys)) AS u(k)),
    turns AS (
      SELECT doc_id, k AS idx, sys, total,
        CASE WHEN k = 0 AND sys = 1 THEN 'system'
             WHEN t % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        -- array_to_string over an out-of-range slice is NULL in DuckDB,
        -- not '' — coalesce so the fallback arm fires like Spark's
        CASE WHEN k = 0 AND sys = 1 THEN 'be helpful'
             WHEN coalesce(array_to_string(
                 list_slice(ws, t*4+1, t*4+4), ' '), '') = ''
               THEN 'ok' || t
             ELSE array_to_string(list_slice(ws, t*4+1, t*4+4), ' ')
        END AS content
      FROM t0)"""

  /** RollingFingerprint oracle terms: Java's wrap-around long arithmetic
    * is mod-2^64 ring arithmetic, so each window hash is the polynomial
    * sum with HUGEINT pow-mod constants, reduced once, then mapped back to
    * the signed 64-bit range before the min (Java compares SIGNED longs).
    */
  private def duckRollingTerms(win: Int): String = {
    val M = BigInt(1) << 64
    val pows = (0 until win).map(k => BigInt(1000003).modPow(BigInt(k), M))
    (0 until win).map(j =>
      s"ord(substring(text, i+$j, 1))::HUGEINT * ${pows(win - 1 - j)}::HUGEINT")
      .mkString(" + ")
  }

  /** ANSI SQL that runs VERBATIM on both engines — `spark.sql` over the
    * Catalog temp views here, and the DuckDB oracle on the same parquet —
    * the strongest form of the cross-engine contract.
    */
  private val PortableSql: Map[String, String] = Map(
    "q_sql_cte" -> """
      WITH seg AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0)
      SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders JOIN seg ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_grouping_sets" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY rf, ls""")

  /** Full registry = the fixed bench headline set + everything else. */
  val all: Seq[QueryDef] = Headline.all ++ Seq(

    QueryDef("q_nation_orders", (s, d) => {
      val ord = t(s, d, "orders")
      val cust = t(s, d, "customer")
      val nat = t(s, d, "nation")
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice")).as("total"))
        .orderBy("n_name")
    }, Some("""
      SELECT n_name, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""")),

    QueryDef("q_window_rank", (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn = 1
      ORDER BY o_custkey""")),

    QueryDef("q_sort_limit", (s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50),
      Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""")),

    QueryDef("q_distinct", (s, d) =>
      t(s, d, "customer")
        .select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey"),
      Some("""
      SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      ORDER BY c_mktsegment, c_nationkey""")),

    QueryDef("q_semijoin", (s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")),

    QueryDef("q_antijoin", (s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")),

    QueryDef("q_union_all", (s, d) => {
      val part = t(s, d, "part")
      part.filter(col("p_size") >= 40)
        .select(col("p_partkey").as("key"), lit("large").as("tag"))
        .unionByName(
          part.filter(col("p_retailprice") > 990.0)
            .select(col("p_partkey").as("key"), lit("pricey").as("tag")))
        .orderBy("key", "tag")
    }, Some("""
      SELECT p_partkey AS key, 'large' AS tag FROM part WHERE p_size >= 40
      UNION ALL
      SELECT p_partkey AS key, 'pricey' AS tag FROM part WHERE p_retailprice > CAST(990.0 AS DOUBLE)
      ORDER BY key, tag""")),

    QueryDef("q_case_agg", (s, d) =>
      t(s, d, "orders").groupBy("o_orderpriority")
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
          count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some("""
      SELECT o_orderpriority,
        COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
        COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QueryDef("q_rollup", (s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls"),
      Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY rf, ls""")),

    QueryDef("q_scalar_subquery", (s, d) => {
      val cust = t(s, d, "customer")
      val thr = cust.agg((sumd(col("c_acctbal")) / count(lit(1))).as("__thr"))
      cust.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("__thr"))
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer)
      ORDER BY c_custkey""")),

    QueryDef("q_outer_join", (s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sumd(col("o_totalprice")), lit(0.0)).as("total"))
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""")),

    QueryDef("q_full_outer", (s, d) => {
      val c = t(s, d, "customer").filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"))
      val o = t(s, d, "orders").filter(col("o_custkey") % 2 === 0)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(
          coalesce(c("c_custkey"), o("o_custkey")).as("custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          c("c_custkey").isNotNull.as("has_cust"))
        .orderBy("custkey")
    }, Some("""
      SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        COALESCE(n_orders, 0) AS n_orders,
        c_custkey IS NOT NULL AS has_cust
      FROM (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0) c
      FULL JOIN (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
                 FROM orders WHERE o_custkey % 2 = 0 GROUP BY 1) o
        ON c_custkey = o_custkey
      ORDER BY custkey""")),

    QueryDef("q_dense_rank", (s, d) => {
      val qc = expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val wd = Window.partitionBy("l_returnflag").orderBy(col("qcents"))
      t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          qc.as("qcents"))
        .withColumn("rnk", rank().over(wd).cast("long"))
        .withColumn("drnk", dense_rank().over(wd).cast("long"))
        .orderBy("l_returnflag", "qcents", "l_orderkey", "l_linenumber")
    }, Some("""
      SELECT l_returnflag, l_orderkey, l_linenumber,
        CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qcents,
        CAST(RANK() OVER (PARTITION BY l_returnflag
          ORDER BY CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rnk,
        CAST(DENSE_RANK() OVER (PARTITION BY l_returnflag
          ORDER BY CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS drnk
      FROM lineitem WHERE l_orderkey < 2000
      ORDER BY l_returnflag, qcents, l_orderkey, l_linenumber""")),

    QueryDef("q_like_in", (s, d) =>
      t(s, d, "part")
        .filter(col("p_brand").like("Brand#1%") &&
                col("p_type").isin("ECONOMY", "PROMO"))
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey"),
      Some("""
      SELECT p_partkey, p_brand, p_type FROM part
      WHERE p_brand LIKE 'Brand#1%' AND p_type IN ('ECONOMY', 'PROMO')
      ORDER BY p_partkey""")),

    // quartiles as SCALAR columns — an array-typed output column breaks
    // the driver's compare (pandas sorts the result; numpy arrays are
    // unhashable), so the multi-quantile array form is flattened
    QueryDef("q_quantiles", (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25D)").as("qty_p25"),
          expr("percentile(l_quantity, 0.5D)").as("qty_p50"),
          expr("percentile(l_quantity, 0.75D)").as("qty_p75"),
          expr("percentile(l_extendedprice, 0.5D)").as("median_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""
      SELECT l_returnflag,
        quantile_cont(l_quantity, 0.25) AS qty_p25,
        quantile_cont(l_quantity, 0.5) AS qty_p50,
        quantile_cont(l_quantity, 0.75) AS qty_p75,
        quantile_cont(l_extendedprice, 0.5) AS median_price,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q_salted_agg", (s, d) => {
      // two-phase salted aggregation must equal the direct group-sum;
      // decimal sums keep both phases exact so the oracle is the plain agg
      val li = t(s, d, "lineitem")
        .withColumn("__uid",
          concat(col("l_orderkey").cast("string"), lit("_"),
            col("l_linenumber").cast("string")))
        .withColumn("qty_dec", dec(col("l_quantity")))
      graft.ops.Skew.saltedSumCount(li, Seq("l_returnflag"), "__uid",
          saltBuckets = 8, sums = Seq("qty_dec"))
        .select(col("l_returnflag"), col("n"),
          col("sum_qty_dec").cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // The diagnostic that feeds the salted mitigations: per-key
    // frequency audit of a prospective shuffle key with two integer
    // dials — skew_ratio_pct (this key's load vs the mean key, x100)
    // and suggested_salt (the factor saltedJoin/saltedSumCount need so
    // no reducer sees more than targetRowsPerTask rows of the key).
    // Pure integer `div` arithmetic; the top-k pick ties (cnt desc,
    // numeric key) and the presented relation re-sorts on the string
    // key, both replayed identically by the oracle.
    QueryDef("skew_audit", (s, d) =>
      graft.ops.Skew.skewAudit(t(s, d, "orders"), "o_custkey",
          topK = 10, targetRowsPerTask = 4)
        .orderBy(col("cnt").desc, col("key")),
      Some("""
      WITH c AS (SELECT o_custkey AS k, COUNT(*) AS cnt
                 FROM orders GROUP BY 1),
      s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                   COUNT(*) AS n_keys FROM c),
      t AS (SELECT * FROM c ORDER BY cnt DESC, k LIMIT 10)
      SELECT CAST(t.k AS VARCHAR) AS key, t.cnt, s.n_rows, s.n_keys,
        CAST((t.cnt * s.n_keys * 100) // s.n_rows AS BIGINT)
          AS skew_ratio_pct,
        (t.cnt + 3) // 4 AS suggested_salt
      FROM t CROSS JOIN s ORDER BY cnt DESC, key""")),

    // One-pass per-column table profile (ops/Profiling): every stat is
    // an aggregate expression in a SINGLE agg over a SINGLE scan, then
    // exploded to tidy rows — no per-column scans, no driver collect.
    // The entry runs the exact-distinct flavor AND pins the HLL sketch
    // against it as a 15%-relative-error bound boolean (rsd = 5%), so
    // the approx path — the 100 TB default — is itself oracle-checked.
    // Timestamp/double columns are profiled fine by the operator but
    // kept out of this entry (cast-to-string rendering is
    // engine-specific for those types; min/max exactness for them is
    // ProfilingSpec's job).
    QueryDef("profile_table", (s, d) =>
      graft.ops.Profiling.profileTable(t(s, d, "lineitem"),
          Seq("l_orderkey", "l_suppkey", "l_linenumber",
            "l_returnflag", "l_linestatus"),
          exactDistinct = true)
        .withColumn("approx_ok",
          abs(col("n_distinct_approx") - col("n_distinct")) * lit(100L)
            <= col("n_distinct") * lit(15L))
        .drop("n_distinct_approx")
        .orderBy("col_name"),
      Some("""
      WITH p AS (
        SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
          COUNT(*) - COUNT(l_orderkey) AS n_null,
          COUNT(DISTINCT l_orderkey) AS n_distinct,
          CAST(MIN(l_orderkey) AS VARCHAR) AS min_value,
          CAST(MAX(l_orderkey) AS VARCHAR) AS max_value FROM lineitem
        UNION ALL
        SELECT 'l_suppkey', COUNT(*), COUNT(*) - COUNT(l_suppkey),
          COUNT(DISTINCT l_suppkey), CAST(MIN(l_suppkey) AS VARCHAR),
          CAST(MAX(l_suppkey) AS VARCHAR) FROM lineitem
        UNION ALL
        SELECT 'l_linenumber', COUNT(*), COUNT(*) - COUNT(l_linenumber),
          COUNT(DISTINCT l_linenumber), CAST(MIN(l_linenumber) AS VARCHAR),
          CAST(MAX(l_linenumber) AS VARCHAR) FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
          COUNT(DISTINCT l_returnflag), MIN(l_returnflag),
          MAX(l_returnflag) FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', COUNT(*), COUNT(*) - COUNT(l_linestatus),
          COUNT(DISTINCT l_linestatus), MIN(l_linestatus),
          MAX(l_linestatus) FROM lineitem)
      SELECT col_name, n_rows, n_null, n_distinct, min_value, max_value,
        TRUE AS approx_ok
      FROM p ORDER BY col_name""")),

    QueryDef("q_cube", (s, d) =>
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pr"),
          col("n"))
        .orderBy("st", "pr"),
      Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS st,
             COALESCE(o_orderpriority, 'ALL') AS pr,
             COUNT(*) AS n
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY st, pr""")),

    QueryDef("q_lag_lead", (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey,
        lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      FROM orders ORDER BY o_custkey, o_orderkey""")),

    QueryDef("q_ntile", (s, d) =>
      // global quartiles without the single-partition window ntile needs:
      // range-partitioned global row number + the SQL bucket-size formula
      graft.ops.Ranking.globalNtile(t(s, d, "orders"), 4,
          Seq(col("o_totalprice").desc, col("o_orderkey")), "quartile")
        .select("o_orderkey", "quartile")
        .orderBy("o_orderkey"),
      Some("""
      SELECT o_orderkey,
        CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
      FROM orders ORDER BY o_orderkey""")),

    QueryDef("q_having", (s, d) =>
      t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 15)
        .orderBy("o_custkey"),
      Some("""
      SELECT o_custkey, COUNT(*) AS n FROM orders
      GROUP BY o_custkey HAVING COUNT(*) >= 15 ORDER BY o_custkey""")),

    QueryDef("q_string_ops", (s, d) =>
      t(s, d, "customer").select(
          col("c_custkey"),
          upper(col("c_name")).as("name_u"),
          substring(col("c_name"), 1, 8).as("name_pre"),
          length(col("c_name")).cast("long").as("name_len"),
          concat(col("c_mktsegment"), lit("-"), col("c_nationkey").cast("string"))
            .as("seg_nat"))
        .orderBy("c_custkey"),
      Some("""
      SELECT c_custkey, upper(c_name) AS name_u, substr(c_name, 1, 8) AS name_pre,
        CAST(length(c_name) AS BIGINT) AS name_len,
        concat(c_mktsegment, '-', CAST(c_nationkey AS VARCHAR)) AS seg_nat
      FROM customer ORDER BY c_custkey""")),

    QueryDef("q_date_parts", (s, d) =>
      t(s, d, "orders").groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
        .orderBy("y", "m"),
      Some("""
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1, 2 ORDER BY y, m""")),

    // pivot to fixed status columns (null combos -> 0 like conditional agg)
    QueryDef("q_pivot", (s, d) =>
      t(s, d, "orders").groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P")).count()
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority"),
      Some("""
      SELECT o_orderpriority,
        COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // RANGE frame (value-based window): running revenue over orders within
    // the trailing 30 days per customer — RANGE, unlike ROWS, must bound
    // by the ORDER-BY VALUE, so ties and gaps behave differently.
    QueryDef("q_range_frame", (s, d) => {
      val o = t(s, d, "orders")
        .withColumn("d", datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).cast("long"))
      val w = Window.partitionBy("o_custkey").orderBy("d")
        .rangeBetween(-30L, Window.currentRow)
      o.withColumn("rev30",
          sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"), col("d"), col("rev30"))
        .orderBy("o_custkey", "d", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey, d,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY d
          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev30
      FROM (SELECT o_custkey, o_orderkey,
              CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d
              , o_totalprice FROM orders)
      WHERE o_custkey < 200 ORDER BY o_custkey, d, o_orderkey""")),

    // Calendar bucketing: monthly order revenue via date_trunc — the
    // time-series resample every BI layer runs. Month key rendered as a
    // DATE-cast string so both engines hash identically.
    QueryDef("q_date_trunc", (s, d) =>
      t(s, d, "orders")
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"))
        .agg(sumd(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("month_start"),
      Some("""
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM orders GROUP BY 1 ORDER BY month_start""")),

    // Unpivot (wide -> long): lineitem measures to (measure, value) rows —
    // Spark's stack() against the portable UNION ALL formulation.
    QueryDef("q_unpivot", (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("""stack(3, 'quantity', CAST(l_quantity AS DOUBLE),
                           'extendedprice', CAST(l_extendedprice AS DOUBLE),
                           'discount', CAST(l_discount AS DOUBLE))
                  AS (measure, value)"""))
        .orderBy("l_orderkey", "l_linenumber", "measure"),
      Some("""
      SELECT l_orderkey, l_linenumber, measure, value FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice',
               CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount',
               CAST(l_discount AS DOUBLE) FROM lineitem)
      WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber, measure""")),

    // Lateral explode + aggregate: corpus word frequency (top 100). The
    // tokenizer is the same space-run split both engines use elsewhere.
    QueryDef("q_explode_tokens", (s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(100),
      Some("""
      SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
        FROM documents)
      GROUP BY word ORDER BY n DESC, word LIMIT 100""")),

    // Time-series gap fill: hourly event counts with empty buckets
    // materialized as zeros (sequence + explode + left join) — the
    // standard resample shape reporting pipelines need.
    QueryDef("q_gap_fill", (s, d) => {
      val e = eventsUs(s, d).withColumn("b", expr(s"ts_us div $UsPerHour"))
      val counts = e.groupBy("b").agg(count(lit(1)).as("n_events"))
      val range = e.agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
        .select(explode(expr("sequence(b0, b1)")).as("b"))
      range.join(counts, Seq("b"), "left")
        .select(col("b"), coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("b")
    }, Some("""
      WITH e AS (SELECT epoch_us(ts) // 3600000000 AS b FROM events),
      r AS (SELECT unnest(generate_series(MIN(b), MAX(b))) AS b FROM e),
      c AS (SELECT b, COUNT(*) AS n_events FROM e GROUP BY b)
      SELECT r.b AS b, COALESCE(c.n_events, 0) AS n_events
      FROM r LEFT JOIN c USING (b) ORDER BY b""")),

    // Higher-order array functions as a query: per-order quantity list ->
    // sort, transform (double it), filter (> 40), aggregate (sum) — all
    // inside codegen'd array expressions; scalar output keeps the
    // cross-engine hash comparable.
    // Array set algebra: per-order shipmode/returnflag sets intersected /
    // diffed against fixed sets — Spark array_intersect/array_except vs
    // DuckDB list_intersect / list_filter, canonicalized by sort.
    QueryDef("q_array_setops", (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
        .groupBy("l_orderkey")
        .agg(sort_array(array_distinct(collect_list(col("l_returnflag")))).as("flags"))
        .select(col("l_orderkey"),
          array_join(array_intersect(col("flags"), array(lit("A"), lit("R"))), ",")
            .as("ar_flags"),
          array_join(array_except(col("flags"), array(lit("N"))), ",")
            .as("non_n_flags"),
          size(col("flags")).cast("long").as("n_flags"))
        .orderBy("l_orderkey"),
      Some("""
      WITH f AS (
        SELECT l_orderkey,
               list_sort(list_distinct(list(l_returnflag))) AS flags
        FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_orderkey)
      SELECT l_orderkey,
        COALESCE(array_to_string(list_filter(flags, x -> x IN ('A', 'R')), ','), '') AS ar_flags,
        COALESCE(array_to_string(list_filter(flags, x -> x <> 'N'), ','), '') AS non_n_flags,
        CAST(len(flags) AS BIGINT) AS n_flags
      FROM f ORDER BY l_orderkey""")),

    // Map column construction + lookup: per-order (returnflag -> count)
    // map built with map_from_entries, then element_at lookups. The map
    // itself never crosses to the oracle (map key order is
    // engine-specific) — the LOOKUPS are the checked surface.
    QueryDef("q_map_ops", (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
        .groupBy("l_orderkey", "l_returnflag").agg(count(lit(1)).as("n"))
        .groupBy("l_orderkey")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("l_returnflag"), col("n"))))).as("m"))
        .select(col("l_orderkey"),
          coalesce(element_at(col("m"), "A"), lit(0L)).as("n_a"),
          coalesce(element_at(col("m"), "N"), lit(0L)).as("n_n"),
          coalesce(element_at(col("m"), "R"), lit(0L)).as("n_r"),
          size(col("m")).cast("long").as("n_keys"))
        .orderBy("l_orderkey"),
      Some("""
      SELECT l_orderkey,
        CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN 1 END), 0) AS BIGINT) AS n_a,
        CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN 1 END), 0) AS BIGINT) AS n_n,
        CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN 1 END), 0) AS BIGINT) AS n_r,
        CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_keys
      FROM lineitem WHERE l_orderkey < 2000
      GROUP BY l_orderkey ORDER BY l_orderkey""")),

    QueryDef("q_array_transform", (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 500)
        .withColumn("q", col("l_quantity").cast("long"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("q"))).as("qs"))
        .select(col("l_orderkey"),
          expr("aggregate(filter(transform(qs, x -> x * 2), x -> x > 40), 0L, (a, x) -> a + x)")
            .as("total"),
          size(col("qs")).cast("long").as("n_items"))
        .orderBy("l_orderkey"),
      Some("""
      SELECT l_orderkey,
        CAST(COALESCE(list_sum(list_filter(
               list_transform(list_sort(list(CAST(l_quantity AS BIGINT))), x -> x * 2),
               x -> x > 40)), 0) AS BIGINT) AS total,
        CAST(len(list(CAST(l_quantity AS BIGINT))) AS BIGINT) AS n_items
      FROM lineitem WHERE l_orderkey < 500
      GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // Z-order (Morton) clustering key: identical shift/OR interleave
    // arithmetic on both engines — the layout op behind multi-column
    // min/max scan pruning, exactly checkable because the z-value is a
    // static expression tree, not a UDF.
    QueryDef("q_zorder", (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          graft.ops.Layout.zValue(
            Seq(pmod(col("l_orderkey"), lit(256)),
                pmod(col("l_partkey"), lit(256))), 8).as("z"))
        .orderBy("z", "l_orderkey", "l_partkey", "l_linenumber"),
      Some(s"""
      SELECT l_orderkey, l_partkey, l_linenumber,
        ${graft.ops.Layout.zValueSql(
          Seq("(l_orderkey % 256)", "(l_partkey % 256)"), 8)} AS z
      FROM lineitem WHERE l_orderkey < 2000
      ORDER BY z, l_orderkey, l_partkey, l_linenumber""")),

    // Edit distance between part names of consecutive part keys — both
    // engines implement classic Levenshtein, so exact oracle.
    QueryDef("q_levenshtein", (s, d) => {
      val p = t(s, d, "part")
      val a = p.filter(col("p_partkey") <= 500)
        .select(col("p_partkey").as("k"), col("p_name").as("name_a"))
      val b = p.select((col("p_partkey") - 1).as("k"), col("p_name").as("name_b"))
      a.join(b, "k")
        .select(col("k"), levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
        .orderBy("k")
    }, Some("""
      SELECT a.p_partkey AS k,
        CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
      WHERE a.p_partkey <= 500 ORDER BY k""")),

    // JSON shaping + extraction: rows serialize to JSON, fields extract
    // back by path — to_json writes fields in struct order on both sides,
    // and the extracted values hash-match exactly.
    QueryDef("q_json", (s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          to_json(struct(col("o_orderpriority").as("p"),
                         col("o_custkey").cast("long").as("ck"))).as("j"))
        .select(col("o_orderkey"),
          get_json_object(col("j"), "$.p").as("priority"),
          get_json_object(col("j"), "$.ck").cast("long").as("cust_key"))
        .orderBy("o_orderkey"),
      Some("""
      SELECT o_orderkey,
        j->>'$.p' AS priority,
        CAST(j->>'$.ck' AS BIGINT) AS cust_key
      FROM (SELECT o_orderkey,
              to_json(struct_pack(p := o_orderpriority,
                                  ck := CAST(o_custkey AS BIGINT))) AS j
            FROM orders)
      WHERE o_orderkey < 200 ORDER BY o_orderkey""")),

    // Approximate aggregates (HLL++ distinct, approx percentile): sketch
    // ALGORITHMS are engine-specific, so instead of pinning measured
    // sketch values as literals (the r7/r8 form — stale the moment the
    // driver regenerates testdata), the compare is DERIVED FROM THE DATA:
    // the exact per-group distinct count is recomputed by both engines,
    // and the sketch outputs are exported as in-bound BOOLEANS checked
    // inside Spark against in-Spark exact answers (HLL++ rsd=0.02 within
    // 4 sigma; percentile_approx accuracy=10000 on ~3k rows/group has
    // rank error < 1 row, so landing in the exact p45..p55 band is
    // guaranteed). Regen-proof by construction; a broken sketch path
    // flips a boolean. Tighter error-bound semantics live in SketchSpec.
    QueryDef("sketch_stats", (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("exact_customers"),
          approx_count_distinct(col("o_custkey"), 0.02).as("approx_c"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_m"),
          expr("percentile(o_totalprice, 0.45)").as("p45"),
          expr("percentile(o_totalprice, 0.55)").as("p55"))
        .select(col("o_orderpriority"), col("exact_customers"),
          (abs(col("approx_c") - col("exact_customers")).cast("double")
            <= col("exact_customers") * lit(0.08)).as("hll_in_bound"),
          (col("approx_m") >= col("p45") && col("approx_m") <= col("p55"))
            .as("median_in_bound"))
        .orderBy("o_orderpriority"),
      Some("""
      SELECT o_orderpriority,
        COUNT(DISTINCT o_custkey) AS exact_customers,
        TRUE AS hll_in_bound,
        TRUE AS median_in_bound
      FROM orders GROUP BY 1 ORDER BY o_orderpriority""")),

    // the SQL route: identical ANSI text runs on this engine (temp views
    // registered by graft.Catalog) and on the DuckDB oracle
    QueryDef("q_sql_cte", (s, d) => {
      graft.Catalog.registerTables(s, d)
      s.sql(PortableSql("q_sql_cte"))
    }, Some(PortableSql("q_sql_cte"))),

    QueryDef("q_grouping_sets", (s, d) => {
      graft.Catalog.registerTables(s, d)
      s.sql(PortableSql("q_grouping_sets"))
    }, Some(PortableSql("q_grouping_sets"))),

    QueryDef("q_intersect", (s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .intersect(
          t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey"),
      Some("""
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      ORDER BY c_custkey""")),

    QueryDef("q_except", (s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .except(
          t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey"),
      Some("""
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      ORDER BY c_custkey""")),

    // correlated scalar subquery: orders 1.5x above their customer's
    // average order value (expressed as an aggregate join — the optimizer
    // rewrites the correlated form the same way)
    QueryDef("q_correlated_avg", (s, d) => {
      val ord = t(s, d, "orders")
      val perCust = ord.groupBy(col("o_custkey").as("__ck"))
        .agg((sumd(col("o_totalprice")) / count(lit(1))).as("__avg"))
      ord.join(perCust, col("o_custkey") === col("__ck"))
        .filter(col("o_totalprice") > col("__avg") * 1.5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      WHERE o_totalprice > 1.5 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM orders i WHERE i.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")),

    // moving average over the customer's last 3 orders (ROWS frame);
    // exact decimal sum + one division keeps both engines bit-identical
    QueryDef("q_moving_avg", (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
      t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          (sum(dec(col("o_totalprice"))).over(w).cast("double") /
            count(lit(1)).over(w)).as("avg3"))
        .orderBy("o_custkey", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
          / COUNT(*) OVER w AS avg3
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey""")),

    QueryDef("q_first_last", (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"))
        .orderBy("o_custkey", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey,
        first_value(o_totalprice) OVER w AS first_price,
        last_value(o_totalprice) OVER w AS last_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""")),

    QueryDef("q_percent_rank", (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      t(s, d, "orders").select(
          col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey""")),

    // top-3 per group via partitioned row_number (the general top-N shape;
    // q_window_rank pins the N=1 variant)
    QueryDef("q_top3_per_group", (s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "rn", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", "rn")
    }, Some("""
      SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
          CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        FROM customer)
      WHERE rn <= 3 ORDER BY c_mktsegment, rn""")),

    // list aggregation with deterministic ordering, joined to a scalar
    // string (arrays can't cross the driver's pandas compare)
    QueryDef("q_array_agg", (s, d) =>
      t(s, d, "orders").filter(col("o_custkey") <= 50)
        .groupBy("o_custkey")
        .agg(expr(
          "array_join(transform(sort_array(collect_list(o_orderkey)), " +
          "x -> cast(x as string)), ',')").as("order_keys"))
        .orderBy("o_custkey"),
      Some("""
      SELECT o_custkey,
        array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
      FROM orders WHERE o_custkey <= 50
      GROUP BY o_custkey ORDER BY o_custkey""")),

    QueryDef("q_regexp", (s, d) =>
      t(s, d, "part").select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_count(col("p_name"), lit("[aeiou]")).cast("long").as("n_vowels"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
        .orderBy("p_partkey"),
      Some("""
      SELECT p_partkey,
        regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
      FROM part ORDER BY p_partkey""")),

    // null-safe equality join (<=> / IS NOT DISTINCT FROM) — nulls planted
    // with nullif so the null-matching branch actually fires
    QueryDef("q_nullsafe_join", (s, d) => {
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), nullif(col("c_nationkey"), lit(3)).as("ck"))
      val supp = t(s, d, "supplier")
        .select(col("s_suppkey"), nullif(col("s_nationkey"), lit(3)).as("sk"))
      cust.join(supp, col("ck") <=> col("sk"))
        .groupBy(col("ck").as("nation_key"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("nation_key").asc_nulls_first)
    }, Some("""
      SELECT ck AS nation_key, COUNT(*) AS n_pairs
      FROM (SELECT nullif(c_nationkey, 3) AS ck FROM customer) c
      JOIN (SELECT nullif(s_nationkey, 3) AS sk FROM supplier) s
        ON ck IS NOT DISTINCT FROM sk
      GROUP BY ck ORDER BY nation_key NULLS FIRST""")),

    // ================================================================
    // Event time-slicing pipeline (the reference's flagship analytic)
    // ================================================================

    QueryDef("pulse_times", (s, d) => {
      EventTime.derivePulseTimes(
          eventsUs(s, d), "event_type", "ts_us", "click",
          alternates = Seq("view"), runKeys = Seq("event_type"),
          tieBreak = Seq("event_id"))
        .select(col("pulse_index"), col("pulse_time").as("pulse_time_us"))
        .orderBy("pulse_index")
    }, Some("""
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS BIGINT) AS pulse_index,
             epoch_us(ts) AS pulse_time_us
      FROM events WHERE event_type = 'click'
      ORDER BY pulse_index""")),

    // forward direction on the same custom plan: each event's NEXT click
    // of the same user (at-or-after).
    QueryDef("asof_merge_forward", (s, d) => {
      val ev = eventsUs(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("ct"))
        .agg(max(col("event_id")).as("click_id"))
      graft.plans.AsOfMergeJoin.forward(
          ev.select("event_id", "user_id", "ts_us"), clicks,
          leftTime = "ts_us", rightTime = "ct",
          keys = Seq("user_id"), rightCols = Seq("click_id"))
        .select(col("event_id"), col("click_id"),
          col("ct").as("click_time_us"))
        .orderBy("event_id")
    }, Some("""
      WITH clicks AS (
        SELECT user_id, epoch_us(ts) AS ct, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts))
      SELECT e.event_id,
        (SELECT c.click_id FROM clicks c
          WHERE c.user_id = e.user_id AND c.ct >= epoch_us(e.ts)
          ORDER BY c.ct ASC LIMIT 1) AS click_id,
        (SELECT min(c.ct) FROM clicks c
          WHERE c.user_id = e.user_id AND c.ct >= epoch_us(e.ts)) AS click_time_us
      FROM events e ORDER BY e.event_id""")),

    QueryDef("asof_sql", (s, d) => {
      eventsUs(s, d).select("event_id", "ts_us")
        .createOrReplaceTempView("asof_ev")
      EventTime.derivePulseTimes(
          eventsUs(s, d), "event_type", "ts_us", "click",
          runKeys = Seq("event_type"), tieBreak = Seq("event_id"))
        .select("pulse_time", "pulse_index")
        .createOrReplaceTempView("asof_pulse")
      s.sql(s"""
        SELECT event_id, pulse_index, pulse_time AS pulse_time_us
        FROM asof_ev ASOF JOIN asof_pulse
          MATCH_CONDITION (ts_us >= pulse_time) WITHIN $UsPerHour
        ORDER BY event_id""")
    }, Some("""
      WITH pulses AS (
        SELECT epoch_us(ts) AS pt,
               CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS BIGINT) AS pulse_index
        FROM events WHERE event_type = 'click')
      SELECT e.event_id,
        (SELECT max(p.pulse_index) FROM pulses p WHERE p.pt <= epoch_us(e.ts)) AS pulse_index,
        (SELECT max(p.pt) FROM pulses p WHERE p.pt <= epoch_us(e.ts)) AS pulse_time_us
      FROM events e ORDER BY e.event_id""")),

    // Forward (<=) flavor of the ASOF SQL surface — the same correlation
    // asof_merge_forward runs through the custom SparkPlan, here via the
    // parser rewrite (LAG/(prev, rt] intervals, per-key MIN(left)-1 cap).
    QueryDef("asof_sql_forward", (s, d) => {
      val ev = eventsUs(s, d)
      ev.select("event_id", "user_id", "ts_us")
        .createOrReplaceTempView("asof_fwd_ev")
      ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("ct"))
        .agg(max(col("event_id")).as("click_id"))
        .createOrReplaceTempView("asof_fwd_clicks")
      s.sql(s"""
        SELECT event_id, click_id, ct AS click_time_us
        FROM asof_fwd_ev ASOF JOIN asof_fwd_clicks
          MATCH_CONDITION (ts_us <= ct) USING (user_id) WITHIN $UsPerHour
        ORDER BY event_id""")
    }, Some("""
      WITH clicks AS (
        SELECT user_id, epoch_us(ts) AS ct, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts))
      SELECT e.event_id,
        (SELECT c.click_id FROM clicks c
          WHERE c.user_id = e.user_id AND c.ct >= epoch_us(e.ts)
          ORDER BY c.ct ASC LIMIT 1) AS click_id,
        (SELECT min(c.ct) FROM clicks c
          WHERE c.user_id = e.user_id AND c.ct >= epoch_us(e.ts)) AS click_time_us
      FROM events e ORDER BY e.event_id""")),

    QueryDef("events_time_range", (s, d) => {
      val off = EventTime.withOffsetFromStart(eventsUs(s, d), "ts_us", "off_us")
      EventTime.countInTimeRange(off, "off_us", UsPerDay, 7 * UsPerDay,
        bankCol = Some("event_type"), pulseCol = Some("user_id"))
    }, Some(s"""
      WITH m AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
        e AS (SELECT epoch_us(ts) - t0 AS off_us, event_type, user_id FROM events, m)
      SELECT CAST(${UsPerDay} AS BIGINT) AS start_time,
             CAST(${7 * UsPerDay} AS BIGINT) AS end_time,
             COUNT(*) AS event_count,
             MIN(off_us) AS min_time, MAX(off_us) AS max_time,
             COUNT(DISTINCT event_type) AS n_banks,
             COUNT(DISTINCT user_id) AS n_pulses
      FROM e WHERE off_us >= ${UsPerDay} AND off_us < ${7 * UsPerDay}""")),

    QueryDef("events_by_bank_interval", (s, d) => {
      val off = EventTime.withOffsetFromStart(eventsUs(s, d), "ts_us", "off_us")
      EventTime.countByBankAndInterval(off, "off_us", "event_type", UsPerDay,
        pulseCol = Some("user_id"))
    }, Some(s"""
      WITH m AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
        e AS (SELECT epoch_us(ts) - t0 AS off_us, event_type, user_id FROM events, m)
      SELECT interval, event_type, event_count, min_time, max_time, n_pulses,
             interval * ${UsPerDay} AS interval_start,
             (interval + 1) * ${UsPerDay} AS interval_end
      FROM (
        SELECT CAST(off_us // ${UsPerDay} AS BIGINT) AS interval, event_type,
               COUNT(*) AS event_count,
               MIN(off_us) AS min_time, MAX(off_us) AS max_time,
               COUNT(DISTINCT user_id) AS n_pulses
        FROM e GROUP BY 1, 2)
      ORDER BY interval, event_type""")),

    QueryDef("events_sessionize", (s, d) =>
      EventTime.sessionizeBatch(eventsUs(s, d), "user_id", "ts_us", UsPerHour),
      Some(s"""
      WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        marks AS (
          SELECT user_id, t,
            CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) > ${UsPerHour}
                 THEN 1 ELSE 0 END AS new_s
          FROM e),
        sess AS (
          SELECT user_id, t,
            CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY t) AS BIGINT) AS session_id
          FROM marks)
      SELECT user_id, session_id, COUNT(*) AS n_events,
             MIN(t) AS session_start, MAX(t) AS session_end
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id""")),

    QueryDef("event_summary", (s, d) =>
      eventsUs(s, d).groupBy(col("event_type").as("bank"))
        .agg(
          count(lit(1)).as("total_counts"),
          count_distinct(col("user_id")).as("n_users"),
          sumd(col("value")).as("sum_value"),
          min(col("ts_us")).as("min_ts_us"),
          max(col("ts_us")).as("max_ts_us"))
        .orderBy("bank"),
      Some("""
      SELECT event_type AS bank, COUNT(*) AS total_counts,
        COUNT(DISTINCT user_id) AS n_users,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us
      FROM events GROUP BY event_type ORDER BY bank""")),

    // Ordered funnel over the event stream (view -> click -> purchase,
    // strictly sequential per user) — graft.ops.Funnel; per-step filtered
    // aggregations keyed on user_id, no stream-wide window.
    QueryDef("q_funnel", (s, d) =>
      graft.ops.Funnel.counts(eventsUs(s, d), "user_id", "ts_us",
        "event_type", Seq("view", "click", "purchase")),
      Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
             WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT s1.user_id, MIN(e.t) AS t2 FROM s1 JOIN e
             ON e.user_id = s1.user_id AND e.event_type = 'click'
                AND e.t >= s1.t1 GROUP BY 1),
      s3 AS (SELECT s2.user_id, MIN(e.t) AS t3 FROM s2 JOIN e
             ON e.user_id = s2.user_id AND e.event_type = 'purchase'
                AND e.t >= s2.t2 GROUP BY 1)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_type,
               (SELECT COUNT(*) FROM s1) AS n_users
        UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
      ORDER BY step""")),

    // Funnel with per-transition conversion windows ("click within 1 h of
    // view, purchase within 1 day of click") — same filtered-agg shape as
    // q_funnel with one extra predicate per step; a conversion outside
    // its window stalls the user even if later events exist.
    QueryDef("q_funnel_window", (s, d) =>
      graft.ops.Funnel.counts(eventsUs(s, d), "user_id", "ts_us",
        "event_type", Seq("view", "click", "purchase"),
        maxGaps = Seq(3600000000L, 86400000000L)),
      Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
             WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT s1.user_id, MIN(e.t) AS t2 FROM s1 JOIN e
             ON e.user_id = s1.user_id AND e.event_type = 'click'
                AND e.t >= s1.t1 AND e.t <= s1.t1 + 3600000000 GROUP BY 1),
      s3 AS (SELECT s2.user_id, MIN(e.t) AS t3 FROM s2 JOIN e
             ON e.user_id = s2.user_id AND e.event_type = 'purchase'
                AND e.t >= s2.t2 AND e.t <= s2.t2 + 86400000000 GROUP BY 1)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_type,
               (SELECT COUNT(*) FROM s1) AS n_users
        UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
      ORDER BY step""")),

    // Weekly cohort retention: cohort = the epoch-week of a user's first
    // event; one row per (cohort, week offset) with distinct active
    // users. Two aggregations keyed on user_id / (cohort, offset) — the
    // user-activity matrix never materializes wider than its distinct
    // (user, week) pairs.
    QueryDef("q_cohort_retention", (s, d) => {
      val wkUs = 7L * 24 * 3600 * 1000000L
      val userWeeks = eventsUs(s, d)
        .select(col("user_id"), expr(s"ts_us div $wkUs").as("wk"))
        .distinct()
      val cohorts = userWeeks.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      cohorts.join(userWeeks, "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort_wk", "week_offset")
    }, Some("""
      WITH uw AS (SELECT DISTINCT user_id,
                    epoch_us(ts) // 604800000000 AS wk FROM events),
      c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY 1)
      SELECT c.cohort_wk, uw.wk - c.cohort_wk AS week_offset,
             COUNT(DISTINCT c.user_id) AS n_users
      FROM c JOIN uw ON uw.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("daslogs_stats", (s, d) => {
      val ev = t(s, d, "events")
        .withColumn("value_numeric", graft.etl.NexusEtl.valueNumeric(
          expr("""replace(replace(props, '{"k": ', ''), '}', '')""")))
      ev.groupBy(col("event_type").as("log_name"))
        .agg(
          count(lit(1)).as("n_points"),
          (sumd(col("value")) / count(lit(1))).as("average_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          sum(col("value_numeric")).cast("double").as("sum_k"))
        .orderBy("log_name")
    }, Some("""
      SELECT event_type AS log_name, COUNT(*) AS n_points,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS average_value,
        MIN(value) AS min_value, MAX(value) AS max_value,
        CAST(SUM(TRY_CAST(replace(replace(props, '{"k": ', ''), '}', '') AS DOUBLE)) AS DOUBLE) AS sum_k
      FROM events GROUP BY event_type ORDER BY log_name""")),

    QueryDef("value_numeric", (s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        graft.etl.NexusEtl.valueNumeric(
          expr("""replace(replace(props, '{"k": ', ''), '}', '')"""))
          .as("value_numeric"))
        .orderBy("event_id"),
      Some("""
      SELECT event_id,
        TRY_CAST(replace(replace(props, '{"k": ', ''), '}', '') AS DOUBLE) AS value_numeric
      FROM events ORDER BY event_id""")),

    QueryDef("replay_kafka_shape", (s, d) => {
      val ev = t(s, d, "events").select("event_id", "user_id", "event_type")
      graft.streaming.Replay.kafkaShape(ev, "user_id")
        .withColumn("event_id", get_json_object(col("value"), "$.event_id").cast("long"))
        .orderBy("event_id")
    }, Some("""
      SELECT CAST(user_id AS VARCHAR) AS key,
        CAST(to_json(struct_pack(event_id := event_id, user_id := user_id,
                                 event_type := event_type)) AS VARCHAR) AS value,
        event_id
      FROM events ORDER BY event_id""")),

    // ================================================================
    // LLM-data-pipeline operators: dedup / text / similarity / media
    // ================================================================

    QueryDef("stratified_sample", (s, d) =>
      graft.ops.Sampling.stratified(
          t(s, d, "documents").select("doc_id", "lang"),
          "doc_id", "lang",
          rates = Map("en" -> 1.0, "de" -> 0.5, "zh" -> 0.25),
          defaultRate = 0.1)
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id, lang FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
        CASE lang WHEN 'en' THEN 'g0000000'
                  WHEN 'de' THEN '80000000'
                  WHEN 'zh' THEN '40000000'
                  ELSE '1999999a' END
      ORDER BY doc_id""")),

    QueryDef("doc_fingerprint", (s, d) =>
      TextAnalysis.fingerprints(t(s, d, "documents"), "text", "doc_id")
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id, md5(lower(replace(text, ' ', ''))) AS fingerprint
      FROM documents ORDER BY doc_id""")),

    QueryDef("text_stats", (s, d) =>
      TextAnalysis.textStats(t(s, d, "documents"), "text", "doc_id")
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id,
        CAST(LENGTH(text) AS BIGINT) AS n_chars,
        CAST(LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
          / (LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1) AS avg_word_len
      FROM documents ORDER BY doc_id""")),

    QueryDef("dedup_segments", (s, d) =>
      // word-level segments on the single-line testdata corpus: the
      // mechanics (global first-occurrence by (id, pos), order-preserving
      // reassembly, all-dropped docs kept) are separator-independent
      Dedup.dedupSegments(t(s, d, "documents"), "text", "doc_id", sep = " ")
        .orderBy("doc_id"),
      Some("""
      WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      segs AS (SELECT doc_id, CAST(t.pos AS BIGINT) AS pos, ws[pos] AS seg
               FROM base, UNNEST(range(1, len(ws) + 1)) AS t(pos)),
      kept AS (SELECT doc_id, pos, seg FROM (
                 SELECT doc_id, pos, seg,
                   ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
                 FROM segs)
               WHERE rn = 1),
      ka AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text_kept,
                    CAST(COUNT(*) AS BIGINT) AS n_kept
             FROM kept GROUP BY 1),
      tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs FROM segs GROUP BY 1)
      SELECT tot.doc_id, COALESCE(ka.text_kept, '') AS text_kept,
        COALESCE(ka.n_kept, 0) AS n_kept,
        tot.n_segs - COALESCE(ka.n_kept, 0) AS n_dropped
      FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id
      ORDER BY tot.doc_id""")),

    QueryDef("q_salted_join", (s, d) => {
      // planned-salt join (Skew.saltedJoin): result must equal the plain
      // equi-join — the salt spreads each hot key over saltFactor
      // reducers and disappears from the output
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") < 30000)
        .select(col("l_orderkey").as("okey"), col("l_linenumber"),
          dec(col("l_quantity")).cast("double").as("qty"))
      val ords = t(s, d, "orders")
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.ops.Skew.saltedJoin(li, ords, "okey", "l_linenumber", 8)
        .orderBy("okey", "l_linenumber")
    }, Some("""
      SELECT l_orderkey AS okey, l_linenumber,
        CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty,
        o_orderpriority
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_orderkey < 30000
      ORDER BY okey, l_linenumber""")),

    // Statistical aggregates with cross-engine-exact arithmetic: built-in
    // stddev/corr stream doubles in engine-specific orders (never
    // hash-comparable), so the moments come from EXACT integer-cent sums
    // (decimal(38,0) in Spark, HUGEINT in DuckDB) and every double is
    // derived by the same single division/sqrt of the same exact integers.
    QueryDef("q_stats_agg", (s, d) => {
      val qi = (dec(col("l_quantity")) * 100).cast("decimal(38,0)")
      val pi = (dec(col("l_extendedprice")) * 100).cast("decimal(38,0)")
      val g = t(s, d, "lineitem")
        .select(col("l_returnflag"), qi.as("qi"), pi.as("pi"))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("qi")).cast("decimal(38,0)").as("sx"),
          sum(col("qi") * col("qi")).cast("decimal(38,0)").as("sxx"),
          sum(col("pi")).cast("decimal(38,0)").as("sy"),
          sum(col("pi") * col("pi")).cast("decimal(38,0)").as("syy"),
          sum(col("qi") * col("pi")).cast("decimal(38,0)").as("sxy"))
      val varNum = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      val varDen = (col("n") * (col("n") - 1)).cast("double") * 1e4
      g.select(col("l_returnflag"),
          col("n").cast("long").as("n"),
          (varNum / varDen).as("var_qty"),
          sqrt(varNum / varDen).as("stddev_qty"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
             sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }, Some("""
      WITH c AS (
        SELECT l_returnflag,
          CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS HUGEINT) AS qi,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS pi
        FROM lineitem),
      s AS (
        SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
          SUM(qi) AS sx, SUM(qi*qi) AS sxx,
          SUM(pi) AS sy, SUM(pi*pi) AS syy, SUM(qi*pi) AS sxy
        FROM c GROUP BY 1)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        CAST(n*sxx - sx*sx AS DOUBLE) / (CAST(n*(n-1) AS DOUBLE) * 1e4) AS var_qty,
        SQRT(CAST(n*sxx - sx*sx AS DOUBLE) / (CAST(n*(n-1) AS DOUBLE) * 1e4)) AS stddev_qty,
        CAST(n*sxy - sx*sy AS DOUBLE) /
          (SQRT(CAST(n*sxx - sx*sx AS DOUBLE)) * SQRT(CAST(n*syy - sy*sy AS DOUBLE)))
          AS corr_qty_price
      FROM s ORDER BY l_returnflag""")),

    QueryDef("q_histogram", (s, d) =>
      t(s, d, "lineitem")
        .select(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 500000")
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 500000
               AS bucket,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    QueryDef("q_bool_agg", (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          bool_and(col("l_quantity") > 1).as("all_multi"),
          bool_or(dec(col("l_discount")) > 0.09).as("any_deep_discount"),
          sum(when(dec(col("l_discount")) > 0.09, 1L).otherwise(0L))
            .as("n_deep_discount"))
        .orderBy("l_returnflag"),
      Some("""
      SELECT l_returnflag,
        BOOL_AND(l_quantity > 1) AS all_multi,
        BOOL_OR(CAST(l_discount AS DECIMAL(18,2)) > 0.09) AS any_deep_discount,
        CAST(SUM(CASE WHEN CAST(l_discount AS DECIMAL(18,2)) > 0.09
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_deep_discount
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("upsample_mix", (s, d) =>
      // 2.3 "epochs" of the documents source: 2 copies always, a 3rd for
      // the deterministic md5-fraction of ids below 0.3
      graft.ops.Sampling.upsampled(
          t(s, d, "documents").select("doc_id"), "doc_id", 2.3)
        .orderBy("doc_id", "copy"),
      Some("""
      WITH c AS (SELECT doc_id,
        2 + CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '4ccccccc'
                 THEN 1 ELSE 0 END AS n
        FROM documents)
      SELECT doc_id, CAST(t.c AS BIGINT) AS copy
      FROM c, UNNEST(range(0, n)) AS t(c)
      ORDER BY doc_id, copy""")),

    QueryDef("vocab_topk", (s, d) =>
      TextAnalysis.buildVocab(t(s, d, "documents"), "text",
          minCount = 5L, topV = 100L)
        .orderBy("token_id"),
      Some("""
      WITH w AS (SELECT UNNEST(list_filter(string_split_regex(text, ' +'),
                   w -> w <> '')) AS word FROM documents),
      c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1
            HAVING COUNT(*) >= 5),
      r AS (SELECT word, n,
              CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) - 1 AS BIGINT)
                AS token_id
            FROM c)
      SELECT word, n, token_id FROM r WHERE token_id < 100
      ORDER BY token_id""")),

    QueryDef("encode_docs", (s, d) => {
      val docs = t(s, d, "documents")
      // token_ids is emitted as a space-joined string: the driver's
      // pandas comparator sorts column values before hashing and a raw
      // array<long> cell is unhashable there (r4's one red row). Same
      // shape trick doc_chunks uses; semantics unchanged.
      TextAnalysis.encodeDocs(docs, "text", "doc_id",
          TextAnalysis.buildVocab(docs, "text", minCount = 5L, topV = 100L))
        .select(col("doc_id"),
          concat_ws(" ", col("token_ids").cast("array<string>")).as("token_ids"))
        .orderBy("doc_id")
    }, Some("""
      WITH vw AS (SELECT UNNEST(list_filter(string_split_regex(text, ' +'),
                    w -> w <> '')) AS word FROM documents),
      c AS (SELECT word, COUNT(*) AS n FROM vw GROUP BY 1 HAVING COUNT(*) >= 5),
      r AS (SELECT word,
              CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) - 1 AS BIGINT)
                AS token_id
            FROM c),
      vocab AS (SELECT word, token_id FROM r WHERE token_id < 100),
      base AS (SELECT doc_id,
          list_filter(string_split_regex(text, ' +'), w -> w <> '') AS ws
        FROM documents),
      w AS (SELECT doc_id, CAST(t.pos AS BIGINT) AS pos, ws[pos] AS word
            FROM base, UNNEST(range(1, len(ws) + 1)) AS t(pos)),
      enc AS (SELECT doc_id,
          array_to_string(list(COALESCE(v.token_id, -1) ORDER BY w.pos), ' ')
            AS token_ids
        FROM w LEFT JOIN vocab v USING (word) GROUP BY doc_id)
      -- empty/all-space docs keep a row with an empty encoding, matching
      -- the Spark side's posexplode_outer per-document contract
      SELECT b.doc_id, COALESCE(e.token_ids, '') AS token_ids
      FROM base b LEFT JOIN enc e USING (doc_id) ORDER BY b.doc_id""")),

    QueryDef("doc_chunks", (s, d) =>
      TextAnalysis.chunkDocs(t(s, d, "documents"), "text", "doc_id",
          chunkWords = 64, overlapWords = 16)
        .orderBy("doc_id", "chunk_id"),
      Some("""
      WITH base AS (SELECT doc_id,
          list_filter(string_split_regex(text, ' +'), w -> w <> '') AS ws
        FROM documents),
      -- GREATEST guard: an empty doc still yields one empty chunk (Spark's
      -- (size-1) div 48 truncates -1/48 to 0; DuckDB's // floors to -1)
      ex AS (
        SELECT doc_id, ws,
          UNNEST(range(0, GREATEST((len(ws) - 1) // 48, 0) + 1)) AS chunk_id
        FROM base)
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        CAST(chunk_id * 48 AS BIGINT) AS word_start,
        CAST(LEAST(len(ws) - chunk_id * 48, 64) AS BIGINT) AS n_chunk_words,
        array_to_string(ws[(chunk_id * 48 + 1):(chunk_id * 48 + 64)], ' ') AS chunk_text
      FROM ex ORDER BY doc_id, chunk_id""")),

    QueryDef("token_count", (s, d) =>
      TextAnalysis.tokenCounts(t(s, d, "documents"), "text", "doc_id")
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id,
        CAST(LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1 AS BIGINT) AS n_ws_tokens,
        CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS n_bpe_est
      FROM documents ORDER BY doc_id""")),

    QueryDef("lang_id", (s, d) =>
      TextAnalysis.langId(t(s, d, "documents"), "text", "doc_id")
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id,
        CAST(CASE WHEN POSITION(' the ' IN text) > 0 THEN 1 ELSE 0 END
           + CASE WHEN POSITION(' and ' IN text) > 0 THEN 1 ELSE 0 END
           + CASE WHEN POSITION(' of ' IN text) > 0 THEN 1 ELSE 0 END AS BIGINT) AS en_hits,
        CASE WHEN (CASE WHEN POSITION(' the ' IN text) > 0 THEN 1 ELSE 0 END
                 + CASE WHEN POSITION(' and ' IN text) > 0 THEN 1 ELSE 0 END
                 + CASE WHEN POSITION(' of ' IN text) > 0 THEN 1 ELSE 0 END) >= 2
             THEN 'en' ELSE 'other' END AS lang_pred
      FROM documents ORDER BY doc_id""")),

    // PII redaction over documents with deterministically planted PII
    // (the synthetic corpus has none): same RE2-subset regexes run
    // verbatim in both engines; counts audit the scrub.
    QueryDef("pii_redaction", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("contact user"), col("doc_id"),
            lit("@example.com or 10.0."), pmod(col("doc_id"), lit(200)),
            lit(".7 phone 555-867-530"), pmod(col("doc_id"), lit(10)),
            lit(" "), substring(col("text"), 1, 80)).as("text"))
        .transform(df => TextAnalysis.redactPiiReport(df, "text", "doc_id"))
        .orderBy("doc_id"),
      Some("""
      WITH planted AS (
        SELECT doc_id,
          'contact user' || doc_id || '@example.com or 10.0.' || (doc_id % 200)
            || '.7 phone 555-867-530' || (doc_id % 10) || ' '
            || substr(text, 1, 80) AS text
        FROM documents)
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
          '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS redacted,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        CAST(len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phones
      FROM planted ORDER BY doc_id""")),

    // C4-style cleaning (Raffel et al. 2020 §2.2) over a deterministically
    // planted multi-line corpus (the synthetic docs are single-line): the
    // same RE2-subset line-deletion regexes run verbatim in both engines;
    // md5 of the cleaned text makes the whole line filter hash-exact.
    QueryDef("c4_clean", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(
            lit("The opening line carries five words.\n"),
            substring(col("text"), 1, 60), lit("\n"),
            lit("short line\n"),
            lit("Enable JavaScript to continue reading this page.\n"),
            lit("Line group "), pmod(col("doc_id"), lit(7)),
            lit(" keeps exactly six words.\n"),
            when(pmod(col("doc_id"), lit(11)) === 0,
              lit("if (x) { return; }\n")).otherwise(lit("")),
            when(pmod(col("doc_id"), lit(13)) === 0,
              lit("Lorem ipsum dolor sit amet.\n")).otherwise(lit("")),
            lit("A closing line also has words?")).as("text"))
        .transform(df => TextAnalysis.c4Clean(df, "text", "doc_id"))
        .select(col("doc_id"), col("kept"),
          md5(col("clean_text")).as("clean_md5"),
          col("n_lines_kept"), col("n_lines_total"))
        .orderBy("doc_id"),
      Some("""
      WITH planted AS (
        SELECT doc_id,
          'The opening line carries five words.' || chr(10)
          || substr(text, 1, 60) || chr(10)
          || 'short line' || chr(10)
          || 'Enable JavaScript to continue reading this page.' || chr(10)
          || 'Line group ' || (doc_id % 7) || ' keeps exactly six words.' || chr(10)
          || CASE WHEN doc_id % 11 = 0 THEN 'if (x) { return; }' || chr(10) ELSE '' END
          || CASE WHEN doc_id % 13 = 0 THEN 'Lorem ipsum dolor sit amet.' || chr(10) ELSE '' END
          || 'A closing line also has words?' AS text
        FROM documents),
      cleaned AS (
        SELECT doc_id, text,
          (position('{' IN text) > 0 OR position('}' IN text) > 0
           OR position('lorem ipsum' IN lower(text)) > 0) AS dropped,
          regexp_replace(regexp_replace(regexp_replace(text,
            '(?m)^[^\n]*(?i:javascript)[^\n]*\n?', '', 'g'),
            '(?m)^[^\n]*[^.!?"\n]$\n?', '', 'g'),
            '(?m)^ *(?:[^ \n]+(?: +[^ \n]+){0,3})? *$\n?', '', 'g') AS lf
        FROM planted)
      SELECT doc_id,
        CAST(CASE WHEN dropped THEN 0 ELSE 1 END AS BIGINT) AS kept,
        md5(CASE WHEN dropped THEN '' ELSE lf END) AS clean_md5,
        CAST(len(regexp_extract_all(CASE WHEN dropped THEN '' ELSE lf END,
          '[^\n]+')) AS BIGINT) AS n_lines_kept,
        CAST(len(regexp_extract_all(text, '[^\n]+')) AS BIGINT) AS n_lines_total
      FROM cleaned ORDER BY doc_id""")),

    // Token-budget mixing: per-source prefix under a hard token budget.
    // The Spark side rides the scalable keyedRunningSum (range-partition
    // stitch, never a per-source one-reducer window); the oracle is the
    // SQL-obvious PARTITION BY window — equal output proves the
    // scalable form implements exactly the textbook semantics.
    QueryDef("token_budget_mix", (s, d) =>
      graft.ops.Sampling.tokenBudgetMix(
          t(s, d, "documents").select(col("doc_id"), col("source"),
            size(TextAnalysis.spaceTokens(col("text"))).cast("long")
              .as("n_tokens")),
          "source", "n_tokens", col("doc_id"), budgetPerStratum = 1000L)
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id, source, n_tokens, cum_tokens FROM (
        SELECT doc_id, source, n_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM (SELECT doc_id, source,
                CAST(len(list_filter(string_split(text, ' '),
                  w -> w <> '')) AS BIGINT) AS n_tokens
              FROM documents))
      WHERE cum_tokens <= 1000 ORDER BY doc_id""")),

    // Cross-source shingle-overlap matrix (corpus-slice audit): the
    // portable (raw-shingle-join) form so DuckDB replays the WHOLE
    // pipeline — shingling, per-slice distinct, pair join, complete
    // zero-included matrix. n=3 keeps real overlap present at sf0.01.
    QueryDef("cross_source_overlap", (s, d) =>
      Dedup.crossSourceOverlap(t(s, d, "documents"), "text", "source",
          n = 3, hashShingles = false)
        .orderBy("source_a", "source_b"),
      Some(s"""
      WITH sh AS (
        SELECT DISTINCT source, s FROM (
          SELECT source, unnest(${duckShingleList(3)}) AS s
          FROM (SELECT source, $DuckWords AS words FROM documents))),
      tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n
              FROM sh GROUP BY source),
      ov AS (SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared
             FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
             GROUP BY 1, 2)
      SELECT ta.source AS source_a, tb.source AS source_b,
        CAST(COALESCE(ov.n_shared, 0) AS BIGINT) AS n_shared,
        ta.n AS n_a, tb.n AS n_b
      FROM tot ta JOIN tot tb ON ta.source < tb.source
      LEFT JOIN ov ON ov.source_a = ta.source AND ov.source_b = tb.source
      ORDER BY source_a, source_b""")),

    // Gopher A1.1 document-level quality rules as per-rule audit flags:
    // every ratio gate is an integer cross-multiplication, so the whole
    // report is BIGINT and hash-exact; planted bullet/ellipsis/symbol
    // tails exercise each rule both ways across the corpus.
    QueryDef("gopher_quality", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(4)) === 0,
              lit("\n- a bullet line\n- another bullet line"))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(5)) === 0,
              lit("\nThis planted line trails off with an ellipsis..."))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(6)) === 0,
              lit(" ## # ### 42 7 99")).otherwise(lit(""))).as("text"))
        .transform(df => TextAnalysis.gopherQualityFlags(df, "text", "doc_id"))
        .orderBy("doc_id"),
      Some("""
      WITH planted AS (
        SELECT doc_id,
          text
          || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- a bullet line'
               || chr(10) || '- another bullet line' ELSE '' END
          || CASE WHEN doc_id % 5 = 0 THEN chr(10)
               || 'This planted line trails off with an ellipsis...' ELSE '' END
          || CASE WHEN doc_id % 6 = 0 THEN ' ## # ### 42 7 99' ELSE '' END AS text
        FROM documents),
      m AS (
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[^ \n]+')) AS BIGINT) AS n_words,
          CAST(len(regexp_extract_all(text, '[^\n]+')) AS BIGINT) AS n_lines,
          CAST(length(regexp_replace(text, '[ \n]', '', 'g')) AS BIGINT) AS word_chars,
          CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
          CAST(len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS n_ellipsis,
          CAST(len(regexp_extract_all(text, '(?m)^ *[-*]')) AS BIGINT) AS n_bullet,
          CAST(len(regexp_extract_all(text, '(?m)\.\.\.$')) AS BIGINT) AS n_ell_lines,
          CAST(len(regexp_extract_all(text, '[^ \n]*[A-Za-z][^ \n]*')) AS BIGINT) AS n_alpha,
          (CASE WHEN position(' the ' IN text) > 0 THEN 1 ELSE 0 END
           + CASE WHEN position(' and ' IN text) > 0 THEN 1 ELSE 0 END
           + CASE WHEN position(' of ' IN text) > 0 THEN 1 ELSE 0 END) AS stop_hits
        FROM planted)
      SELECT doc_id, n_words, n_lines,
        CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS ok_word_count,
        CAST(CASE WHEN word_chars >= 3*n_words AND word_chars <= 10*n_words THEN 1 ELSE 0 END AS BIGINT) AS ok_mean_word_len,
        CAST(CASE WHEN 10*(n_hash + n_ellipsis) <= n_words THEN 1 ELSE 0 END AS BIGINT) AS ok_symbol_ratio,
        CAST(CASE WHEN 10*n_bullet <= 9*n_lines THEN 1 ELSE 0 END AS BIGINT) AS ok_bullet_lines,
        CAST(CASE WHEN 10*n_ell_lines <= 3*n_lines THEN 1 ELSE 0 END AS BIGINT) AS ok_ellipsis_lines,
        CAST(CASE WHEN 5*n_alpha >= 4*n_words THEN 1 ELSE 0 END AS BIGINT) AS ok_alpha_words,
        CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS ok_stopwords,
        CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
          AND word_chars >= 3*n_words AND word_chars <= 10*n_words
          AND 10*(n_hash + n_ellipsis) <= n_words
          AND 10*n_bullet <= 9*n_lines
          AND 10*n_ell_lines <= 3*n_lines
          AND 5*n_alpha >= 4*n_words
          AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS gopher_pass
      FROM m ORDER BY doc_id""")),

    // Canonical dedup-key normalization (native NormalizeText codegen
    // expression: NFD + combining-mark strip, ROOT lowercase, whitespace
    // collapse). The planted prefix carries DECOMPOSED accent sequences
    // (e+U+0301, I+U+0308, n+U+0303); the oracle writes their ASCII fold
    // as literals and replays only the portable lowercase + collapse on
    // the ASCII remainder — deliberately no DuckDB unicode builtins (the
    // lottery lesson: version-sensitive oracle constructs are how a
    // correct operator fails a driver gate). Composed≡decomposed and the
    // full unicode contract are NormalizeTextSpec's job.
    QueryDef("text_normalize", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("Cafe\u0301  NAI\u0308VE Mun\u0303oz "),
            substring(col("text"), 1, 40),
            lit("   the  END")).as("text"))
        .transform(df => TextAnalysis.normalizeDocs(df, "text", "doc_id"))
        .orderBy("doc_id"),
      Some("""
      WITH folded AS (
        SELECT doc_id,
          'cafe  naive munoz ' || substr(text, 1, 40) || '   the  END' AS t
        FROM documents)
      SELECT doc_id,
        trim(regexp_replace(lower(t), ' +', ' ', 'g')) AS norm_text,
        CAST(length(trim(regexp_replace(lower(t), ' +', ' ', 'g')))
          AS BIGINT) AS norm_len
      FROM folded ORDER BY doc_id""")),

    // Normalization-aware exact dedup: case/whitespace variants planted
    // for doc_id<50 MUST collapse onto their base documents under the
    // normalized key. The corpus is ASCII, so DuckDB rederives the
    // normalized key portably (lower + space collapse) and the whole
    // duplicate-group relation — key, size, survivor — is a full
    // cross-engine compare at any scale.
    QueryDef("dedup_normalized", (s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val variants = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(lit("  "), upper(col("text")), lit("   ")).as("text"))
      TextAnalysis.normalizeDocs(docs.unionByName(variants), "text", "doc_id")
        .groupBy(md5(col("norm_text")).as("norm_key"))
        .agg(count(lit(1)).as("n_members"), min(col("doc_id")).as("min_doc_id"))
        .filter(col("n_members") > 1)
        .orderBy("norm_key")
    }, Some("""
      WITH alldocs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 20000, '  ' || upper(text) || '   '
        FROM documents WHERE doc_id < 50),
      k AS (SELECT doc_id,
              trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS nk
            FROM alldocs)
      SELECT md5(nk) AS norm_key, CAST(count(*) AS BIGINT) AS n_members,
             min(doc_id) AS min_doc_id
      FROM k GROUP BY nk HAVING count(*) > 1 ORDER BY norm_key""")),

    // HTML boilerplate strip over deterministically planted markup (the
    // synthetic corpus has none): the same RE2-subset regex chain runs
    // verbatim in both engines — script/style blocks, then tags, then
    // the five ubiquitous entities (&amp; last, the HTML-correct order),
    // then whitespace collapse. n_tags audits markup mass.
    QueryDef("html_strip", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(
            lit("<html><head><script type=\"text/javascript\">var x = 1 < 2; </script>"),
            lit("<style>p { color: red }</style></head><body><h1>Doc "),
            col("doc_id"),
            lit("</h1>\n<p class=\"intro\">"),
            substring(col("text"), 1, 60),
            lit(" &amp; more &lt;tags&gt; &quot;quoted&quot; &#39;q&#39;&nbsp;end</p></body></html>"))
            .as("text"))
        .transform(df => TextAnalysis.htmlStrip(df, "text", "doc_id"))
        .orderBy("doc_id"),
      Some("""
      WITH planted AS (
        SELECT doc_id,
          '<html><head><script type="text/javascript">var x = 1 < 2; </script>'
          || '<style>p { color: red }</style></head><body><h1>Doc ' || doc_id
          || '</h1>' || chr(10) || '<p class="intro">' || substr(text, 1, 60)
          || ' &amp; more &lt;tags&gt; &quot;quoted&quot; &#39;q&#39;&nbsp;end</p></body></html>'
          AS text
        FROM documents),
      stripped AS (
        SELECT doc_id, text,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
            '(?s)<[^>]*>', ' ', 'g'),
            '&nbsp;', ' ', 'g'),
            '&lt;', '<', 'g'),
            '&gt;', '>', 'g'),
            '&quot;', '"', 'g'),
            '&#39;', '''', 'g'),
            '&amp;', '&', 'g') AS decoded
        FROM planted)
      SELECT doc_id,
        trim(regexp_replace(decoded, '[ \t\n\r]+', ' ', 'g')) AS clean_text,
        CAST(len(regexp_extract_all(text, '(?s)<[^>]*>')) AS BIGINT) AS n_tags
      FROM stripped ORDER BY doc_id""")),

    // C4-style blocklist gate over planted placeholder tokens (word-exact
    // on lowercased whitespace tokens; the corpus itself is clean, so
    // hits are planted by doc_id arithmetic and the whole relation is
    // data-derived at any scale).
    QueryDef("blocklist_filter", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(7)) === 0, lit(" zorblag"))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(13)) === 0, lit(" QuxNoise zorblag"))
              .otherwise(lit(""))).as("text"))
        .transform(df => TextAnalysis.blocklistFlags(df, "text",
          Seq("zorblag", "QuxNoise")))
        .select("doc_id", "n_words", "n_blocked", "kept")
        .orderBy("doc_id"),
      Some("""
      WITH planted AS (
        SELECT doc_id, text
          || CASE WHEN doc_id % 7 = 0 THEN ' zorblag' ELSE '' END
          || CASE WHEN doc_id % 13 = 0 THEN ' QuxNoise zorblag' ELSE '' END
          AS text
        FROM documents),
      w AS (SELECT doc_id,
              list_filter(string_split(lower(text), ' '), x -> x <> '') AS words
            FROM planted)
      SELECT doc_id,
        CAST(len(words) AS BIGINT) AS n_words,
        CAST(len(list_filter(words,
          x -> list_contains(['zorblag', 'quxnoise'], x))) AS BIGINT) AS n_blocked,
        len(list_filter(words,
          x -> list_contains(['zorblag', 'quxnoise'], x))) = 0 AS kept
      FROM w ORDER BY doc_id""")),

    // URL parsing + blocked-domain gate over deterministically planted
    // URLs (the corpus has no URL column): the same RE2-subset regexes
    // run verbatim in both engines — scheme/host/path extraction,
    // userinfo/port strip, last-two-label registered domain, exact
    // domain-blocklist match. Every 11th doc gets a blocked ad-tracker
    // URL with userinfo+port+fragment to exercise every strip rule.
    QueryDef("url_filter", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(lit("http://User@ads.SpamSite.test:8080/track/"),
              col("doc_id"), lit("?x=1#f")))
          .otherwise(
            concat(lit("https://sub"), pmod(col("doc_id"), lit(5)),
              lit(".Example"), pmod(col("doc_id"), lit(20)),
              lit(".test/p/"), col("doc_id"), lit("/v?q=1"))).as("url"))
        .transform(df => graft.text.Web.urlFlags(df, "url",
          Seq("SpamSite.test")))
        .select("doc_id", "scheme", "host", "domain", "url_path", "kept")
        .orderBy("doc_id"),
      Some("""
      WITH planted AS (
        SELECT doc_id,
          CASE WHEN doc_id % 11 = 0
            THEN 'http://User@ads.SpamSite.test:8080/track/' || doc_id || '?x=1#f'
            ELSE 'https://sub' || (doc_id % 5) || '.Example' || (doc_id % 20)
                 || '.test/p/' || doc_id || '/v?q=1' END AS url
        FROM documents),
      p AS (
        SELECT doc_id,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
          lower(regexp_replace(regexp_replace(
            regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
            '^[^@]*@', ''), ':[0-9]+$', '')) AS host,
          regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
            AS url_path
        FROM planted),
      q AS (
        SELECT doc_id, scheme, host, url_path,
          CASE WHEN host LIKE '%.%'
               THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
               ELSE host END AS domain
        FROM p)
      SELECT doc_id, scheme, host, domain, url_path,
        NOT list_contains(['spamsite.test'], domain) AS kept
      FROM q ORDER BY doc_id""")),

    // Per-domain corpus profile over the same planted URLs: one shuffle
    // on the registered domain (the natural per-domain-cap key), doc
    // count + distinct-path count per domain, fully rederived in SQL.
    // robots.txt crawl gating (text/Robots + the native RobotsAllowed
    // expression, r14 — RFC 9309, the first etiquette gate a crawl
    // applies): planted per-domain robots bodies exercise prefix
    // rules, longest-match allow-over-disallow, and wildcard+anchor
    // patterns; URLs join their domain's parsed rules and the gate
    // evaluates per row in codegen. Domains with NO robots row allow
    // (the RFC default — the %11 spam domain here). DuckDB replays the
    // rule arithmetic with LIKE algebra. Data-derived at any scale.
    // robots.txt OPERATIONAL surface (text/Robots.rulesTable r15 —
    // what a crawl scheduler reads beyond allow/deny): the winning
    // group's crawl-delay (most-specific agent group, NOT the `*`
    // fallback's decoy value) and the file-global sitemap URLs as
    // audit columns. Bodies follow k-arithmetic; DuckDB rederives
    // delay/sitemap-count/rule-count from the formulas alone — a
    // group-selection or directive-parse bug corrupts a column.
    QueryDef("robots_audit", (s, d) => {
      import graft.text.Robots
      import s.implicits._
      val robots = (0 until 20).map { k =>
        val sm2 = if (k % 2 == 0) s"\nSitemap: https://example$k.test/s2.xml"
                  else ""
        (s"example$k.test",
          s"User-agent: graftbot\nDisallow: /p/\nCrawl-delay: $k.5\n" +
            s"User-agent: *\nCrawl-delay: 99\n" +
            s"Sitemap: https://example$k.test/s1.xml$sm2")
      }.toDF("host", "txt")
      Robots.rulesTable(robots, "host", "txt", agent = "graftbot/2.0")
        .select(col("host"),
          size(col("robots_rules")).as("n_rules"),
          col("crawl_delay"),
          size(col("sitemaps")).as("n_sitemaps"))
        .orderBy("host")
    }, Some("""
      SELECT 'example' || k || '.test' AS host,
        CAST(1 AS INTEGER) AS n_rules,
        CAST(k + 0.5 AS DOUBLE) AS crawl_delay,
        CAST(1 + (CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS INTEGER)
          AS n_sitemaps
      FROM (SELECT unnest(generate_series(0, 19)) AS k)
      ORDER BY host""")),

    QueryDef("robots_gate", (s, d) => {
      import graft.text.Robots
      import s.implicits._
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(lit("https://norobots.test/p/"), col("doc_id"),
              lit("/v")))
          .otherwise(
            concat(lit("https://example"), pmod(col("doc_id"), lit(20)),
              lit(".test/p/"), col("doc_id"), lit("/v"))).as("url"))
      def body(k: Int): String = k % 3 match {
        case 0 => "User-agent: graftbot\nDisallow: /p/1\n" +
          "User-agent: *\nDisallow: /"
        case 1 => "User-agent: *\nDisallow: /p/\nAllow: /p/2"
        case _ => "User-agent: *\nDisallow: /*/v$"
      }
      // keyed by HOST — the RFC authority scope the gate joins on
      val robots = (0 until 20)
        .map(k => (s"example$k.test", body(k)))
        .toDF("host", "txt")
      val rules = Robots.rulesTable(robots, "host", "txt",
        agent = "graftbot/2.0")
      Robots.gate(docs, "url", rules)
        .select("doc_id", "domain", "url_path", "robots_allowed", "kept")
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 11 = 0 THEN 'norobots.test'
             ELSE 'example' || (doc_id % 20) || '.test' END AS domain,
        '/p/' || doc_id || '/v' AS url_path,
        allowed AS robots_allowed,
        allowed AS kept
      FROM (
        SELECT doc_id,
          CASE
            WHEN doc_id % 11 = 0 THEN TRUE
            WHEN (doc_id % 20) % 3 = 0
              THEN NOT (CAST(doc_id AS VARCHAR) LIKE '1%')
            WHEN (doc_id % 20) % 3 = 1
              THEN CAST(doc_id AS VARCHAR) LIKE '2%'
            ELSE FALSE END AS allowed
        FROM documents)
      ORDER BY doc_id""")),

    QueryDef("domain_stats", (s, d) =>
      graft.text.Web.domainStats(
        t(s, d, "documents")
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(11)) === 0,
              concat(lit("http://User@ads.SpamSite.test:8080/track/"),
                col("doc_id"), lit("?x=1#f")))
            .otherwise(
              concat(lit("https://sub"), pmod(col("doc_id"), lit(5)),
                lit(".Example"), pmod(col("doc_id"), lit(20)),
                lit(".test/p/"), col("doc_id"), lit("/v?q=1"))).as("url")),
        "url")
        .orderBy("domain"),
      Some("""
      WITH planted AS (
        SELECT doc_id,
          CASE WHEN doc_id % 11 = 0
            THEN 'http://User@ads.SpamSite.test:8080/track/' || doc_id || '?x=1#f'
            ELSE 'https://sub' || (doc_id % 5) || '.Example' || (doc_id % 20)
                 || '.test/p/' || doc_id || '/v?q=1' END AS url
        FROM documents),
      p AS (
        SELECT doc_id,
          lower(regexp_replace(regexp_replace(
            regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
            '^[^@]*@', ''), ':[0-9]+$', '')) AS host,
          regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
            AS url_path
        FROM planted),
      q AS (
        SELECT doc_id, url_path,
          CASE WHEN host LIKE '%.%'
               THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
               ELSE host END AS domain
        FROM p)
      SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT url_path) AS BIGINT) AS n_paths
      FROM q GROUP BY domain ORDER BY domain""")),

    // Markdown-to-prose strip over planted markdown (htmlStrip's
    // companion for docs/wiki corpora): both engines run the same
    // RE2-subset chain; only the link backreference differs in SPELLING
    // (Spark '$1' vs RE2 '\1' replacement syntax — same semantics).
    QueryDef("markdown_strip", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("# Title "), pmod(col("doc_id"), lit(5)), lit("\n"),
            lit("> quoted words\n"),
            lit("- bullet **bold** and *ital*\n"),
            lit("See [docs "), pmod(col("doc_id"), lit(3)),
            lit("](https://docs.example/"), col("doc_id"),
            lit(") and ![logo](x.png)\n"),
            lit("```scala\n"),
            lit("code keeps "), pmod(col("doc_id"), lit(7)), lit("\n"),
            lit("```\n"),
            substring(col("text"), 1, 40)).as("text"))
        .transform(df => TextAnalysis.markdownStrip(df, "text", "doc_id"))
        .orderBy("doc_id"),
      Some("""
      WITH planted AS (
        SELECT doc_id,
          '# Title ' || (doc_id % 5) || chr(10)
          || '> quoted words' || chr(10)
          || '- bullet **bold** and *ital*' || chr(10)
          || 'See [docs ' || (doc_id % 3) || '](https://docs.example/' || doc_id
          || ') and ![logo](x.png)' || chr(10)
          || '```scala' || chr(10) || 'code keeps ' || (doc_id % 7) || chr(10)
          || '```' || chr(10) || substr(text, 1, 40) AS text
        FROM documents),
      c AS (
        SELECT doc_id, text,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '!\[[^\]]*\]\([^)]*\)', ' ', 'g'),
            '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g'),
            '(?m)^```[^\n]*$', ' ', 'g'),
            '(?m)^#{1,6} *', '', 'g'),
            '(?m)^> ?', '', 'g'),
            '(?m)^[-*+] +', '', 'g'),
            '\*+', '', 'g'),
            '`+', '', 'g') AS stripped
        FROM planted)
      SELECT doc_id,
        trim(regexp_replace(stripped, '[ \t\n\r]+', ' ', 'g')) AS clean_text,
        CAST(len(regexp_extract_all(text, '\[[^\]]*\]\([^)]*\)')) AS BIGINT)
          AS n_links,
        CAST(len(regexp_extract_all(text, '!\[[^\]]*\]\([^)]*\)')) AS BIGINT)
          AS n_images
      FROM c ORDER BY doc_id""")),

    // URL canonicalization for fetch-list dedup (the cheapest dedup of
    // all — no text needed): planted URLs carry uppercase scheme/host,
    // scheme-default ports, userinfo, tracking params, and fragments;
    // the oracle REDERIVES the expected canonical arithmetically from
    // doc_id (independent rederivation, not the same regex chain run
    // twice — the strongest oracle shape, like multimodal_dims). Docs in
    // the %4==0 and %4==2 families canonicalize onto the SAME URL
    // whenever their (mod 10, 7, 5) residues agree, so the dedup payoff
    // is exercised, not just the string rewrite.
    QueryDef("url_canonical", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit("HTTPS://WWW.Example"), pmod(col("doc_id"), lit(10)),
              lit(".TEST:443/Path/"), pmod(col("doc_id"), lit(7)),
              lit("?utm_source=x&id="), pmod(col("doc_id"), lit(5)),
              lit("&utm_campaign=y#frag")))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            concat(lit("http://user@host"), pmod(col("doc_id"), lit(10)),
              lit(".example:80/a?fbclid=abc")))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            concat(lit("https://www.example"), pmod(col("doc_id"), lit(10)),
              lit(".test/Path/"), pmod(col("doc_id"), lit(7)),
              lit("?id="), pmod(col("doc_id"), lit(5))))
          .otherwise(concat(lit("not a url "), col("doc_id"))).as("url"))
        .select(col("doc_id"),
          graft.text.Web.canonicalUrl(col("url")).as("canonical_url"))
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 4 IN (0, 2)
               THEN 'https://www.example' || (doc_id % 10) || '.test/Path/'
                    || (doc_id % 7) || '?id=' || (doc_id % 5)
             WHEN doc_id % 4 = 1 THEN 'http://host' || (doc_id % 10) || '.example/a'
             ELSE 'not a url ' || doc_id END AS canonical_url
      FROM documents ORDER BY doc_id""")),

    // Canonical-URL dedup groups over the same planted fetch list:
    // min-id survivor per canonical, groups >1 only — the %4==0/%4==2
    // collision families rederived arithmetically in DuckDB.
    QueryDef("url_dedup", (s, d) =>
      graft.text.Web.urlDedupGroups(
        t(s, d, "documents")
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(4)) === 0,
              concat(lit("HTTPS://WWW.Example"), pmod(col("doc_id"), lit(10)),
                lit(".TEST:443/Path/"), pmod(col("doc_id"), lit(7)),
                lit("?utm_source=x&id="), pmod(col("doc_id"), lit(5)),
                lit("&utm_campaign=y#frag")))
            .when(pmod(col("doc_id"), lit(4)) === 1,
              concat(lit("http://user@host"), pmod(col("doc_id"), lit(10)),
                lit(".example:80/a?fbclid=abc")))
            .when(pmod(col("doc_id"), lit(4)) === 2,
              concat(lit("https://www.example"), pmod(col("doc_id"), lit(10)),
                lit(".test/Path/"), pmod(col("doc_id"), lit(7)),
                lit("?id="), pmod(col("doc_id"), lit(5))))
            .otherwise(concat(lit("not a url "), col("doc_id"))).as("url")),
        "url", "doc_id")
        .orderBy("canonical_url"),
      Some("""
      WITH c AS (
        SELECT doc_id,
          CASE WHEN doc_id % 4 IN (0, 2)
                 THEN 'https://www.example' || (doc_id % 10) || '.test/Path/'
                      || (doc_id % 7) || '?id=' || (doc_id % 5)
               WHEN doc_id % 4 = 1 THEN 'http://host' || (doc_id % 10) || '.example/a'
               ELSE 'not a url ' || doc_id END AS canonical_url
        FROM documents)
      SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_copies,
             min(doc_id) AS keep_id
      FROM c GROUP BY canonical_url HAVING count(*) > 1
      ORDER BY canonical_url""")),

    // C4's remaining document-level rule — the three-sentence minimum —
    // over planted terminal punctuation (the synthetic docs are mostly
    // punctuation-free). Segmentation is the PORTABLE split-on-[.!?]+
    // definition (RE2 has no lookbehind, so a lookbehind split could
    // never be oracle-checked); abbreviation-naivety is identical in
    // both engines by construction.
    QueryDef("sentence_stats", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(substring(col("text"), 1, 50),
            lit(". Second sentence here! Third one? "),
            when(pmod(col("doc_id"), lit(3)) === 0, lit("Fourth sentence."))
              .otherwise(lit(""))).as("text"))
        .transform(df => TextAnalysis.sentenceStats(df, "text", "doc_id"))
        .orderBy("doc_id"),
      Some("""
      WITH planted AS (
        SELECT doc_id,
          substr(text, 1, 50) || '. Second sentence here! Third one? '
          || CASE WHEN doc_id % 3 = 0 THEN 'Fourth sentence.' ELSE '' END AS text
        FROM documents),
      s AS (
        SELECT doc_id,
          list_filter(list_transform(string_split_regex(text, '[.!?]+'),
            x -> trim(x)), x -> x <> '') AS sents
        FROM planted)
      SELECT doc_id, CAST(len(sents) AS BIGINT) AS n_sentences,
             len(sents) >= 3 AS ok_min_sentences
      FROM s ORDER BY doc_id""")),

    // Sentence explode with 0-based in-document index (the sentence-
    // granularity feed for segment dedup): full relation rederived.
    QueryDef("sentence_explode", (s, d) =>
      TextAnalysis.explodeSentences(
          t(s, d, "documents")
            .select(col("doc_id"),
              concat(substring(col("text"), 1, 50),
                lit(". Second sentence here! Third one? "),
                when(pmod(col("doc_id"), lit(3)) === 0, lit("Fourth sentence."))
                  .otherwise(lit(""))).as("text")),
          "text", "doc_id")
        .select(col("doc_id"), col("sent_idx").cast("long").as("sent_idx"),
          col("sentence"))
        .orderBy("doc_id", "sent_idx"),
      Some("""
      WITH planted AS (
        SELECT doc_id,
          substr(text, 1, 50) || '. Second sentence here! Third one? '
          || CASE WHEN doc_id % 3 = 0 THEN 'Fourth sentence.' ELSE '' END AS text
        FROM documents),
      s AS (
        SELECT doc_id,
          list_filter(list_transform(string_split_regex(text, '[.!?]+'),
            x -> trim(x)), x -> x <> '') AS sents
        FROM planted)
      SELECT doc_id, i - 1 AS sent_idx, sents[i] AS sentence
      FROM s, unnest(generate_series(1, len(sents))) AS u(i)
      ORDER BY doc_id, sent_idx""")),

    // The Brown-et-al Pareto quality lottery, cross-engine exact on a
    // PURE INTEGER substrate: the keep rule `q > 1 - pareto(u)` with
    // q = k/100 (k = doc_id%100) and u = m/16^15 (m = md5 15-hex-digit
    // uniform) is algebraically
    //   (16^15 - m) * (200 - k)^9 < 16^15 * 100^9
    // — no pow(), no float, no boundary guard; bit-identical across
    // engines/libm builds by construction (the r7/r8 1e-6-guarded float
    // form did NOT survive the driver environment's libm). Evaluated
    // division-first on both engines so nothing exceeds 128-bit/
    // DECIMAL(38,0): A*B < R ⟺ A <= (R-1) div B for positive integers.
    // r10 (the r9 verdict's prescription after a driver-only hash
    // mismatch with local byte-exactness): the compared relation is now
    // the FULL per-doc integer substrate — (doc_id, k, m, quotient,
    // kept), all BIGINT, over ALL documents — so the compare contains no
    // decimal, no filtered set, and no DuckDB-version-sensitive
    // construct; a residual mismatch localizes to a column. The oracle
    // parses the 15 md5 hex digits with an explicit strpos-ladder
    // polynomial (the '0x' string cast was version-dependent) and the
    // k/100.0 double→decimal cast is gone entirely.
    // The trained-classifier scoring that normally feeds this rule is
    // ScalaTest-pinned (QualityFilterSpec) — LR training has no
    // portable SQL.
    QueryDef("quality_pareto_lottery", (s, d) => {
      val scored = t(s, d, "documents")
        .select(col("doc_id"), (col("doc_id") % 100).cast("int").as("quality_pct"))
      graft.ops.QualityFilter.paretoLotteryDiagnostics(
          scored, "quality_pct", "doc_id", alpha = 9)
        .orderBy("doc_id")
    }, Some("""
      WITH s AS (
        SELECT doc_id, doc_id % 100 AS k,
          substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS h
        FROM documents),
      mm AS (
        SELECT doc_id, k,
            (strpos('0123456789abcdef', substring(h,  1, 1)) - 1) * 72057594037927936
          + (strpos('0123456789abcdef', substring(h,  2, 1)) - 1) * 4503599627370496
          + (strpos('0123456789abcdef', substring(h,  3, 1)) - 1) * 281474976710656
          + (strpos('0123456789abcdef', substring(h,  4, 1)) - 1) * 17592186044416
          + (strpos('0123456789abcdef', substring(h,  5, 1)) - 1) * 1099511627776
          + (strpos('0123456789abcdef', substring(h,  6, 1)) - 1) * 68719476736
          + (strpos('0123456789abcdef', substring(h,  7, 1)) - 1) * 4294967296
          + (strpos('0123456789abcdef', substring(h,  8, 1)) - 1) * 268435456
          + (strpos('0123456789abcdef', substring(h,  9, 1)) - 1) * 16777216
          + (strpos('0123456789abcdef', substring(h, 10, 1)) - 1) * 1048576
          + (strpos('0123456789abcdef', substring(h, 11, 1)) - 1) * 65536
          + (strpos('0123456789abcdef', substring(h, 12, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substring(h, 13, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substring(h, 14, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substring(h, 15, 1)) - 1) AS m
        FROM s),
      q AS (
        SELECT doc_id, k, m,
          1152921504606846975999999999999999999
            // (CAST(200 - k AS HUGEINT) * (200-k) * (200-k) * (200-k)
                * (200-k) * (200-k) * (200-k) * (200-k) * (200-k)) AS quotient
        FROM mm)
      SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(k AS BIGINT) AS k,
        CAST(m AS BIGINT) AS m, CAST(quotient AS BIGINT) AS quotient,
        CAST(CASE WHEN (1152921504606846976 - m) <= quotient
             THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM q ORDER BY doc_id""")),

    // CCNet perplexity filtering, cross-engine exact on its FULL integer
    // substrate (NgramLm.scoreCounts): the bigram LM is trained on the
    // doc_id%7==0 slice and scores the rest; the compare pins the exact
    // bigram/OOV counts AND the summed numerators/denominators of every
    // smoothed probability — so the model-lookup joins are verified
    // bit-exactly with NO float in the output (the r7 floored-CE+guard
    // form did not survive the driver environment's libm). The float
    // cross-entropy/perplexity on this substrate is NgramLmSpec's job.
    // Short docs keep their NULL-sums row (the per-document contract).
    QueryDef("lm_perplexity", (s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.text.NgramLm.train(
        docs.filter(col("doc_id") % 7 === 0), "text")
      graft.text.NgramLm.scoreCounts(
          docs.filter(col("doc_id") % 7 =!= 0), "text", "doc_id", model)
        .orderBy("doc_id")
    }, Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, ' +'),
                 w -> w <> '') AS t
        FROM documents),
      pairs AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
      p2 AS (
        SELECT doc_id, t[i] || ' ' || t[i+1] AS g, t[i] AS w1 FROM pairs),
      big AS (SELECT g, COUNT(*) AS c2 FROM p2 WHERE doc_id % 7 = 0 GROUP BY 1),
      ctx AS (SELECT w1, COUNT(*) AS c1 FROM p2 WHERE doc_id % 7 = 0 GROUP BY 1),
      v AS (SELECT COUNT(DISTINCT w) AS vs
            FROM (SELECT unnest(t) AS w FROM toks WHERE doc_id % 7 = 0)),
      scored AS (
        SELECT p.doc_id, COUNT(*) AS nb,
          SUM(CASE WHEN b.c2 IS NULL THEN 1 ELSE 0 END) AS oov,
          SUM(COALESCE(b.c2, 0) + 1) AS sum_num,
          SUM(COALESCE(c.c1, 0) + (SELECT vs FROM v)) AS sum_den
        FROM p2 p LEFT JOIN big b USING (g) LEFT JOIN ctx c USING (w1)
        WHERE p.doc_id % 7 <> 0 GROUP BY 1)
      SELECT d.doc_id, CAST(COALESCE(s.nb, 0) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(s.oov, 0) AS BIGINT) AS n_oov_bigrams,
        CAST(s.sum_num AS BIGINT) AS sum_num,
        CAST(s.sum_den AS BIGINT) AS sum_den
      FROM documents d LEFT JOIN scored s USING (doc_id)
      WHERE d.doc_id % 7 <> 0
      ORDER BY doc_id""")),

    // Deterministic training-order delivery, cross-engine exact end to
    // end: md5 hex strings order identically in both engines and every
    // derived value (position, round-robin shard, within-shard position)
    // is integer arithmetic on that order — no floats anywhere.
    QueryDef("corpus_shuffle", (s, d) =>
      graft.ops.Shuffling.sharded(
          t(s, d, "documents").select("doc_id"), "doc_id", "s42", 8)
        .select(col("doc_id"), col("shard"), col("pos_in_shard"))
        .orderBy("doc_id"),
      Some("""
      WITH r AS (SELECT doc_id,
        ROW_NUMBER() OVER (ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR)),
          doc_id) - 1 AS pos
        FROM documents)
      SELECT doc_id, CAST(pos % 8 AS BIGINT) AS shard,
        CAST(pos // 8 AS BIGINT) AS pos_in_shard
      FROM r ORDER BY doc_id""")),

    // Multi-source mixing: 2.3 epochs of the doc_id%3==0 slice against a
    // 0.5 subsample of the rest, interleaved by the seeded md5 order —
    // the deterministic-upsample logic is upsample_mix's oracle pattern
    // (floor(rate) copies + one more when md5(id) < the rate threshold),
    // and the mix position is integer rank on the composite-key md5.
    QueryDef("corpus_mix", (s, d) => {
      val docs = t(s, d, "documents").select("doc_id")
      graft.ops.Shuffling.mixCorpora(Seq(
          (docs.filter(col("doc_id") % 3 === 0), 2.3),
          (docs.filter(col("doc_id") % 3 =!= 0), 0.5)), "doc_id", "m7")
        .select(col("pos"), col("source_id"), col("doc_id"), col("copy"))
        .orderBy("pos")
    }, Some("""
      WITH a AS (SELECT doc_id,
          2 + CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        < '4ccccccc' THEN 1 ELSE 0 END AS n
        FROM documents WHERE doc_id % 3 = 0),
      b AS (SELECT doc_id,
          CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    < '80000000' THEN 1 ELSE 0 END AS n
        FROM documents WHERE doc_id % 3 <> 0),
      u AS (
        SELECT CAST(0 AS BIGINT) AS source_id, doc_id,
          CAST(t.c AS BIGINT) AS copy FROM a, UNNEST(range(0, n)) t(c)
        UNION ALL
        SELECT CAST(1 AS BIGINT), doc_id, CAST(t.c AS BIGINT)
        FROM b, UNNEST(range(0, n)) t(c)),
      k AS (SELECT *, md5('m7:' || CAST(source_id AS VARCHAR) || ':' ||
              CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR)) AS key
            FROM u)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY key, source_id, doc_id, copy)
               - 1 AS BIGINT) AS pos,
        source_id, doc_id, copy
      FROM k ORDER BY pos""")),

    // Deterministic k-way split assignment (hash-threshold buckets over
    // the md5 fraction — weights 8/1/1 exercise normalization). Exact:
    // lowercase-hex string comparison is identical in both engines.
    QueryDef("corpus_split", (s, d) =>
      graft.ops.Sampling.assignSplit(
          t(s, d, "documents").select("doc_id"), "doc_id",
          Seq(("train", 8.0), ("val", 1.0), ("test", 1.0)))
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id,
        CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
               THEN 'train'
             WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
               THEN 'val'
             ELSE 'test' END AS split
      FROM documents ORDER BY doc_id""")),

    // BPE tokenizer end to end at the verify SF: train 200 merges on the
    // doc_id%10==0 slice (word-count shuffle + bounded driver merge
    // loop), encode the whole corpus with the native expression, and
    // emit integer-exact corpus statistics. BPE training has no portable
    // SQL, so the oracle pins the deterministic measured values at
    // sf0.01 (same pinned-literal pattern as ann_recall — train table,
    // tie-breaks, and encode are all deterministic by construction);
    // exact token-level semantics are ScalaTest-pinned in BpeSpec.
    // REGEN DEPENDENCY: like ann_recall, the pins assume the documents
    // table's seed-stable generator; re-measure on any content regen.
    // SCALE-ROBUST (r10): the old oracle pinned corpus-specific literals
    // (500 docs / 93 merges / 27165 tokens), failing by construction at
    // any other SF. The compared relation is now data-derived: DuckDB
    // rederives n_docs and the exact whitespace word count, while the
    // BPE-specific claims ride as identities a correct encoder satisfies
    // at ANY scale — losslessness (every doc's token sequence reassembles
    // to its normalized text, so n_lossless ≡ count(*)), the per-doc
    // token-count sandwich n_words <= n_bpe_tokens <= non-space chars,
    // and the structural vocab bound distinct_tokens <= alphabet+merges.
    // The driver-trained merge loop itself is not SQL-expressible; its
    // greedy-merge exactness is BpeSpec's classic-fixture job.
    // End-to-end IMAGE-TEXT curation (pipelines/MultimodalPipeline —
    // the multimodal twin of the text curation pipeline): six planted
    // sample classes by doc_id arithmetic — a good PNG+caption, a
    // byte-identical copy of the PREVIOUS doc's image (must drop as
    // near_dup with the smaller key surviving), a 2×2 image
    // (too_small), junk bytes (decode_failed), a missing image, and a
    // short caption — flow through decode gates, caption gates and the
    // banded-pHash near-dup clustering (maxHamming=0: candidacy is
    // exact hash equality, guaranteed for the planted copies). DuckDB
    // rederives every sample's keep/reason decision from the
    // arithmetic alone. Data-derived at any scale.
    QueryDef("multimodal_curation", (s, d) => {
      import graft.multimodal.PngCodec
      import graft.pipelines.MultimodalPipeline
      import s.implicits._
      // per-block PSEUDORANDOM pixels (splitmix-style) — images that
      // differ only by a constant offset or a uniform scale share their
      // DCT sign structure and thus their pHash, so a linear formula
      // would alias distinct seeds into one hash bucket; the decisions,
      // not the pixels, are what the SQL oracle rederives
      def png(seed: Long, w: Int, h: Int): Array[Byte] = {
        def mix(z0: Long): Long = {
          var z = z0 + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        PngCodec.encode(PngCodec.Image(w, h, 3,
          Array.tabulate(w * h * 3) { i =>
            val pix = i / 3
            val block = ((pix % w) / 4) * 64 + ((pix / w) / 4)
            ((mix(seed * 4099 + block) >>> (8 * (i % 3))) & 0xff).toByte
          }))
      }
      val samples = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val cls = id % 6
          val img: Option[Array[Byte]] = cls match {
            case 0 | 5 => Some(png(id, 16, 16))
            case 1 => Some(png(id - 1, 16, 16)) // copy of the previous doc
            case 2 => Some(png(id, 2, 2))
            case 3 => Some("not a png".getBytes("UTF-8"))
            case _ => None
          }
          val caption =
            if (cls == 5) "hi" else s"caption text for doc $id"
          (id, img.map("png" -> _).toMap +
            ("txt" -> caption.getBytes("UTF-8")))
        }.toDF("key", "files")
      MultimodalPipeline.curateImageText(s, samples, maxHamming = 0)
        .select(col("key").as("doc_id"), col("keep"), col("reason"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        doc_id % 6 = 0 AS keep,
        CASE doc_id % 6
          WHEN 0 THEN NULL
          WHEN 1 THEN 'near_dup'
          WHEN 2 THEN 'too_small'
          WHEN 3 THEN 'decode_failed'
          WHEN 4 THEN 'image_missing'
          ELSE 'caption_short' END AS reason
      FROM documents ORDER BY doc_id""")),

    // T5-style span corruption (text/SpanCorruption — the pretraining-
    // example generator): deterministic md5-seeded span masking over
    // whitespace tokens, sentinel inputs + span targets. The per-doc
    // RECONSTRUCTION IDENTITY (inputs with every sentinel re-expanded
    // ≡ the original tokens — a masking bug cannot survive it), the
    // terminator convention, and the corruption-fraction band ride as
    // in-Spark booleans folded to counts; DuckDB rederives doc and
    // token totals. Data-derived at any scale.
    QueryDef("span_corruption", (s, d) => {
      import graft.text.SpanCorruption
      import s.implicits._
      val rows = t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.spaceTokens(col("text")).as("tokens"))
        .as[(Long, Array[String])]
        .map { case (id, toks0) =>
          val toks = if (toks0 == null) Array.empty[String] else toks0
          val (in, tgt) = SpanCorruption.corruptTokens(
            toks, seed = 17L, docKey = id.toString,
            corruptRate = 0.15, meanSpanLen = 3)
          val ok = SpanCorruption.reconstruct(in, tgt).sameElements(toks)
          val nSpans = in.count(_.startsWith("<extra_id_"))
          val corrupted = toks.length - (in.length - nSpans)
          (id, toks.length.toLong, nSpans.toLong, corrupted.toLong, ok,
            tgt.lastOption.exists(_.startsWith("<extra_id_")))
        }.toDF("doc_id", "n_tokens", "n_spans", "n_corrupted", "ok", "term")
      rows.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_reconstruct_ok"),
          (sum(when(col("term"), 1L).otherwise(0L)) === count(lit(1)))
            .as("all_terminated"),
          // corpus-level corruption mass: CLT-tight at tens of
          // thousands of tokens, unlike any per-doc band
          (sum(col("n_corrupted")) * 100L > sum(col("n_tokens")) * 10L &&
            sum(col("n_corrupted")) * 100L < sum(col("n_tokens")) * 20L)
            .as("rate_in_band"),
          (sum(col("n_spans")) > 0L).as("spans_nonzero"))
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
          AS BIGINT) AS total_tokens,
        CAST(count(*) AS BIGINT) AS n_reconstruct_ok,
        TRUE AS all_terminated,
        TRUE AS rate_in_band,
        TRUE AS spans_nonzero
      FROM documents""")),

    // FIM fill-in-the-middle transformation (text/Infill r15 — the
    // code-model infilling example generator, Bavarian et al. 2022):
    // deterministic md5-driven selection/cuts/mode over whitespace
    // tokens; the per-doc reconstruction identity (original ≡
    // reassembled from the PSM/SPM output) and the sentinel/token-mass
    // conservation ride as in-Spark booleans, with corpus-level rate
    // bands (CLT-tight at corpus scale); DuckDB rederives doc and
    // token counts. Data-derived at any scale.
    QueryDef("fim_transform", (s, d) => {
      import graft.text.Infill
      import s.implicits._
      val rows = t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.spaceTokens(col("text")).as("tokens"))
        .as[(Long, Array[String])]
        .map { case (id, toks0) =>
          val toks = if (toks0 == null) Array.empty[String] else toks0
          val (mode, out) = Infill.fimTokens(
            toks, seed = 23L, docKey = id.toString,
            fimRate = 0.5, spmRate = 0.5)
          val ok = Infill.reconstruct(out).sameElements(toks)
          val massOk =
            if (mode == "ar") out.length == toks.length
            else out.length == toks.length + 3
          (id, toks.length.toLong, mode, ok, massOk)
        }.toDF("doc_id", "n_tokens", "mode", "ok", "mass_ok")
      rows.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(when(col("ok") && col("mass_ok"), 1L).otherwise(0L))
            .as("n_reconstruct_ok"),
          // selection and mode rates: CLT-tight bands at corpus scale
          (sum(when(col("mode") =!= "ar", 1L).otherwise(0L)) * 100L >
            count(lit(1)) * 40L &&
            sum(when(col("mode") =!= "ar", 1L).otherwise(0L)) * 100L <
              count(lit(1)) * 60L).as("fim_rate_in_band"),
          (sum(when(col("mode") === "spm", 1L).otherwise(0L)) * 100L >
            count(lit(1)) * 15L &&
            sum(when(col("mode") === "spm", 1L).otherwise(0L)) * 100L <
              count(lit(1)) * 35L).as("spm_rate_in_band"))
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
          AS BIGINT) AS total_tokens,
        CAST(count(*) AS BIGINT) AS n_reconstruct_ok,
        TRUE AS fim_rate_in_band,
        TRUE AS spm_rate_in_band
      FROM documents""")),

    // Source-code quality gates (text/CodeFilters r15 — The Stack /
    // StarCoder preprocessing: long-line + mean-line caps, the
    // alphanumeric floor, the base64/hex data-blob cap, the
    // auto-generated-header gate). Five planted classes by doc_id
    // arithmetic (clean, long line, autogen header, blob-dominated,
    // alnum-stripped); DuckDB REPLAYS EVERY RULE — line math, both
    // fractions, the header scan — so the per-class keep ledger is an
    // independent rederivation, not a rubber stamp. Data-derived at
    // any scale.
    QueryDef("code_quality", (s, d) => {
      import graft.text.CodeFilters
      val docs = t(s, d, "documents").select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 1,
          concat(col("text"), lit("\n"), repeat(lit("y"), 1200)))
        .when(pmod(col("doc_id"), lit(5)) === 2,
          concat(lit("// auto-generated. do not edit\n"), col("text")))
        .when(pmod(col("doc_id"), lit(5)) === 3,
          concat(substring(col("text"), 1, 20), repeat(lit("ab12"), 40)))
        .when(pmod(col("doc_id"), lit(5)) === 4,
          regexp_replace(col("text"), "[A-Za-z0-9]", "."))
        .otherwise(col("text")).as("text"))
      CodeFilters.codeGate(docs, "text")
        .groupBy(pmod(col("doc_id"), lit(5)).as("cls"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("max_line_len").cast("long")).as("sum_max_line"),
          sum(when(col("auto_generated"), 1L).otherwise(0L)).as("n_autogen"))
        .orderBy("cls")
    }, Some("""
      WITH planted AS (
        SELECT doc_id, doc_id % 5 AS cls,
          CASE doc_id % 5
            WHEN 1 THEN text || chr(10) || repeat('y', 1200)
            WHEN 2 THEN '// auto-generated. do not edit' || chr(10) || text
            WHEN 3 THEN substr(text, 1, 20) || repeat('ab12', 40)
            WHEN 4 THEN regexp_replace(text, '[A-Za-z0-9]', '.', 'g')
            ELSE text END AS t
        FROM documents),
      f AS (
        SELECT cls,
          list_max(list_transform(string_split(t, chr(10)),
            l -> len(l))) AS maxl,
          CAST(len(t) AS DOUBLE) /
            len(string_split(t, chr(10))) AS avgl,
          CASE WHEN len(t) = 0 THEN 0.0 ELSE
            CAST(len(t) - len(regexp_replace(t, '[A-Za-z0-9]', '', 'g'))
              AS DOUBLE) / len(t) END AS af,
          CASE WHEN len(t) = 0 THEN 0.0 ELSE
            CAST(coalesce(list_sum(list_transform(
              regexp_extract_all(t, '[0-9A-Fa-f+/=]{16,}'),
              m -> len(m))), 0) AS DOUBLE) / len(t) END AS bf,
          (lower(substr(t, 1, 300)) LIKE '%auto-generated%' OR
           lower(substr(t, 1, 300)) LIKE '%autogenerated%' OR
           lower(substr(t, 1, 300)) LIKE '%generated by%' OR
           lower(substr(t, 1, 300)) LIKE '%do not edit%') AS ag
        FROM planted)
      SELECT cls,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN maxl <= 1000 AND avgl <= 100.0 AND af >= 0.25
          AND bf <= 0.5 AND NOT ag THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(maxl) AS BIGINT) AS sum_max_line,
        CAST(sum(CASE WHEN ag THEN 1 ELSE 0 END) AS BIGINT) AS n_autogen
      FROM f GROUP BY cls ORDER BY cls""")),

    // Unigram-LM tokenizer (text/Unigram — SentencePiece's other
    // algorithm next to BPE: seed-and-PRUNE EM training, Viterbi
    // most-probable segmentation): trained on the %10 slice, encoding
    // ALL docs through the native log-domain Viterbi expression. The
    // bpe_stats oracle discipline — DuckDB rederives doc and word
    // counts, and the per-doc identities ride as in-Spark booleans:
    // losslessness (every token stream reassembles to the de-spaced
    // text, OOV chars included via the UNK floor), the word ≤ tokens ≤
    // non-space-chars sandwich, and the vocab bound (distinct tokens ≤
    // pieces + OOV alphabet). Data-derived at any scale; the EM/Viterbi
    // algebra itself is UnigramSpec's fixture job.
    QueryDef("unigram_stats", (s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.text.Unigram.train(
        docs.filter(col("doc_id") % 10 === 0), "text",
        vocabSize = 400, maxWords = 5000, emIters = 2)
      val enc = graft.text.Unigram.encodeDocs(docs, "text", "doc_id", model)
        .join(docs.select("doc_id", "text"), "doc_id")
        .select(col("doc_id"), col("uni_tokens"), col("n_uni_tokens"),
          size(TextAnalysis.spaceTokens(col("text"))).cast("long").as("n_words"),
          length(regexp_replace(col("text"), " +", "")).cast("long")
            .as("n_word_chars"),
          (concat_ws("", col("uni_tokens")) ===
            regexp_replace(col("text"), " +", "")).as("lossless"))
        .localCheckpoint()
      val distinctChars = docs.select(
          explode(split(regexp_replace(col("text"), " +", ""), "")).as("ch"))
        .filter(length(col("ch")) > 0)
        .agg(countDistinct(col("ch"))).head().getLong(0)
      enc.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          sum(when(col("lossless"), 1L).otherwise(0L)).as("n_lossless"),
          sum(when(col("n_uni_tokens") < col("n_words") ||
                   col("n_uni_tokens") > col("n_word_chars"), 1L)
            .otherwise(0L)).as("n_bounds_viol"))
        .crossJoin(enc.select(explode(col("uni_tokens")).as("tk"))
          .agg(countDistinct(col("tk")).as("distinct_tokens")))
        .select(col("n_docs"), col("total_words"), col("n_lossless"),
          (col("n_bounds_viol") === 0L).as("tokens_within_bounds"),
          (col("distinct_tokens") <=
            lit(model.pieces.length.toLong) + lit(distinctChars))
            .as("vocab_bounded"))
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
          AS BIGINT) AS total_words,
        CAST(count(*) AS BIGINT) AS n_lossless,
        TRUE AS tokens_within_bounds,
        TRUE AS vocab_bounded
      FROM documents""")),

    QueryDef("bpe_stats", (s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.text.Bpe.train(
        docs.filter(col("doc_id") % 10 === 0), "text",
        numMerges = 200, maxWords = 5000)
      val enc = graft.text.Bpe.encodeDocs(docs, "text", "doc_id", model)
        .join(docs.select("doc_id", "text"), "doc_id")
        .select(col("doc_id"), col("bpe_tokens"), col("n_bpe_tokens"),
          size(TextAnalysis.spaceTokens(col("text"))).cast("long").as("n_words"),
          length(regexp_replace(col("text"), " +", "")).cast("long")
            .as("n_word_chars"),
          (trim(regexp_replace(concat_ws("", col("bpe_tokens")), "</w>", " "))
            === trim(regexp_replace(col("text"), " +", " "))).as("lossless"))
        .localCheckpoint()
      enc.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          sum(when(col("lossless"), 1L).otherwise(0L)).as("n_lossless"),
          sum(when(col("n_bpe_tokens") < col("n_words") ||
                   col("n_bpe_tokens") > col("n_word_chars"), 1L)
            .otherwise(0L)).as("n_bounds_viol"))
        .crossJoin(enc.select(explode(col("bpe_tokens")).as("tk"))
          .agg(countDistinct(col("tk")).as("distinct_tokens")))
        .select(col("n_docs"), col("total_words"), col("n_lossless"),
          (col("n_bounds_viol") === 0L).as("tokens_within_bounds"),
          (col("distinct_tokens") <= lit(256L + model.merges.length))
            .as("vocab_bounded"))
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
          AS BIGINT) AS total_words,
        CAST(count(*) AS BIGINT) AS n_lossless,
        TRUE AS tokens_within_bounds,
        TRUE AS vocab_bounded
      FROM documents""")),

    // BYTE-LEVEL BPE (r14 — the GPT-2 discipline: words pass the
    // byte↔unicode bijection before merging, so the base alphabet is
    // CLOSED at 256 symbols and production tokenizers never emit UNK):
    // trained on the %10 ASCII slice only, then encoding a corpus with
    // PLANTED out-of-alphabet docs (accents, CJK, emoji the training
    // never saw). Per-doc identities ride as in-Spark booleans:
    // losslessness through the byte-level DECODE (every token stream
    // restores the exact de-spaced text, planted docs included) and
    // alphabet closure (every token spells only byte-alphabet chars —
    // the zero-UNK claim); DuckDB rederives doc/word counts incl. the
    // planted suffix arithmetic. Data-derived at any scale.
    QueryDef("bpe_byte_stats", (s, d) => {
      import graft.text.{Bpe, ByteLevel}
      import s.implicits._
      val plantedSuffix = "héllo wörld " +
        "日本語テキスト " +
        "🚀🌍 café"
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 200)
        .select((col("doc_id") + 50000).as("doc_id"),
          concat(col("text"), lit(" " + plantedSuffix)).as("text"))
      val corpus = docs.unionByName(planted)
      val model = Bpe.train(docs.filter(col("doc_id") % 10 === 0), "text",
        numMerges = 200, maxWords = 5000, byteLevel = true)
      val image = ByteLevel.byteToCp.map(_.toChar).toSet
      val enc = Bpe.encodeDocs(corpus, "text", "doc_id", model)
        .join(corpus, "doc_id")
        .select(col("doc_id"), col("bpe_tokens"), col("text"))
        .as[(Long, Seq[String], String)]
        .map { case (id, toks, text) =>
          val lossless =
            Bpe.decodeTokens(model, toks) == text.replaceAll(" +", "")
          val inAlpha =
            toks.forall(_.stripSuffix("</w>").forall(image))
          val nWords = text.split(" +").count(_.nonEmpty).toLong
          (id, lossless, inAlpha, nWords, id >= 50000L)
        }.toDF("doc_id", "lossless", "in_alpha", "n_words", "planted")
      enc.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          sum(when(col("lossless"), 1L).otherwise(0L)).as("n_lossless"),
          (sum(when(col("in_alpha"), 0L).otherwise(1L)) === 0L)
            .as("alphabet_closed"),
          sum(when(col("planted"), 1L).otherwise(0L)).as("n_planted"),
          (sum(when(col("planted") && !col("lossless"), 1L).otherwise(0L))
            === 0L).as("planted_all_lossless"))
    }, Some("""
      WITH corpus AS (
        SELECT doc_id, text, FALSE AS planted FROM documents
        UNION ALL
        SELECT doc_id + 50000,
          text || ' héllo wörld 日本語テキスト 🚀🌍 café',
          TRUE
        FROM documents WHERE doc_id < 200)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
          AS BIGINT) AS total_words,
        CAST(count(*) AS BIGINT) AS n_lossless,
        TRUE AS alphabet_closed,
        CAST(count(*) FILTER (WHERE planted) AS BIGINT) AS n_planted,
        TRUE AS planted_all_lossless
      FROM corpus""")),

    // Unigram BYTE FALLBACK (r14 — SentencePiece --byte_fallback:
    // out-of-alphabet characters emit their UTF-8 bytes as <0xNN>
    // pieces, surrogate pairs reunited first, so the vocabulary is
    // CLOSED and nothing ever maps to UNK): trained on the %10 ASCII
    // slice, encoding planted accents/CJK/emoji docs. Booleans:
    // losslessness through decodeTokens and vocabulary closure (every
    // emitted piece ∈ trained pieces ∪ the 256 byte pieces). DuckDB
    // rederives doc/word counts. Data-derived at any scale.
    QueryDef("unigram_byte_stats", (s, d) => {
      import graft.text.Unigram
      import s.implicits._
      val plantedSuffix = "héllo wörld " +
        "日本語テキスト " +
        "🚀🌍 café"
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 200)
        .select((col("doc_id") + 50000).as("doc_id"),
          concat(col("text"), lit(" " + plantedSuffix)).as("text"))
      val corpus = docs.unionByName(planted)
      val model = Unigram.train(docs.filter(col("doc_id") % 10 === 0),
        "text", vocabSize = 400, maxWords = 5000, emIters = 2,
        byteFallback = true)
      val vocab = model.vocabPieces.map(_._1).toSet
      val enc = Unigram.encodeDocs(corpus, "text", "doc_id", model)
        .join(corpus, "doc_id")
        .select(col("doc_id"), col("uni_tokens"), col("text"))
        .as[(Long, Seq[String], String)]
        .map { case (id, toks, text) =>
          val lossless =
            Unigram.decodeTokens(toks, model) == text.replaceAll(" +", "")
          val inVocab = toks.forall(vocab)
          val nWords = text.split(" +").count(_.nonEmpty).toLong
          (id, lossless, inVocab, nWords, id >= 50000L,
            toks.exists(_.startsWith("<0x")))
        }.toDF("doc_id", "lossless", "in_vocab", "n_words", "planted",
          "used_bytes")
      enc.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          sum(when(col("lossless"), 1L).otherwise(0L)).as("n_lossless"),
          (sum(when(col("in_vocab"), 0L).otherwise(1L)) === 0L)
            .as("vocab_closed"),
          sum(when(col("planted"), 1L).otherwise(0L)).as("n_planted"),
          (sum(when(col("planted") && !col("used_bytes"), 1L).otherwise(0L))
            === 0L).as("planted_all_hit_fallback"))
    }, Some("""
      WITH corpus AS (
        SELECT doc_id, text, FALSE AS planted FROM documents
        UNION ALL
        SELECT doc_id + 50000,
          text || ' héllo wörld 日本語テキスト 🚀🌍 café',
          TRUE
        FROM documents WHERE doc_id < 200)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
          AS BIGINT) AS total_words,
        CAST(count(*) AS BIGINT) AS n_lossless,
        TRUE AS vocab_closed,
        CAST(count(*) FILTER (WHERE planted) AS BIGINT) AS n_planted,
        TRUE AS planted_all_hit_fallback
      FROM corpus""")),

    // WORDPIECE tokenizer (text/WordPiece r15 — BERT's family, the
    // third next to BPE and unigram: likelihood-scored merge training
    // freq(ab)/(freq(a)·freq(b)), greedy longest-match-first inference
    // with ##-continuations and whole-word [UNK] collapse): trained on
    // the %10 slice, encoding a corpus with PLANTED docs carrying an
    // out-of-alphabet word (the 'ø' the ASCII training never saw) that
    // MUST collapse to [UNK]. Per-doc identities ride as in-Spark
    // booleans: encode CONSISTENCY (every word is spelled exactly by
    // its pieces or consumed by exactly one [UNK], the stream exhausts
    // — WordPiece.consistent, the identity that holds even with UNKs),
    // vocabulary closure (every token ∈ vocab ∪ {[UNK]}), and the
    // words ≤ tokens ≤ non-space-chars sandwich ([UNK] words emit one
    // token). DuckDB rederives doc/word counts incl. the planted
    // arithmetic. Data-derived at any scale.
    QueryDef("wordpiece_stats", (s, d) => {
      import graft.text.WordPiece
      import s.implicits._
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 200)
        .select((col("doc_id") + 50000).as("doc_id"),
          concat(col("text"), lit(" zøq")).as("text"))
      val corpus = docs.unionByName(planted)
      val model = WordPiece.train(docs.filter(col("doc_id") % 10 === 0),
        "text", vocabSize = 500, maxWords = 5000)
      val vocab = model.vocab.toSet + model.unk
      val enc = WordPiece.encodeDocs(corpus, "text", "doc_id", model)
        .join(corpus, "doc_id")
        .select(col("doc_id"), col("wp_tokens"), col("text"))
        .as[(Long, Seq[String], String)]
        .map { case (id, toks, text) =>
          val words = text.split(" +").filter(_.nonEmpty).toSeq
          val ok = WordPiece.consistent(words, toks, model)
          val inVocab = toks.forall(vocab)
          val nChars = words.map(_.length.toLong).sum
          val bounds = toks.length >= words.length && toks.length <= nChars
          (id, ok, inVocab, bounds, words.length.toLong, id >= 50000L,
            toks.contains(model.unk))
        }.toDF("doc_id", "ok", "in_vocab", "bounds", "n_words", "planted",
          "has_unk")
      enc.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_consistent"),
          (sum(when(col("in_vocab"), 0L).otherwise(1L)) === 0L)
            .as("vocab_closed"),
          (sum(when(col("bounds"), 0L).otherwise(1L)) === 0L)
            .as("tokens_within_bounds"),
          sum(when(col("planted"), 1L).otherwise(0L)).as("n_planted"),
          (sum(when(col("planted") && !col("has_unk"), 1L).otherwise(0L))
            === 0L).as("planted_all_unk"))
    }, Some("""
      WITH corpus AS (
        SELECT doc_id, text, FALSE AS planted FROM documents
        UNION ALL
        SELECT doc_id + 50000, text || ' zøq', TRUE
        FROM documents WHERE doc_id < 200)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
          AS BIGINT) AS total_words,
        CAST(count(*) AS BIGINT) AS n_consistent,
        TRUE AS vocab_closed,
        TRUE AS tokens_within_bounds,
        CAST(count(*) FILTER (WHERE planted) AS BIGINT) AS n_planted,
        TRUE AS planted_all_unk
      FROM corpus""")),

    // Conversation VALIDATION (text/Chat r15 — the SFT front gate:
    // role-alternation, system-position, termination, empty-turn
    // checks with first-failure-wins reasons): five planted defect
    // classes by doc_id%7 arithmetic (alternation break, emptied
    // first turn, dropped final turn, misplaced system, unknown
    // role); DuckDB REPLAYS the synthesis, the planting, and EVERY
    // rule incl. the reason precedence — the per-class reason ledger
    // is an independent rederivation. Data-derived at any scale.
    QueryDef("chat_validate", (s, d) => {
      import graft.text.Chat
      val docs = t(s, d, "documents").select(col("doc_id").as("key"),
        col("doc_id").as("src"), col("text"))
      val base = chatTurns(docs, "key", "src", "text")
      val cls = pmod(col("doc_id"), lit(7))
      val planted = base
        .withColumn("role",
          when(cls === 1 && col("idx") === col("sys") + 1, "user")
            .when(cls === 4 && col("idx") === col("sys") + 2, "system")
            .when(cls === 5 && col("idx") === col("sys"), "narrator")
            .otherwise(col("role")))
        .withColumn("content",
          when(cls === 2 && col("idx") === col("sys"), "")
            .otherwise(col("content")))
        .filter(!(cls === 3 && col("idx") === col("total") - 1))
      Chat.validate(planted, "doc_id", "idx", "role", "content")
        .groupBy(pmod(col("doc"), lit(7)).as("cls"))
        .agg(count(lit(1)).as("n_convs"),
          sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("reason") === "bad_role", 1L).otherwise(0L))
            .as("n_bad_role"),
          sum(when(col("reason") === "system_position", 1L).otherwise(0L))
            .as("n_sys_pos"),
          sum(when(col("reason") === "alternation", 1L).otherwise(0L))
            .as("n_alternation"),
          sum(when(col("reason") === "ends_with_user", 1L).otherwise(0L))
            .as("n_ends_user"),
          sum(when(col("reason") === "empty_turn", 1L).otherwise(0L))
            .as("n_empty"),
          sum(col("n_turns")).as("total_turns"))
        .orderBy("cls")
    }, Some(s"""
      WITH d0 AS (
        SELECT doc_id AS key, doc_id AS src, text FROM documents),
      $chatTurnsSql,
      planted AS (
        SELECT doc_id, idx, sys,
          CASE WHEN doc_id % 7 = 1 AND idx = sys + 1 THEN 'user'
               WHEN doc_id % 7 = 4 AND idx = sys + 2 THEN 'system'
               WHEN doc_id % 7 = 5 AND idx = sys THEN 'narrator'
               ELSE role END AS role,
          CASE WHEN doc_id % 7 = 2 AND idx = sys THEN ''
               ELSE content END AS content
        FROM turns
        WHERE NOT (doc_id % 7 = 3 AND idx = total - 1)),
      flags AS (
        SELECT doc_id, idx, role, content,
          max(CASE WHEN idx = 0 AND role = 'system' THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id) AS lead_sys
        FROM planted),
      v AS (
        SELECT doc_id,
          count(*) AS n_turns,
          max(lead_sys) AS sys_lead,
          max(CASE WHEN role NOT IN ('system','user','assistant')
            THEN 1 ELSE 0 END) AS any_bad,
          max(CASE WHEN role = 'system' AND idx <> 0 THEN 1 ELSE 0 END)
            AS any_syspos,
          max(CASE WHEN role IN ('user','assistant') AND role <>
              (CASE WHEN (idx - lead_sys) % 2 = 0
                THEN 'user' ELSE 'assistant' END)
            THEN 1 ELSE 0 END) AS any_alt,
          max(CASE WHEN len(trim(content)) = 0 THEN 1 ELSE 0 END)
            AS any_empty,
          arg_max(role, idx) AS last_role
        FROM flags GROUP BY doc_id),
      r AS (
        SELECT doc_id, n_turns,
          CASE WHEN any_bad = 1 THEN 'bad_role'
               WHEN any_syspos = 1 THEN 'system_position'
               WHEN n_turns - sys_lead = 0 THEN 'no_turns'
               WHEN any_alt = 1 THEN 'alternation'
               WHEN last_role <> 'assistant' THEN 'ends_with_user'
               WHEN any_empty = 1 THEN 'empty_turn'
               ELSE 'ok' END AS reason
        FROM v)
      SELECT doc_id % 7 AS cls,
        CAST(count(*) AS BIGINT) AS n_convs,
        CAST(sum(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_valid,
        CAST(sum(CASE WHEN reason = 'bad_role' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_bad_role,
        CAST(sum(CASE WHEN reason = 'system_position' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_sys_pos,
        CAST(sum(CASE WHEN reason = 'alternation' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_alternation,
        CAST(sum(CASE WHEN reason = 'ends_with_user' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_ends_user,
        CAST(sum(CASE WHEN reason = 'empty_turn' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_empty,
        CAST(sum(n_turns) AS BIGINT) AS total_turns
      FROM r GROUP BY 1 ORDER BY 1""")),

    // Chat-template RENDERING + assistant LOSS SPANS (text/Chat r15 —
    // ChatML markers, the generation-prompt variant, and the character
    // ranges a trainer masks loss to): the extraction identity
    // (substring(rendered, start, end) ≡ the assistant turn's content,
    // for EVERY span) rides as an in-Spark boolean; DuckDB
    // independently rederives doc counts, total rendered mass, the
    // generation-prompt delta (+22 chars/doc = '<|im_start|>' + (9)
    // 'assistant' + newline), span counts and span mass from the same
    // synthesis. Data-derived at any scale.
    QueryDef("chat_render_mask", (s, d) => {
      import graft.text.Chat
      val docs = t(s, d, "documents").select(col("doc_id").as("key"),
        col("doc_id").as("src"), col("text"))
      val turns = chatTurns(docs, "key", "src", "text")
      val rendered = Chat.render(turns, "doc_id", "idx", "role", "content")
      val renderedGen = Chat.render(turns, "doc_id", "idx", "role",
        "content", addGenerationPrompt = true)
      val spans = Chat.lossSpans(turns, "doc_id", "idx", "role", "content")
      val spanChk = spans
        .join(rendered.withColumnRenamed("doc", "rdoc"),
          col("doc") === col("rdoc"))
        .join(turns.select(col("doc_id").as("tdoc"), col("idx").as("tidx"),
            col("content")),
          col("doc") === col("tdoc") && col("idx") === col("tidx"))
        .select(col("doc"),
          (col("rendered").substr((col("start_char") + 1).cast("int"),
            (col("end_char") - col("start_char")).cast("int"))
            === col("content")).as("span_ok"),
          (col("end_char") - col("start_char")).as("mass"))
      val agg1 = rendered.agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      val agg2 = renderedGen.agg(sum(col("n_chars")).as("total_chars_gen"))
      val agg3 = spanChk.agg(count(lit(1)).as("n_spans"),
        sum(col("mass")).as("span_mass"),
        (sum(when(col("span_ok"), 0L).otherwise(1L)) === 0L)
          .as("extract_ok"))
      agg1.crossJoin(agg2).crossJoin(agg3)
    }, Some(s"""
      WITH d0 AS (
        SELECT doc_id AS key, doc_id AS src, text FROM documents),
      $chatTurnsSql,
      pieces AS (
        SELECT doc_id, idx, role, content,
          '<|im_start|>' || role || chr(10) || content ||
            '<|im_end|>' || chr(10) AS piece
        FROM turns),
      per_doc AS (
        SELECT doc_id, sum(len(piece)) AS n_chars,
          count(*) FILTER (WHERE role = 'assistant') AS n_spans,
          coalesce(sum(len(content)) FILTER (WHERE role = 'assistant'), 0)
            AS span_mass
        FROM pieces GROUP BY doc_id)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(sum(n_chars) + 22 * count(*) AS BIGINT) AS total_chars_gen,
        CAST(sum(n_spans) AS BIGINT) AS n_spans,
        CAST(sum(span_mass) AS BIGINT) AS span_mass,
        TRUE AS extract_ok
      FROM per_doc""")),

    // SECOND-TEMPLATE rendering (text/Chat.Template presets r16 —
    // Mistral's [INST] format, the preset that exercises the per-role
    // prefix/suffix OVERRIDE path: role names never render): the same
    // turns frame rendered under Template.Mistral, with the loss-span
    // extraction identity re-proven against the override-aware prefix
    // arithmetic. DuckDB replays the per-role CASE rendering; span
    // mass stays template-independent (it is content length), so a
    // wrong prefix length flips extract_ok while the masses still
    // match — both are pinned. Data-derived at any scale.
    QueryDef("chat_render_mistral", (s, d) => {
      import graft.text.Chat
      val docs = t(s, d, "documents").select(col("doc_id").as("key"),
        col("doc_id").as("src"), col("text"))
      val turns = chatTurns(docs, "key", "src", "text")
      val tpl = Chat.Template.Mistral
      val rendered = Chat.render(turns, "doc_id", "idx", "role", "content",
        tpl)
      val spans = Chat.lossSpans(turns, "doc_id", "idx", "role", "content",
        tpl)
      val spanChk = spans
        .join(rendered.withColumnRenamed("doc", "rdoc"),
          col("doc") === col("rdoc"))
        .join(turns.select(col("doc_id").as("tdoc"), col("idx").as("tidx"),
            col("content")),
          col("doc") === col("tdoc") && col("idx") === col("tidx"))
        .select(col("doc"),
          (col("rendered").substr((col("start_char") + 1).cast("int"),
            (col("end_char") - col("start_char")).cast("int"))
            === col("content")).as("span_ok"),
          (col("end_char") - col("start_char")).as("mass"))
      val agg1 = rendered.agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      val agg3 = spanChk.agg(count(lit(1)).as("n_spans"),
        sum(col("mass")).as("span_mass"),
        (sum(when(col("span_ok"), 0L).otherwise(1L)) === 0L)
          .as("extract_ok"))
      agg1.crossJoin(agg3)
    }, Some(s"""
      WITH d0 AS (
        SELECT doc_id AS key, doc_id AS src, text FROM documents),
      $chatTurnsSql,
      pieces AS (
        SELECT doc_id, idx, role, content,
          CASE WHEN role = 'assistant' THEN ' ' || content || '</s>'
               ELSE '[INST] ' || content || ' [/INST]' END AS piece
        FROM turns),
      per_doc AS (
        SELECT doc_id, sum(len(piece)) AS n_chars,
          count(*) FILTER (WHERE role = 'assistant') AS n_spans,
          coalesce(sum(len(content)) FILTER (WHERE role = 'assistant'), 0)
            AS span_mass
        FROM pieces GROUP BY doc_id)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(sum(n_spans) AS BIGINT) AS n_spans,
        CAST(sum(span_mass) AS BIGINT) AS span_mass,
        TRUE AS extract_ok
      FROM per_doc""")),

    // Conversation-level EXACT DEDUP (text/Chat r15 — hash the ordered
    // role/content stream with control-char separators, keep the
    // smallest id per group): docs with doc_id%10=7 get the
    // conversation of doc_id-7 PLANTED verbatim (synthesis keyed on
    // the donor), so each collides with its donor and must lose to
    // it; DuckDB replays synthesis, hashing (portable md5 substrate)
    // and the min-id winner rule. The cohort ledger pins that every
    // class-7 conversation is dropped and its donor kept.
    QueryDef("chat_dedup", (s, d) => {
      import graft.text.Chat
      val docs = t(s, d, "documents").select("doc_id", "text")
      val donors = docs.select(col("doc_id").as("key"),
        when(pmod(col("doc_id"), lit(10)) === 7, col("doc_id") - 7)
          .otherwise(col("doc_id")).as("src"))
        .join(docs.select(col("doc_id").as("src2"), col("text")),
          col("src") === col("src2"))
      val turns = chatTurns(donors, "key", "src", "text")
      Chat.dedupConversations(turns, "doc_id", "idx", "role", "content",
          hashOf = md5)
        .groupBy(pmod(col("doc"), lit(10)).as("cohort"))
        .agg(count(lit(1)).as("n_convs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("cohort")
    }, Some(s"""
      WITH d0 AS (
        SELECT d.doc_id AS key,
          CASE WHEN d.doc_id % 10 = 7 THEN d.doc_id - 7
               ELSE d.doc_id END AS src,
          dd.text
        FROM documents d
        JOIN documents dd ON dd.doc_id =
          CASE WHEN d.doc_id % 10 = 7 THEN d.doc_id - 7 ELSE d.doc_id END),
      $chatTurnsSql,
      hashes AS (
        SELECT doc_id,
          md5(string_agg(coalesce('v' || role, chr(0)) || chr(1) ||
            coalesce('v' || content, chr(0)), chr(2) ORDER BY idx))
            AS h
        FROM turns GROUP BY doc_id),
      k AS (
        SELECT doc_id, h,
          doc_id = min(doc_id) OVER (PARTITION BY h) AS kept
        FROM hashes)
      SELECT doc_id % 10 AS cohort,
        CAST(count(*) AS BIGINT) AS n_convs,
        CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM k GROUP BY 1 ORDER BY 1""")),

    // Repo-context concatenation (text/CodeFilters.repoConcat r15 —
    // StarCoder2's repo-level grouping: files ordered by path inside
    // one <repo_name>/<file_sep>-framed training doc): repos and paths
    // derived from doc_id arithmetic; DuckDB replays the grouping, the
    // path ordering, and the exact framing — the md5 of every repo
    // document is the cross-engine identity, so one misplaced
    // separator or a wrong sort order flips the hash. Data-derived at
    // any scale.
    QueryDef("code_repo_concat", (s, d) => {
      import graft.text.CodeFilters
      val files = t(s, d, "documents").select(
        pmod(col("doc_id"), lit(97)).as("repo"),
        concat(lit("src/f"), col("doc_id").cast("string"), lit(".txt"))
          .as("path"),
        col("text"))
      CodeFilters.repoConcat(files, "repo", "path", "text")
        .select(col("repo"), col("n_files"), col("n_chars"),
          md5(col("repo_text")).as("repo_md5"))
        .orderBy("repo")
    }, Some("""
      WITH files AS (
        SELECT doc_id % 97 AS repo,
          'src/f' || doc_id || '.txt' AS path, text
        FROM documents),
      repos AS (
        SELECT repo,
          '<repo_name>' || repo || '<file_sep>' ||
            string_agg(path || chr(10) || text, '<file_sep>'
              ORDER BY path) AS repo_text,
          count(*) AS n_files
        FROM files GROUP BY repo)
      SELECT repo, CAST(n_files AS BIGINT) AS n_files,
        CAST(len(repo_text) AS BIGINT) AS n_chars,
        md5(repo_text) AS repo_md5
      FROM repos ORDER BY repo""")),

    // Preference-PAIR construction (text/Chat.preferencePairs r15 —
    // the DPO/RLHF-data shape: among completions sharing a prompt,
    // best-vs-worst by score with deterministic tie-breaks): prompt
    // groups of five by doc_id div 5, scores from modular arithmetic
    // (ties INCLUDED — (doc_id*7)%13 collides inside groups, so the
    // tie-break rule is exercised, not dodged); DuckDB replays
    // grouping, ranking, tie-breaks, and the margin. Data-derived at
    // any scale.
    QueryDef("preference_pairs", (s, d) => {
      import graft.text.Chat
      val comps = t(s, d, "documents").select(
        expr("doc_id div 5").as("g"),
        col("doc_id"),
        pmod(col("doc_id") * 7, lit(13)).as("score"),
        array_join(slice(TextAnalysis.spaceTokens(col("text")), 1, 6), " ")
          .as("completion"))
      Chat.preferencePairs(comps, "g", "doc_id", "score", "completion")
        .select(col("prompt_hash").as("g"), col("chosen_doc"),
          col("rejected_doc"), col("margin"),
          length(col("chosen_text")).cast("long").as("chosen_len"),
          length(col("rejected_text")).cast("long").as("rejected_len"))
        .orderBy("g")
    }, Some("""
      WITH comps AS (
        SELECT doc_id // 5 AS g, doc_id,
          (doc_id * 7) % 13 AS score,
          coalesce(array_to_string(list_slice(
            list_filter(string_split(text, ' '), w -> w <> ''),
            1, 6), ' '), '') AS completion
        FROM documents),
      ranked AS (
        SELECT g, doc_id, score, completion,
          row_number() OVER (PARTITION BY g
            ORDER BY score DESC, doc_id ASC) AS rb,
          row_number() OVER (PARTITION BY g
            ORDER BY score ASC, doc_id DESC) AS rw,
          count(*) OVER (PARTITION BY g) AS n
        FROM comps),
      chosen AS (SELECT g, doc_id AS chosen_doc, score AS cs,
          completion AS ct FROM ranked WHERE rb = 1 AND n >= 2),
      rejected AS (SELECT g, doc_id AS rejected_doc, score AS rs,
          completion AS rt FROM ranked WHERE rw = 1 AND n >= 2)
      SELECT c.g, chosen_doc, rejected_doc,
        CAST(cs - rs AS BIGINT) AS margin,
        CAST(len(ct) AS BIGINT) AS chosen_len,
        CAST(len(rt) AS BIGINT) AS rejected_len
      FROM chosen c JOIN rejected r ON c.g = r.g
      WHERE chosen_doc <> rejected_doc
      ORDER BY c.g""")),

    // TOKEN-level loss masks (text/Chat.tokenLossMask r15 — the "pack
    // then mask" shape: per-conversation running token offsets, loss
    // only on assistant ranges): whitespace-token substrate so DuckDB
    // replays offsets EXACTLY (window prefix sums over the same
    // synthesis); per-turn start/end are cross-engine VALUES, not
    // booleans. Data-derived at any scale.
    QueryDef("sft_token_mask", (s, d) => {
      import graft.text.Chat
      val docs = t(s, d, "documents").select(col("doc_id").as("key"),
        col("doc_id").as("src"), col("text"))
      val turns = chatTurns(docs, "key", "src", "text")
      Chat.tokenLossMask(turns, "doc_id", "idx", "role", "content")
        .select(col("doc").as("doc_id"), col("idx").cast("long").as("idx"),
          col("tok_start"), col("tok_end"))
        .orderBy("doc_id", "idx")
    }, Some(s"""
      WITH d0 AS (
        SELECT doc_id AS key, doc_id AS src, text FROM documents),
      $chatTurnsSql,
      counted AS (
        SELECT doc_id, idx, role,
          CAST(len(list_filter(string_split(content, ' '), w -> w <> ''))
            AS BIGINT) AS n
        FROM turns),
      offs AS (
        SELECT doc_id, idx, role, n,
          coalesce(sum(n) OVER (PARTITION BY doc_id ORDER BY idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS tok_start
        FROM counted)
      SELECT doc_id, CAST(idx AS BIGINT) AS idx,
        CAST(tok_start AS BIGINT) AS tok_start,
        CAST(tok_start + n AS BIGINT) AS tok_end
      FROM offs WHERE role = 'assistant'
      ORDER BY doc_id, idx""")),

    // PACKED loss masks (r15 — the ops SNAP TOGETHER: tokenLossMask's
    // per-conversation assistant ranges lifted into packSequences'
    // global packed stream, max 64 tokens/sequence): abs offsets =
    // conversation stream start + local mask; seq_first/seq_last name
    // the training sequences each span touches. packSequences' prefix
    // sum is the scalable globalRunningSum (range partition + stitch);
    // DuckDB replays it as a plain window sum over the same synthesis.
    // Every output is a cross-engine VALUE. Data-derived at any scale.
    QueryDef("sft_pack_mask", (s, d) => {
      import graft.text.Chat
      val docs = t(s, d, "documents").select(col("doc_id").as("key"),
        col("doc_id").as("src"), col("text"))
      val turns = chatTurns(docs, "key", "src", "text")
      val perConv = turns.groupBy(col("doc_id")).agg(
        sum(size(TextAnalysis.spaceTokens(col("content"))).cast("long"))
          .as("nt"))
      val packed = TextAnalysis.packSequences(perConv, "doc_id", "nt",
        maxTokens = 64L)
      val mask = Chat.tokenLossMask(turns, "doc_id", "idx", "role",
        "content")
      mask.join(packed.select(col("doc_id").as("pdoc"),
          col("tok_start").as("conv_start")), col("doc") === col("pdoc"))
        .select(col("doc").as("doc_id"), col("idx").cast("long").as("idx"),
          (col("conv_start") + col("tok_start")).as("abs_start"),
          (col("conv_start") + col("tok_end")).as("abs_end"))
        .select(col("doc_id"), col("idx"), col("abs_start"), col("abs_end"),
          expr("abs_start div 64").as("seq_first"),
          expr("(abs_end - 1) div 64").as("seq_last"))
        .orderBy("doc_id", "idx")
    }, Some(s"""
      WITH d0 AS (
        SELECT doc_id AS key, doc_id AS src, text FROM documents),
      $chatTurnsSql,
      counted AS (
        SELECT doc_id, idx, role,
          CAST(len(list_filter(string_split(content, ' '), w -> w <> ''))
            AS BIGINT) AS n
        FROM turns),
      conv AS (
        SELECT doc_id, sum(n) AS nt FROM counted GROUP BY doc_id),
      cum AS (
        SELECT doc_id,
          coalesce(sum(nt) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS conv_start
        FROM conv WHERE nt > 0),
      offs AS (
        SELECT doc_id, idx, role, n,
          coalesce(sum(n) OVER (PARTITION BY doc_id ORDER BY idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS tok_start
        FROM counted)
      SELECT o.doc_id, CAST(idx AS BIGINT) AS idx,
        CAST(c.conv_start + o.tok_start AS BIGINT) AS abs_start,
        CAST(c.conv_start + o.tok_start + o.n AS BIGINT) AS abs_end,
        CAST((c.conv_start + o.tok_start) // 64 AS BIGINT) AS seq_first,
        CAST((c.conv_start + o.tok_start + o.n - 1) // 64 AS BIGINT)
          AS seq_last
      FROM offs o JOIN cum c ON o.doc_id = c.doc_id
      WHERE o.role = 'assistant'
      ORDER BY o.doc_id, idx""")),

    // JSONL conversation ingestion (text/Chat.fromJsonConversations
    // r15 — the interchange shape SFT data ships in: a messages array
    // of {role, content} objects per row): the synthesis builds each
    // conversation's JSON string (contents sanitized of quote/backslash
    // via translate so serialization is plain concat), Spark PARSES it
    // back with from_json + posexplode, and the round-trip ledger
    // (n_turns + the md5 of the ordered role/content stream) must
    // equal DuckDB's DIRECT derivation from the same synthesis — the
    // parse is the only thing that can break the match. Data-derived
    // at any scale.
    QueryDef("chat_from_json", (s, d) => {
      import graft.text.Chat
      val docs = t(s, d, "documents").select(col("doc_id").as("key"),
        col("doc_id").as("src"), col("text"))
      val turns = chatTurns(docs, "key", "src", "text")
        .withColumn("content", translate(col("content"), "\"\\", ""))
      val json = turns
        .select(col("doc_id"),
          struct(col("idx").cast("long").as("idx"),
            concat(lit("{\"role\":\""), col("role"),
              lit("\",\"content\":\""), col("content"), lit("\"}"))
              .as("m")).as("tp"))
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(col("tp"))).as("tps"))
        .select(col("doc_id"),
          concat(lit("{\"messages\":["),
            array_join(transform(col("tps"), tp => tp.getField("m")), ","),
            lit("]}")).as("j"))
      val parsed = Chat.fromJsonConversations(json, "doc_id", "j")
      parsed
        .groupBy(col("doc"))
        .agg(count(lit(1)).as("n_turns"),
          collect_list(struct(col("idx").cast("long").as("idx"),
            col("role"), col("content"))).as("turns"))
        .select(col("doc").as("doc_id"), col("n_turns"),
          Chat.convHashCol(col("turns"), md5).as("conv_md5"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH d0 AS (
        SELECT doc_id AS key, doc_id AS src, text FROM documents),
      $chatTurnsSql,
      clean AS (
        SELECT doc_id, idx, role,
          translate(content, '"' || chr(92), '') AS content
        FROM turns)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_turns,
        md5(string_agg(coalesce('v' || role, chr(0)) || chr(1) ||
            coalesce('v' || content, chr(0)), chr(2) ORDER BY idx))
          AS conv_md5
      FROM clean GROUP BY doc_id ORDER BY doc_id""")),

    // PACKING EFFICIENCY ledger (text/Packing.scala r16 — the
    // judge-tasked bin-packing surface): the same corpus packed three
    // ways — greedy stream-cut (zero pad, counted document straddles),
    // next-fit-decreasing, and best-fit-decreasing whole-document
    // packing — with exact integer waste accounting. The Spark side
    // folds the bounded length histogram (<= maxTokens rows, the one
    // driver-side solve); DuckDB REPLAYS BOTH FOLDS — next-fit as a
    // per-class scalar recursion, best-fit as a recursion over the
    // class x capacity grid carrying the remaining-capacity histogram
    // as a list — so every n_seqs/pad integer is independently
    // rederived, not trusted. Data-derived at any scale (the
    // recursion cost is class-bounded, not data-bounded).
    QueryDef("pack_efficiency", (s, d) => {
      val counted = t(s, d, "documents").select(col("doc_id"),
        size(TextAnalysis.spaceTokens(col("text"))).cast("long").as("n_ws"))
      graft.text.Packing.packEfficiency(counted, "doc_id", "n_ws", 64L)
        .orderBy("strategy")
    }, Some("""
      WITH RECURSIVE counted AS MATERIALIZED (
        SELECT doc_id,
          CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
            AS BIGINT) AS n
        FROM documents),
      pos AS (SELECT doc_id, n FROM counted WHERE n > 0),
      pieces AS MATERIALIZED (
        SELECT CASE WHEN u.q < n // 64 THEN CAST(64 AS BIGINT)
                    ELSE n % 64 END AS len
        FROM pos, UNNEST(range(0, (n + 63) // 64)) AS u(q)),
      grid AS MATERIALIZED (SELECT len AS c, CAST(count(*) AS BIGINT) AS k,
          CAST(row_number() OVER (ORDER BY len DESC) AS BIGINT) AS ci
        FROM pieces GROUP BY 1),
      tot AS MATERIALIZED (SELECT CAST(sum(len) AS BIGINT) AS total,
          CAST(count(*) AS BIGINT) AS n_pieces FROM pieces),
      cum AS (
        SELECT doc_id, n,
          CAST(sum(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm
        FROM pos),
      strad AS (SELECT CAST(sum((cm - 1) // 64 - (cm - n) // 64) AS BIGINT) AS s
        FROM cum),
      nfd AS (
        SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS bins,
               CAST(0 AS BIGINT) AS r
        UNION ALL
        SELECT g.ci,
          f.bins + CASE WHEN g.k - least(g.k, f.r // g.c) > 0
            THEN (g.k - least(g.k, f.r // g.c) + (64 // g.c) - 1) // (64 // g.c)
            ELSE CAST(0 AS BIGINT) END,
          CASE WHEN g.k - least(g.k, f.r // g.c) > 0
            THEN 64 - (g.k - least(g.k, f.r // g.c)
              - ((g.k - least(g.k, f.r // g.c) + (64 // g.c) - 1) // (64 // g.c)
                 - 1) * (64 // g.c)) * g.c
            ELSE f.r - least(g.k, f.r // g.c) * g.c END
        FROM nfd f JOIN grid g ON g.ci = f.i + 1),
      nfd_bins AS (SELECT bins FROM nfd ORDER BY i DESC LIMIT 1),
      bfd AS (
        SELECT CAST(0 AS BIGINT) AS s,
               list_transform(generate_series(1, 63),
                 i -> CAST(0 AS BIGINT)) AS caps,
               CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS bins
        UNION ALL
        SELECT f.s + 1,
          CASE WHEN v.act THEN
            list_transform(generate_series(1, 63), i ->
              f.caps[i]
              + CASE WHEN i = v.rcol THEN -(CASE WHEN v.fullall THEN v.b
                  ELSE v.fdiv + CASE WHEN v.remv > 0 THEN 1 ELSE 0 END END)
                ELSE 0 END
              + CASE WHEN i = v.rcol - v.q * g.c
                  THEN (CASE WHEN v.fullall THEN v.b ELSE v.fdiv END)
                ELSE 0 END
              + CASE WHEN NOT v.fullall AND v.remv > 0
                     AND i = v.rcol - v.remv * g.c THEN 1 ELSE 0 END)
          WHEN v.rcol = 64 AND v.kk > 0 THEN
            list_transform(generate_series(1, 63), i ->
              f.caps[i]
              + CASE WHEN i = 64 - (64 // g.c) * g.c
                  THEN v.kk // (64 // g.c) ELSE 0 END
              + CASE WHEN v.kk % (64 // g.c) > 0
                     AND i = 64 - (v.kk % (64 // g.c)) * g.c THEN 1 ELSE 0 END)
          ELSE f.caps END,
          CASE WHEN v.act THEN (CASE WHEN v.fullall
                 THEN v.kk - v.b * v.q ELSE CAST(0 AS BIGINT) END)
               WHEN v.rcol = 64 THEN CAST(0 AS BIGINT)
               ELSE v.kk END,
          f.bins + CASE WHEN v.rcol = 64 AND v.kk > 0
            THEN v.kk // (64 // g.c)
                 + CASE WHEN v.kk % (64 // g.c) > 0 THEN 1 ELSE 0 END
            ELSE CAST(0 AS BIGINT) END
        FROM bfd f
        JOIN grid g ON g.ci = (f.s // 64) + 1
        CROSS JOIN LATERAL (SELECT rcol, kk, b, q,
            rcol < 64 AND rcol >= g.c AND kk > 0 AND b > 0 AS act,
            kk >= b * q AS fullall, kk // q AS fdiv, kk % q AS remv
          FROM (SELECT
            (f.s % 64) + 1 AS rcol,
            CASE WHEN (f.s % 64) + 1 = 1 THEN g.k ELSE f.k END AS kk,
            f.caps[(f.s % 64) + 1] AS b,
            CASE WHEN (f.s % 64) + 1 >= g.c THEN ((f.s % 64) + 1) // g.c
                 ELSE CAST(1 AS BIGINT) END AS q)) v),
      bfd_bins AS (SELECT bins FROM bfd ORDER BY s DESC LIMIT 1),
      big AS (SELECT doc_id, n FROM pos WHERE n > 64),
      big_tot AS (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) AS bt FROM big),
      big_cum AS (
        SELECT doc_id, n,
          CAST(sum(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm
        FROM big),
      big_strad AS (
        SELECT coalesce(CAST(sum((cm - 1) // 64 - (cm - n) // 64) AS BIGINT),
          0) AS s
        FROM big_cum),
      small_grid AS MATERIALIZED (
        SELECT n AS c, CAST(count(*) AS BIGINT) AS k,
          CAST(row_number() OVER (ORDER BY n DESC) AS BIGINT) AS ci
        FROM pos WHERE n <= 64 GROUP BY 1),
      nfd2 AS (
        SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS bins,
               CAST(0 AS BIGINT) AS r
        UNION ALL
        SELECT g.ci,
          f.bins + CASE WHEN g.k - least(g.k, f.r // g.c) > 0
            THEN (g.k - least(g.k, f.r // g.c) + (64 // g.c) - 1) // (64 // g.c)
            ELSE CAST(0 AS BIGINT) END,
          CASE WHEN g.k - least(g.k, f.r // g.c) > 0
            THEN 64 - (g.k - least(g.k, f.r // g.c)
              - ((g.k - least(g.k, f.r // g.c) + (64 // g.c) - 1) // (64 // g.c)
                 - 1) * (64 // g.c)) * g.c
            ELSE f.r - least(g.k, f.r // g.c) * g.c END
        FROM nfd2 f JOIN small_grid g ON g.ci = f.i + 1),
      nfd2_bins AS (SELECT bins FROM nfd2 ORDER BY i DESC LIMIT 1)
      SELECT * FROM (
        SELECT 'stream' AS strategy,
          CAST((t.total + 63) // 64 AS BIGINT) AS n_seqs,
          CAST(((t.total + 63) // 64) * 64 - t.total AS BIGINT) AS pad_tokens,
          (SELECT s FROM strad) AS n_straddles,
          t.n_pieces, t.total AS total_tokens
        FROM tot t
        UNION ALL
        SELECT 'nextfit_dec', b.bins, b.bins * 64 - t.total,
          CAST(0 AS BIGINT), t.n_pieces, t.total
        FROM nfd_bins b, tot t
        UNION ALL
        SELECT 'bestfit_dec', b.bins, b.bins * 64 - t.total,
          CAST(0 AS BIGINT), t.n_pieces, t.total
        FROM bfd_bins b, tot t
        UNION ALL
        SELECT 'hybrid_stream_nfd',
          (SELECT bt FROM big_tot) // 64
            + CASE WHEN (SELECT bt FROM big_tot) % 64 > 0 THEN 1 ELSE 0 END
            + b.bins,
          ((SELECT bt FROM big_tot) // 64
            + CASE WHEN (SELECT bt FROM big_tot) % 64 > 0 THEN 1 ELSE 0 END
            + b.bins) * 64 - t.total,
          (SELECT s FROM big_strad), t.n_pieces, t.total
        FROM nfd2_bins b, tot t)
      ORDER BY strategy""")),

    // Per-sequence DOCUMENT BOUNDARIES (TextAnalysis.sequenceBoundaries
    // r15 — the trainer metadata block-diagonal attention masks and
    // position-id resets are built from when packed documents straddle
    // sequence cuts): packSequences at 64 tokens over the whitespace
    // counts, then each document's within-sequence [start, end) ranges;
    // DuckDB replays the prefix sum, the cut arithmetic, and the range
    // tiling — every row a cross-engine VALUE. Data-derived at any
    // scale.
    QueryDef("pack_boundaries", (s, d) => {
      val counted = t(s, d, "documents").select(col("doc_id"),
        size(TextAnalysis.spaceTokens(col("text"))).cast("long").as("n_ws"))
      val packed = TextAnalysis.packSequences(counted, "doc_id", "n_ws",
        maxTokens = 64L)
      TextAnalysis.sequenceBoundaries(packed, "doc_id", 64L)
        .orderBy("seq_id", "doc_id")
    }, Some("""
      WITH counted AS (
        SELECT doc_id,
          CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
            AS BIGINT) AS n
        FROM documents),
      cum AS (
        SELECT doc_id, n,
          coalesce(sum(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        FROM counted WHERE n > 0),
      spans AS (
        -- windowed sum() is HUGEINT in DuckDB: pin the cut indices back
        -- to BIGINT so range() binds
        SELECT doc_id, s AS tok_start, s + n AS tok_end,
          CAST(s // 64 AS BIGINT) AS f,
          CAST((s + n - 1) // 64 AS BIGINT) AS l
        FROM cum)
      SELECT CAST(u.q AS BIGINT) AS seq_id, doc_id,
        CAST(greatest(tok_start, u.q*64) - u.q*64 AS BIGINT)
          AS start_in_seq,
        CAST(least(tok_end, (u.q+1)*64) - u.q*64 AS BIGINT) AS end_in_seq
      FROM spans, UNNEST(range(f, l+1)) AS u(q)
      ORDER BY seq_id, doc_id""")),

    QueryDef("multimodal_meta", (s, d) =>
      t(s, d, "documents").select(
          col("doc_id"),
          lit("text/plain").as("content_type"),
          octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
          (expr("octet_length(cast(text as binary)) div 256") + 1)
            .cast("long").as("n_chunks"))
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id, 'text/plain' AS content_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        CAST(octet_length(encode(text)) // 256 + 1 AS BIGINT) AS n_chunks
      FROM documents ORDER BY doc_id""")),

    // REAL image-dimension extraction (graft.multimodal.ImageHeaders —
    // pure-JVM PNG IHDR / JPEG SOF marker walk / GIF screen descriptor;
    // no codec library): each document's text rides as the payload of a
    // spec-conformant container (ImageFixtures — real chunk framing,
    // CRCs, marker lengths) with dims planted from doc_id, and the
    // native ImageDims expression parses them back inside codegen. The
    // oracle recomputes the planted dims arithmetically — deliberately
    // NOT DuckDB blob slicing (byte-extraction builtins are version-
    // sensitive, the lottery lesson); the parser's honesty against
    // canonical real-file bytes is ImageHeadersSpec's job.
    QueryDef("multimodal_dims", (s, d) => {
      val blobs = graft.multimodal.Multimodal.syntheticBlobs(
        t(s, d, "documents"), "doc_id", "text")(
        graft.multimodal.ImageFixtures.syntheticImageBlob)
      blobs
        .select(col("doc_id"),
          graft.multimodal.ImageDims.col(col("content")).as("dims"))
        .select(col("doc_id"),
          col("dims.format").as("format"),
          col("dims.width").cast("long").as("width"),
          col("dims.height").cast("long").as("height"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
             WHEN 2 THEN 'gif' ELSE 'webp' END AS format,
        CAST(doc_id % 640 + 1 AS BIGINT) AS width,
        CAST(doc_id % 480 + 1 AS BIGINT) AS height
      FROM documents ORDER BY doc_id""")),

    // The audio companion of multimodal_dims: REAL WAV/FLAC container
    // headers (AudioFixtures plants the parameters, AudioHeaders parses
    // them back as a native codegen expression over the binary column).
    // Same proof shape: the oracle recomputes the planted values
    // arithmetically, so a green row means construct→parse roundtrips
    // real RIFF-chunk / STREAMINFO-bit-pack bytes on every document;
    // AudioHeadersSpec separately pins the parser against canonical
    // hand-hexed file bytes so construction and parsing cannot share a
    // mirrored bug.
    QueryDef("multimodal_audio_meta", (s, d) => {
      val blobs = graft.multimodal.Multimodal.syntheticBlobs(
        t(s, d, "documents"), "doc_id", "text")(
        graft.multimodal.AudioFixtures.syntheticAudioBlob)
      blobs
        .select(col("doc_id"),
          graft.multimodal.AudioMeta.col(col("content")).as("m"))
        .select(col("doc_id"),
          col("m.format").as("format"),
          col("m.channels").cast("long").as("channels"),
          col("m.sample_rate").cast("long").as("sample_rate"),
          col("m.bits_per_sample").cast("long").as("bits_per_sample"),
          col("m.n_frames").as("n_frames"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        CASE doc_id % 2 WHEN 0 THEN 'wav' ELSE 'flac' END AS format,
        CAST(doc_id % 3 + 1 AS BIGINT) AS channels,
        CAST(CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
             WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS BIGINT)
          AS sample_rate,
        CAST((doc_id % 4 + 1) * 8 AS BIGINT) AS bits_per_sample,
        CAST(doc_id % 50 + 1 AS BIGINT) AS n_frames
      FROM documents ORDER BY doc_id""")),

    // Completes the multimodal header triad (dims/audio/video): REAL
    // ISO-BMFF (MP4) box walks — ftyp/moov/mvhd/tkhd with big-endian
    // sizes, 16.16 fixed-point track dims, and the trailing-moov layout
    // on every 3rd doc so the parser proves it hops the mdat payload by
    // declared size rather than assuming a header prefix. Oracle shape
    // as above: arithmetic recomputation of the planted parameters;
    // VideoHeadersSpec pins canonical hand-transcribed bytes.
    QueryDef("multimodal_video_meta", (s, d) => {
      val blobs = graft.multimodal.Multimodal.syntheticBlobs(
        t(s, d, "documents"), "doc_id", "text")(
        graft.multimodal.VideoFixtures.syntheticVideoBlob)
      blobs
        .select(col("doc_id"),
          graft.multimodal.VideoMeta.col(col("content")).as("m"))
        .select(col("doc_id"),
          col("m.format").as("format"),
          col("m.timescale").as("timescale"),
          col("m.duration").as("duration"),
          col("m.width").cast("long").as("width"),
          col("m.height").cast("long").as("height"),
          col("m.n_tracks").cast("long").as("n_tracks"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        'mp4' AS format,
        CAST(CASE doc_id % 5 WHEN 0 THEN 600 WHEN 1 THEN 1000
             WHEN 2 THEN 90000 WHEN 3 THEN 24000 ELSE 30000 END AS BIGINT)
          AS timescale,
        CAST((doc_id % 1000 + 1) * 100 AS BIGINT) AS duration,
        CAST(doc_id % 1920 + 16 AS BIGINT) AS width,
        CAST(doc_id % 1080 + 16 AS BIGINT) AS height,
        CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_tracks
      FROM documents ORDER BY doc_id""")),

    QueryDef("heavy_hitters", (s, d) =>
      t(s, d, "events")
        .agg(graft.functions.HeavyHitters.topK(col("event_type"), 10).as("top"))
        .selectExpr("inline(top)")
        .select(col("value"), col("count"), col("error"))
        .orderBy(col("count").desc, col("value")),
      // k=10 > 5 distinct event types => SpaceSaving is exact and matches
      // a plain group-count
      Some("""
      SELECT event_type AS value, COUNT(*) AS count, CAST(0 AS BIGINT) AS error
      FROM events GROUP BY event_type ORDER BY count DESC, value""")),

    // Range joins (graft.ops.RangeJoin): the bucketed equi-join
    // formulation vs DuckDB's direct inequality join. Intervals are
    // day-number spans derived from sampled orders; spans (<=29 days) sit
    // near the 32-day bucket width so the explosion factor stays ~1.
    QueryDef("q_range_join_point", (s, d) => {
      val iv = t(s, d, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("range_id"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("s_day"))
        .withColumn("e_day", col("s_day") + col("range_id") % 29 + 1)
      val pts = t(s, d, "lineitem")
        .select(datediff(col("l_shipdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("p_day"))
      graft.ops.RangeJoin.pointInInterval(pts, iv, "p_day", "s_day", "e_day",
          keys = Nil, bucketWidth = 32L)
        .groupBy("range_id").agg(count(lit(1)).as("n_pts"))
        .orderBy("range_id")
    }, Some("""
      WITH iv AS (
        SELECT o_orderkey AS range_id,
          CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS s_day,
          CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
            + o_orderkey % 29 + 1 AS e_day
        FROM orders WHERE o_orderkey % 97 = 0),
      pts AS (
        SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS p_day
        FROM lineitem)
      SELECT range_id, COUNT(*) AS n_pts
      FROM iv JOIN pts ON p_day >= s_day AND p_day < e_day
      GROUP BY range_id ORDER BY range_id""")),

    // same oracle as q_range_join_point, through the HYBRID path with a
    // span limit (16 days) that genuinely routes the wider intervals onto
    // the broadcast branch — the oracle certifies the three-path union
    QueryDef("q_range_join_point_hybrid", (s, d) => {
      val iv = t(s, d, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("range_id"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("s_day"))
        .withColumn("e_day", col("s_day") + col("range_id") % 29 + 1)
      val pts = t(s, d, "lineitem")
        .select(datediff(col("l_shipdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("p_day"))
      graft.ops.RangeJoin.pointInIntervalHybrid(pts, iv, "p_day", "s_day",
          "e_day", keys = Nil, bucketWidth = 8L, longSpanBuckets = 2)
        .groupBy("range_id").agg(count(lit(1)).as("n_pts"))
        .orderBy("range_id")
    }, Some("""
      WITH iv AS (
        SELECT o_orderkey AS range_id,
          CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS s_day,
          CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
            + o_orderkey % 29 + 1 AS e_day
        FROM orders WHERE o_orderkey % 97 = 0),
      pts AS (
        SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS p_day
        FROM lineitem)
      SELECT range_id, COUNT(*) AS n_pts
      FROM iv JOIN pts ON p_day >= s_day AND p_day < e_day
      GROUP BY range_id ORDER BY range_id""")),

    QueryDef("q_range_join_overlap_hybrid", (s, d) => {
      def spans(modKey: Int, modSpan: Int, p: String) =
        t(s, d, "orders")
          .filter(col("o_orderkey") % modKey === 0)
          .select(col("o_orderkey").as(s"${p}_id"),
            datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
              .cast("long").as(s"${p}_s"))
          .withColumn(s"${p}_e", col(s"${p}_s") + col(s"${p}_id") % modSpan + 1)
      val a = spans(97, 29, "a")
      val b = spans(89, 23, "b")
      graft.ops.RangeJoin.intervalOverlapHybrid(a, b, "a_s", "a_e", "b_s",
          "b_e", keys = Nil, bucketWidth = 8L, longSpanBuckets = 2)
        .select(col("a_id"), col("b_id"),
          (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
            .as("overlap_days"))
        .orderBy("a_id", "b_id")
    }, Some("""
      WITH iv AS (
        SELECT o_orderkey AS id,
          CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS s
        FROM orders),
      a AS (SELECT id AS a_id, s AS a_s, s + id % 29 + 1 AS a_e FROM iv WHERE id % 97 = 0),
      b AS (SELECT id AS b_id, s AS b_s, s + id % 23 + 1 AS b_e FROM iv WHERE id % 89 = 0)
      SELECT a_id, b_id, LEAST(a_e, b_e) - GREATEST(a_s, b_s) AS overlap_days
      FROM a JOIN b ON a_s < b_e AND b_s < a_e
      ORDER BY a_id, b_id""")),

    QueryDef("q_range_join_overlap", (s, d) => {
      def spans(modKey: Int, modSpan: Int, p: String) =
        t(s, d, "orders")
          .filter(col("o_orderkey") % modKey === 0)
          .select(col("o_orderkey").as(s"${p}_id"),
            datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
              .cast("long").as(s"${p}_s"))
          .withColumn(s"${p}_e", col(s"${p}_s") + col(s"${p}_id") % modSpan + 1)
      val a = spans(97, 29, "a")
      val b = spans(89, 23, "b")
      graft.ops.RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e",
          keys = Nil, bucketWidth = 32L)
        .select(col("a_id"), col("b_id"),
          (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
            .as("overlap_days"))
        .orderBy("a_id", "b_id")
    }, Some("""
      WITH iv AS (
        SELECT o_orderkey AS id,
          CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS s
        FROM orders),
      a AS (SELECT id AS a_id, s AS a_s, s + id % 29 + 1 AS a_e FROM iv WHERE id % 97 = 0),
      b AS (SELECT id AS b_id, s AS b_s, s + id % 23 + 1 AS b_e FROM iv WHERE id % 89 = 0)
      SELECT a_id, b_id, LEAST(a_e, b_e) - GREATEST(a_s, b_s) AS overlap_days
      FROM a JOIN b ON a_s < b_e AND b_s < a_e
      ORDER BY a_id, b_id""")),

    // The absolute-recall claim the old dedup_minhash oracle made
    // implicitly, now explicit and scale-robust: the PRODUCTION
    // (xxhash64) LSH path must recover >= 85% of the exact-Jaccard>=0.5
    // pair set — an integer-arithmetic bound computed entirely in Spark
    // (sketch_stats pattern: the oracle derives n_exact from data and
    // pins the bound boolean TRUE). Measured recall is 100% at sf0.01
    // and 91/92 ≈ 99% at sf0.001, so 85% has wide margin against LSH's
    // expected boundary-pair misses at any SF while still catching a
    // real banding/verify defect (which collapses recall, not shaves it).
    QueryDef("dedup_minhash_recall", (s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"),
                concat(col("text"), lit(" planted near duplicate suffix")).as("text"))
      val all = docs.unionByName(planted)
      val sh = all.select(col("doc_id"), array_distinct(
        graft.functions.WordShingles.col(col("text"), 3)).as("sh"))
      val shx = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      val cand = shx.alias("x").join(shx.alias("y"),
          col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      val exact = cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .filter(graft.functions.JaccardSim.col(col("sh_a"), col("sh_b")) >= 0.5)
        .select("id_a", "id_b")
        .localCheckpoint()
      val found = Dedup.minHashCandidates(all, "text", "doc_id",
          shingleSize = 3, numHashes = 32, bands = 8, minJaccard = 0.5)
        .select("id_a", "id_b")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(found.join(exact, Seq("id_a", "id_b"), "left_semi")
          .agg(count(lit(1)).as("__n_found")))
        .select(col("n_exact"),
          (col("__n_found") * lit(100L) >= col("n_exact") * lit(85L))
            .as("recall_ok"))
    },
    Some(s"""
      WITH alldocs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id+10000, text || ' planted near duplicate suffix'
        FROM documents WHERE doc_id < 50),
      sh AS (
        SELECT doc_id, list_distinct(${duckShingleList(3)}) AS sh
        FROM (SELECT doc_id, $DuckWords AS words FROM alldocs)),
      shx AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      cpairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM shx a JOIN shx b ON a.s = b.s AND a.doc_id < b.doc_id),
      exact AS (
        SELECT id_a, id_b FROM (
          SELECT p.id_a, p.id_b,
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
          FROM cpairs p JOIN sh a ON a.doc_id = p.id_a
                        JOIN sh b ON b.doc_id = p.id_b)
        WHERE jaccard >= 0.5)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
      FROM exact""")),

    // Native xxhash64 SimHash (the bench path; simhash_portable carries
    // the per-row cross-engine oracle for the SEMANTICS). xxhash64 has no
    // DuckDB twin, but the values are a deterministic function of the
    // fixture — pin order-insensitive checksums of the full (doc_id,
    // simhash) relation as literals (driver sf0.01): count + distinct
    // count + pmod-checksum + id-weighted checksum. Any changed bit in
    // any row moves a checksum; ANSI-safe (pmod < 2^31, x500 docs x id
    // weight < 2^54). REGEN DEPENDENCY: these literals are a function of
    // the generated corpus — they survive a driver testdata regen only
    // because the generator is seed-stable; if a regen ever changes the
    // documents table, re-measure and re-pin (the r7 regen burned
    // sketch_stats for exactly this; it is now data-derived instead).
    // SCALE-ROBUST (r10): the old oracle pinned checksums of the native
    // xxhash64 simhash relation (DuckDB can't evaluate it), so the row
    // failed by construction at any other SF. The native pipeline is now
    // exercised end to end against DATA-DERIVED identities instead:
    //  - planted EXACT duplicates (Hamming 0 ⇒ all four quadrants agree)
    //    MUST all surface as candidates ⇒ n_planted_found ≡ the planted
    //    count DuckDB rederives from the data;
    //  - every identical-text pair in the union corpus (also Hamming 0)
    //    MUST surface ⇒ n_exact_text_pairs ≡ DuckDB's Σ C(k,2) over
    //    text-group sizes — catching any blocking/verify defect;
    //  - the Hamming verify bound holds on every emitted pair.
    // Per-row signature exactness is simhash_portable's (md5, cross-
    // engine exact) job; the bit math is SimHashSigSpec's.
    QueryDef("dedup_simhash", (s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      val all = docs.unionByName(planted)
      val cand = Dedup.simHashCandidates(all, "text", "doc_id",
          maxHamming = 3).localCheckpoint()
      val withText = cand
        .join(all.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
        .join(all.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
      cand.agg(
          sum(when(col("id_a") < 50 && col("id_b") === col("id_a") + 10000 &&
                   col("hamming") === 0, 1L).otherwise(0L))
            .as("n_planted_found"),
          sum(when(col("hamming") > 3, 1L).otherwise(0L)).as("n_over_bound"))
        .crossJoin(withText.agg(
          sum(when(col("ta") === col("tb"), 1L).otherwise(0L))
            .as("n_exact_text_pairs")))
        .select(col("n_planted_found"), col("n_exact_text_pairs"),
          (col("n_over_bound") === 0L).as("hamming_bound_ok"))
    }, Some("""
      WITH alldocs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000, text FROM documents WHERE doc_id < 50),
      g AS (SELECT text, count(*) AS k FROM alldocs GROUP BY text)
      SELECT
        CAST((SELECT count(*) FROM documents WHERE doc_id < 50) AS BIGINT)
          AS n_planted_found,
        CAST(COALESCE(sum(k * (k - 1) // 2), 0) AS BIGINT)
          AS n_exact_text_pairs,
        TRUE AS hamming_bound_ok
      FROM g""")),

    QueryDef("dedup_ngram_jaccard", (s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"),
                concat(col("text"), lit(" planted suffix")).as("text"))
      val pairs = docs.filter(col("doc_id") < 50)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 10000).as("id_b"))
      Dedup.ngramJaccard(docs.unionByName(planted), pairs, "text", "doc_id", n = 3)
        .orderBy("id_a", "id_b")
    }, Some(s"""
      WITH alldocs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id+10000, text || ' planted suffix' FROM documents WHERE doc_id < 50),
      sh AS (
        SELECT doc_id, list_distinct(${duckShingleList(3)}) AS sh
        FROM (SELECT doc_id, $DuckWords AS words FROM alldocs)),
      pairs AS (SELECT doc_id AS id_a, doc_id+10000 AS id_b FROM documents WHERE doc_id < 50)
      SELECT p.id_a, p.id_b,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM pairs p JOIN sh a ON a.doc_id = p.id_a JOIN sh b ON b.doc_id = p.id_b
      ORDER BY id_a, id_b""")),

    QueryDef("contamination_scan", (s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      // plant eval docs containing train 8-grams verbatim
      val eval_ = docs.filter(col("doc_id") < 40)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(lit("evalprefix "), col("text"), lit(" evalsuffix")).as("text"))
      Dedup.crossCorpusContamination(docs, eval_, "text", "doc_id",
          n = 8, minShared = 3, maxDocFreq = 10)
        .orderBy("id_a", "id_b")
    },
    // The Spark side joins on xxhash64(shingle) (small shuffle keys at
    // scale); the oracle joins on the shingle STRINGS — agreement also
    // certifies hash-collision-freedom on this corpus.
    Some(s"""
      WITH alldocs AS (
        SELECT doc_id AS id, text, 'train' AS side FROM documents
        UNION ALL
        SELECT doc_id+20000, 'evalprefix ' || text || ' evalsuffix', 'eval'
        FROM documents WHERE doc_id < 40),
      sh AS (
        SELECT id, side, unnest(list_distinct(${duckShingleList(8)})) AS sh
        FROM (SELECT id, side, $DuckWords AS words FROM alldocs)),
      b AS (SELECT id AS id_b, sh FROM sh WHERE side='eval'),
      keep AS (SELECT sh FROM b GROUP BY sh HAVING count(DISTINCT id_b) <= 10),
      a AS (SELECT id AS id_a, sh FROM sh WHERE side='train')
      SELECT a.id_a, bk.id_b, CAST(count(*) AS BIGINT) AS n_shared
      FROM a JOIN (SELECT b.id_b, b.sh FROM b JOIN keep USING (sh)) bk ON a.sh = bk.sh
      GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY id_a, id_b""")),

    // The Bloom-prefiltered contamination path: same planted fixture,
    // same EXACT oracle as contamination_scan — the Bloom filter only
    // prunes corpus-side shingles before the verify join (map-only, in
    // the scan), and its false positives are eliminated by that join, so
    // the result is identical BY CONSTRUCTION at any fpp. The oracle
    // therefore needs no bounds/booleans: hash-green here certifies the
    // prefilter loses nothing. fpp=0.1 deliberately forces false
    // positives through the prefilter at this corpus size.
    QueryDef("contamination_bloom", (s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val eval_ = docs.filter(col("doc_id") < 40)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(lit("evalprefix "), col("text"), lit(" evalsuffix")).as("text"))
      Dedup.crossCorpusContaminationBloom(docs, eval_, "text", "doc_id",
          n = 8, minShared = 3, maxDocFreq = 10, fpp = 0.1)
        .orderBy("id_a", "id_b")
    },
    Some(s"""
      WITH alldocs AS (
        SELECT doc_id AS id, text, 'train' AS side FROM documents
        UNION ALL
        SELECT doc_id+20000, 'evalprefix ' || text || ' evalsuffix', 'eval'
        FROM documents WHERE doc_id < 40),
      sh AS (
        SELECT id, side, unnest(list_distinct(${duckShingleList(8)})) AS sh
        FROM (SELECT id, side, $DuckWords AS words FROM alldocs)),
      b AS (SELECT id AS id_b, sh FROM sh WHERE side='eval'),
      keep AS (SELECT sh FROM b GROUP BY sh HAVING count(DISTINCT id_b) <= 10),
      a AS (SELECT id AS id_a, sh FROM sh WHERE side='train')
      SELECT a.id_a, bk.id_b, CAST(count(*) AS BIGINT) AS n_shared
      FROM a JOIN (SELECT b.id_b, b.sh FROM b JOIN keep USING (sh)) bk ON a.sh = bk.sh
      GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY id_a, id_b""")),

    // Temperature-scaled (α = 0.5) source mixing on the pure integer
    // substrate: per-lang counts → isqrt ppm weights → exact rational
    // multiplicities realized as floor copies + an md5 15-hex-digit
    // integer lottery. Every quantity is an integer and every division
    // floors, so the mixed multiset is bit-identical across engines —
    // the same no-libm discipline as quality_pareto_lottery (general-α
    // float rates are ScalaTest-pinned in SamplingSpec).
    QueryDef("temperature_mix", (s, d) =>
      graft.ops.Sampling.temperatureMixSqrt(
          t(s, d, "documents").select("doc_id", "lang"), "doc_id", "lang")
        .select(col("doc_id"), col("lang"), col("copy"))
        .orderBy("doc_id", "copy"),
      Some("""
      WITH n AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1),
      tot AS (SELECT SUM(cnt) AS N FROM n),
      x AS (SELECT lang, cnt,
              CAST((SELECT N FROM tot) AS HUGEINT) * 1000000000000 // cnt AS xv
            FROM n),
      s0 AS (SELECT lang, cnt, xv,
              CAST(floor(sqrt(CAST(xv AS DOUBLE))) AS HUGEINT) AS g FROM x),
      isq AS (SELECT lang, cnt,
              CASE WHEN (g+1)*(g+1) <= xv THEN g+1
                   WHEN g*g > xv THEN g-1 ELSE g END AS wgt
            FROM s0),
      den AS (SELECT SUM(CAST(cnt AS HUGEINT) * wgt) AS dv FROM isq),
      rate AS (SELECT lang,
              (wgt * (SELECT N FROM tot)) // (SELECT dv FROM den) AS whole,
              (CAST(1152921504606846976 AS HUGEINT) *
                ((wgt * (SELECT N FROM tot)) % (SELECT dv FROM den)))
                // (SELECT dv FROM den) AS thr
            FROM isq),
      cp AS (SELECT d.doc_id, d.lang,
              r.whole + CASE WHEN
                CAST(concat('0x', substring(md5(d.lang || ':' ||
                  CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) < r.thr
                THEN 1 ELSE 0 END AS copies
            FROM documents d JOIN rate r USING (lang))
      SELECT doc_id, lang, CAST(t.c AS BIGINT) AS copy
      FROM cp, unnest(generate_series(0, CAST(copies AS BIGINT) - 1)) AS t(c)
      ORDER BY doc_id, copy""")),

    // Corpus snapshot diff: v1 = documents as-is; v2 = drop doc_id%31==0,
    // modify doc_id%17==0, add 20 fresh ids — the governance primitive
    // ("what changed since the last training set"), sha256 both engines.
    QueryDef("corpus_diff", (s, d) => {
      val v1 = t(s, d, "documents").select("doc_id", "text")
      val v2 = v1.filter(col("doc_id") % 31 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 17 === 0, concat(col("text"), lit(" v2 edit")))
            .otherwise(col("text")).as("text"))
        .unionByName(v1.filter(col("doc_id") < 20)
          .select((col("doc_id") + 90000).as("doc_id"), col("text")))
      Dedup.corpusDiff(v1, v2, "text", "doc_id").orderBy("doc_id")
    }, Some("""
      WITH v1 AS (SELECT doc_id, text FROM documents),
      v2 AS (
        SELECT doc_id,
          CASE WHEN doc_id % 17 = 0 THEN text || ' v2 edit' ELSE text END AS text
        FROM documents WHERE doc_id % 31 <> 0
        UNION ALL
        SELECT doc_id + 90000, text FROM documents WHERE doc_id < 20),
      j AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
          sha256(a.text) AS oh, sha256(b.text) AS nh,
          a.doc_id IS NULL AS only_new, b.doc_id IS NULL AS only_old
        FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      SELECT doc_id,
        CASE WHEN only_new THEN 'added'
             WHEN only_old THEN 'removed'
             WHEN oh = nh THEN 'unchanged'
             ELSE 'modified' END AS status
      FROM j ORDER BY doc_id""")),

    // Per-document n-gram novelty vs a reference slice (doc_id%10==0):
    // integer (n_shingles, n_seen) counts — novelty = 1 - n_seen/n is
    // the caller's division. Spark joins on xxhash64 keys, the oracle on
    // shingle strings (the contamination_scan collision-freedom
    // certification, per-document this time).
    QueryDef("ngram_novelty", (s, d) => {
      val docs = t(s, d, "documents")
      Dedup.referenceOverlapStats(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "text", "doc_id", n = 8)
        .orderBy("doc_id")
    }, Some(s"""
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(${duckShingleList(8)})) AS s
        FROM (SELECT doc_id, $DuckWords AS words FROM documents)),
      ref AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
      corp AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 <> 0)
      SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        CAST(count(r.s) AS BIGINT) AS n_seen
      FROM corp c LEFT JOIN ref r USING (s)
      GROUP BY 1 ORDER BY doc_id""")),

    // Deterministic fixed-size global sample: smallest-k by seeded md5
    // order (hex ordering + id tie-break — the corpus_shuffle total
    // order), rank via the range-partitioned globalRowNumber. The
    // growth-stability contrast with rate-based stratified sampling is
    // the scaladoc's contract; this oracle pins the exact member set.
    QueryDef("fixed_size_sample", (s, d) =>
      graft.ops.Sampling.fixedSizeSample(
          t(s, d, "documents").select("doc_id", "source"), "doc_id",
          k = 100, seed = "fs1")
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id, source FROM (
        SELECT doc_id, source, row_number() OVER (
          ORDER BY md5('fs1:' || CAST(doc_id AS VARCHAR)), doc_id) AS r
        FROM documents)
      WHERE r <= 100 ORDER BY doc_id""")),

    // Curriculum ordering: 4 length-difficulty phases (global ntile over
    // (n_chars, doc_id) — integer, portable) with a seeded deterministic
    // shuffle within each phase; pos = the 0-based global training
    // position. Both ranks ride ops/Ranking's range-partitioned
    // machinery; the oracle rederives the full order with window
    // functions — integer substrate end to end.
    QueryDef("curriculum_order", (s, d) =>
      graft.ops.Shuffling.curriculumOrder(
          t(s, d, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", phases = 4, seed = "cur1")
        .select(col("doc_id"), col("n_chars"), col("phase"), col("pos"))
        .orderBy("pos"),
      Some("""
      WITH tiled AS (
        SELECT doc_id, n_chars,
          CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS phase
        FROM documents)
      SELECT doc_id, n_chars, phase,
        CAST(row_number() OVER (
          ORDER BY phase, md5('cur1:' || CAST(doc_id AS VARCHAR)), doc_id)
          - 1 AS BIGINT) AS pos
      FROM tiled ORDER BY pos""")),

    QueryDef("lang_id_ngram", (s, d) =>
      TextAnalysis.langIdNgram(t(s, d, "documents"), "text", "doc_id")
        .orderBy("doc_id"),
      Some(s"""
      WITH scored AS (
        SELECT doc_id, $duckLangScoreCols
        FROM (SELECT doc_id, lower(text) AS lt FROM documents)),
      best AS (${duckLangBestSql("scored")})
      SELECT doc_id,
        CASE WHEN best_score > 0 THEN best_lang ELSE 'unknown' END AS lang_pred,
        best_score AS lang_score
      FROM best ORDER BY doc_id""")),

    QueryDef("rolling_fingerprint", (s, d) =>
      t(s, d, "documents")
        .selectExpr("doc_id", "graft_rolling_fingerprint(text, 8) AS fp")
        .orderBy("doc_id"),
      Some(s"""
      WITH w AS (
        SELECT doc_id, text, unnest(generate_series(1, LENGTH(text)-7)) AS i
        FROM documents),
      h AS (
        SELECT doc_id, (${duckRollingTerms(8)})
          % 18446744073709551616::HUGEINT AS hu
        FROM w)
      SELECT doc_id,
        CAST(min(CASE WHEN hu >= 9223372036854775808::HUGEINT
                      THEN hu - 18446744073709551616::HUGEINT ELSE hu END)
             AS BIGINT) AS fp
      FROM h GROUP BY doc_id ORDER BY doc_id""")),

    QueryDef("ann_lsh", (s, d) => {
      val em = t(s, d, "embeddings")
      Similarity.lshTopKPortable(em, em.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, bits = 4)
        .select(col("probe_id"), col("neighbor_id"), col("rank"))
        .orderBy("probe_id", "rank")
    }, Some("""
      WITH q AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0 + 0.5) AS BIGINT)) AS e
        FROM embeddings),
      w AS (SELECT tt.t, pp.p, list_transform(generate_series(0, 63), d ->
          CAST(concat('0x', substring(md5('lshw_' || tt.t || '_' || pp.p || '_' || d),
            1, 15)) AS BIGINT) % 2000 - 1000) AS wv
        FROM (SELECT unnest(generate_series(0, 3)) AS t) tt,
             (SELECT unnest(generate_series(0, 3)) AS p) pp),
      bits AS (SELECT q.vec_id, w.t, w.p,
          CASE WHEN list_sum(list_transform(generate_series(1, 64),
            i -> q.e[i] * w.wv[i])) >= 0 THEN 1 ELSE 0 END AS b
        FROM q CROSS JOIN w),
      buck AS (SELECT vec_id, t, CAST(sum(b * (1 << p)) AS BIGINT) AS bucket
        FROM bits GROUP BY 1, 2),
      pb AS (SELECT vec_id AS probe_id, t, bucket FROM buck WHERE vec_id < 5),
      pbm AS (SELECT probe_id, t,
          unnest(list_append(list_transform(generate_series(0, 3),
            bb -> xor(bucket, CAST(1 << bb AS BIGINT))), bucket)) AS bucket
        FROM pb),
      cand AS (SELECT DISTINCT p.probe_id, c.vec_id AS neighbor_id
        FROM pbm p JOIN buck c ON c.t = p.t AND c.bucket = p.bucket
        WHERE c.vec_id != p.probe_id),
      scored AS (SELECT cand.probe_id, cand.neighbor_id,
          CAST(list_sum(list_transform(generate_series(1, 64),
            i -> a.e[i] * b.e[i])) AS BIGINT) AS dot
        FROM cand JOIN q a ON a.vec_id = cand.probe_id
                  JOIN q b ON b.vec_id = cand.neighbor_id)
      SELECT probe_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY dot DESC, neighbor_id) AS rank FROM scored)
      WHERE rank <= 5 ORDER BY probe_id, rank""")),

    QueryDef("ann_ivf", (s, d) => {
      val em = t(s, d, "embeddings")
      Similarity.ivfTopKPortable(em, em.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, nLists = 8, nProbe = 3)
        .select(col("probe_id"), col("neighbor_id"), col("rank"))
        .orderBy("probe_id", "rank")
    }, Some("""
      WITH q AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0 + 0.5) AS BIGINT)) AS e
        FROM embeddings),
      cents AS (SELECT vec_id AS centroid_id, e AS ce FROM q
        WHERE vec_id % GREATEST(1, (SELECT COUNT(*) FROM q) // 8) = 0
        ORDER BY vec_id LIMIT 8),
      asg AS (SELECT vec_id, e, centroid_id, row_number() OVER (
          PARTITION BY vec_id ORDER BY cdot DESC, centroid_id) AS rn
        FROM (SELECT q.vec_id, q.e, c.centroid_id,
            CAST(list_sum(list_transform(generate_series(1, 64),
              i -> q.e[i] * c.ce[i])) AS BIGINT) AS cdot
          FROM q CROSS JOIN cents c)),
      lists AS (SELECT vec_id AS neighbor_id, e, centroid_id
        FROM asg WHERE rn = 1),
      plists AS (SELECT vec_id AS probe_id, e AS pe, centroid_id
        FROM asg WHERE vec_id < 5 AND rn <= 3),
      scored AS (SELECT p.probe_id, l.neighbor_id,
          CAST(list_sum(list_transform(generate_series(1, 64),
            i -> p.pe[i] * l.e[i])) AS BIGINT) AS dot
        FROM plists p JOIN lists l ON l.centroid_id = p.centroid_id
        WHERE l.neighbor_id != p.probe_id)
      SELECT probe_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY dot DESC, neighbor_id) AS rank FROM scored)
      WHERE rank <= 5 ORDER BY probe_id, rank""")),

    // The LSH-bucketed near-dup candidates over the planted-duplicate
    // fixture recover EXACTLY the planted pairs at this SF (measured; 0
    // false positives at minCos = 0.999), so the planted ground truth IS
    // the oracle — real SQL, not a pinned literal. The float cosine is
    // projected away (engine-specific ulps; embed_dedup_exact anchors
    // exactness), and a recall loss in the bucketed path = missing rows.
    QueryDef("embed_dedup", (s, d) => {
      val em = t(s, d, "embeddings").select("vec_id", "embedding")
      val planted = em.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      Similarity.cosineDedupCandidates(em.unionByName(planted),
          "vec_id", "embedding", bits = 8, dim = 64, minCos = 0.999)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }, Some("""
      SELECT vec_id AS id_a, vec_id + 10000 AS id_b
      FROM embeddings WHERE vec_id < 50 ORDER BY id_a""")),

    // Integer-quantized inner-product top-k: floor(x*1e7+0.5) per element
    // makes every score an exact 64-bit integer, so the ranking is
    // bit-identical across engines — the exact-correctness anchor for the
    // float-cosine ANN family above (whose IEEE sum order is engine-
    // specific and is verified by ScalaTest instead).
    QueryDef("ann_exact", (s, d) => {
      val q = t(s, d, "embeddings").select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0D + 0.5D) AS BIGINT))").as("e"))
      val probes = q.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("e").as("pe"))
      q.crossJoin(broadcast(probes))
        .withColumn("dot", expr("aggregate(zip_with(e, pe, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("dot").desc, col("vec_id"))).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("dot"), col("rank"))
        .orderBy("probe_id", "rank")
    }, Some("""
      WITH q AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0 + 0.5) AS BIGINT)) AS e
        FROM embeddings),
      p AS (SELECT vec_id AS probe_id, e AS pe FROM q WHERE vec_id < 5),
      scored AS (
        SELECT p.probe_id, q.vec_id AS neighbor_id,
          CAST(list_sum(list_transform(generate_series(1, len(q.e)),
            i -> q.e[i] * p.pe[i])) AS BIGINT) AS dot
        FROM p CROSS JOIN q)
      SELECT probe_id, neighbor_id, dot, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY dot DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY probe_id, rank""")),

    // Portable SimHash: 60-bit per-token hash from md5 (computable in any
    // engine), sign-summed per bit position. The native xxhash64 variant
    // (dedup_simhash) keeps the bench crown; this one carries the
    // cross-engine oracle for the simhash SEMANTICS.
    QueryDef("simhash_portable", (s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .filter(col("tok") =!= "")
        .withColumn("h",
          conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
      toks
        .select(col("doc_id"), col("h"), explode(expr("sequence(0, 59)")).as("p"))
        .groupBy("doc_id", "p")
        .agg(sum(when(expr("shiftright(h, p) % 2") === 1, 1L).otherwise(-1L)).as("sgn"))
        .groupBy("doc_id")
        .agg(sum(when(col("sgn") > 0, expr("shiftleft(1L, p)")).otherwise(0L)).as("simhash"))
        .orderBy("doc_id")
    }, Some("""
      WITH toks AS (
        SELECT doc_id,
          CAST(concat('0x', substring(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(list_distinct(
                list_filter(string_split(text, ' '), w -> w <> ''))) AS tok
              FROM documents)),
      bits AS (
        SELECT doc_id, p,
          sum(CASE WHEN (h >> p) % 2 = 1 THEN 1 ELSE -1 END) AS sgn
        FROM toks, unnest(generate_series(0, 59)) AS t(p)
        GROUP BY doc_id, p)
      SELECT doc_id,
        CAST(sum(CASE WHEN sgn > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // k-NN majority-vote label eval on the integer-quantized dot product
    // (same exactness trick as ann_exact): the standard embedding-space
    // quality probe (label-noise / dataset-cartography pass) — does a
    // vector's neighborhood agree with its label? Tie-break: most votes,
    // then smallest label.
    QueryDef("knn_eval", (s, d) => {
      val q = t(s, d, "embeddings").select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0D + 0.5D) AS BIGINT))").as("e"))
      val probes = q.filter(col("vec_id") < 50)
        .select(col("vec_id").as("probe_id"), col("label").as("true_label"),
          col("e").as("pe"))
      val top = q.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("dot", expr(
          "aggregate(zip_with(e, pe, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("dot").desc, col("vec_id"))))
        .filter(col("rnk") <= 5)
      top.groupBy(col("probe_id"), col("true_label"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
        .groupBy("probe_id", "true_label")
        .agg(max(struct(col("n_votes"),
          (-col("label")).cast("long").as("negl"))).as("best"))
        .select(col("probe_id"),
          col("true_label").cast("long").as("true_label"),
          (-col("best.negl")).as("pred_label"),
          col("best.n_votes").as("n_votes"))
        .orderBy("probe_id")
    }, Some("""
      WITH q AS (SELECT vec_id, label, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0 + 0.5) AS BIGINT)) AS e
        FROM embeddings),
      p AS (SELECT vec_id AS probe_id, label AS true_label, e AS pe
            FROM q WHERE vec_id < 50),
      scored AS (SELECT p.probe_id, p.true_label, q.vec_id, q.label,
          CAST(list_sum(list_transform(generate_series(1, len(q.e)),
            i -> q.e[i] * p.pe[i])) AS BIGINT) AS dot
        FROM p JOIN q ON q.vec_id <> p.probe_id),
      top AS (SELECT * FROM (SELECT *, row_number() OVER (
            PARTITION BY probe_id ORDER BY dot DESC, vec_id) AS rnk
          FROM scored) WHERE rnk <= 5),
      votes AS (SELECT probe_id, true_label, label, COUNT(*) AS n_votes
                FROM top GROUP BY 1, 2, 3),
      best AS (SELECT probe_id, true_label, label AS pred_label, n_votes,
          row_number() OVER (PARTITION BY probe_id
                             ORDER BY n_votes DESC, label) AS r FROM votes)
      SELECT probe_id, CAST(true_label AS BIGINT) AS true_label,
             CAST(pred_label AS BIGINT) AS pred_label,
             CAST(n_votes AS BIGINT) AS n_votes
      FROM best WHERE r = 1 ORDER BY probe_id""")),

    // Per-label centroid statistics over the quantized embedding space
    // (class centroids: IVF warm-start, label-noise screening). One
    // posexplode + one (label, dim) aggregation — the mean is an exact
    // long-sum divided once, so the doubles are bit-identical across
    // engines.
    QueryDef("embed_label_centroids", (s, d) =>
      t(s, d, "embeddings").select(col("label"),
          posexplode(expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0D + 0.5D) AS BIGINT))"))
            .as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n_vecs"), sum(col("v")).as("sum_q"))
        .select(col("label").cast("long").as("label"),
          col("pos").cast("long").as("pos"), col("n_vecs"), col("sum_q"),
          (col("sum_q").cast("double") / col("n_vecs")).as("mean_q"))
        .orderBy("label", "pos"),
      Some("""
      WITH q AS (SELECT label, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0 + 0.5) AS BIGINT)) AS e
        FROM embeddings),
      ex AS (SELECT label, t.pos - 1 AS pos, e[t.pos] AS v
             FROM q, unnest(generate_series(1, len(e))) AS t(pos))
      SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
        COUNT(*) AS n_vecs, CAST(SUM(v) AS BIGINT) AS sum_q,
        CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_q
      FROM ex GROUP BY 1, 2 ORDER BY label, pos""")),

    // DSIR-style hashed n-gram features (data selection for LM training,
    // Xie et al. 2023): per-doc bigram bucket counts with an md5-derived
    // portable bucket hash — the integer substrate the importance
    // log-ratio scoring runs on (ratio itself is ScalaTest-pinned; ln
    // differs in final ulps across engines).
    QueryDef("dsir_features", (s, d) =>
      graft.ops.Selection.hashedNgramFeatures(
          t(s, d, "documents").select("doc_id", "text"),
          "text", "doc_id", n = 2, buckets = 64)
        .orderBy("doc_id", "bucket"),
      Some("""
      WITH base AS (SELECT doc_id,
          list_filter(string_split_regex(text, ' +'), w -> w <> '') AS ws
        FROM documents),
      g AS (SELECT doc_id, ws[t.i] || ' ' || ws[t.i + 1] AS gram
            FROM base, unnest(generate_series(1, len(ws) - 1)) AS t(i)
            WHERE len(ws) >= 2
            -- sub-n docs collapse to one whole-doc shingle, mirroring
            -- WordShingles (same branch minhash_portable pins)
            UNION ALL
            SELECT doc_id, array_to_string(ws, ' ') AS gram
            FROM base WHERE len(ws) < 2)
      SELECT doc_id,
        CAST(concat('0x', substring(md5(gram), 1, 15)) AS BIGINT) % 64
          AS bucket,
        COUNT(*) AS n
      FROM g GROUP BY 1, 2 ORDER BY doc_id, bucket""")),

    // Exact substring dedup (Lee et al. 2022): repeated 8-token windows
    // across the corpus (here: 50 planted near-copies) are removed from
    // every occurrence but the global first. Window hashes are md5 so
    // the DuckDB oracle rederives them bit-exactly.
    QueryDef("dedup_substrings", (s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" planted unique tail")).as("text"))
      Dedup.dedupSubstrings(docs.unionByName(planted), "text", "doc_id",
          windowTokens = 8)
        .orderBy("doc_id")
    }, Some("""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text || ' planted unique tail' AS text
        FROM documents WHERE doc_id < 50),
      base AS (SELECT doc_id,
          list_filter(string_split_regex(text, ' +'), w -> w <> '') AS ws
        FROM corpus),
      wins AS (SELECT doc_id, t.i - 1 AS pos,
          md5(array_to_string(list_slice(ws, t.i, t.i + 7), ' ')) AS h
        FROM base, unnest(generate_series(1, len(ws) - 7)) AS t(i)
        WHERE len(ws) >= 8),
      occ AS (SELECT doc_id, pos,
          ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
          COUNT(*) OVER (PARTITION BY h) AS n_occ
        FROM wins),
      dup AS (SELECT doc_id, pos FROM occ WHERE n_occ > 1 AND rn > 1),
      cov AS (SELECT DISTINCT doc_id, t.c AS cpos
        FROM dup, unnest(generate_series(pos, pos + 7)) AS t(c)),
      words AS (SELECT doc_id, t.i - 1 AS wpos, ws[t.i] AS word
        FROM base, unnest(generate_series(1, len(ws))) AS t(i)),
      kept AS (SELECT w.doc_id, w.wpos, w.word FROM words w
        LEFT JOIN cov ON cov.doc_id = w.doc_id AND cov.cpos = w.wpos
        WHERE cov.doc_id IS NULL),
      reb AS (SELECT doc_id, string_agg(word, ' ' ORDER BY wpos) AS text_kept,
          COUNT(*) AS n_kept FROM kept GROUP BY 1),
      tot AS (SELECT doc_id,
          len(list_filter(string_split_regex(text, ' +'), w -> w <> ''))
            AS n_words FROM corpus)
      SELECT t.doc_id, COALESCE(r.text_kept, '') AS text_kept,
        CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept_words,
        CAST(t.n_words - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped_words
      FROM tot t LEFT JOIN reb r USING (doc_id) ORDER BY t.doc_id""")),

    // Portable MinHash+banding rederivation — the exact-correctness
    // anchor for the native dedup path (WordShingles/MinHashSig/
    // BandHashes run on xxhash64, which DuckDB cannot evaluate, so
    // dedup_sigs_10k stays rows-only and THIS query certifies the same
    // construction end to end on engine-portable md5 hashes): 3-word
    // shingles over space-run tokens (short docs collapse to one whole-
    // doc shingle, mirroring WordShingles), double-hashing signature
    // sig[j] = min over shingles of (h1 + j*h2) mod p with h1/h2 the two
    // md5 halves and p = 2^31-1, 16 hashes banded 4x4, band hash =
    // md5 of the comma-joined band slice.
    QueryDef("minhash_portable", (s, d) =>
      // native portable twins (PortableMinHashSig/PortableBandHashes):
      // bit-identical to the conv/substring/md5 HOF formulation this
      // query originally spelled out (property- and SQL-spec-pinned),
      // in two fused loops instead of an explode x16 shuffle
      t(s, d, "documents")
        .select(col("doc_id"), array_distinct(
          graft.functions.WordShingles.col(col("text"), 3)).as("sh"))
        .select(col("doc_id"), posexplode(
          graft.functions.PortableBandHashes.col(
            graft.functions.PortableMinHashSig.col(col("sh"), 16), 4))
          .as(Seq("band_id", "band_hash")))
        .select(col("doc_id"), col("band_id").cast("long").as("band_id"),
          col("band_hash"))
        .orderBy("doc_id", "band_id"),
    Some("""
      WITH base AS (SELECT doc_id,
          list_filter(string_split_regex(text, ' +'), w -> w <> '') AS ws
        FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) >= 3
          THEN list_transform(generate_series(1, len(ws) - 2),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
          ELSE [array_to_string(ws, ' ')] END)) AS sh FROM base),
      h AS (SELECT doc_id,
          CAST(concat('0x', substring(md5(sh), 1, 15)) AS BIGINT) % 2147483647 AS h1,
          CAST(concat('0x', substring(md5(sh), 16, 15)) AS BIGINT) % 2147483647 AS h2
        FROM sh),
      sig AS (SELECT doc_id, j, min((h1 + j * h2) % 2147483647) AS s
        FROM h, unnest(generate_series(0, 15)) AS t(j) GROUP BY 1, 2),
      band AS (SELECT doc_id, CAST(j // 4 AS BIGINT) AS band_id,
          md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY j)) AS band_hash
        FROM sig GROUP BY 1, 2)
      SELECT doc_id, band_id, band_hash FROM band
      ORDER BY doc_id, band_id""")),

    // ANN quality as a driver-visible row: recall of the PRODUCTION LSH
    // and IVF variants (same hyperparameters as the old pinned entries)
    // against the float-cosine exact top-k, over 20 probes x k=5 = 100
    // ground-truth pairs. r10 (the dedup_minhash_recall pattern): the
    // compared relation is now SCALE-ROBUST — per-variant floor-bound
    // booleans plus the two ladder-ordering claims, not the exact
    // measured recalls (those are a function of corpus scale: measured
    // sf0.01 / sf0.001 = ivf 73/78, ivf_learned 66/67, eqcost 89/84,
    // lsh 94/92, multiprobe_1table 43/50, single 12/15 — every floor
    // sits a wide margin under BOTH, because a real sketch/centroid
    // defect collapses recall rather than shaving it; the floors and
    // ladder stay driver-visible, the exact dial lives in
    // BENCH_SCALE.json's ann_curve).
    QueryDef("ann_recall", (s, d) => {
      import s.implicits._
      val em = t(s, d, "embeddings")
      val probes = em.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(em, probes, "vec_id", "embedding", k = 5)
        .select("probe_id", "neighbor_id")
      def recallRow(name: String, approx: org.apache.spark.sql.DataFrame) =
        exact.join(approx.select("probe_id", "neighbor_id"),
            Seq("probe_id", "neighbor_id"), "left_semi")
          .agg(floor(count(lit(1)) * lit(100.0) / lit(100)).cast("long")
            .as("recall_pct"))
          .select(lit(name).as("variant"), col("recall_pct"))
      val learned = Similarity.kmeansCentroids(
        em, "vec_id", "embedding", k = 8, iters = 2)
      val measured = recallRow("ivf", Similarity.ivfTopK(em, probes,
          "vec_id", "embedding", k = 5, nLists = 8, nProbe = 3))
        // k-means-learned centroids at the SAME nProbe: recall drops
        // because balanced lists scan far less corpus per probe (37.3%
        // vs the unbalanced sample's 59.8% at sf0.01 — see
        // Similarity.ivfScanCost); the eqcost row is the fair comparison
        .unionByName(recallRow("ivf_learned", Similarity.ivfTopK(em, probes,
          "vec_id", "embedding", k = 5, nLists = 8, nProbe = 3,
          learnedCentroids = Some(learned))))
        // ...at EQUAL probe cost (learned nProbe=5) learned centroids
        // WIN — asserted as the z_eqcost_beats_equal_nprobe row below
        .unionByName(recallRow("ivf_learned_eqcost", Similarity.ivfTopK(em,
          probes, "vec_id", "embedding", k = 5, nLists = 8, nProbe = 5,
          learnedCentroids = Some(learned))))
        // the DEFAULT lshTopK path (multi-table OR-construction +
        // multi-probe) — the row a user's default call delivers
        .unionByName(recallRow("lsh", Similarity.lshTopK(em, probes,
          "vec_id", "embedding", k = 5, bits = 4, dim = 64)))
        // explicit opt-down ladder: each lever's cost/recall trade
        .unionByName(recallRow("lsh_multiprobe_1table", Similarity.lshTopK(em, probes,
          "vec_id", "embedding", k = 5, bits = 4, dim = 64,
          multiProbe = true, tables = 1)))
        .unionByName(recallRow("lsh_single", Similarity.lshTopK(em, probes,
          "vec_id", "embedding", k = 5, bits = 4, dim = 64,
          multiProbe = false, tables = 1)))
        .localCheckpoint()  // 6 tiny rows feeding 3 consumers below
      val floors = Seq(
        ("ivf", 60L), ("ivf_learned", 50L), ("ivf_learned_eqcost", 75L),
        ("lsh", 85L), ("lsh_multiprobe_1table", 25L), ("lsh_single", 5L))
        .toDF("variant", "recall_floor_pct")
      val bounds = measured.join(floors, Seq("variant"))
        .select(col("variant"), col("recall_floor_pct"),
          (col("recall_pct") >= col("recall_floor_pct")).as("recall_ok"))
      def pick(v: String) =
        max(when(col("variant") === v, col("recall_pct")))
      val wide = measured.agg(
        pick("lsh").as("__lsh"), pick("lsh_multiprobe_1table").as("__mp1"),
        pick("lsh_single").as("__single"),
        pick("ivf_learned_eqcost").as("__eqcost"),
        pick("ivf_learned").as("__learned"))
      val ladder = wide.select(
        lit("z_ladder_multiprobe").as("variant"),
        lit(0L).as("recall_floor_pct"),
        (col("__lsh") >= col("__mp1") && col("__mp1") >= col("__single"))
          .as("recall_ok"))
      val eqcost = wide.select(
        lit("z_eqcost_beats_equal_nprobe").as("variant"),
        lit(0L).as("recall_floor_pct"),
        (col("__eqcost") >= col("__learned")).as("recall_ok"))
      bounds.unionByName(ladder).unionByName(eqcost).orderBy("variant")
    }, Some("""
      SELECT 'ivf' AS variant, CAST(60 AS BIGINT) AS recall_floor_pct,
             TRUE AS recall_ok
      -- at EQUAL nProbe learned centroids measure below the hash sample —
      -- but that compares unequal work: k-means balances the lists, so
      -- nProbe=3/8 scans far less corpus than the unbalanced sample
      -- (Similarity.ivfScanCost). The z_eqcost row pins the fair claim:
      -- at equal scanned rows, learned centroids win.
      UNION ALL SELECT 'ivf_learned', 50, TRUE
      UNION ALL SELECT 'ivf_learned_eqcost', 75, TRUE
      UNION ALL SELECT 'lsh', 85, TRUE
      UNION ALL SELECT 'lsh_multiprobe_1table', 25, TRUE
      UNION ALL SELECT 'lsh_single', 5, TRUE
      UNION ALL SELECT 'z_eqcost_beats_equal_nprobe', 0, TRUE
      UNION ALL SELECT 'z_ladder_multiprobe', 0, TRUE
      ORDER BY variant""")),

    // Embedding EXACT dedup at scale: hash-groupBy on the quantized
    // vector key (same shape as dedup_exact — no pairwise work at all);
    // the near-dup threshold variant stays LSH-bucketed (embed_dedup).
    QueryDef("embed_dedup_exact", (s, d) => {
      val em = t(s, d, "embeddings").select("vec_id", "embedding")
      val planted = em.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      em.unionByName(planted)
        .select(col("vec_id"),
          md5(expr("""array_join(transform(embedding,
            x -> CAST(CAST(floor(CAST(x AS DOUBLE)*10000000.0D + 0.5D) AS BIGINT) AS STRING)), ',')"""))
            .as("emb_key"))
        .groupBy("emb_key")
        .agg(min(col("vec_id")).as("keep_vec_id"), count(lit(1)).as("n_copies"))
        .orderBy("emb_key")
    }, Some("""
      WITH q AS (
        SELECT vec_id, md5(array_to_string(list_transform(embedding,
          x -> CAST(CAST(floor(CAST(x AS DOUBLE)*10000000.0 + 0.5) AS BIGINT) AS VARCHAR)), ',')) AS emb_key
        FROM (SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id+10000, embedding FROM embeddings WHERE vec_id < 50))
      SELECT emb_key, MIN(vec_id) AS keep_vec_id, COUNT(*) AS n_copies
      FROM q GROUP BY emb_key ORDER BY emb_key""")),

    // SemDeDup (Abbas et al. 2023): cluster-blocked semantic dedup —
    // candidates are pairs CO-ASSIGNED to a k-means cell with cos >=
    // 0.999. Same planted-ground-truth oracle design as embed_dedup:
    // the only pairs at/above the threshold at this SF are the planted
    // exact copies (measured corpus-wide max non-planted cosine 0.513),
    // identical vectors always share an argmax cell, and no cell
    // reaches the cap — so the planted set IS the oracle, and a lost
    // pair (assignment bug, capped cell, threshold drift) = missing
    // rows. Float cosine projected away (ann_exact anchors exactness).
    QueryDef("semdedup", (s, d) => {
      val em = t(s, d, "embeddings").select("vec_id", "embedding")
      val planted = em.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      val corpus = em.unionByName(planted)
      val centroids = em.filter(col("vec_id").between(100, 107))
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid_vec"))
      graft.ann.SemDedup.candidates(corpus, "vec_id", "embedding",
          centroids, minCos = 0.999)
        .select(col("id_a"), col("id_b"))
        .orderBy("id_a", "id_b")
    }, Some("""
      SELECT vec_id AS id_a, vec_id + 10000 AS id_b
      FROM embeddings WHERE vec_id < 50 ORDER BY id_a""")),

    // SemDeDup survivor policy (paper §3: keep the duplicate-group
    // member FARTHEST from its centroid, min-id tie-break). Planted
    // exact copies tie on centroid cosine, so the tie-break keeps the
    // original and drops every +10000 copy — survivors ≡ the original
    // corpus, exactly. The non-tied argmin policy is pinned by
    // SemDedupSpec on constructed jittered groups.
    QueryDef("semdedup_survivors", (s, d) => {
      val em = t(s, d, "embeddings").select("vec_id", "embedding")
      val planted = em.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      val corpus = em.unionByName(planted)
      val centroids = em.filter(col("vec_id").between(100, 107))
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid_vec"))
      graft.ann.SemDedup.semDedup(corpus, "vec_id", "embedding",
          centroids, minCos = 0.999)
        .select(col("vec_id"))
        .orderBy("vec_id")
    }, Some("""
      SELECT vec_id FROM embeddings ORDER BY vec_id""")),

    // TF-IDF over the full inverted index — EXACT integer substrate end
    // to end: tf/df are exact counts and the weight is the ppm rational
    // idf proxy `tf * ((1e6*N) div df)` (Retrieval.tfidfExact), so the
    // compare has no float anywhere (the r7 float-floor+guard form did
    // not survive the driver environment's libm). The classic ln-form
    // tfidf stays ScalaTest-pinned in RetrievalSpec.
    QueryDef("tfidf_postings", (s, d) => {
      graft.text.Retrieval.tfidfExact(t(s, d, "documents"), "text", "doc_id")
        .orderBy("doc_id", "term")
    }, Some("""
      WITH base AS (SELECT doc_id,
          list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents),
      post AS (
        SELECT doc_id, term, count(*) AS tf FROM (
          SELECT doc_id, unnest(t) AS term FROM base) GROUP BY 1, 2),
      dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM base)
      SELECT doc_id, term, tf, df,
        CAST(tf * ((1000000 * n_docs) // df) AS BIGINT) AS w
      FROM post JOIN dfs USING (term) CROSS JOIN n
      ORDER BY doc_id, term""")),

    // BM25 top-10 for three fixed keyword queries — EXACT integer
    // scoring end to end (Retrieval.bm25TopKExact): idf as a ppm
    // rational, tf-normalization scaled through 10*S, per-doc sum and
    // ranking all integer arithmetic. No libm anywhere, so the ranking
    // replays bit-identically in any engine (the r7 float-floor+guard
    // form did not survive the driver environment). The float Robertson
    // BM25 path (bm25TopK's sorted fold) is pinned by RetrievalSpec.
    QueryDef("bm25_topk", (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val queries = Seq((0L, "hash index scan"), (1L, "window agg stream"),
        (2L, "vector scan slow")).toDF("query_id", "query_text")
      graft.text.Retrieval
        .bm25TopKExact(docs, "text", "doc_id",
          queries, "query_id", "query_text", 10)
        .select("query_id", "doc_id", "score_q", "rank")
        .orderBy("query_id", "rank")
    }, Some("""
      WITH base AS (SELECT doc_id,
          list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents),
      post AS (
        SELECT term, doc_id, count(*) AS tf, max(dl) AS dl FROM (
          SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM base)
        GROUP BY 1, 2),
      stats AS (SELECT count(*) AS n_docs, sum(len(t)) AS s_tok FROM base),
      q AS (SELECT query_id, unnest(list_distinct(
              list_filter(string_split(qt, ' '), x -> x <> ''))) AS term
            FROM (VALUES (0, 'hash index scan'), (1, 'window agg stream'),
              (2, 'vector scan slow')) v(query_id, qt)),
      dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      ts AS (
        SELECT q.query_id, p.doc_id,
          ((1000000 * (2*n_docs - 2*df + 1)) // (2*df + 1))
          * ((1000000 * 22 * tf * s_tok) //
             (10*s_tok*tf + 3*s_tok + 9*dl*n_docs)) AS s_int
        FROM post p JOIN q USING (term) JOIN dfs USING (term)
        CROSS JOIN stats),
      agg AS (
        SELECT query_id, doc_id, CAST(sum(s_int) AS BIGINT) AS score_q
        FROM ts GROUP BY 1, 2)
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_q,
        CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY score_q DESC, doc_id) AS rank
            FROM agg)
      WHERE rank <= 10 ORDER BY query_id, rank""")),

    // Cluster-balanced downsampling: at most 10 docs per source, chosen
    // by the seeded md5 order — deterministic, so the oracle rederives
    // the exact survivor set (hex strings order identically in both
    // engines; integer rank arithmetic only).
    QueryDef("cluster_cap_sample", (s, d) =>
      graft.ops.Sampling.clusterCapped(
          t(s, d, "documents"), "doc_id", "source", cap = 10, seed = "c1")
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id, source FROM (
        SELECT doc_id, source, row_number() OVER (PARTITION BY source
          ORDER BY md5('c1:' || CAST(doc_id AS VARCHAR)), doc_id) AS r
        FROM documents)
      WHERE r <= 10 ORDER BY doc_id""")),

    // Mergeable distinct-count sketches: per-(lang, epoch) HLL sketch
    // table, merged per lang — the maintained-aggregate shape where a
    // batch folds in WITHOUT re-scanning the corpus. The corpus
    // vocabulary (~31 words/lang) is deep inside HLL's coupon-exact
    // regime, so the merged estimate EQUALS the true distinct count and
    // the oracle is real SQL (count distinct), not a pinned literal;
    // larger-cardinality accuracy + the partitioning-invariance
    // contract (self-union drops the order-sensitive HIP estimator)
    // are pinned by SketchesSpec.
    QueryDef("sketch_epoch_distinct", (s, d) => {
      val toks = t(s, d, "documents")
        .select(col("lang"), (col("doc_id") % 3).as("epoch"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val perEpoch = graft.ops.Sketches.hllSketchTable(
        toks, "w", Seq("lang", "epoch"))
      graft.ops.Sketches.hllMergeEstimate(
          perEpoch.select("lang", "hll"), Seq("lang"))
        .orderBy("lang")
    }, Some("""
      SELECT lang, count(DISTINCT w) AS n_distinct_est
      FROM (SELECT lang, unnest(list_filter(string_split(text, ' '),
              x -> x <> '')) AS w
            FROM documents)
      GROUP BY lang ORDER BY lang""")),

    // The same per-(lang, epoch) sketch/merge shape on the RAW Spark 4
    // datasketches SQL surface (hll_sketch_agg / hll_union_agg /
    // hll_sketch_estimate) — what a SQL user writes WITHOUT
    // graft.ops.Sketches' wrapper. The wrapper adds the self-union
    // HIP-dropping determinism contract (Sketches.scala scaladoc); in
    // the coupon-exact regime both estimators agree, so the raw surface
    // is safely checkable here while Sketches remains the
    // partitioning-safe API at real cardinalities. ~31-word vocabulary
    // = exact regime, so the oracle is real SQL and
    // testdata-independent, as in sketch_epoch_distinct.
    QueryDef("sketch_hll_native", (s, d) =>
      t(s, d, "documents")
        .select(col("lang"), (col("doc_id") % 3).as("epoch"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("lang", "epoch")
        .agg(expr("hll_sketch_agg(w)").as("sk"))
        .groupBy("lang")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")
          .as("n_distinct_est"))
        .orderBy("lang"),
      Some("""
      SELECT lang, count(DISTINCT w) AS n_distinct_est
      FROM (SELECT lang, unnest(list_filter(string_split(text, ' '),
              x -> x <> '')) AS w
            FROM documents)
      GROUP BY lang ORDER BY lang""")),

    // ---- HDF5/NeXus ingestion (the reference's raw input format) -------
    // The graft.sources.Hdf5 pure-JVM container parser reads a
    // deterministic .nxs.h5 fixture corpus (graft.etl.NexusFixtures —
    // every value derives from run/bank/position arithmetic, chunked +
    // shuffle + deflate event datasets, vlen-string notes), the
    // NexusH5 walk turns the trees into a RunBundle, and
    // NexusPipeline.processRuns produces the 8 typed tables. The oracle
    // never parses HDF5: it REPLAYS THE CONTENT FORMULAS in SQL —
    // an independent rederivation at the far side of the whole
    // file-format round trip (writer → parser → walk → distributed
    // pipeline), data-derived at any corpus size. Offsets/pulse times
    // are exact binary (x/64), so ·64 recovers integers and the compare
    // is all-BIGINT.
    QueryDef("nexus_h5_events", (s, _) => {
      val tables = graft.etl.NexusH5.processH5Dir(
        s, graft.etl.NexusFixtures.oracleCorpus())
      tables("events")
        .groupBy("run_id", "bank")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("event_id")).cast("long").as("sum_event_id"),
          sum(round(col("time_offset") * 64)).cast("long").as("sum_offset64"),
          sum(round(col("pulse_time") * 64)).cast("long").as("sum_pulse64"))
        .orderBy("run_id", "bank")
    }, Some("""
      WITH rb AS (
        SELECT r, b, 32 + 8*(r%4) AS p,
               CASE WHEN b=3 THEN 1 ELSE 1 + ((r+b)%3) END AS k
        FROM (SELECT unnest(generate_series(0,5)) AS r),
             (SELECT unnest(generate_series(0,3)) AS b)),
      ev AS (SELECT r, b, k, unnest(generate_series(0, p*k - 1)) AS e FROM rb)
      SELECT 'NXS:' || CAST(1000+r AS VARCHAR) AS run_id,
        CASE WHEN b=3 THEN 'monitor1'
             ELSE 'bank' || CAST(b+1 AS VARCHAR) || '_events' END AS bank,
        CAST(count(*) AS BIGINT) AS n_events,
        CAST(sum((7*e + 13*b + r) % 512) AS BIGINT) AS sum_event_id,
        CAST(sum((31*e + 11*b) % 1000) AS BIGINT) AS sum_offset64,
        CAST(sum(e // k) AS BIGINT) AS sum_pulse64
      FROM ev GROUP BY 1, 2 ORDER BY run_id, bank""")),

    // Per-bank event summaries off the same ingestion: counts and pulse
    // counts per (run, bank) — events_extracted ≡ total_counts ≡ P·k and
    // n_pulses ≡ P by the fixture formulas.
    QueryDef("nexus_h5_summary", (s, _) => {
      val tables = graft.etl.NexusH5.processH5Dir(
        s, graft.etl.NexusFixtures.oracleCorpus())
      tables("event_summary")
        .select(col("run_id"), col("bank"), col("total_counts"),
          col("n_pulses"), col("events_extracted"))
        .orderBy("run_id", "bank")
    }, Some("""
      WITH rb AS (
        SELECT r, b, 32 + 8*(r%4) AS p,
               CASE WHEN b=3 THEN 1 ELSE 1 + ((r+b)%3) END AS k
        FROM (SELECT unnest(generate_series(0,5)) AS r),
             (SELECT unnest(generate_series(0,3)) AS b))
      SELECT 'NXS:' || CAST(1000+r AS VARCHAR) AS run_id,
        CASE WHEN b=3 THEN 'monitor1'
             ELSE 'bank' || CAST(b+1 AS VARCHAR) || '_events' END AS bank,
        CAST(p*k AS BIGINT) AS total_counts,
        CAST(p AS BIGINT) AS n_pulses,
        CAST(p*k AS BIGINT) AS events_extracted
      FROM rb ORDER BY run_id, bank""")),

    // Run-level cross-section of the remaining 6 tables: metadata
    // scalars + file/entry attribute maps (experiment_runs), sample
    // fields incl. the additional_fields spill, user/software counts,
    // DAS-log point counts and value sums (incl. the veto-fallback
    // ones and the string log's NULL value_numeric), and the
    // vlen-string notes read straight off the decoded frame. All
    // numerics are exact binary (x/64, x/4, x/2) so the doubles compare
    // bit-identically and the sums ride integers.
    QueryDef("nexus_h5_run_meta", (s, _) => {
      import graft.etl.{NexusFixtures, NexusH5, NexusPipeline}
      val runs = NexusH5.readRuns(s, NexusFixtures.oracleCorpus())
      val tables = NexusPipeline.processRuns(s, NexusH5.toRunBundle(runs))
      val meta = tables("experiment_runs").select(
        col("run_id"), col("title"), col("duration"), col("proton_charge"),
        col("total_counts"), col("experiment_identifier"), col("definition"),
        element_at(col("file_attributes"), "file_name").as("file_name"),
        element_at(col("entry_attributes"), "NX_class").as("nx_class"))
      val sample = tables("sample").select(
        col("run_id"), col("name").as("sample_name"), col("mass"),
        col("temperature"),
        element_at(col("additional_fields"), "container").as("container"))
      val nUsers = tables("users").groupBy("run_id")
        .agg(count(lit(1)).as("n_users"))
      val sw = tables("software").filter(col("component") === "nexus_writer")
        .select(col("run_id"), col("version").as("writer_version"))
      val logs = tables("daslogs").groupBy("run_id").agg(
        count(lit(1)).as("n_log_points"),
        sum(round(col("value_numeric") * 64)).cast("long").as("sum_value64"),
        count(when(col("value").isNotNull && col("value_numeric").isNull, 1))
          .as("n_nonnumeric_points"),
        max(col("average_value")).as("speed_avg"))
      val notes = runs.toDF().select(
        concat_ws(":", col("instrument_id"), col("run_number")).as("run_id"),
        element_at(col("metadata"), "notes").as("notes"))
      meta.join(sample, Seq("run_id")).join(nUsers, Seq("run_id"))
        .join(sw, Seq("run_id")).join(logs, Seq("run_id"))
        .join(notes, Seq("run_id"))
        .orderBy("run_id")
    }, Some("""
      WITH runs AS (
        SELECT r, 32 + 8*(r%4) AS p FROM (SELECT unnest(generate_series(0,5)) AS r)),
      tc AS (
        SELECT r, CAST(sum(p * (CASE WHEN b=3 THEN 1 ELSE 1 + ((r+b)%3) END)) AS BIGINT) AS total_counts
        FROM runs, (SELECT unnest(generate_series(0,3)) AS b) GROUP BY r),
      pcsum AS (
        SELECT r, sum(10 + e % 5) AS s FROM
          (SELECT r, unnest(generate_series(0, p-1)) AS e FROM runs) GROUP BY r),
      spsum AS (SELECT sum(100 + e % 7) AS s FROM
          (SELECT unnest(generate_series(0, 15)) AS e))
      SELECT 'NXS:' || CAST(1000+r AS VARCHAR) AS run_id,
        'Run ' || CAST(1000+r AS VARCHAR) AS title,
        CAST(3600 + r AS DOUBLE) AS duration,
        1000 + r/2.0 AS proton_charge,
        tc.total_counts,
        'IPTS-' || CAST(2000 + r%5 AS VARCHAR) AS experiment_identifier,
        'NXsns' AS definition,
        'run_' || CAST(1000+r AS VARCHAR) || '.nxs.h5' AS file_name,
        'NXentry' AS nx_class,
        'SAMPLE_' || CAST(r AS VARCHAR) AS sample_name,
        1 + r/4.0 AS mass,
        CAST(300 + r AS DOUBLE) AS temperature,
        'can' || CAST(r AS VARCHAR) AS container,
        CAST(1 + r%2 AS BIGINT) AS n_users,
        '1.2.3' AS writer_version,
        CAST(p + 16 + 8 + 3 + 12 AS BIGINT) AS n_log_points,
        CAST(64 * (pcsum.s + (SELECT s FROM spsum) + 8 + 72) AS BIGINT)
          AS sum_value64,
        CAST(3 AS BIGINT) AS n_nonnumeric_points,
        CAST(103 AS DOUBLE) AS speed_avg,
        'notes for run ' || CAST(1000+r AS VARCHAR) AS notes
      FROM runs JOIN tc USING (r) JOIN pcsum USING (r)
      ORDER BY run_id""")),

    // Integer-substrate PageRank over a doc_id-derived domain link graph
    // (ops/Graph.pageRank — the web-curation domain-quality prior).
    // 20 'siteN' nodes; sites 17-19 never source an edge (dangling-mass
    // path exercised). Total mass 10^12 integer units, floor division
    // at every share, so 3 synchronized power iterations are
    // bit-identical across engines — the oracle unrolls the SAME three
    // iterations in SQL. Data-derived at any corpus scale.
    QueryDef("domain_pagerank", (s, d) => {
      val edges = t(s, d, "documents")
        .filter(col("doc_id") % 20 < 17)
        .select(
          concat(lit("site"), (col("doc_id") % 20).cast("string")).as("src"),
          concat(lit("site"),
            ((col("doc_id") * 7 + 3) % 20).cast("string")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 3)
        .orderBy("node")
    }, Some("""
      WITH e AS (
        SELECT DISTINCT 'site' || CAST(doc_id % 20 AS VARCHAR) AS src,
               'site' || CAST((doc_id*7+3) % 20 AS VARCHAR) AS dst
        FROM documents
        WHERE doc_id % 20 < 17
          AND 'site' || CAST(doc_id % 20 AS VARCHAR)
              <> 'site' || CAST((doc_id*7+3) % 20 AS VARCHAR)),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
      r0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS r FROM nodes),
      c1 AS (SELECT e.dst AS node, sum(r0.r // deg.d) AS c
             FROM e JOIN deg ON deg.node = e.src JOIN r0 ON r0.node = e.src
             GROUP BY 1),
      g1 AS (SELECT coalesce(sum(r0.r), 0) AS dm FROM r0
             LEFT JOIN deg ON deg.node = r0.node WHERE deg.d IS NULL),
      r1 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * (SELECT n FROM nn))
               + (85 * (SELECT dm FROM g1)) // (100 * (SELECT n FROM nn))
               + (85 * coalesce(c1.c, 0)) // 100 AS r
             FROM nodes LEFT JOIN c1 USING (node)),
      c2 AS (SELECT e.dst AS node, sum(r1.r // deg.d) AS c
             FROM e JOIN deg ON deg.node = e.src JOIN r1 ON r1.node = e.src
             GROUP BY 1),
      g2 AS (SELECT coalesce(sum(r1.r), 0) AS dm FROM r1
             LEFT JOIN deg ON deg.node = r1.node WHERE deg.d IS NULL),
      r2 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * (SELECT n FROM nn))
               + (85 * (SELECT dm FROM g2)) // (100 * (SELECT n FROM nn))
               + (85 * coalesce(c2.c, 0)) // 100 AS r
             FROM nodes LEFT JOIN c2 USING (node)),
      c3 AS (SELECT e.dst AS node, sum(r2.r // deg.d) AS c
             FROM e JOIN deg ON deg.node = e.src JOIN r2 ON r2.node = e.src
             GROUP BY 1),
      g3 AS (SELECT coalesce(sum(r2.r), 0) AS dm FROM r2
             LEFT JOIN deg ON deg.node = r2.node WHERE deg.d IS NULL),
      r3 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * (SELECT n FROM nn))
               + (85 * (SELECT dm FROM g3)) // (100 * (SELECT n FROM nn))
               + (85 * coalesce(c3.c, 0)) // 100 AS r
             FROM nodes LEFT JOIN c3 USING (node))
      SELECT node, CAST(r AS BIGINT) AS rank FROM r3 ORDER BY node""")),

    // Data-quality expectation suite (ops/Expectations): the corpus
    // admission gate as ONE aggregation over ONE scan for every
    // row-level check (null / unique / accepted values / range / regex)
    // plus one left-anti join per referential check. The two subset
    // checks run both directions of orders⋈customer so a PASS and a
    // FAIL verdict are both exercised (every customer key exists; not
    // every customer has an order). All counts rederive in SQL.
    QueryDef("data_expectations", (s, d) => {
      import graft.ops.Expectations._
      val docs = t(s, d, "documents")
      val orders = t(s, d, "orders")
      val customer = t(s, d, "customer")
      evaluate(docs, Seq(
          NotNull("text"),
          Unique(Seq("doc_id")),
          AcceptedValues("lang", Seq("de", "en", "es", "fr", "zh")),
          AcceptedValues("lang", Seq("en", "fr")),
          InRange("n_chars", 1, 500),
          MatchesRegex("source", "^src[0-9]+$")))
        .unionByName(evaluate(orders,
          Seq(SubsetOf("o_custkey", customer, "c_custkey"))))
        .unionByName(evaluate(customer,
          Seq(SubsetOf("c_custkey", orders, "o_custkey"))))
        .orderBy("check", "column", "n_violations")
    }, Some("""
      WITH v AS (
        SELECT 'not_null' AS chk, 'text' AS col_,
          (SELECT count(*) FROM documents) AS n_rows,
          (SELECT count(*) FILTER (WHERE text IS NULL) FROM documents)
            AS n_violations
        UNION ALL
        SELECT 'unique', 'doc_id', (SELECT count(*) FROM documents),
          (SELECT count(*) - count(DISTINCT doc_id) FROM documents)
        UNION ALL
        SELECT 'accepted_values', 'lang', (SELECT count(*) FROM documents),
          (SELECT count(*) FILTER (WHERE lang IS NULL
             OR lang NOT IN ('de','en','es','fr','zh')) FROM documents)
        UNION ALL
        SELECT 'accepted_values', 'lang', (SELECT count(*) FROM documents),
          (SELECT count(*) FILTER (WHERE lang IS NULL
             OR lang NOT IN ('en','fr')) FROM documents)
        UNION ALL
        SELECT 'in_range', 'n_chars', (SELECT count(*) FROM documents),
          (SELECT count(*) FILTER (WHERE n_chars IS NULL
             OR n_chars < 1 OR n_chars > 500) FROM documents)
        UNION ALL
        SELECT 'matches_regex', 'source', (SELECT count(*) FROM documents),
          (SELECT count(*) FILTER (WHERE source IS NULL
             OR NOT regexp_matches(source, '^src[0-9]+$')) FROM documents)
        UNION ALL
        SELECT 'subset_of', 'o_custkey->c_custkey',
          (SELECT count(*) FROM orders),
          (SELECT count(*) FROM orders
           WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        UNION ALL
        SELECT 'subset_of', 'c_custkey->o_custkey',
          (SELECT count(*) FROM customer),
          (SELECT count(*) FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)))
      SELECT chk AS "check", col_ AS "column",
        CAST(n_rows AS BIGINT) AS n_rows,
        CAST(n_violations AS BIGINT) AS n_violations,
        n_violations = 0 AS passed
      FROM v ORDER BY 1, 2, 4""")),

    // WARC/WET web-crawl ingestion (sources/WarcIO): records framed by
    // the text source's lineSep (no custom InputFormat, no UDF), header
    // fields + body split by codegen expressions in the scan. The
    // fixture corpus is index-derived (WetFixtures), so the oracle
    // REBUILDS the expected relation arithmetically — urls, dates, byte
    // lengths, and md5 of the reconstructed text — without ever seeing
    // a WARC byte. The warcinfo record must be filtered out and every
    // Content-Length header must equal the body length (ASCII corpus).
    QueryDef("wet_ingest", (s, _) => {
      val corpus = graft.sources.WetFixtures.oracleCorpus()
      graft.sources.WarcIO.wetCorpus(s, corpus)
        .select(col("url"), col("warc_date"), col("content_length"),
          length(col("text")).cast("long").as("n_chars"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy("url")
    }, Some("""
      WITH t AS (
        SELECT 'https://site' || CAST(i%7 AS VARCHAR) || '.example.com/page'
                 || CAST(i AS VARCHAR) AS url,
               '2024-03-0' || CAST(1 + i%9 AS VARCHAR) || 'T00:00:00Z'
                 AS warc_date,
               'Document ' || CAST(i AS VARCHAR) || ' line one.' || chr(10)
                 || 'Line two with token' || CAST((17*i)%100 AS VARCHAR)
                 || '.' AS text
        FROM (SELECT unnest(generate_series(0, 39)) AS i))
      SELECT url, warc_date,
        CAST(length(text) AS BIGINT) AS content_length,
        CAST(length(text) AS BIGINT) AS n_chars,
        md5(text) AS text_md5
      FROM t ORDER BY url""")),

    // Mergeable QUANTILE sketch table + epoch merge (the percentile leg
    // of the sketch algebra, next to sketch_epoch_distinct's HLL and
    // heavy_hitters' top-k): per-(lang, epoch) GK summaries over
    // n_chars fold per lang WITHOUT re-scanning the corpus. GK merge
    // results are bound-guaranteed but not replay-deterministic (the
    // partial-merge tree varies), so the compare NEVER sees a raw
    // quantile: the query exports the rank-bound BOOLEANS — with
    // ε = 1/1000, the merged p50/p90 value's rank interval must
    // intersect [φn − εn − 1, φn + εn + 1], checked in pure integer
    // arithmetic in-Spark — plus the per-lang count both engines
    // rederive. The sketch_stats/regen-proof oracle shape.
    QueryDef("sketch_quantile_epoch", (s, d) => {
      import graft.ops.Sketches
      val vals = t(s, d, "documents")
        .select(col("lang"), (col("doc_id") % 3).as("epoch"),
          col("n_chars").cast("double").as("v"))
      val table = Sketches.quantileSketchTable(
        vals, "v", Seq("lang", "epoch"), eps = 0.001)
      val merged = Sketches.quantileMergeEstimate(
          table, Seq("lang"), Seq(0.5, 0.9), eps = 0.001)
        .select(col("lang"),
          element_at(col("quantiles"), 1).as("q50"),
          element_at(col("quantiles"), 2).as("q90"))
      vals.join(merged, Seq("lang"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("v") <= col("q50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("v") < col("q50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("v") <= col("q90"), 1L).otherwise(0L)).as("le90"),
          sum(when(col("v") < col("q90"), 1L).otherwise(0L)).as("lt90"))
        .select(col("lang"), col("n"),
          // rank interval [lt+1, le] must intersect [φn−εn−1, φn+εn+1]:
          // 1000·le ≥ 500n − n − 1000 AND 1000·(lt+1) ≤ 500n + n + 1000
          (col("le50") * 1000 >= col("n") * 500 - col("n") - 1000 &&
            (col("lt50") + 1) * 1000 <= col("n") * 500 + col("n") + 1000)
            .as("p50_ok"),
          (col("le90") * 1000 >= col("n") * 900 - col("n") - 1000 &&
            (col("lt90") + 1) * 1000 <= col("n") * 900 + col("n") + 1000)
            .as("p90_ok"))
        .orderBy("lang")
    }, Some("""
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
        TRUE AS p50_ok, TRUE AS p90_ok
      FROM documents GROUP BY lang ORDER BY lang""")),

    // Snapshot distribution drift (ops/Drift): corpus A vs a derived
    // snapshot B (every 5th doc removed) on n_chars — fixed-width
    // integer bins with under/overflow edge bins, and total-variation
    // distance as an EXACT RATIONAL (tv_num/tv_den = Σ|c_a·N_b −
    // c_b·N_a| / 2·N_a·N_b) — no float anywhere, bit-identical
    // cross-engine, data-derived at any scale. Bin range 50..500 by 50
    // deliberately leaves both edge bins populated at this corpus.
    QueryDef("snapshot_drift", (s, d) => {
      val docs = t(s, d, "documents")
      val a = docs.select(col("n_chars").cast("long").as("v"))
      val b = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("n_chars").cast("long").as("v"))
      val bins = graft.ops.Drift.binDrift(a, b, "v", lo = 50, width = 50,
        nBins = 9)
      val tv = bins.agg(sum(col("drift_num")).as("tv_num"),
        (sum(col("n_a")) * sum(col("n_b")) * 2).as("tv_den"))
      bins.crossJoin(tv).orderBy("bin")
    }, Some("""
      WITH a AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents),
      b AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents
            WHERE doc_id % 5 <> 0),
      ba AS (SELECT CASE WHEN v < 50 THEN -1 WHEN v >= 500 THEN 9
                    ELSE (v - 50) // 50 END AS bin,
               CAST(count(*) AS BIGINT) AS n_a
             FROM a WHERE v IS NOT NULL GROUP BY 1),
      bb AS (SELECT CASE WHEN v < 50 THEN -1 WHEN v >= 500 THEN 9
                    ELSE (v - 50) // 50 END AS bin,
               CAST(count(*) AS BIGINT) AS n_b
             FROM b WHERE v IS NOT NULL GROUP BY 1),
      j AS (SELECT coalesce(ba.bin, bb.bin) AS bin,
              coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
            FROM ba FULL OUTER JOIN bb ON ba.bin = bb.bin),
      tots AS (SELECT sum(n_a) AS na, sum(n_b) AS nb,
                 sum(abs(n_a * (SELECT sum(n_b) FROM j)
                       - n_b * (SELECT sum(n_a) FROM j))) AS tvn
               FROM j)
      SELECT j.bin, j.n_a, j.n_b,
        CAST(abs(j.n_a * t.nb - j.n_b * t.na) AS BIGINT) AS drift_num,
        CAST(t.tvn AS BIGINT) AS tv_num,
        CAST(2 * t.na * t.nb AS BIGINT) AS tv_den
      FROM j, tots t ORDER BY j.bin""")),

    // Gaps-and-islands interval coalescing (ops/Intervals): 10-minute
    // activity intervals around each event merge into per-type
    // coverage islands — ONE per-key window pass (running max end over
    // ROWS UNBOUNDED..1 PRECEDING), no self-join, keys parallelize.
    // The oracle is the identical window formulation in DuckDB.
    QueryDef("q_interval_coalesce", (s, d) => {
      val iv = eventsUs(s, d).select(col("event_type"),
        col("ts_us").as("s0"), (col("ts_us") + 600000000L).as("e0"))
      graft.ops.Intervals.coalesceIntervals(
          iv, Seq("event_type"), "s0", "e0")
        .select(col("event_type"), col("island"), col("start"),
          col("end"), col("n_merged"))
        .orderBy("event_type", "island")
    }, Some("""
      WITH iv AS (SELECT event_type, epoch_us(ts) AS s0,
                    epoch_us(ts) + 600000000 AS e0 FROM events),
      o AS (SELECT event_type, s0, e0,
              CASE WHEN s0 > max(e0) OVER (PARTITION BY event_type
                     ORDER BY s0, e0
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   THEN 1 ELSE 0 END AS brk
            FROM iv),
      g AS (SELECT event_type, s0, e0,
              sum(brk) OVER (PARTITION BY event_type ORDER BY s0, e0)
                AS island
            FROM o)
      SELECT event_type, CAST(island AS BIGINT) AS island,
        min(s0) AS start, max(e0) AS "end",
        CAST(count(*) AS BIGINT) AS n_merged
      FROM g GROUP BY 1, 2 ORDER BY 1, 2""")),

    // NEAREST as-of (plans/AsOfMergeJoin.nearest): each event's closest
    // click of the same user in EITHER direction, backward winning
    // ties — composed from the two O(L+R) directional merge walks plus
    // a per-row integer gap compare. The oracle ranks all candidate
    // clicks by (|gap|, direction).
    QueryDef("asof_nearest", (s, d) => {
      val ev = eventsUs(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("ct"))
        .agg(max(col("event_id")).as("click_id"))
      graft.plans.AsOfMergeJoin.nearest(
          ev.select("event_id", "user_id", "ts_us"), clicks,
          leftTime = "ts_us", rightTime = "ct",
          keys = Seq("user_id"), rightCols = Seq("click_id"))
        .select(col("event_id"), col("click_id"),
          col("ct").as("click_time_us"))
        .orderBy("event_id")
    }, Some("""
      WITH clicks AS (
        SELECT user_id, epoch_us(ts) AS ct, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)),
      cand AS (
        SELECT e.event_id, c.ct, c.click_id,
          CASE WHEN c.ct <= epoch_us(e.ts) THEN epoch_us(e.ts) - c.ct
               ELSE c.ct - epoch_us(e.ts) END AS gap,
          CASE WHEN c.ct <= epoch_us(e.ts) THEN 0 ELSE 1 END AS fwd
        FROM events e JOIN clicks c ON c.user_id = e.user_id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY event_id
                   ORDER BY gap, fwd) AS rn FROM cand)
      SELECT e.event_id, r.click_id, r.ct AS click_time_us
      FROM events e LEFT JOIN ranked r
        ON r.event_id = e.event_id AND r.rn = 1
      ORDER BY e.event_id""")),

    // Iceberg v1 table format WITHOUT the runtime (sources/IcebergLite
    // — the Hdf5 move applied to the lakehouse): write a lang-
    // partitioned table from the documents slice, append a second
    // snapshot, then read CURRENT and snapshot 1 back purely through
    // version-hint → metadata json → manifest-list avro → manifest
    // avro → data files. The per-lang aggregate is wrong if ANY
    // metadata layer mis-routes; the oracle rederives it from the
    // documents table arithmetic alone. Data-derived at any scale.
    QueryDef("iceberg_roundtrip", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 3 =!= 0),
        dir, partitionBy = Seq("lang"))
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 3 === 0),
        dir, partitionBy = Seq("lang"))
      val current = IcebergLite.readTable(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_current"),
          sum(col("n_chars")).as("sum_chars"))
      val snap1 = IcebergLite.readTable(s, dir, Some(1L))
        .groupBy("lang").agg(count(lit(1)).as("n_snap1"))
      // left + coalesce(0): a lang whose docs all land in the appended
      // snapshot is absent from snapshot 1 — the oracle still emits it
      // (count FILTER → 0), so an inner join would be scale-fragile
      current.join(snap1, Seq("lang"), "left")
        .withColumn("n_snap1", coalesce(col("n_snap1"), lit(0L)))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_current,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        CAST(count(*) FILTER (WHERE doc_id % 3 <> 0) AS BIGINT) AS n_snap1
      FROM documents GROUP BY lang ORDER BY lang""")),

    // Schema evolution on the Iceberg v1 metadata (sources/IcebergLite
    // addColumn/renameColumn): create → evolve (add `quality`, rename
    // `n_chars`→`length`) → append in the NEW shape → read the CURRENT
    // snapshot (old + new files mixed) AND snapshot 1 through the
    // evolved schema. Old files resolve the renamed column BY FIELD ID
    // and read NULL for the added one, so every aggregate here is
    // wrong if id-projection mis-maps; the oracle rederives the mixed
    // result from the documents arithmetic alone. Data-derived at any
    // scale.
    QueryDef("iceberg_evolution", (s, d) => {
      import graft.sources.IcebergLite
      import org.apache.spark.sql.types.LongType
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_evo_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 3 =!= 0), dir)
      IcebergLite.addColumn(s, dir, "quality", LongType)
      IcebergLite.renameColumn(s, dir, "n_chars", "length")
      IcebergLite.appendSnapshot(s,
        docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("lang"),
            col("n_chars").as("length"),
            (col("n_chars") % 7).as("quality")), dir)
      val current = IcebergLite.readTable(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_current"),
          sum(col("length")).as("sum_len"),
          count(col("quality")).as("n_quality"),
          sum(col("quality")).as("sum_quality"))
      val snap1 = IcebergLite.readTable(s, dir, Some(1L))
        .groupBy("lang").agg(count(lit(1)).as("n_snap1"))
      // left + coalesce(0): a lang whose docs all land in the appended
      // snapshot is absent from snapshot 1 — the oracle still emits it
      // (count FILTER → 0), so an inner join would be scale-fragile
      current.join(snap1, Seq("lang"), "left")
        .withColumn("n_snap1", coalesce(col("n_snap1"), lit(0L)))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_current,
        CAST(sum(n_chars) AS BIGINT) AS sum_len,
        CAST(count(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT) AS n_quality,
        CAST(sum(CASE WHEN doc_id % 3 = 0 THEN n_chars % 7 END) AS BIGINT)
          AS sum_quality,
        CAST(count(*) FILTER (WHERE doc_id % 3 <> 0) AS BIGINT) AS n_snap1
      FROM documents GROUP BY lang ORDER BY lang""")),

    // Manifest-bounds FILE SKIPPING (sources/IcebergLite per-file
    // column bounds, spec fields 125/128): three range-disjoint
    // appends segment the doc_id space across files, then a ranged
    // read plans through readTableWhere — files whose bounds exclude
    // the range never scan (files_skipped pins that the planner
    // actually skipped, the recall-floor boolean pattern), and the
    // result must equal the plain SQL filter. Data-derived at any
    // scale.
    QueryDef("iceberg_prune", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_prune_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      val n = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut1 = n / 3
      val cut2 = 2 * n / 3
      IcebergLite.createTable(s, docs.filter(col("doc_id") <= cut1), dir)
      IcebergLite.appendSnapshot(s,
        docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2), dir)
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") > cut2), dir)
      val (kept, total) = IcebergLite.scanFileCount(s, dir,
        Seq(IcebergLite.GtEq("doc_id", cut2 + 1)))
      IcebergLite.readTableWhere(s, dir, Seq(IcebergLite.GtEq("doc_id", cut2 + 1)))
        .filter(col("doc_id") > cut2)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .withColumn("files_skipped", lit(kept < total))
        .orderBy("lang")
    }, Some("""
      WITH cut AS (SELECT 2 * max(doc_id) // 3 AS c2 FROM documents)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        TRUE AS files_skipped
      FROM documents WHERE doc_id > (SELECT c2 FROM cut)
      GROUP BY lang ORDER BY lang""")),

    // SQL-route scan planning (plans/IcebergScan.scala — r15): the SAME
    // ranged read as iceberg_prune, but issued as `spark.sql` over a
    // REGISTERED table name. The pre-CBO rule must map the SQL WHERE
    // onto manifest-bounds file skipping; files_skipped pins — via the
    // optimized plan's actual file count, never an assumption — that
    // the SQL route planned fewer files than the table holds, and the
    // aggregate must equal the plain filter (the oracle rederives it
    // from documents alone). Data-derived at any scale.
    QueryDef("iceberg_sql_prune", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_sqlprune_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      val n = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut1 = n / 3
      val cut2 = 2 * n / 3
      IcebergLite.createTable(s, docs.filter(col("doc_id") <= cut1), dir)
      IcebergLite.appendSnapshot(s,
        docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2), dir)
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") > cut2), dir)
      graft.Catalog.registerIcebergTable(s, "iceberg_sql_prune_docs", dir)
      val total = graft.plans.IcebergSqlAudit.scannedFiles(
        s.sql("SELECT * FROM iceberg_sql_prune_docs"))
      val q = s.sql(
        s"""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
            FROM iceberg_sql_prune_docs WHERE doc_id >= ${cut2 + 1}
            GROUP BY lang""")
      q.withColumn("files_skipped",
          lit(graft.plans.IcebergSqlAudit.scannedFiles(q) < total))
        .orderBy("lang")
    }, Some("""
      WITH cut AS (SELECT 2 * max(doc_id) // 3 AS c2 FROM documents)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        TRUE AS files_skipped
      FROM documents WHERE doc_id > (SELECT c2 FROM cut)
      GROUP BY lang ORDER BY lang""")),

    // SQL TIME TRAVEL on the registered route (plans/IcebergScan r15):
    // `TIMESTAMP AS OF <wall-clock between the commits>` and
    // `VERSION AS OF 1` must BOTH resolve to the first snapshot — the
    // timestamp captured at run time (so the oracle needs no clock:
    // DuckDB rederives the first append's aggregate from documents
    // arithmetic), and ts_equals_v1 pins the two routes returning the
    // same rows. Data-derived at any scale.
    QueryDef("iceberg_sql_time_travel", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_sqltt_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), dir)
      Thread.sleep(5)
      val between = System.currentTimeMillis()
      Thread.sleep(5)
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 2 === 1), dir)
      graft.Catalog.registerIcebergTable(s, "iceberg_sql_tt_docs", dir)
      val asOfTs = s.sql(
        s"""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
            FROM iceberg_sql_tt_docs TIMESTAMP AS OF $between
            GROUP BY lang""")
      val asOfV1 = s.sql(
        """SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
           FROM iceberg_sql_tt_docs VERSION AS OF 1
           GROUP BY lang""")
      val same = asOfTs.exceptAll(asOfV1).count() == 0 &&
        asOfV1.exceptAll(asOfTs).count() == 0
      asOfTs.withColumn("ts_equals_v1", lit(same)).orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        TRUE AS ts_equals_v1
      FROM documents WHERE doc_id % 2 = 0
      GROUP BY lang ORDER BY lang""")),

    // SQL WRITE route, INSERT (plans/IcebergWrite.scala r16 — the
    // reference's users INGEST through their catalog:
    // ingest_neutron_data.py:209-211 writeTo().append()): INSERT INTO a
    // REGISTERED name must land through appendSnapshot INHERITING the
    // table's persisted partition spec and sort order — contract_kept
    // pins both straight from the table metadata AFTER the SQL write,
    // and the aggregate reads the combined table back through the
    // registered scan route; DuckDB rederives it from documents alone.
    // Data-derived at any scale.
    QueryDef("iceberg_sql_insert", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_sqlins_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 3 === 0), dir,
        partitionBy = Seq("lang"), sortBy = Seq("doc_id"),
        bloomFor = Seq("doc_id"))
      graft.Catalog.registerIcebergTable(s, "iceberg_sql_ins_docs", dir)
      docs.filter(col("doc_id") % 3 =!= 0)
        .createOrReplaceTempView("iceberg_sql_ins_src")
      s.sql("""INSERT INTO iceberg_sql_ins_docs
               SELECT doc_id, lang, n_chars FROM iceberg_sql_ins_src""")
      val contractKept =
        IcebergLite.tablePartitionSpec(s, dir) == Seq("lang") &&
          IcebergLite.tableSortOrder(s, dir) == Seq("doc_id")
      s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
               FROM iceberg_sql_ins_docs GROUP BY lang""")
        .withColumn("contract_kept", lit(contractKept))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        TRUE AS contract_kept
      FROM documents GROUP BY lang ORDER BY lang""")),

    // SQL WRITE route, DELETE (plans/IcebergWrite.scala r16): DELETE
    // FROM the registered name maps onto the copy-on-write deleteWhere
    // machinery; the command's returned count AND the surviving
    // aggregate are both rederived by DuckDB from documents arithmetic
    // — an over- or under-reaching delete set breaks either. The read
    // back rides the registered scan route. Data-derived at any scale.
    QueryDef("iceberg_sql_delete", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_sqldel_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), dir)
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 2 === 1), dir)
      graft.Catalog.registerIcebergTable(s, "iceberg_sql_del_docs", dir)
      val nDel = s.sql(
        "DELETE FROM iceberg_sql_del_docs WHERE doc_id % 7 = 3")
        .head().getLong(0)
      s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
               FROM iceberg_sql_del_docs GROUP BY lang""")
        .withColumn("n_deleted", lit(nDel))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM documents
          WHERE doc_id % 7 = 3) AS n_deleted
      FROM documents WHERE doc_id % 7 <> 3
      GROUP BY lang ORDER BY lang""")),

    // SQL WRITE route, MERGE (plans/IcebergWrite.scala r16): the upsert
    // shape (WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *)
    // maps onto equalityDeleteMOR + append — sequence semantics make
    // the re-appended rows survive the delete. Matched rows must carry
    // the source's shifted n_chars, unmatched target rows the original,
    // and unmatched source rows insert; DuckDB rederives the merged
    // state from documents arithmetic. Data-derived at any scale.
    QueryDef("iceberg_sql_merge", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_sqlmrg_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), dir)
      graft.Catalog.registerIcebergTable(s, "iceberg_sql_mrg_docs", dir)
      docs.filter(col("doc_id") % 3 === 0)
        .withColumn("n_chars", col("n_chars") + 100000L)
        .createOrReplaceTempView("iceberg_sql_mrg_src")
      val nKeys = s.sql(
        """MERGE INTO iceberg_sql_mrg_docs t USING iceberg_sql_mrg_src s
           ON t.doc_id = s.doc_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").head().getLong(0)
      s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
               FROM iceberg_sql_mrg_docs GROUP BY lang""")
        .withColumn("n_merge_keys", lit(nKeys))
        .orderBy("lang")
    }, Some("""
      WITH merged AS (
        SELECT doc_id, lang, n_chars + 100000 AS n_chars
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id, lang, n_chars FROM documents
        WHERE doc_id % 2 = 0 AND doc_id % 3 <> 0)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM documents
          WHERE doc_id % 3 = 0) AS n_merge_keys
      FROM merged GROUP BY lang ORDER BY lang""")),

    // SQL WRITE route, UPDATE (plans/IcebergWrite.scala r17): UPDATE
    // SET maps onto the copy-on-write updateWhere machinery — only the
    // files containing matches rewrite, every assignment reads the
    // PRE-update row (simultaneous assignment), and updating the
    // PARTITION column moves rows across partitions under the table
    // contract. The returned count and the post-update state are both
    // DuckDB-rederived from documents arithmetic. Data-derived at any
    // scale.
    QueryDef("iceberg_sql_update", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_squpd_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs, dir, partitionBy = Seq("lang"),
        sortBy = Seq("doc_id"))
      graft.Catalog.registerIcebergTable(s, "iceberg_sql_upd_docs", dir)
      val nUpd = s.sql(
        """UPDATE iceberg_sql_upd_docs
           SET n_chars = n_chars * 2 + 1, lang = \u0027zz\u0027
           WHERE doc_id % 5 = 0""").head().getLong(0)
      s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
               FROM iceberg_sql_upd_docs GROUP BY lang""")
        .withColumn("n_updated", lit(nUpd))
        .orderBy("lang")
    }, Some("""
      WITH upd AS (
        SELECT CASE WHEN doc_id % 5 = 0 THEN \u0027zz\u0027 ELSE lang END AS lang,
          CAST(CASE WHEN doc_id % 5 = 0 THEN n_chars * 2 + 1
               ELSE n_chars END AS BIGINT) AS n_chars
        FROM documents)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM documents
          WHERE doc_id % 5 = 0) AS n_updated
      FROM upd GROUP BY lang ORDER BY lang""")),

    // SQL WRITE route, CONDITIONAL MERGE (plans/IcebergWrite.scala
    // r17): the general first-clause-wins form — WHEN MATCHED AND c
    // THEN UPDATE SET <partial> / WHEN MATCHED THEN DELETE / WHEN NOT
    // MATCHED AND c THEN INSERT *. Matched-even rows merge the two
    // sides\u0027 n_chars (lang keeps the TARGET value — a partial
    // assignment), matched-odd rows delete, and only the unmatched
    // source rows passing the insert condition land; DuckDB rederives
    // the merged state and the effect count. Data-derived at any scale.
    QueryDef("iceberg_sql_merge_cond", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_sqlmc_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), dir)
      graft.Catalog.registerIcebergTable(s, "iceberg_sql_mc_docs", dir)
      docs.filter(col("doc_id") % 3 === 0)
        .withColumn("n_chars", col("n_chars") + 100000L)
        .createOrReplaceTempView("iceberg_sql_mc_src")
      val nEff = s.sql(
        """MERGE INTO iceberg_sql_mc_docs t USING iceberg_sql_mc_src s
           ON t.doc_id = s.doc_id
           WHEN MATCHED AND s.n_chars % 2 = 0 THEN
             UPDATE SET n_chars = s.n_chars + t.n_chars
           WHEN MATCHED THEN DELETE
           WHEN NOT MATCHED AND s.n_chars % 3 = 0 THEN INSERT *""")
        .head().getLong(0)
      s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
               FROM iceberg_sql_mc_docs GROUP BY lang""")
        .withColumn("n_effected", lit(nEff))
        .orderBy("lang")
    }, Some("""
      WITH tgt AS (
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 2 = 0),
      src AS (
        SELECT doc_id, lang, CAST(n_chars + 100000 AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 3 = 0),
      merged AS (
        SELECT t.doc_id, t.lang,
          CASE WHEN s.doc_id IS NOT NULL AND s.n_chars % 2 = 0
               THEN s.n_chars + t.n_chars ELSE t.n_chars END AS n_chars
        FROM tgt t LEFT JOIN src s ON t.doc_id = s.doc_id
        WHERE s.doc_id IS NULL OR s.n_chars % 2 = 0
        UNION ALL
        SELECT s.doc_id, s.lang, s.n_chars
        FROM src s LEFT JOIN tgt t ON s.doc_id = t.doc_id
        WHERE t.doc_id IS NULL AND s.n_chars % 3 = 0)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM documents
           WHERE doc_id % 6 = 0) +
        (SELECT CAST(count(*) AS BIGINT) FROM documents
           WHERE doc_id % 3 = 0 AND doc_id % 2 = 1
             AND (n_chars + 100000) % 3 = 0) AS n_effected
      FROM merged GROUP BY lang ORDER BY lang""")),

    // V2 TABLE CATALOG route (sources/GraftCatalog.scala r17): the
    // reference ingests through its catalog with the DataFrameWriterV2
    // API — df.writeTo(t).using("iceberg").createOrReplace()/.append()
    // (ingest_neutron_data.py:209-211) — and reads back with
    // spark.table. Both writes land as IcebergLite snapshots through
    // spark.sql.catalog.*; the read rides the catalog scan facade; the
    // partition/sort/bloom contract persisted by the CREATE governs the
    // append exactly like the SQL INSERT route (contract_kept pins it).
    // DuckDB rederives the final state. Data-derived at any scale.
    QueryDef("iceberg_writeto", (s, d) => {
      val wh = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_gwh_oracle").toString
      s.conf.set("spark.sql.catalog.gwh",
        classOf[graft.sources.GraftTableCatalog].getName)
      s.conf.set("spark.sql.catalog.gwh.warehouse", wh)
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      docs.filter(col("doc_id") % 3 === 0)
        .writeTo("gwh.writeto_docs").using("iceberg")
        .partitionedBy(col("lang"))
        .tableProperty("sort-order", "doc_id")
        .tableProperty("bloom-columns", "doc_id")
        .createOrReplace()
      docs.filter(col("doc_id") % 3 =!= 0)
        .writeTo("gwh.writeto_docs").append()
      val dir = s"$wh/writeto_docs"
      val contractKept =
        graft.sources.IcebergLite.tablePartitionSpec(s, dir) == Seq("lang") &&
          graft.sources.IcebergLite.tableSortOrder(s, dir) == Seq("doc_id") &&
          graft.sources.IcebergLite.tableBloomCols(s, dir) == Seq("doc_id")
      s.table("gwh.writeto_docs")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .withColumn("contract_kept", lit(contractKept))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        TRUE AS contract_kept
      FROM documents GROUP BY lang ORDER BY lang""")),

    // DYNAMIC PARTITION OVERWRITE (sources/IcebergLite
    // .overwritePartitions r17): INSERT OVERWRITE under
    // partitionOverwriteMode=dynamic replaces exactly the partitions
    // the query touches — rows land for a subset of langs, every other
    // partition survives intact; the transform-aware delete predicate
    // derives from the batch itself (hidden partitioning — the writer
    // never names partitions). DuckDB rederives the merged state from
    // documents arithmetic. Data-derived at any scale.
    QueryDef("iceberg_dynamic_overwrite", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_dynow_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs, dir, partitionBy = Seq("lang"))
      graft.Catalog.registerIcebergTable(s, "iceberg_dynow_docs", dir)
      // replacement rows for ONE partition (the alphabetically-first
      // lang — data-derived so the oracle holds at any scale)
      docs.filter(col("doc_id") % 4 === 1)
        .createOrReplaceTempView("iceberg_dynow_src_raw")
      s.sql("""SELECT doc_id,
                 (SELECT min(lang) FROM iceberg_dynow_docs) AS lang,
                 n_chars + 5000 AS n_chars
               FROM iceberg_dynow_src_raw""")
        .createOrReplaceTempView("iceberg_dynow_src")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        s.sql("""INSERT OVERWRITE iceberg_dynow_docs
                 SELECT doc_id, lang, n_chars FROM iceberg_dynow_src""")
      finally
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
               FROM iceberg_dynow_docs GROUP BY lang""")
        .orderBy("lang")
    }, Some("""
      WITH target_lang AS (SELECT min(lang) AS tl FROM documents),
      merged AS (
        SELECT doc_id, (SELECT tl FROM target_lang) AS lang,
          CAST(n_chars + 5000 AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 4 = 1
        UNION ALL
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents WHERE lang <> (SELECT tl FROM target_lang))
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM merged GROUP BY lang ORDER BY lang""")),

    // MERGE-ON-READ UPDATE (sources/IcebergLite.updateWhereMOR r17 —
    // the position-delete composition of UPDATE): matched rows are
    // dropped by (file_path, pos) delete files and their updated
    // versions append behind them — cost proportional to MATCHES, zero
    // data files rewritten; the read merges delete set + append. The
    // returned count and the merged state are DuckDB-rederived, and
    // no_rewrite pins the mechanism (original file count unchanged,
    // a content=1 delete manifest present). Data-derived at any scale.
    QueryDef("iceberg_mor_update", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_morupd_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs, dir, sortBy = Seq("doc_id"))
      val filesBefore = IcebergLite.metaTable(s, dir, "files")
        .filter(col("content") === 0).count()
      graft.Catalog.registerIcebergTable(s, "iceberg_morupd_docs", dir)
      s.conf.set("spark.graft.iceberg.updateMode", "mor")
      val nUpd =
        try s.sql("""UPDATE iceberg_morupd_docs
                     SET n_chars = n_chars * 3 WHERE doc_id % 7 = 2""")
          .head().getLong(0)
        finally s.conf.set("spark.graft.iceberg.updateMode", "cow")
      val manifests = IcebergLite.metaTable(s, dir, "manifests")
      val files = IcebergLite.metaTable(s, dir, "files")
      val noRewrite =
        files.filter(col("content") === 0).count() > filesBefore &&
          manifests.filter(col("content") === 1).count() >= 1
      s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
               FROM iceberg_morupd_docs GROUP BY lang""")
        .withColumn("n_updated", lit(nUpd))
        .withColumn("no_rewrite", lit(noRewrite))
        .orderBy("lang")
    }, Some("""
      WITH upd AS (
        SELECT lang,
          CAST(CASE WHEN doc_id % 7 = 2 THEN n_chars * 3
               ELSE n_chars END AS BIGINT) AS n_chars
        FROM documents)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM documents
          WHERE doc_id % 7 = 2) AS n_updated,
        TRUE AS no_rewrite
      FROM upd GROUP BY lang ORDER BY lang""")),

    // MAINTENANCE PROCEDURES over the V2 catalog (sources/
    // GraftProcedures r17 — the Spark-4 ProcedureCatalog surface, the
    // `CALL catalog.system.<proc>(...)` shape every Iceberg deployment
    // schedules): tag -> rollback -> rewrite_data_files -> expire, all
    // through SQL CALL; the final state must equal the tagged
    // snapshot's data with the compaction content-preserving, and the
    // rollback/compact/retention counters ride as pinned columns.
    // DuckDB rederives the surviving aggregate. Data-derived at any
    // scale.
    QueryDef("iceberg_call_maintenance", (s, d) => {
      import graft.sources.IcebergLite
      val wh = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_gwh_call_oracle").toString
      s.conf.set("spark.sql.catalog.gwhc",
        classOf[graft.sources.GraftTableCatalog].getName)
      s.conf.set("spark.sql.catalog.gwhc.warehouse", wh)
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      docs.filter(col("doc_id") % 2 === 0)
        .writeTo("gwhc.calldocs").using("iceberg").createOrReplace()
      docs.filter(col("doc_id") % 2 === 1)
        .writeTo("gwhc.calldocs").append()
      // snapshot 2 = evens only (createOrReplace = replace+append when
      // the table pre-exists from an earlier run, so derive the id)
      val snapEvens = IcebergLite.snapshotIds(s, s"$wh/calldocs")
        .takeRight(2).head
      // refs survive createOrReplace by design — drop a leftover tag
      // from an earlier run of this oracle before re-tagging
      if (IcebergLite.tableRefs(s, s"$wh/calldocs").contains("evens"))
        IcebergLite.dropRef(s, s"$wh/calldocs", "evens")
      s.sql(s"CALL gwhc.system.create_tag(`table` => 'calldocs', " +
        s"name => 'evens', snapshot_id => $snapEvens)")
      val rolled = s.sql(
        s"CALL gwhc.system.rollback_to_snapshot(`table` => 'calldocs', " +
          s"snapshot_id => $snapEvens)").head().getLong(0) == snapEvens
      val rewritten = s.sql(
        "CALL gwhc.system.rewrite_data_files(`table` => 'calldocs')")
        .head().getLong(0) >= 0L
      val kept = s.sql(
        "CALL gwhc.system.expire_snapshots(`table` => 'calldocs', " +
          "keep_last => 1)").head().getLong(0) >= 1L
      s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
               FROM gwhc.calldocs GROUP BY lang""")
        .withColumn("maintained", lit(rolled && rewritten && kept))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        TRUE AS maintained
      FROM documents WHERE doc_id % 2 = 0
      GROUP BY lang ORDER BY lang""")),

    // FULL SYNC-MIRROR MERGE (plans/IcebergWrite.scala r17 — the
    // complete statement: WHEN MATCHED UPDATE / WHEN NOT MATCHED
    // INSERT / WHEN NOT MATCHED BY SOURCE DELETE): after the merge the
    // table must equal the source EXACTLY — matched rows updated,
    // missing rows inserted, rows the source no longer has deleted
    // (the CDC snapshot-sync shape). DuckDB rederives the mirrored
    // state straight from the source expression and the effect count
    // from three disjoint cardinalities. Data-derived at any scale.
    QueryDef("iceberg_sql_merge_sync", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_sqlms_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), dir)
      graft.Catalog.registerIcebergTable(s, "iceberg_sql_ms_docs", dir)
      docs.filter(col("doc_id") % 3 === 0)
        .withColumn("n_chars", col("n_chars") + 777L)
        .createOrReplaceTempView("iceberg_sql_ms_src")
      val nEff = s.sql(
        """MERGE INTO iceberg_sql_ms_docs t USING iceberg_sql_ms_src s
           ON t.doc_id = s.doc_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN NOT MATCHED BY SOURCE THEN DELETE""").head().getLong(0)
      s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
               FROM iceberg_sql_ms_docs GROUP BY lang""")
        .withColumn("n_effected", lit(nEff))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars + 777) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM documents
           WHERE doc_id % 3 = 0) +
        (SELECT CAST(count(*) AS BIGINT) FROM documents
           WHERE doc_id % 2 = 0 AND doc_id % 3 <> 0) AS n_effected
      FROM documents WHERE doc_id % 3 = 0
      GROUP BY lang ORDER BY lang""")),

    // STORAGE-PARTITIONED JOIN over the V2 catalog (sources/
    // GraftNativeScan r18): two tables bucketed bucket(8, doc_id) join
    // on doc_id with ZERO Exchange — both scans report the same
    // KeyGroupedPartitioning, so EnsureRequirements co-locates instead
    // of shuffling (at 100 TB, the difference between a co-located
    // merge join and shuffling both tables). `n_join_exchanges` pins
    // the plan property THROUGH the oracle: the physical join subtree
    // must contain no shuffle. Values DuckDB-rederived from a
    // documents self-join. Data-derived at any scale.
    QueryDef("iceberg_spj_join", (s, d) => {
      val wh = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_spj_oracle").toString
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.spjcat",
        classOf[graft.sources.GraftTableCatalog].getName)
      s.conf.set("spark.sql.catalog.spjcat.warehouse", wh)
      val docs = t(s, d, "documents")
      s.sql("""CREATE TABLE spjcat.spj_a (doc_id BIGINT, lang STRING,
               n_chars BIGINT) USING iceberg
               PARTITIONED BY (bucket(8, doc_id))""")
      s.sql("""CREATE TABLE spjcat.spj_b (doc_id BIGINT, n2 BIGINT)
               USING iceberg PARTITIONED BY (bucket(8, doc_id))""")
      docs.select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))
        .writeTo("spjcat.spj_a").append()
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), (col("n_chars") * 2).cast("long").as("n2"))
        .writeTo("spjcat.spj_b").append()
      val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
        "spark.graft.preserveDataGrouping",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled").map(k => k -> s.conf.getOption(k))
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // grouping opt-in (default false — grouping costs split
      // granularity + runtime filtering, so only an SPJ query wants it)
      s.conf.set("spark.graft.preserveDataGrouping", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val joined = s.table("spjcat.spj_a")
          .join(s.table("spjcat.spj_b"), "doc_id")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars") + col("n2")).as("sum_all"))
        val smj = joined.queryExecution.executedPlan.collect {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        }
        val nEx = smj.headOption.map(_.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size).getOrElse(-1)
        joined.withColumn("n_join_exchanges", lit(nEx)).orderBy("lang")
          .localCheckpoint(eager = true)
      } finally saved.foreach { // None = was unset: restore by UNSET, so
        // the session's effective defaults survive (an explicit set of
        // the old value would pin entry defaults forever)
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }, Some("""
      SELECT a.lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(a.n_chars + b.n2) AS BIGINT) AS sum_all,
        0 AS n_join_exchanges
      FROM documents a
      JOIN (SELECT doc_id, n_chars * 2 AS n2 FROM documents
            WHERE doc_id % 2 = 0) b USING (doc_id)
      GROUP BY a.lang ORDER BY a.lang""")),

    // NATIVE V2 row-level DML (sources/GraftNativeWrite r18): UPDATE +
    // subquery DELETE + MERGE resolve through the STOCK analyzer's
    // SupportsRowLevelOperations path — current-catalog single-part
    // names keep the graft parser rewrite out of the loop, so this is
    // the route a third-party tool takes (group-based copy-on-write:
    // the operation's scan plans candidate files, the write replaces
    // exactly those groups in ONE snapshot via executor-side parquet
    // DataWriters). The final state is DuckDB-rederived from documents
    // arithmetic. Data-derived at any scale.
    QueryDef("iceberg_native_dml", (s, d) => {
      val wh = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_ndml_oracle").toString
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      s.conf.set("spark.sql.catalog.ndmlcat",
        classOf[graft.sources.GraftTableCatalog].getName)
      s.conf.set("spark.sql.catalog.ndmlcat.warehouse", wh)
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      s.sql("""CREATE TABLE ndmlcat.ndml_docs (doc_id BIGINT, lang STRING,
               n_chars BIGINT) USING iceberg PARTITIONED BY (lang)""")
      docs.writeTo("ndmlcat.ndml_docs").append()
      docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), (col("n_chars") + 5000L).as("nc"))
        .createOrReplaceTempView("ndml_merge_src")
      docs.filter(col("doc_id") % 13 === 0).select("doc_id")
        .createOrReplaceTempView("ndml_del_keys")
      val prevCat = s.catalog.currentCatalog()
      s.catalog.setCurrentCatalog("ndmlcat")
      try {
        // group-based UPDATE through ReplaceData
        s.sql("UPDATE ndml_docs SET n_chars = n_chars * 2 " +
          "WHERE doc_id % 7 = 3")
        // subquery DELETE: not filter-convertible, so the metadata
        // short-circuit cannot take it — the group plan must
        s.sql("""DELETE FROM ndml_docs WHERE doc_id IN
                 (SELECT doc_id FROM ndml_del_keys)""")
        // the full MERGE through the stock analyzer
        s.sql("""MERGE INTO ndml_docs t USING ndml_merge_src s
                 ON t.doc_id = s.doc_id
                 WHEN MATCHED THEN UPDATE SET n_chars = s.nc
                 WHEN NOT MATCHED THEN INSERT
                   (doc_id, lang, n_chars) VALUES (s.doc_id, 'xx', s.nc)""")
      } finally s.catalog.setCurrentCatalog(prevCat)
      s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
               FROM ndmlcat.ndml_docs GROUP BY lang ORDER BY lang""")
    }, Some("""
      WITH upd AS (
        SELECT doc_id, lang,
          CASE WHEN doc_id % 7 = 3 THEN n_chars * 2 ELSE n_chars END
            AS n_chars
        FROM documents),
      del AS (SELECT * FROM upd WHERE doc_id % 13 <> 0)
      SELECT COALESCE(lang, 'xx') AS lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM (
        SELECT del.lang AS lang,
          CASE WHEN m.doc_id IS NOT NULL THEN m.nc
               ELSE del.n_chars END AS n_chars
        FROM del
        LEFT JOIN (SELECT doc_id, n_chars + 5000 AS nc FROM documents
                   WHERE doc_id % 11 = 0) m USING (doc_id)
        UNION ALL
        SELECT 'xx' AS lang, m.nc AS n_chars
        FROM (SELECT doc_id, n_chars + 5000 AS nc FROM documents
              WHERE doc_id % 11 = 0) m
        WHERE m.doc_id NOT IN (SELECT doc_id FROM del))
      GROUP BY 1 ORDER BY 1""")),

    // REST-CATALOG wire twin (sources/RestCatalog r18): the reference's
    // deployments resolve tables through a catalog SERVICE
    // (spark_events_by_time.py:32,54 — `catalog.database.table` against
    // a REST endpoint). Here the full loop runs over a real HTTP wire
    // against the in-process service: CREATE NAMESPACE + CREATE TABLE
    // through the client catalog, appends that stage data + manifests +
    // manifest list on shared storage and COMMIT through the service
    // (`add-snapshot` — the catalog owns the metadata pointer), reads
    // through the metadata-location the wire returns, and VERSION AS OF
    // time travel resolved from the wire metadata. The aggregate and
    // the pinned pre-second-append count are DuckDB-rederived.
    QueryDef("iceberg_rest_roundtrip", (s, d) => {
      import graft.sources.{GraftRestCatalog, GraftRestCatalogServer}
      val wh = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_rest_oracle").toString
      val p = new org.apache.hadoop.fs.Path(wh)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val server = new GraftRestCatalogServer(s, wh).start()
      try {
        s.conf.set("spark.sql.catalog.rcat",
          classOf[GraftRestCatalog].getName)
        s.conf.set("spark.sql.catalog.rcat.uri", server.uri)
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            col("n_chars").cast("long").as("n_chars"))
        s.sql("CREATE NAMESPACE rcat.db")
        s.sql("""CREATE TABLE rcat.db.docs (doc_id BIGINT, lang STRING,
                 n_chars BIGINT) USING iceberg PARTITIONED BY (lang)""")
        docs.filter(col("doc_id") % 2 === 0)
          .writeTo("rcat.db.docs").append()
        docs.filter(col("doc_id") % 2 =!= 0)
          .writeTo("rcat.db.docs").append()
        // time travel THROUGH THE WIRE metadata: the snapshot before
        // the second append (ids: 1 = create, 2 = first append)
        val nFirst = s.sql(
          "SELECT count(*) AS c FROM rcat.db.docs VERSION AS OF 2")
          .head().getLong(0)
        s.sql("""SELECT lang, count(*) AS n_docs,
                 sum(n_chars) AS sum_chars
                 FROM rcat.db.docs GROUP BY lang""")
          .withColumn("n_first_append", lit(nFirst))
          .orderBy("lang")
          .localCheckpoint(eager = true)
      } finally server.stop()
    }, Some("""
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM documents
         WHERE doc_id % 2 = 0) AS n_first_append
      FROM documents GROUP BY lang ORDER BY lang""")),

    // MERGE-ON-READ deletion (sources/IcebergLite.deleteWhereMOR —
    // the v2 position-delete mechanism): rows are deleted by writing
    // (file_path, pos) delete files, NOT by rewriting data; the read
    // anti-joins the delete set through the content=1 manifest. The
    // aggregate is wrong if the delete set over- or under-reaches, and
    // n_deleted pins the O(matches) count; oracle rederives both from
    // the documents arithmetic. Data-derived at any scale.
    QueryDef("iceberg_mor_delete", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_mor_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), dir)
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 2 === 1), dir)
      val nDel = IcebergLite.deleteWhereMOR(s, dir, col("doc_id") % 7 === 3)
      IcebergLite.readTable(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .withColumn("n_deleted", lit(nDel))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM documents
         WHERE doc_id % 7 = 3) AS n_deleted
      FROM documents WHERE doc_id % 7 <> 3
      GROUP BY lang ORDER BY lang""")),

    // Iceberg v2 EQUALITY deletes, the CDC/streaming-upsert shape
    // (sources/IcebergLite.equalityDeleteMOR): create even docs,
    // equality-delete the doc_id%10=4 keys (write ∝ keys — no file/
    // position naming, no scan), then re-append NEW VERSIONS of those
    // keys (+1000 chars). Sequence semantics must drop only the OLD
    // versions: rows written before the delete match and vanish, the
    // re-appended rows postdate it and survive — an upsert through
    // the real metadata chain (content=2 manifest, key parquet,
    // per-file snapshot provenance). The aggregate is over the
    // merge-on-read result; the oracle rebuilds the upsert
    // relationally. Data-derived at any scale.
    QueryDef("iceberg_eq_delete", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_eq_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      val base = docs.filter(col("doc_id") % 2 === 0)
      val upd = docs.filter(col("doc_id") % 10 === 4)
        .withColumn("n_chars", col("n_chars") + 1000L)
      IcebergLite.createTable(s, base, dir)
      val nKeys = IcebergLite.equalityDeleteMOR(s, dir,
        upd.select(col("doc_id")))
      IcebergLite.appendSnapshot(s, upd, dir)
      IcebergLite.readTable(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .withColumn("n_keys", lit(nKeys))
        .orderBy("lang")
    }, Some("""
      WITH base AS (
        SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0),
      upd AS (
        SELECT doc_id, lang, n_chars + 1000 AS n_chars FROM documents
        WHERE doc_id % 10 = 4),
      final AS (
        SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM upd)
        UNION ALL SELECT * FROM upd)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM upd) AS n_keys
      FROM final GROUP BY lang ORDER BY lang""")),

    // Iceberg CHANGELOG scan (sources/IcebergLite.readChangelog — the
    // CDC read surface): append evens, MOR position-delete the %10=2
    // slice, equality-delete the %10∈{2,4} keys (the %10=2 rows are
    // ALREADY deleted — the pre-image semantics must exclude them, so
    // snapshot 3 emits only the %10=4 rows), then re-append updated
    // versions. The per-snapshot (change_type, rows, Σchars) ledger is
    // wrong if any leg over- or under-emits; DuckDB rebuilds it from
    // documents arithmetic replaying the same upsert history.
    // Data-derived at any scale.
    QueryDef("iceberg_changelog", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_cdc_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      val touched = docs.filter(
        col("doc_id") % 10 === 2 || col("doc_id") % 10 === 4)
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), dir)
      IcebergLite.deleteWhereMOR(s, dir, col("doc_id") % 10 === 2)
      IcebergLite.equalityDeleteMOR(s, dir, touched.select(col("doc_id")))
      IcebergLite.appendSnapshot(s,
        touched.withColumn("n_chars", col("n_chars") + 1000L), dir)
      IcebergLite.readChangelog(s, dir, 0L)
        .groupBy(col("_commit_snapshot_id").as("snapshot_id"),
          col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("snapshot_id", "change_type")
    }, Some("""
      WITH evens AS (
        SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0),
      legs AS (
        SELECT 1 AS snapshot_id, 'insert' AS change_type,
               count(*) AS n, sum(n_chars) AS sc FROM evens
        UNION ALL
        SELECT 2, 'delete', count(*), sum(n_chars)
        FROM evens WHERE doc_id % 10 = 2
        UNION ALL
        SELECT 3, 'delete', count(*), sum(n_chars)
        FROM evens WHERE doc_id % 10 = 4
        UNION ALL
        SELECT 4, 'insert', count(*), sum(n_chars + 1000)
        FROM documents WHERE doc_id % 10 IN (2, 4))
      SELECT CAST(snapshot_id AS BIGINT) AS snapshot_id, change_type,
        CAST(n AS BIGINT) AS n_rows, CAST(sc AS BIGINT) AS sum_chars
      FROM legs ORDER BY snapshot_id, change_type""")),

    // CDC TABLE MIRROR over the changelog (IcebergLite.syncViaChangelog
    // — the consumer side): the same upsert history as
    // iceberg_changelog syncs into a SECOND table keyed on doc_id —
    // deletes replay as equality deletes on the mirror, inserts append,
    // each leg exactly-once by commit key. The compare reads the
    // MIRROR (not the source) through its own metadata chain, plus the
    // pinned delete/insert row accounting; DuckDB rebuilds the final
    // relational state and the ledger from documents arithmetic.
    // Data-derived at any scale.
    QueryDef("iceberg_cdc_mirror", (s, d) => {
      import graft.sources.IcebergLite
      val src = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_cdcsrc_oracle").toString
      val dst = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_cdcdst_oracle")
      if (java.nio.file.Files.isDirectory(dst)) {
        val it = java.nio.file.Files.walk(dst)
        try it.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
        finally it.close()
      }
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      val touched = docs.filter(
        col("doc_id") % 10 === 2 || col("doc_id") % 10 === 4)
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), src)
      IcebergLite.deleteWhereMOR(s, src, col("doc_id") % 10 === 2)
      IcebergLite.equalityDeleteMOR(s, src, touched.select(col("doc_id")))
      IcebergLite.appendSnapshot(s,
        touched.withColumn("n_chars", col("n_chars") + 1000L), src)
      val (nDel, nIns) = IcebergLite.syncViaChangelog(
        s, src, dst.toString, keyCols = Seq("doc_id"))
      IcebergLite.readTable(s, dst.toString)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .withColumn("n_del", lit(nDel)).withColumn("n_ins", lit(nIns))
        .orderBy("lang")
    }, Some("""
      WITH evens AS (
        SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0),
      touched AS (
        SELECT doc_id, lang, n_chars + 1000 AS n_chars FROM documents
        WHERE doc_id % 10 IN (2, 4)),
      final AS (
        SELECT * FROM evens WHERE doc_id % 10 NOT IN (2, 4)
        UNION ALL SELECT * FROM touched)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM evens
          WHERE doc_id % 10 IN (2, 4)) AS n_del,
        (SELECT CAST(count(*) AS BIGINT) FROM evens) +
          (SELECT CAST(count(*) AS BIGINT) FROM touched) AS n_ins
      FROM final GROUP BY lang ORDER BY lang""")),

    // Iceberg METADATA TABLES (sources/IcebergLite.metaTable — the
    // table$snapshots/table$files operational surface): three
    // doc_id%3 appends then a MOR delete; the snapshots table must
    // show the commit log in order and the files table must account
    // every live row to the snapshot that ADDED it — including the
    // content=1 delete file whose record_count is the match count.
    // All driver-side KB-scale metadata arithmetic (no data file is
    // opened); the oracle rebuilds the ledger from documents
    // arithmetic. Data-derived at any scale.
    QueryDef("iceberg_meta_tables", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_meta_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 3 === 0), dir)
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 3 === 1), dir)
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 3 === 2), dir)
      IcebergLite.deleteWhereMOR(s, dir, col("doc_id") % 5 === 2)
      val snaps = IcebergLite.metaTable(s, dir, "snapshots")
        .select(col("snapshot_id"), col("operation"))
      IcebergLite.metaTable(s, dir, "files")
        .groupBy("content", "added_snapshot_id")
        .agg(sum(col("record_count")).as("n_rows"))
        .join(snaps, col("added_snapshot_id") === col("snapshot_id"))
        .select(col("snapshot_id"), col("operation"), col("content"),
          col("n_rows"))
        .orderBy("snapshot_id")
    }, Some("""
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS snapshot_id, 'append' AS operation,
          CAST(0 AS INTEGER) AS content,
          (SELECT CAST(count(*) AS BIGINT) FROM documents
           WHERE doc_id % 3 = 0) AS n_rows
        UNION ALL
        SELECT 2, 'append', 0,
          (SELECT count(*) FROM documents WHERE doc_id % 3 = 1)
        UNION ALL
        SELECT 3, 'append', 0,
          (SELECT count(*) FROM documents WHERE doc_id % 3 = 2)
        UNION ALL
        SELECT 4, 'delete', 1,
          (SELECT count(*) FROM documents WHERE doc_id % 5 = 2))
      ORDER BY snapshot_id""")),

    // Iceberg INCREMENTAL append scan (sources/IcebergLite
    // .readIncremental — "everything since the snapshot I processed
    // last", the downstream-consumer change-capture surface): three
    // doc_id%3 appends; the (1, 3] range must return EXACTLY the rows
    // of appends 2 and 3, each carrying its _added_snapshot_id
    // provenance — cost ∝ the new data (the file set is manifest
    // arithmetic), never the table. The per-lang aggregate is wrong if
    // the range over- or under-reaches; sum_snap pins the provenance.
    // Oracle rederives both from documents arithmetic. Data-derived at
    // any scale.
    QueryDef("iceberg_incremental", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_inc_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 3 === 0), dir)
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 3 === 1), dir)
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 3 === 2), dir)
      IcebergLite.readIncremental(s, dir, 1L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("_added_snapshot_id")).as("sum_snap"))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        CAST(sum(CASE WHEN doc_id % 3 = 1 THEN 2 ELSE 3 END) AS BIGINT)
          AS sum_snap
      FROM documents WHERE doc_id % 3 <> 0
      GROUP BY lang ORDER BY lang""")),

    // Iceberg PARTITION TRANSFORMS / hidden partitioning (sources/
    // IcebergTransforms + IcebergLite): the table is laid out by
    // bucket[8](doc_id) — spec murmur3 over the 8-byte little-endian
    // key, the cross-engine placement contract — but the QUERY only
    // ever names doc_id: scan planning maps the equality predicate
    // through the transform and must read ~1/8 of the files
    // (files_skipped pins it), and the row that comes back must be the
    // right one (a murmur3/layout disagreement between write and plan
    // sides loses the row entirely). Oracle rebuilds the lookup
    // relationally. Data-derived at any scale.
    QueryDef("iceberg_transforms", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_tf_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs, dir,
        partitionBy = Seq("bucket[8]:doc_id"))
      val key = docs.agg(max(col("doc_id"))).head().getLong(0)
      val (kept, total) = IcebergLite.scanFileCount(s, dir,
        Seq(IcebergLite.EqTo("doc_id", key)))
      IcebergLite.readTableWhere(s, dir, Seq(IcebergLite.EqTo("doc_id", key)))
        .filter(col("doc_id") === key)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("files_skipped", lit(kept < total))
    }, Some("""
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
        TRUE AS files_skipped
      FROM documents
      WHERE doc_id = (SELECT max(doc_id) FROM documents)""")),

    // Iceberg PARTITION-SPEC EVOLUTION (r13 verdict task 2): a
    // day(ts)-partitioned table evolves to day(ts)+bucket[8](doc_id)
    // as a METADATA-ONLY commit; the second generation appends under
    // the new spec. A ranged read must prune BOTH generations through
    // their own specs (per-manifest spec ids), a keyed read must
    // bucket-prune the new generation without losing the gen-1 row,
    // and every row of both generations must come back. The oracle
    // rederives counts/sums from the same ts := 2024-01-01 + (doc_id
    // mod 16) days formula; the pruning claims ride as pinned
    // booleans (files-kept arithmetic is asserted in
    // IcebergTransformsSpec). Data-derived at any scale.
    QueryDef("iceberg_spec_evolution", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_specevo_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          date_add(lit("2024-01-01").cast("date"),
            (col("doc_id") % 16).cast("int")).as("ts"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), dir,
        partitionBy = Seq("day:ts"))
      val specId = IcebergLite.evolveSpec(s, dir,
        Seq("day:ts", "bucket[8]:doc_id"))
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 2 === 1), dir,
        partitionBy = Seq("day:ts", "bucket[8]:doc_id"))
      val cut = java.sql.Date.valueOf("2024-01-09")
      val (keptT, total) = IcebergLite.scanFileCount(s, dir,
        Seq(IcebergLite.GtEq("ts", cut)))
      val key = docs.agg(max(col("doc_id"))).head().getLong(0)
      val (keptK, _) = IcebergLite.scanFileCount(s, dir,
        Seq(IcebergLite.EqTo("doc_id", key)))
      val keyRow = IcebergLite.readTableWhere(s, dir,
          Seq(IcebergLite.EqTo("doc_id", key)))
        .filter(col("doc_id") === key)
        .agg(count(lit(1)).as("k_rows"), sum(col("n_chars")).as("k_chars"))
      IcebergLite.readTableWhere(s, dir, Seq(IcebergLite.GtEq("ts", cut)))
        .filter(col("ts") >= cut)
        .agg(count(lit(1)).as("n_range"),
          sum(col("n_chars")).as("sum_range_chars"),
          sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_gen1"),
          sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("n_gen2"))
        .crossJoin(keyRow)
        .withColumn("evolved_spec_id", lit(specId))
        .withColumn("ranged_skips", lit(keptT < total))
        .withColumn("keyed_skips", lit(keptK < total))
    }, Some("""
      WITH base AS (
        SELECT doc_id,
          DATE '2024-01-01' + CAST(doc_id % 16 AS INTEGER) AS ts,
          CAST(n_chars AS BIGINT) AS n_chars
        FROM documents)
      SELECT
        CAST(count(*) FILTER (WHERE ts >= DATE '2024-01-09')
          AS BIGINT) AS n_range,
        CAST(sum(n_chars) FILTER (WHERE ts >= DATE '2024-01-09')
          AS BIGINT) AS sum_range_chars,
        CAST(count(*) FILTER (WHERE ts >= DATE '2024-01-09'
          AND doc_id % 2 = 0) AS BIGINT) AS n_gen1,
        CAST(count(*) FILTER (WHERE ts >= DATE '2024-01-09'
          AND doc_id % 2 = 1) AS BIGINT) AS n_gen2,
        CAST(1 AS BIGINT) AS k_rows,
        CAST((SELECT n_chars FROM base
              WHERE doc_id = (SELECT max(doc_id) FROM base))
          AS BIGINT) AS k_chars,
        CAST(1 AS INTEGER) AS evolved_spec_id,
        TRUE AS ranged_skips,
        TRUE AS keyed_skips
      FROM base""")),

    // Iceberg per-file BLOOM FILTERS (r14 verdict task 4 — point
    // lookups beyond min/max): the table is TIME-sorted (manifest
    // bounds cluster on ts), and doc_id is INTERLEAVED across that
    // order, so every file's doc_id bounds span ~the whole range and
    // an equality probe on the NON-sort column proves nothing by
    // bounds — without the Bloom leg it scans everything. The probe
    // must BOTH skip most files (pinned boolean; the exact kept≪total
    // arithmetic is IcebergLiteSpec's and BenchScale's job) and return
    // exactly the right row — a build/probe hash disagreement loses
    // the row entirely. Oracle rebuilds the lookup relationally.
    QueryDef("iceberg_bloom_lookup", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_iceberg_bloom_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"),
          pmod(col("doc_id") * 2654435761L, lit(100000L)).as("ts"))
      IcebergLite.createTable(s, docs, dir,
        sortBy = Seq("ts"), sortFiles = 8, bloomFor = Seq("doc_id"))
      val key = docs.agg(max(col("doc_id"))).head().getLong(0)
      val (kept, total) = IcebergLite.scanFileCount(s, dir,
        Seq(IcebergLite.EqTo("doc_id", key)))
      IcebergLite.readTableWhere(s, dir, Seq(IcebergLite.EqTo("doc_id", key)))
        .filter(col("doc_id") === key)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("files_skipped", lit(kept < total))
    }, Some("""
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
        TRUE AS files_skipped
      FROM documents
      WHERE doc_id = (SELECT max(doc_id) FROM documents)""")),

    // REAL PNG pixel decode end to end (multimodal/PngCodec — the
    // de-stubbed codec boundary): every doc gets a real zlib-
    // compressed, filter-framed PNG whose pixels follow a formula;
    // Multimodal.decodeImages inflates, unfilters, and sums each
    // channel. Any error anywhere in the container walk, the inflate,
    // or the filter inversion corrupts a sum; the oracle rederives the
    // sums from the pixel formula ALONE (it never sees a PNG byte).
    // Data-derived at any scale.
    QueryDef("image_decode", (s, d) => {
      import graft.multimodal.{Multimodal, PngCodec}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = 24; val h = 16
          (id, PngCodec.encode(PngCodec.Image(w, h, 3,
            Array.tabulate(w * h * 3) { i =>
              val pix = i / 3; val c = i % 3
              ((id * 7 + (pix % w) * 3 + (pix / w) * 5 + c * 11) % 256).toByte
            })))
        }.toDF("doc_id", "content")
      Multimodal.decodeImages(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("sum_c0"), col("sum_c1"), col("sum_c2"))
        .orderBy("doc_id")
    }, Some("""
      WITH px AS (
        SELECT d.doc_id, c.c,
          (d.doc_id * 7 + x.x * 3 + y.y * 5 + c.c * 11) % 256 AS v
        FROM documents d,
             (SELECT unnest(generate_series(0, 23)) AS x) x,
             (SELECT unnest(generate_series(0, 15)) AS y) y,
             (SELECT unnest(generate_series(0, 2)) AS c) c)
      SELECT doc_id,
        CAST(24 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        CAST(3 AS INTEGER) AS channels,
        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_c0,
        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_c1,
        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_c2
      FROM px GROUP BY doc_id ORDER BY doc_id""")),

    // REAL BMP pixel decode end to end (multimodal/BmpCodec r14 — the
    // uncompressed Windows DIB container): every doc gets a real
    // 24-bit BI_RGB bottom-up BMP whose pixels follow a formula;
    // decodeImages walks the headers, un-pads the 4-byte rows,
    // reorders BGR→RGB and bottom-up→top-down, and sums each channel.
    // The oracle rederives the sums from the formula alone — a row-
    // order or channel-order bug corrupts them. Width 11 forces a
    // nonzero row pad. Data-derived at any scale.
    QueryDef("bmp_decode", (s, d) => {
      import graft.multimodal.{BmpCodec, Multimodal, PngCodec}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = 11; val h = 7
          (id, BmpCodec.encode(PngCodec.Image(w, h, 3,
            Array.tabulate(w * h * 3) { i =>
              val pix = i / 3; val c = i % 3
              ((id * 11 + (pix % w) * 5 + (pix / w) * 7 + c * 13) % 256).toByte
            })))
        }.toDF("doc_id", "content")
      Multimodal.decodeImages(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("sum_c0"), col("sum_c1"), col("sum_c2"))
        .orderBy("doc_id")
    }, Some("""
      WITH px AS (
        SELECT d.doc_id, c.c,
          (d.doc_id * 11 + x.x * 5 + y.y * 7 + c.c * 13) % 256 AS v
        FROM documents d,
             (SELECT unnest(generate_series(0, 10)) AS x) x,
             (SELECT unnest(generate_series(0, 6)) AS y) y,
             (SELECT unnest(generate_series(0, 2)) AS c) c)
      SELECT doc_id,
        CAST(11 AS INTEGER) AS width, CAST(7 AS INTEGER) AS height,
        CAST(3 AS INTEGER) AS channels,
        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_c0,
        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_c1,
        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_c2
      FROM px GROUP BY doc_id ORDER BY doc_id""")),

    // REAL netpbm P6 decode end to end (multimodal/PnmCodec r14): the
    // zero-compression interchange image; the oracle rederives the
    // channel sums from the pixel formula alone. Data-derived at any
    // scale.
    QueryDef("pnm_decode", (s, d) => {
      import graft.multimodal.{Multimodal, PngCodec, PnmCodec}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = 9; val h = 5
          (id, PnmCodec.encode(PngCodec.Image(w, h, 3,
            Array.tabulate(w * h * 3) { i =>
              val pix = i / 3; val c = i % 3
              ((id * 19 + (pix % w) * 3 + (pix / w) * 17 + c * 7) % 256).toByte
            })))
        }.toDF("doc_id", "content")
      Multimodal.decodeImages(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("sum_c0"), col("sum_c1"), col("sum_c2"))
        .orderBy("doc_id")
    }, Some("""
      WITH px AS (
        SELECT d.doc_id, c.c,
          (d.doc_id * 19 + x.x * 3 + y.y * 17 + c.c * 7) % 256 AS v
        FROM documents d,
             (SELECT unnest(generate_series(0, 8)) AS x) x,
             (SELECT unnest(generate_series(0, 4)) AS y) y,
             (SELECT unnest(generate_series(0, 2)) AS c) c)
      SELECT doc_id,
        CAST(9 AS INTEGER) AS width, CAST(5 AS INTEGER) AS height,
        CAST(3 AS INTEGER) AS channels,
        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_c0,
        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_c1,
        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_c2
      FROM px GROUP BY doc_id ORDER BY doc_id""")),

    // REAL baseline-TIFF pixel decode end to end (multimodal/TiffCodec
    // r14): every doc gets a real little-endian two-strip uncompressed
    // RGB TIFF of formula pixels; decodeImages walks the IFD, follows
    // offset-stored BitsPerSample/strip arrays, reassembles the strips
    // and sums each channel. The oracle rederives the sums from the
    // formula alone — a strip-order or value-offset bug corrupts them.
    // Height 5 makes the strips UNEQUAL (3+2 rows). Data-derived at
    // any scale.
    QueryDef("tiff_decode", (s, d) => {
      import graft.multimodal.{Multimodal, PngCodec, TiffCodec}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = 10; val h = 5
          (id, TiffCodec.encode(PngCodec.Image(w, h, 3,
            Array.tabulate(w * h * 3) { i =>
              val pix = i / 3; val c = i % 3
              ((id * 23 + (pix % w) * 7 + (pix / w) * 11 + c * 5) % 256).toByte
            })))
        }.toDF("doc_id", "content")
      Multimodal.decodeImages(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("sum_c0"), col("sum_c1"), col("sum_c2"))
        .orderBy("doc_id")
    }, Some("""
      WITH px AS (
        SELECT d.doc_id, c.c,
          (d.doc_id * 23 + x.x * 7 + y.y * 11 + c.c * 5) % 256 AS v
        FROM documents d,
             (SELECT unnest(generate_series(0, 9)) AS x) x,
             (SELECT unnest(generate_series(0, 4)) AS y) y,
             (SELECT unnest(generate_series(0, 2)) AS c) c)
      SELECT doc_id,
        CAST(10 AS INTEGER) AS width, CAST(5 AS INTEGER) AS height,
        CAST(3 AS INTEGER) AS channels,
        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_c0,
        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_c1,
        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_c2
      FROM px GROUP BY doc_id ORDER BY doc_id""")),

    // REAL WAV PCM sample decode end to end (multimodal/WavCodec):
    // every doc gets a real RIFF/fmt/data 16-bit PCM stream whose
    // samples follow a formula; decodeAudio walks the chunks, decodes
    // the samples, and derives EXACT integer features. The oracle
    // rederives energy (Σ s²), zero crossings (sign-change count via
    // LAG), and peak from the formula alone — it never sees a WAV
    // byte. Data-derived at any scale.
    QueryDef("audio_decode", (s, d) => {
      import graft.multimodal.{Multimodal, WavCodec}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          (id, WavCodec.encode(WavCodec.Pcm(1, 8000, 16,
            Array.tabulate(256) { tt =>
              ((id * 31 + tt.toLong * tt * 7) % 2000 - 1000).toInt
            })))
        }.toDF("doc_id", "content")
      Multimodal.decodeAudio(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("channels"), col("sample_rate"),
          col("bits_per_sample"), col("n_frames"), col("energy"),
          col("zero_crossings"), col("peak"))
        .orderBy("doc_id")
    }, Some("""
      WITH sm AS (
        SELECT d.doc_id, t.t,
          (d.doc_id * 31 + t.t * t.t * 7) % 2000 - 1000 AS v
        FROM documents d,
             (SELECT unnest(generate_series(0, 255)) AS t) t),
      lagged AS (
        SELECT doc_id, v,
          lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
        FROM sm)
      SELECT doc_id,
        CAST(1 AS INTEGER) AS channels,
        CAST(8000 AS INTEGER) AS sample_rate,
        CAST(16 AS INTEGER) AS bits_per_sample,
        CAST(256 AS BIGINT) AS n_frames,
        CAST(sum(v * v) AS BIGINT) AS energy,
        CAST(count(*) FILTER (WHERE pv IS NOT NULL
          AND (v < 0) <> (pv < 0)) AS BIGINT) AS zero_crossings,
        CAST(max(abs(v)) AS BIGINT) AS peak
      FROM lagged GROUP BY doc_id ORDER BY doc_id""")),

    // REAL AIFF decode end to end (multimodal/AiffCodec — the
    // big-endian cousin of WAV, incl. the 80-bit EXTENDED-float sample
    // rate whose mis-parse is the classic AIFF bug): every doc gets a
    // real FORM/COMM/SSND stream of formula samples at a per-doc
    // sample RATE (8000/11025/22050/44100 by doc_id — the extended
    // float exercised across corners); decodeAudio sniffs AIFF onto
    // the shared Pcm substrate and DuckDB rederives rate, frames,
    // energy, zero crossings and peak from the formulas alone.
    // Data-derived at any scale.
    QueryDef("aiff_decode", (s, d) => {
      import graft.multimodal.{AiffCodec, Multimodal, WavCodec}
      import s.implicits._
      val rates = Array(8000, 11025, 22050, 44100)
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          (id, AiffCodec.encode(WavCodec.Pcm(1, rates((id % 4).toInt), 16,
            Array.tabulate(200) { tt =>
              ((id * 37 + tt.toLong * tt * 11) % 2400 - 1200).toInt
            })))
        }.toDF("doc_id", "content")
      Multimodal.decodeAudio(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("channels"), col("sample_rate"),
          col("bits_per_sample"), col("n_frames"), col("energy"),
          col("zero_crossings"), col("peak"))
        .orderBy("doc_id")
    }, Some("""
      WITH sm AS (
        SELECT d.doc_id, t.t,
          (d.doc_id * 37 + t.t * t.t * 11) % 2400 - 1200 AS v
        FROM documents d,
             (SELECT unnest(generate_series(0, 199)) AS t) t),
      lagged AS (
        SELECT doc_id, v,
          lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
        FROM sm)
      SELECT doc_id,
        CAST(1 AS INTEGER) AS channels,
        CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 11025
          WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
        CAST(16 AS INTEGER) AS bits_per_sample,
        CAST(200 AS BIGINT) AS n_frames,
        CAST(sum(v * v) AS BIGINT) AS energy,
        CAST(count(*) FILTER (WHERE pv IS NOT NULL
          AND (v < 0) <> (pv < 0)) AS BIGINT) AS zero_crossings,
        CAST(max(abs(v)) AS BIGINT) AS peak
      FROM lagged GROUP BY doc_id ORDER BY doc_id""")),

    // REAL FLAC compressed-audio decode end to end (multimodal/
    // FlacCodec): every doc gets a real multi-frame FLAC stream
    // (blockSize 96 → 3 frames incl. a partial tail) of formula
    // samples; decodeAudio sniffs FLAC, Rice-decodes the residuals
    // through the fixed-predictor recurrences, verifies CRC-8/CRC-16/
    // MD5, and derives the same exact integer features as the WAV
    // path. The oracle rederives energy/zero-crossings/peak from the
    // sample formula alone — it never sees a FLAC byte, so any error
    // in the whole compress→decompress chain corrupts a sum.
    // Data-derived at any scale.
    QueryDef("flac_decode", (s, d) => {
      import graft.multimodal.{FlacCodec, Multimodal, WavCodec}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          (id, FlacCodec.encode(WavCodec.Pcm(1, 8000, 16,
            Array.tabulate(256) { tt =>
              ((id * 37 + tt.toLong * tt * 5) % 3000 - 1500).toInt
            }), blockSize = 96))
        }.toDF("doc_id", "content")
      Multimodal.decodeAudio(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("channels"), col("sample_rate"),
          col("bits_per_sample"), col("n_frames"), col("energy"),
          col("zero_crossings"), col("peak"))
        .orderBy("doc_id")
    }, Some("""
      WITH sm AS (
        SELECT d.doc_id, t.t,
          (d.doc_id * 37 + t.t * t.t * 5) % 3000 - 1500 AS v
        FROM documents d,
             (SELECT unnest(generate_series(0, 255)) AS t) t),
      lagged AS (
        SELECT doc_id, v,
          lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
        FROM sm)
      SELECT doc_id,
        CAST(1 AS INTEGER) AS channels,
        CAST(8000 AS INTEGER) AS sample_rate,
        CAST(16 AS INTEGER) AS bits_per_sample,
        CAST(256 AS BIGINT) AS n_frames,
        CAST(sum(v * v) AS BIGINT) AS energy,
        CAST(count(*) FILTER (WHERE pv IS NOT NULL
          AND (v < 0) <> (pv < 0)) AS BIGINT) AS zero_crossings,
        CAST(max(abs(v)) AS BIGINT) AS peak
      FROM lagged GROUP BY doc_id ORDER BY doc_id""")),

    // Iceberg INCREMENTAL table-to-table REPLICATION (sources/
    // IcebergLite.replicateIncremental — the downstream-sync shape):
    // mirror a 2-append source into a destination, one destination
    // commit per source snapshot, the consumed watermark riding the
    // destination's own commit-key log (no side state). n_copied pins
    // cost ∝ the new data; n_second pins the exactly-once no-op on
    // re-run; the aggregate is wrong if any snapshot is lost or
    // double-applied. Rebuilt relationally by DuckDB. Data-derived at
    // any scale.
    QueryDef("iceberg_replicate", (s, d) => {
      import graft.sources.IcebergLite
      val base = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_repl_oracle")
      val src = base.resolve("src").toString
      val dst = base.resolve("dst").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), src)
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 2 === 1), src)
      // a fresh destination every run (the oracle is deterministic)
      val fsPath = new org.apache.hadoop.fs.Path(dst)
      fsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsPath, true)
      val nCopied = IcebergLite.replicateIncremental(s, src, dst)
      val nSecond = IcebergLite.replicateIncremental(s, src, dst)
      IcebergLite.readTable(s, dst)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .withColumn("n_copied", lit(nCopied))
        .withColumn("n_second", lit(nSecond))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_copied,
        CAST(0 AS BIGINT) AS n_second
      FROM documents GROUP BY lang ORDER BY lang""")),

    // Iceberg WRITE-AUDIT-PUBLISH over branch refs (sources/IcebergLite
    // .createBranch/appendSnapshot(toBranch)/fastForward): the staging
    // workflow a production lakehouse ingest runs — land the new batch
    // on an audit branch (main's readers see NOTHING), validate it,
    // then publish by fast-forwarding main, atomically. The oracle
    // pins both sides of the gate: n_before (main while staged) must
    // be the pre-batch count, and the per-lang aggregate (after
    // publish) must cover everything — wrong if branch commits leak
    // into main early or the fast-forward loses staged snapshots.
    // Rebuilt relationally by DuckDB. Data-derived at any scale.
    QueryDef("iceberg_wap", (s, d) => {
      import graft.sources.IcebergLite
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_iceberg_wap_oracle").toString
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      IcebergLite.createTable(s, docs.filter(col("doc_id") % 2 === 0), dir)
      IcebergLite.createBranch(s, dir, "audit")
      IcebergLite.appendSnapshot(s, docs.filter(col("doc_id") % 2 === 1),
        dir, toBranch = "audit")
      val before = IcebergLite.readTable(s, dir).count()
      IcebergLite.fastForward(s, dir, "main", "audit")
      IcebergLite.readTable(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .withColumn("n_before", lit(before))
        .orderBy("lang")
    }, Some("""
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        (SELECT CAST(count(*) AS BIGINT) FROM documents
         WHERE doc_id % 2 = 0) AS n_before
      FROM documents GROUP BY lang ORDER BY lang""")),

    // REAL G.711 LOSSY audio decode end to end (multimodal/WavCodec
    // .G711 — µ-law AND A-law, the telephony companding formats whose
    // expansion is fully formula-defined, ITU-T G.711): every doc gets
    // a real tag-7 (even doc_id, µ-law) or tag-6 (odd, A-law) WAV
    // whose companded codes follow a formula; decodeAudio sniffs the
    // RIFF, expands the codes through the segmented-companding chain
    // to 16-bit linear, and derives the exact integer features. The
    // oracle REPLAYS THE EXPANSION ITSELF in SQL (sign/segment/
    // mantissa arithmetic from the code formula — it never sees a WAV
    // byte), so any error in the compress→container→expand chain
    // corrupts a sum. Data-derived at any scale.
    QueryDef("g711_decode", (s, d) => {
      import graft.multimodal.{Multimodal, WavCodec}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val mu = id % 2 == 0
          val samples = Array.tabulate(256) { tt =>
            val c = ((id * 13 + tt.toLong * tt * 3) % 256).toInt
            if (mu) WavCodec.G711.mulawDecode(c)
            else WavCodec.G711.alawDecode(c)
          }
          (id, WavCodec.encodeG711(WavCodec.Pcm(1, 8000, 16, samples),
            if (mu) "mu" else "a"))
        }.toDF("doc_id", "content")
      Multimodal.decodeAudio(s, blobs, "doc_id", "content")
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, "mu").otherwise("a").as("law"),
          col("channels"), col("sample_rate"), col("bits_per_sample"),
          col("n_frames"), col("energy"), col("zero_crossings"),
          col("peak"))
        .orderBy("doc_id")
    }, Some("""
      WITH sm AS (
        SELECT d.doc_id, t.t,
          (d.doc_id * 13 + t.t * t.t * 3) % 256 AS c
        FROM documents d,
             (SELECT unnest(generate_series(0, 255)) AS t) t),
      expanded AS (
        SELECT doc_id, t,
          CASE WHEN doc_id % 2 = 0 THEN
            -- mu-law: u = ~c; midpoint expansion, sign bit negative
            CASE WHEN (255 - c) >= 128 THEN
              -((((255 - c) % 16) * 8 + 132)
                * CAST(power(2, ((255 - c) // 16) % 8) AS BIGINT) - 132)
            ELSE
              ((((255 - c) % 16) * 8 + 132)
                * CAST(power(2, ((255 - c) // 16) % 8) AS BIGINT) - 132)
            END
          ELSE
            -- A-law: a = c XOR 0x55; sign bit POSITIVE
            CASE WHEN xor(c, 85) >= 128 THEN 1 ELSE -1 END *
            CASE WHEN (xor(c, 85) // 16) % 8 = 0
                 THEN (xor(c, 85) % 16) * 16 + 8
                 WHEN (xor(c, 85) // 16) % 8 = 1
                 THEN (xor(c, 85) % 16) * 16 + 264
                 ELSE ((xor(c, 85) % 16) * 16 + 264)
                   * CAST(power(2, (xor(c, 85) // 16) % 8 - 1) AS BIGINT)
            END
          END AS v
        FROM sm),
      lagged AS (
        SELECT doc_id, v,
          lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
        FROM expanded)
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'mu' ELSE 'a' END AS law,
        CAST(1 AS INTEGER) AS channels,
        CAST(8000 AS INTEGER) AS sample_rate,
        CAST(16 AS INTEGER) AS bits_per_sample,
        CAST(256 AS BIGINT) AS n_frames,
        CAST(sum(v * v) AS BIGINT) AS energy,
        CAST(count(*) FILTER (WHERE pv IS NOT NULL
          AND (v < 0) <> (pv < 0)) AS BIGINT) AS zero_crossings,
        CAST(max(abs(v)) AS BIGINT) AS peak
      FROM lagged GROUP BY doc_id ORDER BY doc_id""")),

    // REAL animated-GIF pixel decode end to end (multimodal/GifCodec):
    // every doc gets a 3-frame GIF89a — formula palette (64 colors),
    // formula indices, frame 1 INTERLACED, frames offset on the
    // logical screen — and gifFrames LZW-decompresses, deinterlaces,
    // palette-maps, and emits per-frame placement + exact channel sums
    // + a position-weighted sum (order-sensitive: a mis-deinterlace
    // keeps the plain sums but breaks wsum_r). The oracle rederives
    // everything from the index/palette formulas alone — it never sees
    // a GIF byte. Data-derived at any scale.
    QueryDef("gif_decode", (s, d) => {
      import graft.multimodal.{GifCodec, Multimodal}
      import s.implicits._
      val palette = Array.tabulate(64)(j =>
        (((j * 5) % 256) << 16) | (((j * 7) % 256) << 8) | ((j * 11) % 256))
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val fw = 16; val fh = 12
          val frames = (0 until 3).map { f =>
            GifCodec.IndexedFrame(f * 2, f, fw, fh,
              Array.tabulate(fw * fh)(pix =>
                ((id * 3 + f * 17 + pix) % 64).toByte),
              interlace = f == 1)
          }
          (id, GifCodec.encode(20, 14, palette, frames))
        }.toDF("doc_id", "content")
      Multimodal.gifFrames(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("frame_idx"),
          col("left").as("f_left"), col("top").as("f_top"),
          col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"), col("wsum_r"))
        .orderBy("doc_id", "frame_idx")
    }, Some("""
      WITH px AS (
        SELECT d.doc_id, f.f, p.p,
          (d.doc_id * 3 + f.f * 17 + p.p) % 64 AS idx
        FROM documents d,
             (SELECT unnest(generate_series(0, 2)) AS f) f,
             (SELECT unnest(generate_series(0, 191)) AS p) p)
      SELECT doc_id,
        CAST(f AS INTEGER) AS frame_idx,
        CAST(f * 2 AS INTEGER) AS f_left, CAST(f AS INTEGER) AS f_top,
        CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
        CAST(sum((idx * 5) % 256) AS BIGINT) AS sum_r,
        CAST(sum((idx * 7) % 256) AS BIGINT) AS sum_g,
        CAST(sum((idx * 11) % 256) AS BIGINT) AS sum_b,
        CAST(sum(p * ((idx * 5) % 256)) AS BIGINT) AS wsum_r
      FROM px GROUP BY doc_id, f ORDER BY doc_id, frame_idx""")),

    // REAL baseline JPEG pixel decode end to end (multimodal/
    // JpegCodec): every doc gets a real 4:2:0 color JPEG — formula
    // YCbCr planes, constant per 8×8 luma block / per 16×16 chroma
    // macroblock, encoded at quality 100 where every quantizer is 1,
    // so the DCT→Huffman→decode chain is EXACT (only DC survives and
    // divides by 1). decodeImages Huffman-decodes, dequantizes,
    // IDCTs, upsamples the subsampled chroma, and color-converts with
    // the fixed-point BT.601 inverse; the oracle rederives the RGB
    // channel sums from the block formulas + the same integer
    // conversion ALONE (it never sees a JPEG byte). Any error in the
    // marker walk, entropy decode, dequant, IDCT, upsampling, or
    // color transform corrupts a sum. Data-derived at any scale.
    QueryDef("jpeg_decode", (s, d) => {
      import graft.multimodal.{JpegCodec, Multimodal}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = 32; val h = 16
          val yP = Array.tabulate(w * h) { i =>
            val bx = (i % w) / 8; val by = (i / w) / 8
            (((id * 13 + bx * 17 + by * 29) % 216) + 20).toInt
          }
          val cbP = Array.tabulate(w * h) { i =>
            val mx = (i % w) / 16
            (((id * 7 + mx * 31) % 200) + 28).toInt
          }
          val crP = Array.tabulate(w * h) { i =>
            val mx = (i % w) / 16
            (((id * 11 + mx * 23) % 200) + 30).toInt
          }
          (id, JpegCodec.encodePlanes(Array(yP, cbP, crP), w, h,
            quality = 100, subsample420 = true))
        }.toDF("doc_id", "content")
      Multimodal.decodeImages(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("sum_c0"), col("sum_c1"), col("sum_c2"))
        .orderBy("doc_id")
    }, Some("""
      WITH blk AS (
        SELECT d.doc_id,
          ((d.doc_id * 13 + bx.bx * 17 + yb.yb * 29) % 216) + 20 AS yv,
          ((d.doc_id * 7 + (bx.bx // 2) * 31) % 200) + 28 AS cb,
          ((d.doc_id * 11 + (bx.bx // 2) * 23) % 200) + 30 AS cr
        FROM documents d,
             (SELECT unnest(generate_series(0, 3)) AS bx) bx,
             (SELECT unnest(generate_series(0, 1)) AS yb) yb),
      conv AS (
        SELECT doc_id,
          LEAST(255, GREATEST(0, yv + CAST(floor(
            (91881 * (cr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
          LEAST(255, GREATEST(0, yv - CAST(floor(
            (22554 * (cb - 128) + 46802 * (cr - 128) + 32768) / 65536.0)
            AS BIGINT))) AS g,
          LEAST(255, GREATEST(0, yv + CAST(floor(
            (116130 * (cb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
        FROM blk)
      SELECT doc_id,
        CAST(32 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        CAST(3 AS INTEGER) AS channels,
        CAST(sum(r) * 64 AS BIGINT) AS sum_c0,
        CAST(sum(g) * 64 AS BIGINT) AS sum_c1,
        CAST(sum(b) * 64 AS BIGINT) AS sum_c2
      FROM conv GROUP BY doc_id ORDER BY doc_id""")),

    // REAL PROGRESSIVE JPEG decode end to end (multimodal/JpegCodec
    // SOF2): the same block-constant quality-100 exactness regime as
    // jpeg_decode, but the stream is MULTI-SCAN — DC first + refinement
    // under successive approximation, per-component AC spectral bands
    // with EOB runs, per-scan Huffman tables — so the whole
    // progressive reassembly (coefficient accumulation across scans,
    // bit-plane refinement, run skipping) is what the oracle checks:
    // DuckDB rederives the RGB channel sums from the block formulas
    // without seeing a byte. Data-derived at any scale.
    QueryDef("jpeg_progressive_decode", (s, d) => {
      import graft.multimodal.{JpegCodec, Multimodal}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = 32; val h = 16
          val yP = Array.tabulate(w * h) { i =>
            val bx = (i % w) / 8; val by = (i / w) / 8
            (((id * 19 + bx * 23 + by * 31) % 216) + 20).toInt
          }
          val cbP = Array.tabulate(w * h) { i =>
            val mx = (i % w) / 16
            (((id * 5 + mx * 37) % 200) + 28).toInt
          }
          val crP = Array.tabulate(w * h) { i =>
            val mx = (i % w) / 16
            (((id * 3 + mx * 41) % 200) + 30).toInt
          }
          (id, JpegCodec.encodePlanes(Array(yP, cbP, crP), w, h,
            quality = 100, subsample420 = true, progressive = true))
        }.toDF("doc_id", "content")
      Multimodal.decodeImages(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("sum_c0"), col("sum_c1"), col("sum_c2"))
        .orderBy("doc_id")
    }, Some("""
      WITH blk AS (
        SELECT d.doc_id,
          ((d.doc_id * 19 + bx.bx * 23 + yb.yb * 31) % 216) + 20 AS yv,
          ((d.doc_id * 5 + (bx.bx // 2) * 37) % 200) + 28 AS cb,
          ((d.doc_id * 3 + (bx.bx // 2) * 41) % 200) + 30 AS cr
        FROM documents d,
             (SELECT unnest(generate_series(0, 3)) AS bx) bx,
             (SELECT unnest(generate_series(0, 1)) AS yb) yb),
      conv AS (
        SELECT doc_id,
          LEAST(255, GREATEST(0, yv + CAST(floor(
            (91881 * (cr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
          LEAST(255, GREATEST(0, yv - CAST(floor(
            (22554 * (cb - 128) + 46802 * (cr - 128) + 32768) / 65536.0)
            AS BIGINT))) AS g,
          LEAST(255, GREATEST(0, yv + CAST(floor(
            (116130 * (cb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
        FROM blk)
      SELECT doc_id,
        CAST(32 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        CAST(3 AS INTEGER) AS channels,
        CAST(sum(r) * 64 AS BIGINT) AS sum_c0,
        CAST(sum(g) * 64 AS BIGINT) AS sum_c1,
        CAST(sum(b) * 64 AS BIGINT) AS sum_c2
      FROM conv GROUP BY doc_id ORDER BY doc_id""")),

    // REAL WebP-lossless (VP8L) pixel decode end to end (multimodal/
    // WebpCodec): every doc gets a real VP8L stream of formula RGBA
    // pixels, encoded through the WHOLE toolbox — subtract-green +
    // predictor transforms, color cache, dist-1 back-references,
    // two-length canonical prefix codes — and decodeImages sniffs the
    // RIFF container, entropy-decodes, and inverts the transforms.
    // VP8L is lossless, so the oracle rederives the channel sums from
    // the pixel formula ALONE (it never sees a WebP byte); any error
    // anywhere in the bit-reader/prefix/LZ77/cache/transform chain
    // corrupts a sum. Data-derived at any scale.
    QueryDef("webp_decode", (s, d) => {
      import graft.multimodal.{Multimodal, PngCodec, WebpCodec}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val w = 20; val h = 14
          (id, WebpCodec.encode(PngCodec.Image(w, h, 4,
            Array.tabulate(w * h * 4) { i =>
              val pix = i / 4; val c = i % 4
              ((id * 7 + (pix % w) * 3 + (pix / w) * 5 + c * 11) % 256).toByte
            }), subtractGreen = true, predictorMode = Some(7),
            cacheBits = 4, rle = true))
        }.toDF("doc_id", "content")
      Multimodal.decodeImages(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("sum_c0"), col("sum_c1"), col("sum_c2"))
        .orderBy("doc_id")
    }, Some("""
      WITH px AS (
        SELECT d.doc_id, c.c,
          (d.doc_id * 7 + x.x * 3 + y.y * 5 + c.c * 11) % 256 AS v
        FROM documents d,
             (SELECT unnest(generate_series(0, 19)) AS x) x,
             (SELECT unnest(generate_series(0, 13)) AS y) y,
             (SELECT unnest(generate_series(0, 2)) AS c) c)
      SELECT doc_id,
        CAST(20 AS INTEGER) AS width, CAST(14 AS INTEGER) AS height,
        CAST(4 AS INTEGER) AS channels,
        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_c0,
        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_c1,
        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_c2
      FROM px GROUP BY doc_id ORDER BY doc_id""")),

    // REAL MJPEG VIDEO decode end to end (multimodal/AviCodec +
    // JpegCodec): every doc gets a real AVI of 2-4 MJPEG frames, each
    // frame a quality-100 4:2:0 block-constant formula JPEG (the
    // jpeg_decode exactness regime, extended with a frame axis), and
    // decodeVideos walks the RIFF container, JPEG-decodes every frame,
    // sums channels across frames and derives the 64-bit TEMPORAL
    // fingerprint (bit i = frame i heavier than frame i+1). DuckDB
    // rederives dims, frame count, channel sums AND the fingerprint
    // from the block formulas alone — a frame-order or container-walk
    // error breaks the fingerprint even where plain sums survive.
    // Data-derived at any scale.
    QueryDef("video_decode", (s, d) => {
      import graft.multimodal.Multimodal
      val blobs = mjpegOracleBlobs(s, d)
      Multimodal.decodeVideos(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("width"), col("height"),
          col("n_frames").cast("long").as("n_frames"), col("us_per_frame"),
          col("sum_c0"), col("sum_c1"), col("sum_c2"), col("vfingerprint"))
        .orderBy("doc_id")
    }, Some("""
      WITH blk AS (
        SELECT d.doc_id, f.f,
          ((d.doc_id * 13 + f.f * 37 + bx.bx * 17 + yb.yb * 29) % 216) + 20 AS yv,
          ((d.doc_id * 7 + f.f * 5 + (bx.bx // 2) * 31) % 200) + 28 AS cb,
          ((d.doc_id * 11 + f.f * 3 + (bx.bx // 2) * 23) % 200) + 30 AS cr
        FROM documents d,
             (SELECT unnest(generate_series(0, 3)) AS f) f,
             (SELECT unnest(generate_series(0, 3)) AS bx) bx,
             (SELECT unnest(generate_series(0, 1)) AS yb) yb
        WHERE f.f <= 1 + d.doc_id % 3),
      conv AS (
        SELECT doc_id, f,
          LEAST(255, GREATEST(0, yv + CAST(floor(
            (91881 * (cr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
          LEAST(255, GREATEST(0, yv - CAST(floor(
            (22554 * (cb - 128) + 46802 * (cr - 128) + 32768) / 65536.0)
            AS BIGINT))) AS g,
          LEAST(255, GREATEST(0, yv + CAST(floor(
            (116130 * (cb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
        FROM blk),
      per_frame AS (
        SELECT doc_id, f, sum(r) * 64 AS sr, sum(g) * 64 AS sg,
               sum(b) * 64 AS sb, sum(r + g + b) * 64 AS mass
        FROM conv GROUP BY doc_id, f),
      stepped AS (
        SELECT doc_id, f, sr, sg, sb, mass,
               lead(mass) OVER (PARTITION BY doc_id ORDER BY f) AS next_mass
        FROM per_frame)
      SELECT doc_id,
        CAST(32 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        CAST(count(*) AS BIGINT) AS n_frames,
        CAST(40000 AS BIGINT) AS us_per_frame,
        CAST(sum(sr) AS BIGINT) AS sum_c0,
        CAST(sum(sg) AS BIGINT) AS sum_c1,
        CAST(sum(sb) AS BIGINT) AS sum_c2,
        CAST(COALESCE(sum(CASE WHEN next_mass IS NOT NULL AND mass > next_mass
          THEN CAST(1 AS BIGINT) << f ELSE 0 END), 0) AS BIGINT)
          AS vfingerprint
      FROM stepped GROUP BY doc_id ORDER BY doc_id""")),

    // REAL per-frame video sampling (Multimodal.videoFrames — the
    // gifFrames twin for MJPEG): one row per decoded frame with exact
    // channel sums; stride=2 exercises the sample-every-kth shape (only
    // sampled frames pay JPEG decode). Same fixture formulas as
    // video_decode; DuckDB enumerates the sampled frame indexes and
    // rederives each frame's sums from the block formulas alone.
    QueryDef("video_frames", (s, d) => {
      import graft.multimodal.Multimodal
      val blobs = mjpegOracleBlobs(s, d)
      Multimodal.videoFrames(s, blobs, "doc_id", "content", stride = 2)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("width"), col("height"),
          col("sum_c0"), col("sum_c1"), col("sum_c2"))
        .orderBy("doc_id", "frame_idx")
    }, Some("""
      WITH blk AS (
        SELECT d.doc_id, f.f,
          ((d.doc_id * 13 + f.f * 37 + bx.bx * 17 + yb.yb * 29) % 216) + 20 AS yv,
          ((d.doc_id * 7 + f.f * 5 + (bx.bx // 2) * 31) % 200) + 28 AS cb,
          ((d.doc_id * 11 + f.f * 3 + (bx.bx // 2) * 23) % 200) + 30 AS cr
        FROM documents d,
             (SELECT unnest(generate_series(0, 3)) AS f) f,
             (SELECT unnest(generate_series(0, 3)) AS bx) bx,
             (SELECT unnest(generate_series(0, 1)) AS yb) yb
        WHERE f.f <= 1 + d.doc_id % 3 AND f.f % 2 = 0),
      conv AS (
        SELECT doc_id, f,
          LEAST(255, GREATEST(0, yv + CAST(floor(
            (91881 * (cr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
          LEAST(255, GREATEST(0, yv - CAST(floor(
            (22554 * (cb - 128) + 46802 * (cr - 128) + 32768) / 65536.0)
            AS BIGINT))) AS g,
          LEAST(255, GREATEST(0, yv + CAST(floor(
            (116130 * (cb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
        FROM blk)
      SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        CAST(32 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        CAST(sum(r) * 64 AS BIGINT) AS sum_c0,
        CAST(sum(g) * 64 AS BIGINT) AS sum_c1,
        CAST(sum(b) * 64 AS BIGINT) AS sum_c2
      FROM conv GROUP BY doc_id, f ORDER BY doc_id, frame_idx""")),

    // REAL YUV4MPEG2 raw-video decode end to end (multimodal/Y4mCodec
    // r14 — the uncompressed interchange container next to MJPEG-AVI):
    // every doc gets a real `YUV4MPEG2 …` stream of 2-4 C420 frames
    // whose PLANE bytes follow (id, frame, index) formulas;
    // decodeVideos walks the FRAME markers, splits planes, and derives
    // per-plane sums + the temporal fingerprint. The oracle rederives
    // everything from the formulas alone — it never sees a y4m byte.
    // Data-derived at any scale.
    QueryDef("y4m_decode", (s, d) => {
      import graft.multimodal.{Multimodal, Y4mCodec}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val frames = (0 until (2 + (id % 3)).toInt).map { f =>
            val y = Array.tabulate(16 * 8)(i =>
              ((id * 7 + f * 13 + i * 3) % 251).toByte)
            val cb = Array.tabulate(32)(i =>
              ((id * 5 + f * 17 + i * 11) % 251).toByte)
            val cr = Array.tabulate(32)(i =>
              ((id * 3 + f * 19 + i * 13) % 251).toByte)
            y ++ cb ++ cr
          }
          (id, Y4mCodec.encode(Y4mCodec.Y4m(16, 8, 25, 1, c420 = true,
            frames)))
        }.toDF("doc_id", "content")
      Multimodal.decodeVideos(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("width"), col("height"),
          col("n_frames").cast("long").as("n_frames"), col("us_per_frame"),
          col("sum_c0"), col("sum_c1"), col("sum_c2"), col("vfingerprint"))
        .orderBy("doc_id")
    }, Some("""
      WITH yv AS (
        SELECT d.doc_id, f.f,
          sum((d.doc_id * 7 + f.f * 13 + i.i * 3) % 251) AS sy
        FROM documents d,
             (SELECT unnest(generate_series(0, 3)) AS f) f,
             (SELECT unnest(generate_series(0, 127)) AS i) i
        WHERE f.f <= 1 + d.doc_id % 3 GROUP BY 1, 2),
      cv AS (
        SELECT d.doc_id, f.f,
          sum((d.doc_id * 5 + f.f * 17 + i.i * 11) % 251) AS scb,
          sum((d.doc_id * 3 + f.f * 19 + i.i * 13) % 251) AS scr
        FROM documents d,
             (SELECT unnest(generate_series(0, 3)) AS f) f,
             (SELECT unnest(generate_series(0, 31)) AS i) i
        WHERE f.f <= 1 + d.doc_id % 3 GROUP BY 1, 2),
      per_frame AS (
        SELECT yv.doc_id, yv.f, sy, scb, scr, sy + scb + scr AS mass
        FROM yv JOIN cv ON yv.doc_id = cv.doc_id AND yv.f = cv.f),
      stepped AS (
        SELECT doc_id, f, sy, scb, scr, mass,
               lead(mass) OVER (PARTITION BY doc_id ORDER BY f) AS next_mass
        FROM per_frame)
      SELECT doc_id,
        CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        CAST(count(*) AS BIGINT) AS n_frames,
        CAST(40000 AS BIGINT) AS us_per_frame,
        CAST(sum(sy) AS BIGINT) AS sum_c0,
        CAST(sum(scb) AS BIGINT) AS sum_c1,
        CAST(sum(scr) AS BIGINT) AS sum_c2,
        CAST(COALESCE(sum(CASE WHEN next_mass IS NOT NULL AND mass > next_mass
          THEN CAST(1 AS BIGINT) << f ELSE 0 END), 0) AS BIGINT)
          AS vfingerprint
      FROM stepped GROUP BY doc_id ORDER BY doc_id""")),

    // REAL Sun AU decode end to end (multimodal/AuCodec r14 — the
    // fifth audio container: 24-byte big-endian header + raw 16-bit BE
    // samples here): formula samples per doc; decodeAudio sniffs the
    // .snd magic onto the shared Pcm substrate. The oracle rederives
    // energy / zero crossings / peak from the formula alone.
    // Data-derived at any scale.
    QueryDef("au_decode", (s, d) => {
      import graft.multimodal.{AuCodec, Multimodal, WavCodec}
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          (id, AuCodec.encode(WavCodec.Pcm(1, 11025, 16,
            Array.tabulate(200) { tt =>
              ((id * 17 + tt.toLong * tt * 5) % 2400 - 1200).toInt
            }), encoding = 3))
        }.toDF("doc_id", "content")
      Multimodal.decodeAudio(s, blobs, "doc_id", "content")
        .select(col("doc_id"), col("channels"), col("sample_rate"),
          col("bits_per_sample"), col("n_frames"), col("energy"),
          col("zero_crossings"), col("peak"))
        .orderBy("doc_id")
    }, Some("""
      WITH sm AS (
        SELECT d.doc_id, t.t,
          (d.doc_id * 17 + t.t * t.t * 5) % 2400 - 1200 AS v
        FROM documents d,
             (SELECT unnest(generate_series(0, 199)) AS t) t),
      lagged AS (
        SELECT doc_id, v,
          lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
        FROM sm)
      SELECT doc_id,
        CAST(1 AS INTEGER) AS channels,
        CAST(11025 AS INTEGER) AS sample_rate,
        CAST(16 AS INTEGER) AS bits_per_sample,
        CAST(200 AS BIGINT) AS n_frames,
        CAST(sum(v * v) AS BIGINT) AS energy,
        CAST(count(*) FILTER (WHERE pv IS NOT NULL
          AND (v < 0) <> (pv < 0)) AS BIGINT) AS zero_crossings,
        CAST(max(abs(v)) AS BIGINT) AS peak
      FROM lagged GROUP BY doc_id ORDER BY doc_id""")),

    // WebDataset tar-shard ingest end to end (sources/TarIO — the
    // multimodal training interchange format; Spark has no tar source,
    // so the ustar container is implemented from the POSIX spec): every
    // doc becomes a two-file sample ({id}.txt formula text + {id}.cls
    // formula label), the corpus writes as xxhash64-deterministic tar
    // shards, reads back one-task-per-shard with TASK-LOCAL sample
    // grouping (no shuffle anywhere), and DuckDB rederives key, file
    // count, text length and label from documents arithmetic — any
    // header/checksum/padding/grouping error loses or corrupts a
    // sample. Data-derived at any scale.
    QueryDef("webdataset_ingest", (s, d) => {
      import graft.sources.TarIO
      import s.implicits._
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_wds_oracle")
      if (java.nio.file.Files.isDirectory(dir)) {
        val it = java.nio.file.Files.list(dir)
        try it.forEach(p => java.nio.file.Files.delete(p))
        finally it.close()
      }
      val samples = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          (id.toString, Map(
            "txt" -> s"doc $id body ${(id * 7) % 97}"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8),
            "cls" -> ((id * 13) % 10).toString
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }.toDF("key", "files")
      TarIO.writeWebDatasetShards(samples, dir.toString, nShards = 8)
      TarIO.readWebDataset(s, dir.toString)
        .select(col("key").cast("long").as("doc_id"),
          col("n_files").cast("long").as("n_files"),
          length(element_at(col("files"), "txt").cast("string"))
            .cast("long").as("txt_len"),
          element_at(col("files"), "cls").cast("string")
            .cast("long").as("cls"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, CAST(2 AS BIGINT) AS n_files,
        CAST(length('doc ' || CAST(doc_id AS VARCHAR) || ' body '
          || CAST((doc_id * 7) % 97 AS VARCHAR)) AS BIGINT) AS txt_len,
        CAST((doc_id * 13) % 10 AS BIGINT) AS cls
      FROM documents ORDER BY doc_id""")),

    // ZIP archive ingest end to end (sources/ZipIO — the other dataset
    // interchange container, implemented from the PKWARE APPNOTE; reads
    // walk the END OF CENTRAL DIRECTORY, the archive's authoritative
    // index): every doc contributes a highly-compressible .txt (the
    // writer picks DEFLATE) and an incompressible md5-hex .bin (STORED),
    // sharded deterministically and read back one task per archive with
    // per-entry CRC verification. DuckDB rederives lengths AND payload
    // md5s from doc_id arithmetic alone — a header, inflate, or CRC
    // error corrupts a hash. Data-derived at any scale.
    QueryDef("zip_ingest", (s, d) => {
      import graft.sources.ZipIO
      import s.implicits._
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_zip_oracle")
      if (java.nio.file.Files.isDirectory(dir)) {
        val it = java.nio.file.Files.list(dir)
        try it.forEach(p => java.nio.file.Files.delete(p))
        finally it.close()
      }
      val entries = t(s, d, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val txt = "word " * (50 + (id % 7)).toInt
          val bin = java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          Iterator((s"$id.txt", txt.getBytes("UTF-8")),
            (s"$id.bin", bin.getBytes("UTF-8")))
        }.toDF("name", "content")
      ZipIO.writeZipShards(entries, dir.toString, nShards = 8)
      ZipIO.readZipEntries(s, dir.toString)
        .withColumn("doc_id",
          regexp_extract(col("name"), "(\\d+)\\.", 1).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_files"),
          sum(when(col("name").endsWith(".txt"), length(col("content"))))
            .cast("long").as("txt_len"),
          max(when(col("name").endsWith(".txt"), md5(col("content"))))
            .as("txt_md5"),
          max(when(col("name").endsWith(".bin"), md5(col("content"))))
            .as("bin_md5"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, CAST(2 AS BIGINT) AS n_files,
        CAST(5 * (50 + doc_id % 7) AS BIGINT) AS txt_len,
        md5(repeat('word ', CAST(50 + doc_id % 7 AS INTEGER))) AS txt_md5,
        md5(md5(CAST(doc_id AS VARCHAR))) AS bin_md5
      FROM documents ORDER BY doc_id""")),

    // Charset sniff + decode over RAW payload bytes (functions/
    // SniffDecode, SQL-registered graft_sniff_decode — the step before
    // htmlStrip when the crawl hands you bytes: a wrong decode turns
    // every é into Ã© and silently poisons dedup/langID downstream).
    // Five planted byte classes by doc_id arithmetic — pure ASCII,
    // real UTF-8 multibyte, a bare 0xE9 (windows-1252 fallback with the
    // rejected-byte evidence counted), a UTF-8 BOM, and cp1252 smart
    // quotes 0x93/0x94 — and DuckDB rederives charset, evidence counts
    // and the md5 OF THE DECODED TEXT from the same arithmetic (the
    // smart-quote class pins the JDK windows-1252 table against
    // literal U+201C/U+201D). Data-derived at any scale.
    QueryDef("charset_sniff", (s, d) => {
      import s.implicits._
      val blobs = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val bytes: Array[Byte] = (id % 5) match {
            case 0 => s"plain doc $id".getBytes("UTF-8")
            case 1 => s"café doc $id".getBytes("UTF-8")
            case 2 => ("caf".getBytes("UTF-8") :+ 0xe9.toByte) ++
              s" doc $id".getBytes("UTF-8")
            case 3 => Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
              s"bom doc $id".getBytes("UTF-8")
            case _ => (0x93.toByte +: s"doc $id".getBytes("UTF-8")) :+
              0x94.toByte
          }
          (id, bytes)
        }.toDF("doc_id", "content")
      blobs.select(col("doc_id"),
          expr("graft_sniff_decode(content)").as("s"))
        .select(col("doc_id"), col("s.charset").as("charset"),
          col("s.n_bad").cast("long").as("n_bad"),
          col("s.n_multibyte").cast("long").as("n_multibyte"),
          md5(col("s.text").cast("binary")).as("text_md5"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        CASE doc_id % 5 WHEN 0 THEN 'ascii' WHEN 1 THEN 'utf-8'
          WHEN 2 THEN 'windows-1252' WHEN 3 THEN 'utf-8-bom'
          ELSE 'windows-1252' END AS charset,
        CAST(CASE doc_id % 5 WHEN 2 THEN 1 WHEN 4 THEN 2 ELSE 0 END
          AS BIGINT) AS n_bad,
        CAST(CASE doc_id % 5 WHEN 1 THEN 1 ELSE 0 END AS BIGINT)
          AS n_multibyte,
        CASE doc_id % 5
          WHEN 0 THEN md5('plain doc ' || CAST(doc_id AS VARCHAR))
          WHEN 1 THEN md5('café doc ' || CAST(doc_id AS VARCHAR))
          WHEN 2 THEN md5('café doc ' || CAST(doc_id AS VARCHAR))
          WHEN 3 THEN md5('bom doc ' || CAST(doc_id AS VARCHAR))
          ELSE md5('“doc ' || CAST(doc_id AS VARCHAR) || '”')
        END AS text_md5
      FROM documents ORDER BY doc_id""")),

    // The admission gate EXECUTED (Expectations.rowFlags/quarantine):
    // per-row violation labels in suite order over four check
    // mechanics at once — scan predicates (range, regex), a duplicate
    // key group (doc_id mod 499 collides exactly once per 500 ids), and
    // referential misses against a derived lang dimension. The compare
    // is the quarantined rows with their joined label strings; the
    // oracle rebuilds the same labels in SQL. Data-derived at any
    // scale.
    QueryDef("data_quarantine", (s, d) => {
      import graft.ops.Expectations._
      val docs = t(s, d, "documents")
        .withColumn("k", col("doc_id") % 499)
      val langDim = t(s, d, "documents")
        .filter(col("lang").isin("en", "de", "es"))
        .select("lang").distinct()
      val (_, quarantined) = quarantine(docs, Seq(
        InRange("n_chars", 1, 500),
        MatchesRegex("source", "^src[0-9]$"),
        Unique(Seq("k")),
        SubsetOf("lang", langDim, "lang")))
      quarantined
        .select(col("doc_id"),
          array_join(col("violations"), ",").as("violations"))
        .orderBy("doc_id")
    }, Some("""
      WITH d AS (SELECT doc_id, lang, source, n_chars,
                   doc_id % 499 AS k FROM documents),
      dup AS (SELECT k FROM d GROUP BY k HAVING count(*) > 1),
      flagged AS (
        SELECT doc_id, list_filter([
          CASE WHEN n_chars IS NULL OR n_chars < 1 OR n_chars > 500
               THEN 'in_range:n_chars' END,
          CASE WHEN source IS NULL
                 OR NOT regexp_matches(source, '^src[0-9]$')
               THEN 'matches_regex:source' END,
          CASE WHEN k IN (SELECT k FROM dup) THEN 'unique:k' END,
          CASE WHEN lang IS NULL OR lang NOT IN ('en', 'de', 'es')
               THEN 'subset_of:lang->lang' END
        ], x -> x IS NOT NULL) AS v
        FROM d)
      SELECT doc_id, array_to_string(v, ',') AS violations
      FROM flagged WHERE len(v) > 0 ORDER BY doc_id""")),

    // Product quantization on the engine-portable integer substrate
    // (ann/Pq — the MEMORY leg of the ANN family: 64 floats become 8
    // small codes; search is asymmetric-distance against codebook
    // centroids). Deterministic modulo-spread anchors supply all 8
    // per-block codebooks, code assignment is exact integer squared
    // distance with (d², centroid) tie-breaks, ADC scores are exact
    // integer sums — the oracle replays the ENTIRE pipeline (anchor
    // pick, per-block argmin encoding, ADC top-5) in SQL. Data-derived
    // at any corpus scale, the ivfTopKPortable pattern.
    QueryDef("ann_pq", (s, d) => {
      val em = t(s, d, "embeddings")
      graft.ann.Pq.pqTopKPortable(em, em.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, m = 8, kSub = 16, dim = 64)
        .select(col("probe_id"), col("neighbor_id"), col("adc"), col("rank"))
        .orderBy("probe_id", "rank")
    }, Some("""
      WITH q AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0 + 0.5) AS BIGINT)) AS e
        FROM embeddings),
      anch AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx, e AS ae
        FROM (SELECT vec_id, e FROM q
          WHERE vec_id % GREATEST(1, (SELECT COUNT(*) FROM q) // 16) = 0
          ORDER BY vec_id LIMIT 16)),
      blocks AS (SELECT unnest(generate_series(0, 7)) AS j),
      cand AS (SELECT v.vec_id, b.j, a.cidx,
          CAST(list_sum(list_transform(generate_series(1, 8),
            i -> (v.e[b.j*8+i] - a.ae[b.j*8+i])
               * (v.e[b.j*8+i] - a.ae[b.j*8+i]))) AS BIGINT) AS d2
        FROM q v CROSS JOIN blocks b CROSS JOIN anch a),
      codes AS (SELECT vec_id, j, cidx FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, j
            ORDER BY d2, cidx) AS rn
          FROM cand) WHERE rn = 1),
      probes AS (SELECT vec_id AS probe_id, e AS pe FROM q WHERE vec_id < 5),
      scored AS (SELECT p.probe_id, c.vec_id AS neighbor_id,
          CAST(SUM(list_sum(list_transform(generate_series(1, 8),
            i -> p.pe[c.j*8+i] * a.ae[c.j*8+i]))) AS BIGINT) AS adc
        FROM probes p CROSS JOIN codes c JOIN anch a USING (cidx)
        WHERE c.vec_id <> p.probe_id
        GROUP BY 1, 2)
      SELECT probe_id, neighbor_id, adc, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY adc DESC, neighbor_id) AS rank FROM scored)
      WHERE rank <= 5 ORDER BY probe_id, rank""")),

    // INT8 scalar quantization LEDGER (ann/Quantize r16 — the 4x
    // storage leg between fp32 and PQ's 32x: per-dimension symmetric
    // int8 on the exact 1e7 integer substrate): per-dim max-|q|
    // calibration, sign-split integer encode, and the exact
    // reconstruction-error accounting. DuckDB rebuilds the scale
    // vector, every code, and every |error| integer — the per-cohort
    // ledger is a full cross-engine value check of the quantizer.
    // Data-derived at any scale.
    QueryDef("embed_int8", (s, d) => {
      val em = t(s, d, "embeddings")
      val scales = graft.ann.Quantize.int8CalibrateDims(em, "embedding", 64)
      graft.ann.Quantize.int8EncodeDims(em, "vec_id", "embedding", scales)
        .groupBy(pmod(col("vec_id"), lit(8)).as("cohort"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("abs_err")).as("sum_abs_err"),
          max(array_max(col("codes"))).as("max_code"),
          min(array_min(col("codes"))).as("min_code"))
        .orderBy("cohort")
    }, Some("""
      WITH q AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0 + 0.5) AS BIGINT))
          AS e
        FROM embeddings),
      cal AS (SELECT list(m ORDER BY d) AS c FROM (
          SELECT t.d AS d,
            GREATEST(CAST(1 AS BIGINT), max(abs(e[CAST(t.d AS INT)]))) AS m
          FROM q, UNNEST(range(1, 65)) AS t(d) GROUP BY 1)),
      enc AS (SELECT vec_id,
          list_transform(generate_series(1, 64), i ->
            CASE WHEN e[i] < 0 THEN -((-e[i]) * 127 // cal.c[i])
                 ELSE (e[i] * 127) // cal.c[i] END) AS codes, e
        FROM q, cal),
      err AS (SELECT vec_id, codes,
          CAST(list_sum(list_transform(generate_series(1, 64), i ->
            abs(e[i] - (CASE WHEN codes[i] < 0
              THEN -((-codes[i]) * cal.c[i] // 127)
              ELSE (codes[i] * cal.c[i]) // 127 END)))) AS BIGINT)
            AS abs_err
        FROM enc, cal)
      SELECT vec_id % 8 AS cohort,
        CAST(count(*) AS BIGINT) AS n_vecs,
        CAST(sum(abs_err) AS BIGINT) AS sum_abs_err,
        CAST(max(list_max(codes)) AS BIGINT) AS max_code,
        CAST(min(list_min(codes)) AS BIGINT) AS min_code
      FROM err GROUP BY 1 ORDER BY 1""")),

    // INT8 DOT top-k (ann/Quantize.int8TopK r16 — the search the
    // codes store serves, per-TENSOR scale so the integer dot is
    // rank-faithful): every (probe, neighbor, dot8, rank) row is a
    // cross-engine VALUE — DuckDB rebuilds the global scale, the
    // codes, the dots, and the deterministic ranking. Composes with
    // Pq.rerankExact for exact-recall deployments. Data-derived at
    // any scale.
    QueryDef("embed_int8_topk", (s, d) => {
      val em = t(s, d, "embeddings")
      val g = graft.ann.Quantize.int8CalibrateTensor(em, "embedding")
      graft.ann.Quantize.int8TopK(em, em.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, scale = g)
        .orderBy("probe_id", "rank")
    }, Some("""
      WITH q AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0 + 0.5) AS BIGINT))
          AS e
        FROM embeddings),
      g AS (SELECT GREATEST(CAST(1 AS BIGINT),
          max(list_max(list_transform(e, x -> abs(x))))) AS m FROM q),
      c AS (SELECT vec_id, list_transform(e, x ->
          CASE WHEN x < 0 THEN -((-x) * 127 // g.m)
               ELSE (x * 127) // g.m END) AS cd
        FROM q, g),
      p AS (SELECT vec_id AS probe_id, cd AS pc FROM c WHERE vec_id < 5),
      sc AS (SELECT p.probe_id, c.vec_id AS neighbor_id,
          CAST(list_sum(list_transform(generate_series(1, 64),
            i -> c.cd[i] * p.pc[i])) AS BIGINT) AS dot8
        FROM c CROSS JOIN p WHERE c.vec_id <> p.probe_id)
      SELECT probe_id, neighbor_id, dot8, CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY dot8 DESC, neighbor_id) AS rank FROM sc)
      WHERE rank <= 5 ORDER BY probe_id, rank""")),

    // ANN two-stage RERANK (ann/Pq.pqTopKPortableRerank r16 — the
    // production retrieval shape: cheap ADC shortlist, exact re-score
    // of the survivors): the ann_pq construction ranked 4x deeper,
    // then every shortlist row re-scored by the exact integer dot of
    // the quantized vectors. DuckDB replays codebooks, codes, ADC,
    // the 20-deep shortlist, and the exact rerank — every (probe,
    // neighbor, dotq, rank) row is a cross-engine VALUE. Data-derived
    // at any corpus scale.
    QueryDef("ann_rerank", (s, d) => {
      val em = t(s, d, "embeddings")
      graft.ann.Pq.pqTopKPortableRerank(em, em.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, m = 8, kSub = 16, dim = 64,
          shortlist = 20)
        .orderBy("probe_id", "rank")
    }, Some("""
      WITH q AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE)*10000000.0 + 0.5) AS BIGINT)) AS e
        FROM embeddings),
      anch AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx, e AS ae
        FROM (SELECT vec_id, e FROM q
          WHERE vec_id % GREATEST(1, (SELECT COUNT(*) FROM q) // 16) = 0
          ORDER BY vec_id LIMIT 16)),
      blocks AS (SELECT unnest(generate_series(0, 7)) AS j),
      cand AS (SELECT v.vec_id, b.j, a.cidx,
          CAST(list_sum(list_transform(generate_series(1, 8),
            i -> (v.e[b.j*8+i] - a.ae[b.j*8+i])
               * (v.e[b.j*8+i] - a.ae[b.j*8+i]))) AS BIGINT) AS d2
        FROM q v CROSS JOIN blocks b CROSS JOIN anch a),
      codes AS (SELECT vec_id, j, cidx FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, j
            ORDER BY d2, cidx) AS rn
          FROM cand) WHERE rn = 1),
      probes AS (SELECT vec_id AS probe_id, e AS pe FROM q WHERE vec_id < 5),
      scored AS (SELECT p.probe_id, c.vec_id AS neighbor_id,
          CAST(SUM(list_sum(list_transform(generate_series(1, 8),
            i -> p.pe[c.j*8+i] * a.ae[c.j*8+i]))) AS BIGINT) AS adc
        FROM probes p CROSS JOIN codes c JOIN anch a USING (cidx)
        WHERE c.vec_id <> p.probe_id
        GROUP BY 1, 2),
      short AS (SELECT probe_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY probe_id
            ORDER BY adc DESC, neighbor_id) AS srank FROM scored)
        WHERE srank <= 20),
      rer AS (SELECT sl.probe_id, sl.neighbor_id,
          CAST(list_sum(list_transform(generate_series(1, 64),
            i -> p.pe[i] * v.e[i])) AS BIGINT) AS dotq
        FROM short sl
        JOIN q v ON v.vec_id = sl.neighbor_id
        JOIN probes p ON p.probe_id = sl.probe_id)
      SELECT probe_id, neighbor_id, dotq, CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY dotq DESC, neighbor_id) AS rank FROM rer)
      WHERE rank <= 5 ORDER BY probe_id, rank""")),

    // FULL-WARC response parsing (raw Common Crawl captures, not just
    // WET conversions): the HTTP message inside each response record
    // splits into status / content-type / payload by the same
    // expression discipline, and the length_ok audit must hold on the
    // whole HTTP message. Fixture corpus index-derived (WetFixtures
    // resp* formulas); the oracle REBUILDS urls, statuses, types, and
    // payload md5s arithmetically — no WARC byte is ever parsed on the
    // oracle side.
    QueryDef("warc_responses", (s, _) => {
      val corpus = graft.sources.WetFixtures.oracleResponseCorpus()
      graft.sources.WarcIO.warcResponses(s, corpus)
        .select(col("url"), col("http_status"), col("content_type"),
          length(col("payload")).cast("long").as("n_chars"),
          md5(col("payload").cast("binary")).as("payload_md5"),
          col("length_ok"))
        .orderBy("url")
    }, Some("""
      WITH t AS (
        SELECT 'https://cap' || CAST(i%5 AS VARCHAR) || '.example.org/r'
                 || CAST(i AS VARCHAR) AS url,
               CASE WHEN i%10 = 0 THEN 404 ELSE 200 END AS http_status,
               CASE WHEN i%2 = 0 THEN 'text/html' ELSE 'text/plain' END
                 AS content_type,
               '<p>Capture ' || CAST(i AS VARCHAR) || ' body '
                 || CAST((13*i)%97 AS VARCHAR) || '</p>' AS payload
        FROM (SELECT unnest(generate_series(0, 29)) AS i))
      SELECT url, http_status, content_type,
        CAST(length(payload) AS BIGINT) AS n_chars,
        md5(payload) AS payload_md5,
        TRUE AS length_ok
      FROM t ORDER BY url""")),

    // Per-group σ-band outlier detection WITHOUT floats: |x − μ| > 1.5σ
    // rewritten as the integer cross-multiplication
    // 4·(n·x − S)² > 9·(n·Q − S²) over the exact (n, Σx, Σx²) moments —
    // the q_stats_agg discipline applied to a per-row verdict. One
    // moment aggregation per group + a broadcast join back.
    // EXACTNESS BOUND (the Drift.scala discipline): the cross-products
    // stay in Long only while n·max|x| and 3·sqrt(n·Q) < 2^31.5, i.e.
    // per-group n ≲ 10^8 at lineitem's q ≤ 50 — fine for any per-flag
    // group below ~sf50. Past that, Spark wraps silently while DuckDB
    // promotes to HUGEINT; recompute the moments in DECIMAL(38,0)
    // before the cross-multiplication if a caller needs larger groups.
    QueryDef("q_outliers", (s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("q"))
      val moments = li.groupBy("flag").agg(
        count(lit(1)).as("n"), sum(col("q")).as("s"),
        sum(col("q") * col("q")).as("qq"))
      li.join(broadcast(moments), Seq("flag"))
        .withColumn("__dev", col("n") * col("q") - col("s"))
        .withColumn("__out",
          lit(4) * col("__dev") * col("__dev") >
            lit(9) * (col("n") * col("qq") - col("s") * col("s")))
        .groupBy("flag")
        .agg(max(col("n")).as("n"),
          count(when(col("__out"), 1)).as("n_outliers"),
          min(when(col("__out"), col("q"))).as("min_outlier_qty"),
          max(when(col("__out"), col("q"))).as("max_outlier_qty"))
        .orderBy("flag")
    }, Some("""
      WITH li AS (SELECT l_returnflag AS flag,
                    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
      m AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(q) AS BIGINT) AS s, CAST(sum(q*q) AS BIGINT) AS qq
            FROM li GROUP BY flag)
      SELECT li.flag, max(m.n) AS n,
        CAST(count(*) FILTER (WHERE
          4*(m.n*li.q - m.s)*(m.n*li.q - m.s) > 9*(m.n*m.qq - m.s*m.s))
          AS BIGINT) AS n_outliers,
        min(li.q) FILTER (WHERE
          4*(m.n*li.q - m.s)*(m.n*li.q - m.s) > 9*(m.n*m.qq - m.s*m.s))
          AS min_outlier_qty,
        max(li.q) FILTER (WHERE
          4*(m.n*li.q - m.s)*(m.n*li.q - m.s) > 9*(m.n*m.qq - m.s*m.s))
          AS max_outlier_qty
      FROM li JOIN m USING (flag)
      GROUP BY li.flag ORDER BY li.flag"""))
  )

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.dedup.Dedup
import graft.ops.{AsOfJoin, EventTime}
import graft.text.TextAnalysis
import graft.queries.QueryShared._

/** The FIXED 17-query benchmark headline set, in its own object so
  * `graft.Bench` never class-initializes the full [[QueryCatalog]]
  * registry: the r13 verdict measured the idle headline total growing
  * ~11% per round purely from shared-JVM warmup over a catalog that
  * grew 175 -> 199 entries (classloading + JIT churn across thousands
  * of per-entry closures), so the one comparable series the project
  * has was re-baselining itself every round. Entries here are included
  * in `QueryCatalog.all` verbatim; adding catalog entries can no
  * longer touch the bench's warmup work.
  *
  * Same cross-engine determinism rules as [[QueryCatalog]] (exact
  * decimal money, µs event time, total ORDER BY, BIGINT casts).
  */
object Headline {

  val all: Seq[QueryDef] = Seq(

    // ================================================================
    // Core relational operators (scan/filter/project/agg/join/window/…)
    // ================================================================

    QueryDef("q1_pricing_summary", (s, d) => {
      val li = t(s, d, "lineitem")
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sumd(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""), bench = true),

    QueryDef("q6_filter_agg", (s, d) => {
      val li = t(s, d, "lineitem")
      li.filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 25)
        .agg(
          sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }, Some("""
      SELECT
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 25"""),
      bench = true),

    QueryDef("q3_top_orders", (s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    }, Some("""
      SELECT l_orderkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        o_orderdate, o_orderpriority
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1996-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 20"""), bench = true),

    QueryDef("q4_order_priority", (s, d) => {
      // single-row-group input: the (priority, orderkey) partial
      // aggregate otherwise rides the ONE scan task (guide §2.5 input
      // skew). Unlike q3/q5 — where the serial parquet DECODE is the
      // floor and probes are cheap, so a spread only added a shuffle
      // (measured, reverted) — q4's two-level count-distinct expansion
      // is heavier than the decode and parallelizes. No-op at scale.
      val li = graft.ops.Parallelism.spread(
        t(s, d, "lineitem"), col("l_orderkey"))
      val ord = t(s, d, "orders")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count_distinct(col("o_orderkey")).as("n_orders"),
          sumd(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority,
        COUNT(DISTINCT o_orderkey) AS n_orders,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""), bench = true),

    QueryDef("q5_local_supplier", (s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      val supp = t(s, d, "supplier")
      val nat = t(s, d, "nation")
      val reg = t(s, d, "region").filter(col("r_name") === "ASIA")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }, Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY n_name"""), bench = true),

    QueryDef("q_window_running", (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_total
      FROM orders ORDER BY o_custkey, o_orderkey"""), bench = true),

    QueryDef("events_absolute_time", (s, d) => {
      val ev = eventsUs(s, d)
      val pulses = EventTime.derivePulseTimes(
          ev, "event_type", "ts_us", "click",
          runKeys = Seq("event_type"), tieBreak = Seq("event_id"))
        .select("pulse_time", "pulse_index")
      AsOfJoin.backward(
          ev.select("event_id", "ts_us"), pulses,
          leftTime = "ts_us", rightTime = "pulse_time",
          keys = Nil, bucketWidth = UsPerHour,
          rightCols = Seq("pulse_index"))
        .select(
          col("event_id"), col("pulse_index"),
          col("pulse_time").as("pulse_time_us"),
          (col("ts_us") - col("pulse_time")).as("time_offset_us"))
        .orderBy("event_id")
    }, Some("""
      WITH pulses AS (
        SELECT epoch_us(ts) AS pt,
               CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS BIGINT) AS pulse_index
        FROM events WHERE event_type = 'click')
      SELECT e.event_id,
        (SELECT max(p.pulse_index) FROM pulses p WHERE p.pt <= epoch_us(e.ts)) AS pulse_index,
        (SELECT max(p.pt) FROM pulses p WHERE p.pt <= epoch_us(e.ts)) AS pulse_time_us,
        epoch_us(e.ts) - (SELECT max(p.pt) FROM pulses p WHERE p.pt <= epoch_us(e.ts)) AS time_offset_us
      FROM events e ORDER BY e.event_id"""), bench = true),

    // the ASOF JOIN SQL surface (parser extension) over the same
    // events⋈pulses correlation — must agree with the DuckDB oracle just
    // like the Scala-API variant above
    // The custom whole-operator as-of join (graft.plans.AsOfMergeJoin —
    // logical node + strategy + sort-merge SparkPlan) on per-user
    // timelines: each event correlated to the user's latest click
    // at-or-before it. Clicks aggregate to one row per (user, time)
    // first so tie resolution is engine-independent.
    QueryDef("asof_merge_join", (s, d) => {
      val ev = eventsUs(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("ct"))
        .agg(max(col("event_id")).as("click_id"))
      graft.plans.AsOfMergeJoin.backward(
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
          WHERE c.user_id = e.user_id AND c.ct <= epoch_us(e.ts)
          ORDER BY c.ct DESC LIMIT 1) AS click_id,
        (SELECT max(c.ct) FROM clicks c
          WHERE c.user_id = e.user_id AND c.ct <= epoch_us(e.ts)) AS click_time_us
      FROM events e ORDER BY e.event_id"""), bench = true),

    QueryDef("events_by_interval", (s, d) => {
      val off = EventTime.withOffsetFromStart(eventsUs(s, d), "ts_us", "off_us")
      EventTime.countByInterval(off, "off_us", 6 * UsPerHour,
        bankCol = Some("event_type"), pulseCol = Some("user_id"))
    }, Some(s"""
      WITH m AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
        e AS (SELECT epoch_us(ts) - t0 AS off_us, event_type, user_id FROM events, m)
      SELECT interval, event_count, min_time, max_time, n_banks, n_pulses,
             interval * ${6 * UsPerHour} AS interval_start,
             (interval + 1) * ${6 * UsPerHour} AS interval_end
      FROM (
        SELECT CAST(off_us // ${6 * UsPerHour} AS BIGINT) AS interval,
               COUNT(*) AS event_count,
               MIN(off_us) AS min_time, MAX(off_us) AS max_time,
               COUNT(DISTINCT event_type) AS n_banks,
               COUNT(DISTINCT user_id) AS n_pulses
        FROM e GROUP BY 1)
      ORDER BY interval"""), bench = true),

    QueryDef("dedup_exact", (s, d) =>
      Dedup.exactGroups(t(s, d, "documents"), "text", "doc_id")
        .select(col("content_hash"), col("keep_id").as("keep_doc_id"), col("n_copies"))
        .orderBy("content_hash"),
      Some("""
      SELECT sha256(text) AS content_hash, MIN(doc_id) AS keep_doc_id,
             COUNT(*) AS n_copies
      FROM documents GROUP BY sha256(text) ORDER BY content_hash"""),
      bench = true),

    QueryDef("sequence_pack", (s, d) => {
      val toks = TextAnalysis.tokenCounts(t(s, d, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("n_ws_tokens"))
      TextAnalysis.packSequences(toks, "doc_id", "n_ws_tokens", 2048L)
        .orderBy("doc_id")
    }, Some("""
      WITH tok AS (
        SELECT doc_id,
          CAST(LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        FROM documents),
      cum AS (
        SELECT doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        FROM tok WHERE n_tokens > 0)
      SELECT doc_id, n_tokens, c - n_tokens AS tok_start,
        (c - n_tokens) // 2048 AS seq_first,
        (c - 1) // 2048 AS seq_last,
        (c - 1) // 2048 - (c - n_tokens) // 2048 + 1 AS n_seqs
      FROM cum ORDER BY doc_id"""), bench = true),

    QueryDef("repetition_stats", (s, d) =>
      TextAnalysis.repetitionStats(t(s, d, "documents"), "text", "doc_id")
        .orderBy("doc_id"),
      // DuckDB rederivation: unigram counts from string_split (testdata
      // text is single-space separated, matching WordShingles'
      // space-run tokenizer), bigrams via a list_transform window join
      Some("""
      WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      wc AS (
        SELECT doc_id, w, COUNT(*) AS c
        FROM (SELECT doc_id, UNNEST(ws) AS w FROM base) GROUP BY 1, 2),
      wstats AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
               CAST(MAX(c) AS BIGINT) AS max_w
        FROM wc GROUP BY 1),
      bg AS (
        SELECT doc_id, UNNEST(
          CASE WHEN len(ws) >= 2
               THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
               ELSE [array_to_string(ws, ' ')] END) AS g
        FROM base),
      gc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      gstats AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
               CAST(MAX(c) AS BIGINT) AS max_g
        FROM gc GROUP BY 1)
      SELECT doc_id, n_words, n_distinct_words,
        CAST(max_w AS DOUBLE) / n_words AS top_word_frac,
        CAST(n_words - n_distinct_words AS DOUBLE) / n_words AS dup_word_frac,
        CAST(max_g AS DOUBLE) / n_bigrams AS top_bigram_frac,
        CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams AS dup_bigram_frac
      FROM wstats JOIN gstats USING (doc_id) ORDER BY doc_id"""), bench = true),

    QueryDef("quality_score", (s, d) =>
      TextAnalysis.qualityScore(t(s, d, "documents"), "text", "doc_id")
        .orderBy("doc_id"),
      Some("""
      SELECT doc_id,
        CAST(LENGTH(text) AS BIGINT) AS n_chars,
        CAST(LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        CAST(LENGTH(text) - LENGTH(replace(text, '.', '')) AS DOUBLE) / LENGTH(text) AS punct_ratio,
        CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
          / (LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1) AS avg_word_len,
        (CASE WHEN LENGTH(text) >= 200 AND LENGTH(text) <= 100000 THEN CAST(1.0 AS DOUBLE)
              ELSE LENGTH(text) / CAST(200.0 AS DOUBLE) END) * 0.5
        + CASE WHEN (CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
                     / (LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1)) >= 3
                AND (CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
                     / (LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1)) <= 10
               THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        + CASE WHEN (CAST(LENGTH(text) - LENGTH(replace(text, '.', '')) AS DOUBLE) / LENGTH(text)) <= 0.1
               THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS quality_score
      FROM documents ORDER BY doc_id"""), bench = true),

    // ------- LSH / ANN operators: no portable SQL oracle (driver records
    // rows-only); exact semantics are asserted in the ScalaTest suites.

    // r10 (verdict #4): the compared relation is now a DATA-DERIVED
    // cross-engine IDENTITY at any scale — the full LSH pipeline on the
    // engine-portable md5 double-hash construction (minhash_portable's
    // math at 32 hashes x 8 bands), with the oracle recomputing
    // signatures, band hashes, the bucket self-join, the fat-bucket cap,
    // and the exact-Jaccard verify itself. The previous oracle was the
    // exact-Jaccard answer, which silently asserted 100% banding recall —
    // true at sf0.01, measurably false at sf0.001 (one jaccard≈0.5 pair
    // misses all 8 bands: expected LSH behavior), so the row was
    // scale-pinned. The absolute-recall claim lives in
    // dedup_minhash_recall as an in-Spark bound boolean (sketch_stats
    // pattern); the native-xxhash64 production path keeps its scale
    // coverage in BenchScale (minhash_candidates) and its recall floors
    // in DedupSpec/SimilaritySpec.
    QueryDef("dedup_minhash", (s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"),
                concat(col("text"), lit(" planted near duplicate suffix")).as("text"))
      Dedup.minHashCandidatesPortable(docs.unionByName(planted), "text", "doc_id",
          shingleSize = 3, numHashes = 32, bands = 8, minJaccard = 0.5)
        .orderBy("id_a", "id_b")
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
      h AS (SELECT doc_id,
          list_transform(sh, x ->
            CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT) % 2147483647) AS h1s,
          list_transform(sh, x ->
            CAST(concat('0x', substring(md5(x), 16, 15)) AS BIGINT) % 2147483647) AS h2s
        FROM sh),
      sig AS (SELECT doc_id,
          list_transform(generate_series(0, 31), j ->
            list_min(list_transform(generate_series(1, len(h1s)),
              i -> (h1s[i] + j * h2s[i]) % 2147483647))) AS sig
        FROM h),
      band AS (SELECT doc_id, t.b AS band_id,
          md5(array_to_string(list_transform(
            list_slice(sig, t.b*4 + 1, t.b*4 + 4), x -> CAST(x AS VARCHAR)), ','))
            AS band_hash
        FROM sig, unnest(generate_series(0, 7)) AS t(b)),
      fat AS (SELECT band_id, band_hash FROM band
              GROUP BY 1, 2 HAVING COUNT(*) > 1000),
      bandk AS (SELECT b.* FROM band b ANTI JOIN fat USING (band_id, band_hash)),
      cpairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bandk a JOIN bandk b
          ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id)
      SELECT id_a, id_b, jaccard FROM (
        SELECT p.id_a, p.id_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        FROM cpairs p JOIN sh a ON a.doc_id = p.id_a JOIN sh b ON b.doc_id = p.id_b)
      WHERE jaccard >= 0.5 ORDER BY id_a, id_b"""), bench = true),

    // scale probe for the dedup map-side path: 21x-replicated corpus
    // (105k docs at sf0.01), signatures + band hashes only — the part
    // whose cost is linear in corpus bytes and must stay so. Since r6
    // the signature math here is the md5-portable double-hash
    // construction (minhash_portable's, at the full 64-hash/16-band
    // production shape), so the per-band histogram is ORACLE-EXACT
    // cross-engine; the native xxhash64 signature path keeps its own
    // scale coverage in BenchScale (minhash_candidates/simhash_sigs)
    // and its bench row in dedup_minhash. Signatures run through the
    // native PortableMinHashSig (md5 double-hash in one fused loop —
    // bit-identical to the HOF/conv formulation, which is interpreted
    // and measured 75 s vs ~2 s here): rows stay |docs| until the
    // 16-band fan-out.
    QueryDef("dedup_sigs_10k", (s, d) => {
      // spread BEFORE the 21x replication: the single-row-group input
      // otherwise holds all 105k replicated docs in ONE task through the
      // md5 signature scan (guide §2.5 — measured 3.3 s single-task);
      // the shuffle moves only the 5k source docs
      val docs = graft.ops.Parallelism.spread(
        t(s, d, "documents").select("doc_id", "text"), col("doc_id"))
      val replicated = docs
        .withColumn("copy", explode(expr("sequence(0, 20)")))
        .select((col("doc_id") * 100 + col("copy")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("copy").cast("string")).as("text"))
      replicated
        // native WordShingles (same space-run-token + whole-doc-shingle
        // semantics the portable HOF formulation mirrors — the HOF CASE
        // was 63M interpreted lambda dispatches at this scale)
        .select(col("doc_id"), array_distinct(
          graft.functions.WordShingles.col(col("text"), 3)).as("sh"))
        .select(col("doc_id"),
          graft.functions.PortableMinHashSig.col(col("sh"), 64).as("sig"))
        .select(col("doc_id"), posexplode(
          graft.functions.PortableBandHashes.col(col("sig"), 16))
          .as(Seq("band_id", "band_hash")))
        .groupBy(col("band_id").cast("long").as("band_id"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("band_hash")).as("n_buckets"))
        .orderBy("band_id")
    }, Some("""
      WITH corpus AS (
        SELECT doc_id * 100 + t.c AS doc_id, text || ' rep' || CAST(t.c AS VARCHAR) AS text
        FROM documents, unnest(generate_series(0, 20)) AS t(c)),
      base AS (SELECT doc_id,
          list_filter(string_split_regex(text, ' +'), w -> w <> '') AS ws
        FROM corpus),
      sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
          THEN list_transform(generate_series(1, len(ws) - 2),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
          ELSE [array_to_string(ws, ' ')] END) AS sh FROM base),
      h AS (SELECT doc_id,
          list_transform(sh, x ->
            CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT) % 2147483647) AS h1s,
          list_transform(sh, x ->
            CAST(concat('0x', substring(md5(x), 16, 15)) AS BIGINT) % 2147483647) AS h2s
        FROM sh),
      sig AS (SELECT doc_id,
          list_transform(generate_series(0, 63), j ->
            list_min(list_transform(generate_series(1, len(h1s)),
              i -> (h1s[i] + j * h2s[i]) % 2147483647))) AS sig
        FROM h),
      band AS (SELECT doc_id, t.b AS band_id,
          md5(array_to_string(list_transform(
            list_slice(sig, t.b*4 + 1, t.b*4 + 4), x -> CAST(x AS VARCHAR)), ','))
            AS band_hash
        FROM sig, unnest(generate_series(0, 15)) AS t(b))
      SELECT CAST(band_id AS BIGINT) AS band_id, COUNT(*) AS n,
        COUNT(DISTINCT band_hash) AS n_buckets
      FROM band GROUP BY 1 ORDER BY band_id"""), bench = true),

    QueryDef("training_pipeline", (s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      // plant exact + near duplicates so every decision branch fires
      val exactDups = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 30000).as("doc_id"), col("text"))
      val nearDups = docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)
        .select((col("doc_id") + 40000).as("doc_id"),
          concat(col("text"), lit(" planted pipeline suffix")).as("text"))
      graft.pipelines.TrainingDataPipeline.curate(
          docs.unionByName(exactDups).unionByName(nearDups), "text", "doc_id")
        .orderBy("doc_id")
    },
    // Full-pipeline oracle: every stage re-derived independently in DuckDB
    // — trigram language ID (bit-identical double sums), quality score,
    // whitespace token counts, sha256 exact dedup, EXACT-Jaccard near-dup
    // pairs closed transitively by a recursive CTE. The near-dup stage
    // checks the MinHash-LSH path against the exact answer, so banding
    // recall and the connected-components clustering are both asserted.
    Some(s"""
      WITH RECURSIVE alldocs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id+30000, text FROM documents WHERE doc_id < 20
        UNION ALL
        SELECT doc_id+40000, text || ' planted pipeline suffix' FROM documents
        WHERE doc_id >= 20 AND doc_id < 40),
      scored AS (
        SELECT doc_id, text, $duckLangScoreCols, $DuckQuality AS quality_score,
          CAST(LENGTH(text) - LENGTH(replace(text,' ','')) + 1 AS BIGINT) AS n_ws_tokens
        FROM (SELECT doc_id, text, lower(text) AS lt FROM alldocs)),
      ann AS (
        SELECT doc_id, text, quality_score, n_ws_tokens,
          CASE WHEN best_score > 0 THEN best_lang ELSE 'unknown' END AS lang_pred
        FROM (${duckLangBestSql("scored")})),
      flags AS (
        SELECT *, lang_pred IN ('en','unknown') AS lang_ok,
               quality_score >= 0.5 AS quality_ok,
               n_ws_tokens >= 10 AND n_ws_tokens <= 1000000 AS len_ok
        FROM ann),
      cand AS (SELECT doc_id, text FROM flags WHERE lang_ok AND quality_ok AND len_ok),
      exact_drop AS (
        SELECT doc_id FROM (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY sha256(text)) AS keep_id
          FROM cand) WHERE doc_id <> keep_id),
      after_exact AS (SELECT * FROM cand ANTI JOIN exact_drop USING (doc_id)),
      sh AS (
        SELECT doc_id, list_distinct(${duckShingleList(3)}) AS sh
        FROM (SELECT doc_id, $DuckWords AS words FROM after_exact)),
      shx AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      cpairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM shx a JOIN shx b ON a.s = b.s AND a.doc_id < b.doc_id),
      vpairs AS (
        SELECT id_a, id_b FROM (
          SELECT p.id_a, p.id_b,
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
          FROM cpairs p JOIN sh a ON a.doc_id = p.id_a JOIN sh b ON b.doc_id = p.id_b)
        WHERE jac >= 0.8),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM vpairs
        UNION SELECT id_b, id_a FROM vpairs),
      reach AS (
        SELECT src AS id, src AS r FROM edges
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src),
      near_drop AS (
        SELECT id AS doc_id FROM reach GROUP BY id HAVING min(r) <> id)
      SELECT f.doc_id, f.lang_pred, f.quality_score, f.n_ws_tokens,
        CASE WHEN NOT f.lang_ok THEN 'language'
             WHEN NOT f.quality_ok THEN 'quality'
             WHEN NOT f.len_ok THEN 'length'
             WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
             WHEN n.doc_id IS NOT NULL THEN 'near_dup' END AS drop_reason,
        CASE WHEN NOT f.lang_ok THEN false WHEN NOT f.quality_ok THEN false
             WHEN NOT f.len_ok THEN false WHEN e.doc_id IS NOT NULL THEN false
             WHEN n.doc_id IS NOT NULL THEN false ELSE true END AS keep
      FROM flags f
      LEFT JOIN exact_drop e ON e.doc_id = f.doc_id
      LEFT JOIN near_drop n ON n.doc_id = f.doc_id
      ORDER BY f.doc_id"""), bench = true),

    // The ANN family, r10 (the dedup_minhash lesson applied): every
    // compared relation is now a DATA-DERIVED cross-engine identity at
    // any corpus scale, not a literal pin measured at sf0.01.
    //  - ann_bruteforce keeps the PRODUCTION float-cosine query
    //    (broadcast probes, native CosineSim codegen) but the oracle
    //    re-derives the ranking on the integer-quantized dot
    //    (floor(x*1e7+0.5), the ann_exact substrate): over unit-
    //    normalized embeddings the two rankings coincide unless two
    //    candidates sit within the 1e-7 quantum of each other —
    //    verified to hold at sf0.001 AND sf0.01, and a flip would be a
    //    real tie, not an engine artifact.
    //  - ann_lsh / ann_ivf compare the *Portable variants (md5-integer
    //    hyperplanes / modulo-spread centroids + exact integer dots),
    //    whose ENTIRE pipeline — buckets, multi-probe fan-out, list
    //    routing, ranking — the oracle replays in SQL. The production
    //    xxhash64/float paths keep their coverage in ann_recall's
    //    ladder, SimilaritySpec's floors, and BenchScale.
    QueryDef("ann_bruteforce", (s, d) => {
      val em = t(s, d, "embeddings")
      Similarity.bruteForceTopK(em, em.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5)
        .select(col("probe_id"), col("neighbor_id"), col("rank"))
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
        FROM p CROSS JOIN q WHERE p.probe_id != q.vec_id)
      SELECT probe_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY dot DESC, neighbor_id) AS rank FROM scored)
      WHERE rank <= 5 ORDER BY probe_id, rank"""), bench = true)
  )
}

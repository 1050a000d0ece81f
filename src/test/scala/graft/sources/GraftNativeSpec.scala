package graft.sources

import org.apache.spark.sql.GraftParquetShim
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The NATIVE V2 read/write path (GraftNativeScan / GraftNativeWrite /
  * SupportsRowLevelOperations): value-equality with the V1 route,
  * storage-partitioned joins with ZERO Exchange, and stock-analyzer
  * row-level DML with NO graft session extensions installed. */
class GraftNativeSpec extends SparkSuite {
  import spark.implicits._

  private val wh =
    java.nio.file.Files.createTempDirectory("graft_native_wh").toString
  spark.conf.set("spark.sql.catalog.ncat",
    classOf[GraftTableCatalog].getName)
  spark.conf.set("spark.sql.catalog.ncat.warehouse", wh)

  private def docs(n: Int) = (1 to n)
    .map(i => (i.toLong, s"w${i % 7}", s"body $i ${"x" * (i % 13)}",
      i * 3L))
    .toDF("id", "lang", "body", "n")

  test("native scan matches the V1 route: identity + bucket partitions, filters, pruning") {
    spark.sql("""CREATE TABLE ncat.nat_docs (id BIGINT, lang STRING,
                 body STRING, n BIGINT) USING iceberg
                 PARTITIONED BY (lang, bucket(4, id))""")
    docs(500).writeTo("ncat.nat_docs").append()
    docs(500).where(col("id") % 5 === 0)
      .withColumn("n", col("n") + 1000L)
      .writeTo("ncat.nat_docs").append()

    def readAll(native: Boolean): Seq[(Long, String, Long)] = {
      spark.conf.set("spark.graft.nativeScan.enabled", native.toString)
      try spark.table("ncat.nat_docs")
        .filter(col("id") <= 400 && col("lang") =!= "w3")
        .select(col("id"), col("lang"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
      finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    }
    val native = readAll(native = true)
    val v1 = readAll(native = false)
    assert(native === v1)
    assert(native.nonEmpty)
    // the native route actually engaged (plan shape, not just values)
    val plan = spark.table("ncat.nat_docs").queryExecution.executedPlan
    assert(plan.toString.contains("GraftNativeScan"),
      s"expected the native batch scan in:\n$plan")
    // column pruning reaches the scan: a two-column projection reads
    // a two-column schema
    val pruned = spark.table("ncat.nat_docs").select("id", "n")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("GraftNativeScan"))
    assert(pruned.collect().length === 600)
  }

  test("storage-partitioned join: bucket(8) ⋈ bucket(8) runs with ZERO Exchange") {
    spark.sql("""CREATE TABLE ncat.spj_a (id BIGINT, v BIGINT)
                 USING iceberg PARTITIONED BY (bucket(8, id))""")
    spark.sql("""CREATE TABLE ncat.spj_b (id BIGINT, w BIGINT)
                 USING iceberg PARTITIONED BY (bucket(8, id))""")
    (1 to 2000).map(i => (i.toLong, i * 2L)).toDF("id", "v")
      .writeTo("ncat.spj_a").append()
    (1 to 2000).map(i => (i.toLong, i * 5L)).toDF("id", "w")
      .writeTo("ncat.spj_b").append()
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // grouping opt-in (default false; see GraftNativeScan.spjMode)
      "spark.graft.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // a deterministic (non-adaptive) plan so the Exchange audit reads
      // the actual physical tree
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.table("ncat.spj_a")
        .join(spark.table("ncat.spj_b"), "id")
        .agg(sum(col("v") + col("w")).as("s"), count(lit(1)).as("c"))
      val row = joined.head()
      assert(row.getLong(0) === (1 to 2000).map(i => i * 7L).sum)
      assert(row.getLong(1) === 2000L)
      // the join subtree must be Exchange-free: both sides report the
      // same bucket(8, id) KeyGroupedPartitioning, so EnsureRequirements
      // plans the storage-partitioned join with NO shuffle on either
      // side (the aggregate above it may still shuffle — that is its
      // own cost, not the join's)
      val smj = joined.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty,
        s"expected a sort-merge join in:\n${joined.queryExecution.executedPlan}")
      val shuffles = smj.head.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"the bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
    } finally saved.foreach { // None = was unset: restore by UNSET
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("SPJ skew: partially-clustered distribution splits a multi-file partition") {
    // r18/r19 carried item: the scan used to PRE-group files one
    // InputPartition per tuple, so a hot partition was structurally one
    // mega-task. Per-file reporting keeps the default grouped plan
    // identical and lets Spark's partially-clustered machinery split
    // the many-files side of a skewed storage-partitioned join.
    spark.sql("""CREATE TABLE ncat.spj_skew_a (id BIGINT, v BIGINT)
                 USING iceberg PARTITIONED BY (bucket(4, id))""")
    spark.sql("""CREATE TABLE ncat.spj_skew_b (id BIGINT, w BIGINT)
                 USING iceberg PARTITIONED BY (bucket(4, id))""")
    // side A: 6 appends → 6 files per bucket tuple (every tuple "hot")
    (0 until 6).foreach { i =>
      (1 to 500).map(j => (j.toLong, (i * 1000 + j).toLong)).toDF("id", "v")
        .writeTo("ncat.spj_skew_a").append()
    }
    (1 to 500).map(j => (j.toLong, j * 5L)).toDF("id", "w")
      .writeTo("ncat.spj_skew_b").append()
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.graft.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val pcd =
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"
    val savedPcd = spark.conf.getOption(pcd)
    def run(split: Boolean): (Long, Long, Int) = {
      spark.conf.set(pcd, split.toString)
      val tasks = new java.util.concurrent.atomic.AtomicInteger()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val j = spark.table("ncat.spj_skew_a")
          .join(spark.table("ncat.spj_skew_b"), "id")
          .agg(sum(col("v") + col("w")).as("s"), count(lit(1)).as("c"))
        val row = j.head()
        // the join subtree stays Exchange-free in BOTH modes
        val smj = j.queryExecution.executedPlan.collect {
          case x: org.apache.spark.sql.execution.joins.SortMergeJoinExec => x
        }
        assert(smj.nonEmpty)
        assert(smj.head.collect {
          case e: ShuffleExchangeExec => e }.isEmpty,
          s"split=$split shuffled:\n${j.queryExecution.executedPlan}")
        Thread.sleep(500)
        (row.getLong(0), row.getLong(1), tasks.get())
      } finally spark.sparkContext.removeSparkListener(l)
    }
    try {
      val (s1, c1, tGrouped) = run(split = false)
      val (s2, c2, tSplit) = run(split = true)
      assert((s1, c1) === ((s2, c2)))
      assert(c1 === 3000L) // 6 copies of each id match once
      // partially-clustered: the 6-file tuples no longer collapse into
      // one task per tuple — the scan-join stage runs MORE tasks
      assert(tSplit > tGrouped,
        s"partially-clustered did not split (grouped=$tGrouped, split=$tSplit)")
    } finally {
      (saved :+ (pcd -> savedPcd)).foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("columnar handoff matrix: temporal/decimal/partition-heavy schemas stay columnar") {
    // supportBatch declines schemas silently — pin that the common
    // non-trivial shapes keep ColumnarBatch handoff (and that the
    // fallback, when it happens, is at least logged — see
    // createReaderFactory)
    spark.sql("""CREATE TABLE ncat.col_mat (id BIGINT, ts TIMESTAMP,
                 d DATE, amt DECIMAL(12,2), lang STRING, n INT)
                 USING iceberg PARTITIONED BY (lang, bucket(4, id))""")
    (1 to 300).map(i => (i.toLong,
        java.sql.Timestamp.valueOf(s"2031-01-01 00:0${i % 6}:00"),
        java.sql.Date.valueOf("2031-03-15"),
        new java.math.BigDecimal(s"${i}.25"), s"w${i % 3}", i))
      .toDF("id", "ts", "d", "amt", "lang", "n")
      .writeTo("ncat.col_mat").append()
    def q = spark.table("ncat.col_mat")
      .filter(col("id") <= 200)
      .groupBy("lang")
      .agg(sum(col("amt")).as("s"), max(col("ts")).as("m"),
        min(col("d")).as("dd"), sum(col("n")).as("sn"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = q.queryExecution.executedPlan
      val scans = plan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty, s"no BatchScan in:\n$plan")
      assert(scans.head.supportsColumnar,
        s"temporal/decimal/partitioned schema fell back to rows:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val got = q.collect().map(r => (r.getString(0), r.getDecimal(1),
      r.getTimestamp(2), r.getDate(3).toString, r.getLong(4))).sortBy(_._1)
    spark.conf.set("spark.graft.nativeScan.enabled", "false")
    val want =
      try q.collect().map(r => (r.getString(0), r.getDecimal(1),
        r.getTimestamp(2), r.getDate(3).toString, r.getLong(4))).sortBy(_._1)
      finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    assert(got === want)
    assert(got.length === 3)
  }

  test("native row-level DML: DELETE / UPDATE / MERGE through the stock analyzer, NO extensions") {
    // the third-party-tool twin: a bare session with NO graft parser /
    // rules — DML must resolve through SupportsRowLevelOperations alone
    val bare = GraftParquetShim.bareSession(spark)
    bare.conf.set("spark.sql.catalog.ncat",
      classOf[GraftTableCatalog].getName)
    bare.conf.set("spark.sql.catalog.ncat.warehouse", wh)
    bare.sql("""CREATE TABLE ncat.nat_dml (id BIGINT, lang STRING,
                n BIGINT) USING iceberg PARTITIONED BY (lang)""")
    bare.range(1, 101)
      .selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS lang",
        "id * 10 AS n")
      .writeTo("ncat.nat_dml").append()

    // UPDATE: group-based copy-on-write through ReplaceData
    bare.sql("UPDATE ncat.nat_dml SET n = n + 1 WHERE id <= 10")
    // DELETE with a subquery condition (not filter-convertible, so the
    // metadata-delete short-circuit cannot take it — the group-based
    // plan must)
    bare.sql("""DELETE FROM ncat.nat_dml WHERE id IN
                (SELECT id * 2 FROM ncat.nat_dml WHERE id <= 5)""")
    // MERGE: the full upsert through the stock analyzer
    bare.range(95, 106)
      .selectExpr("id", "'c' AS lang", "id * 100 AS n")
      .createOrReplaceTempView("nat_dml_src")
    bare.sql("""MERGE INTO ncat.nat_dml t USING nat_dml_src s
                ON t.id = s.id
                WHEN MATCHED THEN UPDATE SET n = s.n
                WHEN NOT MATCHED THEN INSERT *""")

    val got = bare.sql(
      "SELECT id, lang, n FROM ncat.nat_dml ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // expected state, derived independently
    val afterUpdate = (1L to 100L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", i * 10 + (if (i <= 10) 1 else 0)))
    val afterDelete = afterUpdate.filterNot { case (i, _, _) =>
      Seq(2L, 4L, 6L, 8L, 10L).contains(i) }
    val merged = afterDelete.map { case (i, l, n) =>
      if (i >= 95 && i <= 105) (i, l, i * 100) else (i, l, n)
    } ++ (101L to 105L).map(i => (i, "c", i * 100))
    assert(got.toSeq === merged.sortBy(_._1))

    // the MERGE committed as ONE snapshot (group replace is atomic)
    val snaps = bare.table("ncat.nat_dml__snapshots")
      .select("operation").collect().map(_.getString(0))
    // create-empty + append + update + delete + merge = 5 commits
    assert(snaps.length === 5, snaps.mkString(", "))
  }

  test("native MERGE replaces only the groups its runtime filter matches") {
    // MERGE has no static pushable filters — without runtime group
    // filtering the group-based plan would read and REWRITE the whole
    // table. SupportsRuntimeV2Filtering gets the matched rows' partition
    // source values as a dynamic IN-filter, so only the touched
    // partition's files are replaced; every other partition's files
    // must survive BY PATH (carried as EXISTING entries)
    val bare = GraftParquetShim.bareSession(spark)
    bare.conf.set("spark.sql.catalog.ncat",
      classOf[GraftTableCatalog].getName)
    bare.conf.set("spark.sql.catalog.ncat.warehouse", wh)
    bare.sql("""CREATE TABLE ncat.nat_rgf (id BIGINT, lang STRING,
                n BIGINT) USING iceberg PARTITIONED BY (lang)""")
    bare.range(0, 300)
      .selectExpr("id", "element_at(array('a','b','c'), " +
        "CAST(id % 3 + 1 AS INT)) AS lang", "id * 10 AS n")
      .writeTo("ncat.nat_rgf").append()
    val dir = s"$wh/nat_rgf"
    def liveFiles = IcebergLite.metaTable(spark, dir, "files")
      .filter(col("content") === 0)
      .select("file_path").collect().map(_.getString(0)).toSet
    val before = liveFiles
    assert(before.exists(_.contains("lang=a")) &&
      before.exists(_.contains("lang=b")))
    // the source matches ONLY lang='a' rows (ids ≡ 0 mod 3)
    bare.range(0, 100).selectExpr("id * 3 AS id", "id AS m")
      .createOrReplaceTempView("nat_rgf_src")
    bare.sql("""MERGE INTO ncat.nat_rgf t USING nat_rgf_src s
                ON t.id = s.id
                WHEN MATCHED THEN UPDATE SET n = s.m""")
    val after = liveFiles
    val untouched = before.filter(p =>
      p.contains("lang=b") || p.contains("lang=c"))
    assert(untouched.subsetOf(after),
      "files of unmatched partitions were rewritten — runtime group " +
        "filtering did not engage")
    assert(!before.filter(_.contains("lang=a")).subsetOf(after),
      "the matched partition's files were not replaced")
    val got = bare.sql(
      "SELECT sum(n) AS s FROM ncat.nat_rgf WHERE lang = 'a'")
      .head().getLong(0)
    assert(got === (0 until 100).map(_.toLong).sum)
    assert(bare.sql("SELECT count(*) AS c FROM ncat.nat_rgf")
      .head().getLong(0) === 300L)
  }

  test("manifest-accounted statistics: a KB dimension auto-broadcasts on the native route") {
    spark.sql("""CREATE TABLE ncat.stat_fact (id BIGINT, k BIGINT, v BIGINT)
                 USING iceberg""")
    spark.sql("""CREATE TABLE ncat.stat_dim (k BIGINT, name STRING)
                 USING iceberg""")
    spark.range(0, 50000)
      .selectExpr("id", "id % 100 AS k", "id * 2 AS v")
      .writeTo("ncat.stat_fact").append()
    spark.range(0, 100).selectExpr("id AS k", "concat('n', id) AS name")
      .writeTo("ncat.stat_dim").append()

    def joinPlan() = {
      val j = spark.table("ncat.stat_fact")
        .join(spark.table("ncat.stat_dim"), "k")
        .groupBy("name").agg(sum(col("v")).as("s"))
      j.count()
      j.queryExecution.executedPlan
    }
    // the dim's manifest-accounted size is far below the broadcast
    // threshold, so the join must plan as a BroadcastHashJoin (without
    // estimateStatistics both sides report defaultSizeInBytes ≈ ∞ and
    // this planned a two-sided sort-merge join). NOTE the pin is the
    // NATIVE route: the V1 fallback's stats are structurally hidden by
    // Spark's V1ScanWrapper (it does not forward
    // SupportsReportStatistics), so that route keeps the conservative
    // default — documented in OPTIMIZATION_r19.md.
    val bhj = joinPlan().toString
    assert(bhj.contains("BroadcastHashJoin"),
      s"expected a broadcast join in:\n$bhj")
    // and the estimate is honest: disabling auto-broadcast must fall
    // back to a shuffle join (proves the stats are a real number, not
    // just 0/"always broadcast")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smj = joinPlan().toString
      assert(!smj.contains("BroadcastHashJoin"),
        s"threshold -1 must not broadcast:\n$smj")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("columnar handoff: the native scan hands ColumnarBatches to the operator tree") {
    spark.sql("""CREATE TABLE ncat.col_scan (id BIGINT, lang STRING,
                 n BIGINT) USING iceberg PARTITIONED BY (lang)""")
    docs(300).select("id", "lang", "n").writeTo("ncat.col_scan").append()
    def q = spark.table("ncat.col_scan")
      .filter(col("id") <= 200).groupBy("lang")
      .agg(sum(col("n")).as("s"))
    // plan: the BatchScan reports columnar support, so Spark inserts
    // ColumnarToRow above it instead of the scan unwrapping batches
    // row-by-row itself (AQE off for the assertion — its wrapper hides
    // the subtree from collect)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = q.queryExecution.executedPlan
      val scans = plan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty, s"no BatchScan in:\n$plan")
      assert(scans.head.supportsColumnar,
        s"native scan did not advertise columnar reads:\n$plan")
      assert(plan.toString.contains("ColumnarToRow"),
        s"no ColumnarToRow above the scan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // values: identical to the V1 route (identity partition column
    // re-attachment included, since lang is a partition column)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).sorted
    spark.conf.set("spark.graft.nativeScan.enabled", "false")
    val want =
      try spark.table("ncat.col_scan")
        .filter(col("id") <= 200).groupBy("lang")
        .agg(sum(col("n")).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted
      finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("runtime file pruning engages on an ordinary fact⋈dim join (DPP)") {
    // day-partitioned fact, selective dim filter: Spark's PartitionPruning
    // hands the dim's matched day values to the scan's
    // SupportsRuntimeV2Filtering, which must shrink the planned file set
    // — at 100 TB the difference between reading one day and the table
    spark.sql("""CREATE TABLE ncat.dpp_fact (id BIGINT, day BIGINT,
                 v BIGINT) USING iceberg PARTITIONED BY (day)""")
    spark.sql("""CREATE TABLE ncat.dpp_dim (day BIGINT, tag STRING)
                 USING iceberg""")
    spark.range(0, 10000)
      .selectExpr("id", "id % 10 AS day", "id * 2 AS v")
      .writeTo("ncat.dpp_fact").append()
    spark.range(0, 10).selectExpr("id AS day", "concat('t', id) AS tag")
      .writeTo("ncat.dpp_dim").append()

    def recordsRead(f: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          acc.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      try { f; Thread.sleep(500) } // let the listener bus drain
      finally spark.sparkContext.removeSparkListener(l)
      acc.get()
    }

    var planStr = ""
    val pruned = recordsRead {
      val q = spark.table("ncat.dpp_fact")
        .join(spark.table("ncat.dpp_dim").filter(col("tag") === "t3"), "day")
        .agg(sum(col("v")))
      val got = q.head().getLong(0)
      planStr = q.queryExecution.executedPlan.toString
      assert(got === (0 until 10000).filter(_ % 10 == 3).map(_ * 2L).sum)
    }
    // one of ten days + the dim itself: far below a full fact read
    assert(pruned < 10000 / 2,
      s"runtime filtering did not prune the fact read (records=$pruned)\n$planStr")
  }

  test("COUNT(*)/MIN/MAX answer from metadata: zero file records read; filtered/MOR/string aggregates scan") {
    spark.sql("""CREATE TABLE ncat.cnt_t (id BIGINT, day BIGINT)
                 USING iceberg PARTITIONED BY (day)""")
    spark.range(0, 7777).selectExpr("id", "id % 5 AS day")
      .writeTo("ncat.cnt_t").append()

    def recordsRead(f: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          acc.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      try { f; Thread.sleep(500) }
      finally spark.sparkContext.removeSparkListener(l)
      acc.get()
    }

    // clean table: the count comes from manifest accounting — no task
    // may read a single file record
    val n1 = recordsRead {
      assert(spark.sql("SELECT count(*) FROM ncat.cnt_t")
        .head().getLong(0) === 7777L)
    }
    assert(n1 === 0L, s"metadata count read $n1 file records")

    // MIN/MAX on an int/long column: recorded file bounds are exact —
    // zero file records read; mixed with COUNT(*) in one aggregate
    val nMm = recordsRead {
      val r = spark.sql(
        "SELECT min(id), max(id), count(*), max(day) FROM ncat.cnt_t")
        .head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
        ((0L, 7776L, 7777L, 4L)))
    }
    assert(nMm === 0L, s"metadata min/max read $nMm file records")

    // filtered count: the pushdown must REFUSE (this builder claims no
    // filters) and the scan path answer exactly
    val n2 = recordsRead {
      assert(spark.sql(
        "SELECT count(*) FROM ncat.cnt_t WHERE day = 2")
        .head().getLong(0) === (0 until 7777).count(_ % 5 == 2).toLong)
    }
    assert(n2 > 0L, "filtered count did not scan")

    // outstanding MOR delete: manifest totals overcount — refuse and scan
    IcebergLite.deleteWhereMOR(spark, s"$wh/cnt_t", col("id") < 77L)
    val n3 = recordsRead {
      assert(spark.sql("SELECT count(*) FROM ncat.cnt_t")
        .head().getLong(0) === 7700L)
    }
    assert(n3 > 0L, "MOR-deleted count did not scan")
  }

  test("native scan applies MOR deletes: position + equality + sequence semantics ≡ V1") {
    // r19 verdict task 1: MOR-deleted tables must stay on the native
    // route (statistics, DPP, direct parquet) with the deletes applied
    // INSIDE the scan — position deletes as a per-file row-index
    // anti-filter, equality deletes as key sets with the entry-snapshot
    // sequence check (a later re-append of a deleted key survives)
    spark.sql("""CREATE TABLE ncat.nat_morscan (id BIGINT, lang STRING,
                 body STRING, n BIGINT) USING iceberg
                 PARTITIONED BY (lang)""")
    val dir = s"$wh/nat_morscan"
    docs(400).writeTo("ncat.nat_morscan").append()
    // position deletes (content=1): a predicate MOR delete
    IcebergLite.deleteWhereMOR(spark, dir, col("id") % 7 === 0)
    // equality deletes (content=2) on id
    IcebergLite.equalityDeleteMOR(spark, dir,
      (1 to 100).map(_.toLong).toDF("id"))
    // upsert: re-append some of the equality-deleted keys — the new
    // rows postdate the delete and MUST survive
    docs(40).withColumn("n", col("n") + 5000L)
      .writeTo("ncat.nat_morscan").append()

    def readAll(native: Boolean): Seq[(Long, String, Long)] = {
      spark.conf.set("spark.graft.nativeScan.enabled", native.toString)
      try spark.table("ncat.nat_morscan")
        .select(col("id"), col("lang"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
      finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    }
    val native = readAll(native = true)
    val v1 = readAll(native = false)
    assert(native === v1)
    // independent expectation: survivors = (401..∞ none) — base docs
    // minus id%7==0 minus id in 1..100, plus the 40 re-appended rows
    val base = (1 to 400).filter(i => i % 7 != 0 && i > 100)
      .map(i => (i.toLong, s"w${i % 7}", i * 3L))
    val reup = (1 to 40).map(i => (i.toLong, s"w${i % 7}", i * 3L + 5000L))
    assert(native === (base ++ reup).sorted)
    // the native route actually engaged on the MOR table
    val plan = spark.table("ncat.nat_morscan").queryExecution.executedPlan
    assert(plan.toString.contains("GraftNativeScan"),
      s"expected the native batch scan on the MOR table in:\n$plan")
    // column pruning that EXCLUDES the equality key column still
    // applies the deletes (the key rides as an extra reader column)
    def langOnly(native: Boolean): Seq[String] = {
      spark.conf.set("spark.graft.nativeScan.enabled", native.toString)
      try spark.table("ncat.nat_morscan").select("lang", "n")
        .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}")
        .toSeq.sorted
      finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    }
    assert(langOnly(native = true) === langOnly(native = false))
    // filters pushed onto a position-deleted file stay exact (the row
    // index is computed under row-group skipping, not row counting)
    def filtered(native: Boolean): Seq[Long] = {
      spark.conf.set("spark.graft.nativeScan.enabled", native.toString)
      try spark.table("ncat.nat_morscan").filter(col("id") > 350)
        .select("id").collect().map(_.getLong(0)).toSeq.sorted
      finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    }
    assert(filtered(native = true) === filtered(native = false))
  }

  test("MOR position deletes on a NESTED schema (parquet-mr row-index path) ≡ V1") {
    // nested columns decline the vectorized reader — the row-index
    // column must also come back from the parquet-mr reader wrapper
    spark.sql("""CREATE TABLE ncat.nat_mor_nested (id BIGINT,
                 tags ARRAY<STRING>, n BIGINT) USING iceberg""")
    spark.range(1, 101)
      .selectExpr("id", "array(concat('t', id % 5), 'x') AS tags",
        "id * 7 AS n")
      .writeTo("ncat.nat_mor_nested").append()
    IcebergLite.deleteWhereMOR(spark, s"$wh/nat_mor_nested",
      col("id") % 3 === 0)
    def readAll(native: Boolean): Seq[(Long, String, Long)] = {
      spark.conf.set("spark.graft.nativeScan.enabled", native.toString)
      try spark.table("ncat.nat_mor_nested")
        .selectExpr("id", "tags[0] AS t0", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
      finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    }
    val native = readAll(native = true)
    assert(native === readAll(native = false))
    assert(native.size === 67)
    assert(spark.table("ncat.nat_mor_nested").queryExecution.executedPlan
      .toString.contains("GraftNativeScan"))
  }

  test("MOR equality deletes on a BINARY key refuse the native route (reference-equality hazard)") {
    // the reader's key sets compare boxed values; Array[Byte] compares
    // by REFERENCE, so a binary-keyed equality delete on the native
    // route would silently resurrect rows — it must fall back to V1
    spark.sql("""CREATE TABLE ncat.nat_mor_bin (k BINARY, n BIGINT)
                 USING iceberg""")
    spark.range(1, 21)
      .selectExpr("CAST(CAST(id AS STRING) AS BINARY) AS k", "id AS n")
      .writeTo("ncat.nat_mor_bin").append()
    IcebergLite.equalityDeleteMOR(spark, s"$wh/nat_mor_bin",
      Seq("3", "7").toDF("k").selectExpr("CAST(k AS BINARY) AS k"))
    val df = spark.table("ncat.nat_mor_bin")
    assert(!df.queryExecution.executedPlan.toString
      .contains("GraftNativeScan"),
      "binary-keyed equality deletes must not take the native route")
    assert(df.count() === 18L)
    // and the deletes actually applied (V1 route correctness)
    assert(df.selectExpr("CAST(k AS STRING) AS s").collect()
      .map(_.getString(0)).toSet === (1 to 20).map(_.toString).toSet -- Set("3", "7"))
  }

  test("MOR statistics do not under-estimate a pruned scan (global delete total)") {
    // partition A carries heavy position deletes; a read pruned to
    // partition B must NOT subtract the GLOBAL delete total from B's
    // rows (rows=0 would flip the broadcast decision the wrong way)
    spark.sql("""CREATE TABLE ncat.stat_prune (id BIGINT, part STRING,
                 v BIGINT) USING iceberg PARTITIONED BY (part)""")
    spark.range(0, 20000)
      .selectExpr("id", "CASE WHEN id < 10000 THEN 'a' ELSE 'b' END AS part",
        "id AS v")
      .writeTo("ncat.stat_prune").append()
    // delete most of partition a (MOR)
    IcebergLite.deleteWhereMOR(spark, s"$wh/stat_prune",
      col("part") === "a" && col("id") < 9000L)
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val q = spark.table("ncat.stat_prune").filter(col("part") === "b")
    val scan = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scan.nonEmpty)
    val stats = scan.head.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong === 10000L,
      s"pruned-scan estimate subtracted the global delete total: " +
        s"${stats.numRows()}")
    // unpruned scan still subtracts (exact direction for the whole table)
    val full = spark.table("ncat.stat_prune").queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(full.numRows().getAsLong === 11000L, s"${full.numRows()}")
  }

  test("MOR-deleted dimension keeps manifest statistics: the join still broadcasts") {
    // the r19 gap: MOR tables fell to the V1ScanWrapper fallback, whose
    // statistics Spark never consults — every fact⋈dim join on a
    // CDC/upsert table planned a two-sided sort-merge join until compact
    spark.sql("""CREATE TABLE ncat.stat_fact2 (id BIGINT, k BIGINT,
                 v BIGINT) USING iceberg""")
    spark.sql("""CREATE TABLE ncat.stat_dim2 (k BIGINT, name STRING)
                 USING iceberg""")
    spark.range(0, 50000)
      .selectExpr("id", "id % 100 AS k", "id * 2 AS v")
      .writeTo("ncat.stat_fact2").append()
    spark.range(0, 100).selectExpr("id AS k", "concat('n', id) AS name")
      .writeTo("ncat.stat_dim2").append()
    // make the dim a genuine MOR table (outstanding position deletes)
    IcebergLite.deleteWhereMOR(spark, s"$wh/stat_dim2", col("k") >= 90L)

    val j = spark.table("ncat.stat_fact2")
      .join(spark.table("ncat.stat_dim2"), "k")
      .groupBy("name").agg(sum(col("v")).as("s"))
    assert(j.count() === 90L)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"MOR dim did not auto-broadcast:\n$plan")
    // and the values are the V1 route's
    spark.conf.set("spark.graft.nativeScan.enabled", "false")
    val want =
      try spark.table("ncat.stat_fact2")
        .join(spark.table("ncat.stat_dim2"), "k")
        .groupBy("name").agg(sum(col("v")).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted
      finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    val got = j.collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got === want)
  }

  test("MIN/MAX(date|timestamp) answer from metadata with zero file records read") {
    // r19 carried item: temporal bounds serialize as the SAME integral
    // physical values their ordering is defined on (date = days int,
    // timestamp = micros long) — the exactness proof is int/long's
    spark.sql("""CREATE TABLE ncat.mm_temporal (id BIGINT, d DATE,
                 ts TIMESTAMP) USING iceberg""")
    spark.range(0, 500)
      .selectExpr("id", "date_add(DATE'2031-01-01', CAST(id AS INT)) AS d",
        "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP'2031-01-01 00:00:00') AS ts")
      .writeTo("ncat.mm_temporal").append()

    def recordsRead(f: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          acc.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      try { f; Thread.sleep(500) }
      finally spark.sparkContext.removeSparkListener(l)
      acc.get()
    }

    val n = recordsRead {
      val r = spark.sql(
        "SELECT min(d), max(d), min(ts), max(ts), count(*) FROM ncat.mm_temporal")
        .head()
      assert(r.getDate(0).toString === "2031-01-01")
      assert(r.getDate(1).toString === "2032-05-14")
      assert(r.getTimestamp(2) ===
        java.sql.Timestamp.valueOf("2031-01-01 00:00:00"))
      assert(r.getTimestamp(3) ===
        java.sql.Timestamp.valueOf("2031-01-21 19:00:00"))
      assert(r.getLong(4) === 500L)
    }
    assert(n === 0L, s"temporal metadata min/max read $n file records")

    // the recorded temporal bounds also serve ordinary value queries
    // identically on both routes (sanity: bounds don't mis-prune)
    def hot(native: Boolean): Long = {
      spark.conf.set("spark.graft.nativeScan.enabled", native.toString)
      try spark.table("ncat.mm_temporal")
        .filter(col("d") >= java.sql.Date.valueOf("2032-05-10"))
        .count()
      finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    }
    assert(hot(native = true) === hot(native = false))
    assert(hot(native = true) === 5L)
  }

  test("native DML on a MOR-deleted table refuses with a real message") {
    spark.sql("""CREATE TABLE ncat.nat_mor (id BIGINT, n BIGINT)
                 USING iceberg""")
    spark.range(1, 11).selectExpr("id", "id AS n")
      .writeTo("ncat.nat_mor").append()
    IcebergLite.deleteWhereMOR(spark, s"$wh/nat_mor", col("id") === 3L)
    val bare = GraftParquetShim.bareSession(spark)
    bare.conf.set("spark.sql.catalog.ncat",
      classOf[GraftTableCatalog].getName)
    bare.conf.set("spark.sql.catalog.ncat.warehouse", wh)
    val e = intercept[Exception] {
      bare.sql("UPDATE ncat.nat_mor SET n = 0 WHERE id > 100")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++
        messages(t.getCause)
    assert(messages(e).exists(_.contains("merge-on-read")),
      messages(e).mkString(" | "))
  }
}

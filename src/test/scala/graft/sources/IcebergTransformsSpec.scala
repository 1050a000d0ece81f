package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Partition transforms / hidden partitioning (sources/
  * IcebergTransforms + the IcebergLite write/prune integration):
  * spec-pinned bucket hashing, write-side vs plan-side transform
  * agreement (the invariant pruning correctness rests on), per-
  * transform pruning behavior, and maintenance composition. */
class IcebergTransformsSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_iceberg_tf").toString + "/t"

  // ---- spec bucket hashing -------------------------------------------------

  test("murmur3 matches the reference implementation on arbitrary bytes") {
    // scala.util.hashing.MurmurHash3.bytesHash IS murmur3_x86_32 — an
    // independent implementation to agree with
    val rnd = new scala.util.Random(7)
    for (len <- 0 to 40) {
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      assert(IcebergTransforms.murmur3(b, 17) ==
        scala.util.hashing.MurmurHash3.bytesHash(b, 17),
        s"murmur3 disagrees at len $len")
    }
  }

  test("bucket hashing pins the Iceberg spec Appendix B vectors") {
    // int and long 34 hash identically (8-byte little-endian)
    assert(IcebergTransforms.hashLong(34L) == 2017239379)
    // string "iceberg" hashes over UTF-8 bytes
    assert(IcebergTransforms.murmur3("iceberg".getBytes("UTF-8")) ==
      1210000089)
  }

  test("parse accepts the transform DSL and refuses junk") {
    import IcebergTransforms.{parse, PartField}
    assert(parse("lang") == PartField("lang", "identity", "lang"))
    assert(parse("bucket[16]:id") == PartField("id_bucket", "bucket[16]", "id"))
    assert(parse("truncate[8]:name") ==
      PartField("name_trunc", "truncate[8]", "name"))
    assert(parse("day:ts") == PartField("ts_day", "day", "ts"))
    assert(parse("hour:ts") == PartField("ts_hour", "hour", "ts"))
    intercept[RuntimeException](parse("mod[3]:id"))
    intercept[IllegalArgumentException](parse("bucket[0]:id"))
  }

  test("write-side column and plan-side applyValue agree per transform") {
    import IcebergTransforms.{applyValue, column}
    import org.apache.spark.sql.types._
    val ts = java.sql.Timestamp.valueOf("2024-03-05 22:31:08.123")
    val rows = Seq((34L, "iceberg rocks", ts))
      .toDF("id", "s", "ts")
    val checks = Seq[(String, String, DataType, Any)](
      ("bucket[16]", "id", LongType, 34L),
      ("truncate[10]", "id", LongType, 34L),
      ("bucket[16]", "s", StringType, "iceberg rocks"),
      ("truncate[4]", "s", StringType, "iceberg rocks"),
      ("day", "ts", TimestampType, ts),
      ("hour", "ts", TimestampType, ts),
      ("month", "ts", TimestampType, ts),
      ("year", "ts", TimestampType, ts))
    checks.foreach { case (t, c, dt, v) =>
      val colVal = rows.select(column(spark, t, col(c), dt)).head().get(0)
      assert(colVal == applyValue(t, dt, v), s"$t over $c disagrees")
    }
    // negative longs floor, not truncate toward zero
    assert(applyValue("truncate[10]", LongType, -7L) == -10L)
    // int and long bucket identically (widening never reshuffles)
    assert(applyValue("bucket[8]", IntegerType, 34) ==
      applyValue("bucket[8]", LongType, 34L))
  }

  // ---- hidden partitioning end to end --------------------------------------

  private def docs(n: Int) = (0L until n.toLong)
    .map(i => (i, s"w${i % 7}", i * 3)).toDF("id", "s", "n")

  test("bucket-partitioned table: hidden key, equality pruning, exact rows") {
    val dir = tmp()
    IcebergLite.createTable(spark, docs(400), dir,
      partitionBy = Seq("bucket[8]:id"))
    IcebergLite.appendSnapshot(spark, (400L until 800L)
      .map(i => (i, s"w${i % 7}", i * 3)).toDF("id", "s", "n"), dir,
      partitionBy = Seq("bucket[8]:id"))
    // the derived key never enters the table schema
    val back = IcebergLite.readTable(spark, dir)
    assert(back.columns.toSeq == Seq("id", "s", "n"))
    assert(back.count() == 800L)
    // a point query on the SOURCE column prunes to its bucket
    val (kept, total) = IcebergLite.scanFileCount(spark, dir,
      Seq(IcebergLite.EqTo("id", 123L)))
    assert(total == 16, s"expected 16 files, got $total")
    assert(kept <= 2, s"kept $kept of $total — bucket pruning broken")
    val got = IcebergLite.readTableWhere(spark, dir,
      Seq(IcebergLite.EqTo("id", 123L)))
      .filter(col("id") === 123L).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((123L, "w4", 369L)))
    // range predicates cannot prune through bucket (only the COLUMN
    // BOUNDS leg may skip files — here snapshot 1's, ids 0–399) and
    // must not lose rows
    val (keptR, _) = IcebergLite.scanFileCount(spark, dir,
      Seq(IcebergLite.GtEq("id", 700L)))
    assert(keptR == 8, s"kept $keptR — bucket must not range-prune")
    assert(IcebergLite.readTableWhere(spark, dir,
      Seq(IcebergLite.GtEq("id", 700L)))
      .filter(col("id") >= 700L).count() == 100L)
  }

  test("truncate-partitioned table: range pruning on longs and strings") {
    val dir = tmp()
    IcebergLite.createTable(spark, docs(1000), dir,
      partitionBy = Seq("truncate[100]:id"))
    val (kept, total) = IcebergLite.scanFileCount(spark, dir,
      Seq(IcebergLite.GtEq("id", 850L)))
    assert(total == 10 && kept <= 2, s"kept $kept of $total")
    assert(IcebergLite.readTableWhere(spark, dir,
      Seq(IcebergLite.GtEq("id", 850L)))
      .filter(col("id") >= 850L).count() == 150L)
    // string truncate: prefix dirs, ranged + equality pruning
    val dir2 = tmp()
    IcebergLite.createTable(spark, docs(700), dir2,
      partitionBy = Seq("truncate[2]:s"))
    val (k2, t2) = IcebergLite.scanFileCount(spark, dir2,
      Seq(IcebergLite.EqTo("s", "w3")))
    assert(t2 == 7 && k2 == 1, s"kept $k2 of $t2")
    assert(IcebergLite.readTableWhere(spark, dir2,
      Seq(IcebergLite.EqTo("s", "w3")))
      .filter(col("s") === "w3").count() == 100L)
  }

  test("day-partitioned table: time-range queries read their slice") {
    val dir = tmp()
    val rows = (0 until 96).map { h =>
      (h.toLong, java.sql.Timestamp.valueOf(
        f"2024-03-${5 + h / 24}%02d ${h % 24}%02d:30:00"))
    }.toDF("id", "ts")
    IcebergLite.createTable(spark, rows, dir, partitionBy = Seq("day:ts"))
    val cut = java.sql.Timestamp.valueOf("2024-03-07 00:00:00")
    val (kept, total) = IcebergLite.scanFileCount(spark, dir,
      Seq(IcebergLite.GtEq("ts", cut)))
    assert(total == 4 && kept == 2, s"kept $kept of $total")
    assert(IcebergLite.readTableWhere(spark, dir,
      Seq(IcebergLite.GtEq("ts", cut)))
      .filter(col("ts") >= cut).count() == 48L)
    // partitions metadata table shows the derived key
    val parts = IcebergLite.metaTable(spark, dir, "partitions")
      .collect().map(r => (r.getMap[String, String](0).get("ts_day").get,
        r.getLong(2))).toMap
    assert(parts.values.sum == 96L && parts.size == 4)
  }

  test("null sources land in the null partition and never prune away") {
    val dir = tmp()
    val rows = Seq((1L, Some("aa")), (2L, None), (3L, Some("bb")))
      .toDF("id", "s")
    IcebergLite.createTable(spark, rows, dir,
      partitionBy = Seq("bucket[4]:s"))
    assert(IcebergLite.readTable(spark, dir).count() == 3L)
    // the null-bucket file has no partition value — it always scans
    val got = IcebergLite.readTableWhere(spark, dir,
      Seq(IcebergLite.EqTo("s", "aa")))
    assert(got.filter(col("s") === "aa").count() == 1L)
    assert(got.filter(col("s").isNull).count() == 1L) // conservative
  }

  test("maintenance recomputes derived keys; contracts hold") {
    val dir = tmp()
    IcebergLite.createTable(spark, docs(400), dir,
      partitionBy = Seq("bucket[8]:id"))
    // COW delete + compact rewrite through the transform spec
    assert(IcebergLite.deleteWhere(spark, dir, col("id") % 5 === 0) == 80L)
    IcebergLite.compact(spark, dir)
    assert(IcebergLite.readTable(spark, dir).count() == 320L)
    val (kept, total) = IcebergLite.scanFileCount(spark, dir,
      Seq(IcebergLite.EqTo("id", 123L)))
    assert(kept < total, s"kept $kept of $total after compact")
    // spec is a contract: a differently-transformed append refuses
    val ex = intercept[IllegalArgumentException](
      IcebergLite.appendSnapshot(spark, docs(10), dir,
        partitionBy = Seq("bucket[4]:id")))
    assert(ex.getMessage.contains("partitioned by"))
    // evolution guards follow the SOURCE column
    val exRen = intercept[IllegalArgumentException](
      IcebergLite.renameColumn(spark, dir, "id", "doc_id"))
    assert(exRen.getMessage.contains("partition source"))
    // non-source columns still evolve freely
    IcebergLite.renameColumn(spark, dir, "n", "chars")
    assert(IcebergLite.readTable(spark, dir).columns.toSeq ==
      Seq("id", "s", "chars"))
  }

  test("transforms refuse incompatible source types loudly") {
    val dir = tmp()
    val ex = intercept[RuntimeException](
      IcebergLite.createTable(spark, docs(10), dir,
        partitionBy = Seq("day:id")))
    assert(ex.getMessage.contains("not defined over"))
    val ex2 = intercept[RuntimeException](
      IcebergLite.createTable(spark, docs(10), dir,
        partitionBy = Seq("truncate[4]:missing")))
    assert(ex2.getMessage.contains("not in schema"))
  }

  // ---- partition-spec evolution --------------------------------------------

  /** 96 hourly rows over 4 days of March 2024, ids 0..95. */
  private def hourly96 = (0 until 96).map { h =>
    (h.toLong, java.sql.Timestamp.valueOf(
      f"2024-03-${5 + h / 24}%02d ${h % 24}%02d:30:00"), s"d$h")
  }.toDF("id", "ts", "s")

  test("evolveSpec: metadata-only commit; appends re-key; reads span generations") {
    val dir = tmp()
    IcebergLite.createTable(spark, hourly96, dir, partitionBy = Seq("day:ts"))
    val snapsBefore = IcebergLite.snapshotIds(spark, dir)
    val specId = IcebergLite.evolveSpec(spark, dir,
      Seq("day:ts", "bucket[8]:id"))
    assert(specId == 1)
    // metadata-only: no new snapshot, data untouched
    assert(IcebergLite.snapshotIds(spark, dir) == snapsBefore)
    assert(IcebergLite.tablePartitionSpec(spark, dir) ==
      Seq("day:ts", "bucket[8]:id"))
    // the OLD partitionBy now refuses; the NEW one appends
    val ex = intercept[IllegalArgumentException](
      IcebergLite.appendSnapshot(spark,
        hourly96.withColumn("id", col("id") + 100L), dir,
        partitionBy = Seq("day:ts")))
    assert(ex.getMessage.contains("partitioned by"))
    IcebergLite.appendSnapshot(spark,
      hourly96.withColumn("id", col("id") + 100L), dir,
      partitionBy = Seq("day:ts", "bucket[8]:id"))
    val back = IcebergLite.readTable(spark, dir)
    assert(back.columns.toSeq == Seq("id", "ts", "s"))
    assert(back.count() == 192L)
    assert(back.select("id").as[Long].collect().toSet ==
      ((0L until 96L) ++ (100L until 196L)).toSet)
    // manifests carry their write-time spec ids
    assert(IcebergLite.metaTable(spark, dir, "manifests")
      .collect().map(_.getInt(3)).sorted.toSeq == Seq(0, 1))
  }

  test("pruning resolves each generation through ITS spec") {
    val dir = tmp()
    IcebergLite.createTable(spark, hourly96, dir, partitionBy = Seq("day:ts"))
    IcebergLite.evolveSpec(spark, dir, Seq("day:ts", "bucket[8]:id"))
    IcebergLite.appendSnapshot(spark,
      hourly96.withColumn("id", col("id") + 100L), dir,
      partitionBy = Seq("day:ts", "bucket[8]:id"))
    val (_, total) = IcebergLite.scanFileCount(spark, dir, Nil)
    // gen-1: 4 day files; gen-2: a file per POPULATED (day, bucket)
    assert(total > 4 + 8, s"expected both generations' files, got $total")
    // a RANGED read on ts prunes BOTH generations via their day fields:
    // 1 gen-1 file + at most the last day's 8 buckets survive
    val cut = java.sql.Timestamp.valueOf("2024-03-08 00:00:00")
    val (keptT, _) = IcebergLite.scanFileCount(spark, dir,
      Seq(IcebergLite.GtEq("ts", cut)))
    assert(keptT <= 1 + 8, s"kept $keptT — day pruning must span specs")
    assert(IcebergLite.readTableWhere(spark, dir,
        Seq(IcebergLite.GtEq("ts", cut)))
      .filter(col("ts") >= cut).count() == 48L)
    // a KEYED read prunes gen-2 via bucket; gen-1 keeps only what its
    // column bounds allow (conservative, never row-losing)
    val (keptK, _) = IcebergLite.scanFileCount(spark, dir,
      Seq(IcebergLite.EqTo("id", 150L)))
    assert(keptK <= 4 + 4, s"kept $keptK of $total on id=150")
    assert(IcebergLite.readTableWhere(spark, dir,
        Seq(IcebergLite.EqTo("id", 150L)))
      .filter(col("id") === 150L).count() == 1L)
    // ranged + keyed TOGETHER prune across both dimensions
    val (keptB, _) = IcebergLite.scanFileCount(spark, dir,
      Seq(IcebergLite.GtEq("ts", cut), IcebergLite.EqTo("id", 150L)))
    assert(keptB <= 2, s"kept $keptB — combined pruning broken")
  }

  test("maintenance re-keys rewrites through the CURRENT spec; carries keep theirs") {
    val dir = tmp()
    IcebergLite.createTable(spark, hourly96, dir, partitionBy = Seq("day:ts"))
    IcebergLite.evolveSpec(spark, dir, Seq("bucket[4]:id"))
    IcebergLite.appendSnapshot(spark,
      hourly96.withColumn("id", col("id") + 100L), dir,
      partitionBy = Seq("bucket[4]:id"))
    // COW delete touches files in BOTH generations: survivors of hit
    // files rewrite under the NEW spec, untouched files carry under
    // their own
    assert(IcebergLite.deleteWhere(spark, dir, col("id") % 24 === 1L) == 8L)
    val specIds = IcebergLite.metaTable(spark, dir, "manifests")
      .collect().map(_.getInt(3)).toSet
    assert(specIds.contains(1), s"rewrite not under the new spec: $specIds")
    assert(IcebergLite.readTable(spark, dir).count() == 184L)
    // full compact folds everything into the current spec
    IcebergLite.compact(spark, dir)
    assert(IcebergLite.metaTable(spark, dir, "manifests")
      .collect().map(_.getInt(3)).toSet == Set(1))
    assert(IcebergLite.readTable(spark, dir).count() == 184L)
    val (keptK, totalK) = IcebergLite.scanFileCount(spark, dir,
      Seq(IcebergLite.EqTo("id", 150L)))
    assert(keptK < totalK, s"kept $keptK of $totalK after re-key")
  }

  test("spec evolution composes with schema evolution and MOR deletes") {
    val dir = tmp()
    val rows = hourly96.withColumn("n", (col("id") * 2).cast("int"))
    IcebergLite.createTable(spark, rows, dir, partitionBy = Seq("day:ts"))
    IcebergLite.renameColumn(spark, dir, "s", "label")
    IcebergLite.evolveSpec(spark, dir, Seq("day:ts", "truncate[50]:id"))
    IcebergLite.appendSnapshot(spark,
      rows.toDF("id", "ts", "label", "n")
        .withColumn("id", col("id") + 100L), dir,
      partitionBy = Seq("day:ts", "truncate[50]:id"))
    IcebergLite.deleteWhereMOR(spark, dir, col("id") === 5L)
    // widening a NON-partition column composes (partition sources are
    // guarded — their directory encoding anchors the layout)
    IcebergLite.widenColumn(spark, dir, "n",
      org.apache.spark.sql.types.LongType)
    val back = IcebergLite.readTable(spark, dir)
    assert(back.columns.toSeq == Seq("id", "ts", "label", "n"))
    assert(back.count() == 191L)
    assert(back.schema("n").dataType.typeName == "long")
    IcebergLite.compactSmallFiles(spark, dir, Long.MaxValue)
    assert(IcebergLite.readTable(spark, dir).count() == 191L)
    // n was derived BEFORE the append's id shift: both generations
    // carry n = orig_id * 2; the deleted row (id 5) had n = 10
    assert(IcebergLite.readTable(spark, dir)
      .agg(sum(col("n"))).head().getLong(0) ==
      2L * (0L until 96L).map(_ * 2).sum - 10L)
  }

  test("incremental and changelog reads span a spec evolution") {
    val dir = tmp()
    IcebergLite.createTable(spark, hourly96, dir, partitionBy = Seq("day:ts"))
    IcebergLite.evolveSpec(spark, dir, Seq("day:ts", "bucket[8]:id"))
    IcebergLite.appendSnapshot(spark,
      hourly96.withColumn("id", col("id") + 100L), dir,
      partitionBy = Seq("day:ts", "bucket[8]:id"))
    // the (0, 2] range crosses the evolution: both generations' files
    // read through their own partition-dir layouts
    val inc = IcebergLite.readIncremental(spark, dir, 0L)
    assert(inc.count() == 192L)
    assert(inc.select("id").as[Long].collect().toSet ==
      ((0L until 96L) ++ (100L until 196L)).toSet)
    val chg = IcebergLite.readChangelog(spark, dir, 0L)
    assert(chg.filter(col("_change_type") === "insert").count() == 192L)
    // a SQL route over the gate's native function also works end to end
    import spark.implicits._
    val rules = Seq(("x", Seq("D:/p/"))).toDF("d", "rules")
    rules.createOrReplaceTempView("rb")
    assert(spark.sql(
      "SELECT graft_robots_allowed('/p/x', rules) AS a FROM rb")
      .head().getBoolean(0) == false)
  }

  test("evolveSpec refusals: no-op spec, bad source, name collision") {
    val dir = tmp()
    IcebergLite.createTable(spark, hourly96, dir, partitionBy = Seq("day:ts"))
    val ex0 = intercept[IllegalArgumentException](
      IcebergLite.evolveSpec(spark, dir, Seq("day:ts")))
    assert(ex0.getMessage.contains("already the default"))
    val ex1 = intercept[RuntimeException](
      IcebergLite.evolveSpec(spark, dir, Seq("bucket[8]:missing")))
    assert(ex1.getMessage.contains("not in schema"))
    val dir2 = tmp()
    IcebergLite.createTable(spark,
      hourly96.withColumnRenamed("s", "id_bucket"), dir2,
      partitionBy = Seq("day:ts"))
    val ex2 = intercept[IllegalArgumentException](
      IcebergLite.evolveSpec(spark, dir2, Seq("bucket[8]:id")))
    assert(ex2.getMessage.contains("collides"))
  }
}

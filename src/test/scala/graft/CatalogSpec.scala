package graft

class CatalogSpec extends SparkSuite {

  test("SparkEntry.entry (driver smoke check) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registerTables exposes every table to plain SQL") {
    Catalog.registerTables(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT COUNT(*) FROM documents").head().getLong(0) === 500)
    // graft native functions are SQL-callable through GraftExtensions
    val fp = spark.sql(
      "SELECT graft_rolling_fingerprint(text, 8) FROM documents LIMIT 1")
      .head().getLong(0)
    assert(fp != 0L)
  }

  test("registerIcebergWarehouse serves the spark.read.table route") {
    import graft.etl.{NexusFixtures, NexusH5, NexusPipeline}
    val dir = NexusFixtures.writeRunDir(
      java.nio.file.Files.createTempDirectory("graft_cat_nxs"), 2).toString
    val wh = java.nio.file.Files.createTempDirectory("graft_cat_wh").toString
    NexusPipeline.processAndWriteIceberg(spark,
      NexusH5.toRunBundle(NexusH5.readRuns(spark, dir)), wh)
    Catalog.registerIcebergWarehouse(spark, wh)
    // plain SQL over the registered Iceberg-format tables
    val n = spark.sql("""
      SELECT COUNT(*) FROM events e
      JOIN event_summary s ON e.run_id = s.run_id AND e.bank = s.bank""")
      .head().getLong(0)
    val expected = (0 until 2).map(r =>
      (0 until NexusFixtures.Banks).map(b => NexusFixtures.nEvents(r, b)).sum)
      .sum.toLong
    assert(n == expected)
    assert(spark.sql("SELECT COUNT(*) FROM experiment_runs")
      .head().getLong(0) == 2L)
  }
}

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
}

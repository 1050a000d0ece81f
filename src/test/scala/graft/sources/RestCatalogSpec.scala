package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The REST-catalog wire twin (sources/RestCatalog): the full
  * create/append/read/time-travel loop over a real HTTP wire against
  * the in-process service, plus the failure modes that prove the wire
  * is load-bearing (service down → calls fail; stale commit → 409). */
class RestCatalogSpec extends SparkSuite {
  import spark.implicits._

  private def freshServer(): (GraftRestCatalogServer, String) = {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_rest_wh").toString
    (new GraftRestCatalogServer(spark, wh).start(), wh)
  }

  test("create / append / read / time-travel over the wire") {
    val (server, wh) = freshServer()
    try {
      spark.conf.set("spark.sql.catalog.rtest",
        classOf[GraftRestCatalog].getName)
      spark.conf.set("spark.sql.catalog.rtest.uri", server.uri)
      spark.sql("CREATE NAMESPACE rtest.db")
      spark.sql("""CREATE TABLE rtest.db.t (id BIGINT, lang STRING,
                   n BIGINT) USING iceberg PARTITIONED BY (lang)""")
      assert(spark.sql("SHOW TABLES IN rtest.db").collect()
        .map(_.getString(1)).toSeq === Seq("t"))
      val batch1 = (1 to 10)
        .map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i * 10L))
        .toDF("id", "lang", "n")
      batch1.writeTo("rtest.db.t").append()
      batch1.withColumn("id", col("id") + 100)
        .writeTo("rtest.db.t").append()
      assert(spark.table("rtest.db.t").count() === 20L)
      assert(spark.sql(
        "SELECT sum(n) AS s FROM rtest.db.t WHERE lang = 'a'")
        .head().getLong(0) === 2 * (2 to 10 by 2).map(_ * 10L).sum)
      // time travel through the WIRE metadata (1 = create, 2 = first
      // append), by id and by named ref
      assert(spark.sql(
        "SELECT count(*) AS c FROM rtest.db.t VERSION AS OF 2")
        .head().getLong(0) === 10L)
      assert(spark.sql(
        "SELECT count(*) AS c FROM rtest.db.t VERSION AS OF 'main'")
        .head().getLong(0) === 20L)
      // the table is a REAL IcebergLite table on shared storage: the
      // direct route reads the same rows
      assert(IcebergLite.readTable(spark, s"$wh/db/t").count() === 20L)
      // drop over the wire
      assert(spark.sql("DROP TABLE rtest.db.t") != null)
      assert(!new java.io.File(s"$wh/db/t").exists())
    } finally server.stop()
  }

  test("the wire is load-bearing: stale commits refuse, dead service fails") {
    val (server, wh) = freshServer()
    spark.conf.set("spark.sql.catalog.rdead",
      classOf[GraftRestCatalog].getName)
    spark.conf.set("spark.sql.catalog.rdead.uri", server.uri)
    spark.sql("CREATE NAMESPACE rdead.db")
    spark.sql("CREATE TABLE rdead.db.t (id BIGINT) USING iceberg")
    Seq(1L, 2L).toDF("id").writeTo("rdead.db.t").append()
    // a STALE snapshot id (the optimistic-concurrency conflict) → 409
    val dir = s"$wh/db/t"
    val staged = IcebergLite.stageRestAppend(spark, dir,
      Seq(9L).toDF("id")).get
    IcebergLite.stageRestAppend(spark, dir, Seq(8L).toDF("id")) match {
      case Some((sid2, list2, sum2)) =>
        // adopt the SECOND staging first, then replay the first: its
        // snapshot id is now stale and the service must refuse
        IcebergLite.adoptSnapshot(spark, dir, sid2, list2, sum2)
        val e = intercept[IllegalArgumentException] {
          val cat = new GraftRestCatalog()
          val opts = new java.util.HashMap[String, String]()
          opts.put("uri", server.uri)
          cat.initialize("rdead",
            new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
          cat.commitSnapshot(
            org.apache.spark.sql.connector.catalog.Identifier.of(
              Array("db"), "t"),
            staged._1, staged._2, staged._3)
        }
        assert(e.getMessage.contains("409"), e.getMessage)
      case None => fail("staging produced nothing")
    }
    // dead service: every wire call fails, nothing silently local
    server.stop()
    val eDead = intercept[Exception] {
      spark.sql("SELECT count(*) FROM rdead.db.t2x").collect()
    }
    assert(eDead != null)
  }
}

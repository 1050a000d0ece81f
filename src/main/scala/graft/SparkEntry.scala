package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.QueryCatalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator surface itself lives in graft.queries.QueryCatalog; this
  * object only adapts it to the driver's (name -> fn, name -> sql) shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the event time-slicing pipeline (pulse derivation + as-of join +
    * interval counts) — the reference's reason to exist.
    */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.byName("events_by_interval").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all.map(q => q.name -> q.fn).toMap

  /** DuckDB-equivalent SQL for each SQL-expressible query; LSH/ANN
    * operators are deliberately absent (rows-only check) and covered by
    * ScalaTest oracles instead.
    */
  def oracleSql: Map[String, String] =
    QueryCatalog.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Error-bound oracle for the approximate aggregates: sketch outputs are
  * engine-specific (no DuckDB hash match), so exactness is replaced by
  * bounded relative error against the exact answers on the same data.
  */
class SketchSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 3x the configured rsd of exact") {
    val orders = graft.Tables.load(spark, sf, "orders")
    val rows = orders.groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
        count_distinct(col("o_custkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx").toDouble, r.getAs[Long]("exact").toDouble)
      assert(math.abs(a - e) / e <= 0.06,
        s"${r.get(0)}: approx $a vs exact $e")
    }
  }

  test("percentile_approx at accuracy 10000 is near-exact on small groups") {
    val orders = graft.Tables.load(spark, sf, "orders")
    val rows = orders.groupBy("o_orderpriority")
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx"),
        expr("percentile(o_totalprice, 0.5)").as("exact"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getAs[Double]("approx"), r.getAs[Double]("exact"))
      // percentile_approx returns an actual data value nearest the
      // quantile; allow the gap between adjacent order statistics
      assert(math.abs(a - e) / math.max(e, 1.0) <= 0.02,
        s"${r.get(0)}: approx $a vs exact $e")
    }
  }
}

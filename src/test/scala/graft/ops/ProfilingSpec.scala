package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ProfilingSpec extends SparkSuite {
  import spark.implicits._

  private def sample = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, Some("b"), None),
    (3L, None, Some(2.5)),
    (4L, Some("a"), Some(-0.5)),
    (5L, Some("c"), Some(2.5))).toDF("id", "s", "v")

  test("profileTable: exact stats per column from one pass") {
    val p = Profiling.profileTable(sample, Seq("id", "s", "v"),
        exactDistinct = true)
      .select("col_name", "n_rows", "n_null", "n_distinct",
        "min_value", "max_value")
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("id") === (("id", 5L, 0L, 5L, "1", "5")))
    assert(p("s") === (("s", 5L, 1L, 3L, "a", "c")))
    assert(p("v") === (("v", 5L, 1L, 3L, "-0.5", "2.5")))
    // output row order follows the requested column order
    assert(Profiling.profileTable(sample, Seq("v", "id"), exactDistinct = true)
      .select("col_name").as[String].collect().toSeq === Seq("v", "id"))
  }

  test("profileTable default (approx-only) leaves n_distinct null and estimates well") {
    val p = Profiling.profileTable(sample, Seq("id"))
      .select("n_distinct", "n_distinct_approx")
      .as[(Option[Long], Long)].head()
    assert(p._1.isEmpty)
    // HLL++ is exact at tiny cardinality
    assert(p._2 === 5L)
  }

  test("profileTable is a single aggregation over a single scan") {
    val plan = Profiling.profileTable(sample, Seq("id", "s", "v"))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size === 1, s"expected one scan, got ${scans.size}")
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def df = (1L to 4000L).map(i =>
    (i, if (i % 2 == 0) "keep_all" else "half")).toDF("id", "stratum")

  test("stratified keeps rate-1.0 strata fully and others near their rate") {
    val kept = Sampling.stratified(df, "id", "stratum",
      Map("keep_all" -> 1.0, "half" -> 0.5), defaultRate = 0.0)
    val counts = kept.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(counts("keep_all") === 2000L)
    assert(math.abs(counts("half") - 1000L) < 100, s"got ${counts("half")}")
  }

  test("sampling is deterministic and monotone in the rate") {
    val a = Sampling.stratified(df, "id", "stratum", Map.empty, 0.3)
      .select("id").as[Long].collect().toSet
    val b = Sampling.stratified(df, "id", "stratum", Map.empty, 0.3)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    val wider = Sampling.stratified(df, "id", "stratum", Map.empty, 0.6)
      .select("id").as[Long].collect().toSet
    assert(a.subsetOf(wider)) // raising the rate only adds rows
  }

  test("default rate applies to unlisted strata") {
    val kept = Sampling.stratified(df, "id", "stratum",
      Map("keep_all" -> 0.0), defaultRate = 1.0)
    val counts = kept.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("keep_all"))
    assert(counts("half") === 2000L)
  }
}

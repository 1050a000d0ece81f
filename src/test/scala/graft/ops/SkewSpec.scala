package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("saltedSumCount equals the direct aggregation") {
    val df = (1L to 1000L).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i, i.toDouble))
      .toDF("key", "uid", "v")
    val salted = Skew.saltedSumCount(df, Seq("key"), "uid", saltBuckets = 8, sums = Seq("v"))
      .orderBy("key").select("key", "n", "sum_v")
      .as[(String, Long, Double)].collect().toSeq
    val direct = df.groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("key").select("key", "n", "sum_v")
      .as[(String, Long, Double)].collect().toSeq
    assert(salted === direct)
  }

  test("saltedJoin equals the plain join") {
    val large = (1L to 500L).map(i => (if (i % 5 == 0) 1L else i % 50, i)).toDF("key", "uid")
    val small = (0L until 50L).map(k => (k, s"payload$k")).toDF("key", "payload")
    val salted = Skew.saltedJoin(large, small, "key", "uid", saltFactor = 4)
      .select("uid", "payload").as[(Long, String)].collect().toSet
    val plain = large.join(small, "key")
      .select("uid", "payload").as[(Long, String)].collect().toSet
    assert(salted === plain)
  }
}

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

  test("skewAudit measures a planted hot key and sizes its salt") {
    // 900 rows of key=1 (hot), 10 each of keys 2..11 -> 1000 rows, 11 keys
    val df = ((1L to 900L).map(_ => 1L) ++
      (2L to 11L).flatMap(k => Seq.fill(10)(k))).toDF("k")
    val rows = Skew.skewAudit(df, "k", topK = 3, targetRowsPerTask = 100L)
      .select("key", "cnt", "n_rows", "n_keys", "skew_ratio_pct", "suggested_salt")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.size === 3)
    val hot = rows.head
    // hot key first: 900 rows, 900*11*100/1000 = 990% of the mean key,
    // salt = ceil(900/100) = 9
    assert(hot === (("1", 900L, 1000L, 11L, 990L, 9L)))
    // cold keys tie at cnt=10 -> numeric key ascending; salt 1, ratio
    // 10*11*100/1000 = 11% of the mean key's load -> floor-div exact
    assert(rows(1) === (("2", 10L, 1000L, 11L, 11L, 1L)))
    assert(rows(2) === (("3", 10L, 1000L, 11L, 11L, 1L)))
    // the recommended factor actually levels the load: no (key, salt)
    // bucket exceeds targetRowsPerTask by more than the rounding row
    val salt = hot._6.toInt
    val maxBucket = df.filter(col("k") === 1L)
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
      .groupBy("__salt").count().agg(max("count")).as[Long].head()
    assert(maxBucket <= 2 * 100L, s"bucket $maxBucket far above target")
  }
}

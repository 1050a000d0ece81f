package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed join runs with no Exchange on either side") {
    val orders = (1L to 500L).map(i => (i, s"o$i")).toDF("key", "o_payload")
    val items = (1L to 2000L).map(i => (i % 500 + 1, s"i$i")).toDF("key", "i_payload")

    Bucketing.writeBucketed(orders, "graft_bkt_orders", Seq("key"), 8)
    Bucketing.writeBucketed(items, "graft_bkt_items", Seq("key"), 8)
    // force the non-broadcast path: co-location matters exactly when the
    // sides are too big to broadcast
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.joinBucketed(spark, "graft_bkt_orders", "graft_bkt_items", Seq("key"))
      assert(joined.count() === 2000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // correctness: same rows as a plain join
      val plain = orders.join(items, "key").count()
      assert(joined.count() === plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_items")
    }
  }
}

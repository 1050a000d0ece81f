package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkSuite

/** Ranking must reproduce the single-partition window results exactly
  * (given a total order) while never planning an unpartitioned WindowExec.
  */
class RankingSpec extends SparkSuite {
  import spark.implicits._

  // deliberately unsorted, with duplicate sort values broken by id
  private def df = Seq(
    (5L, 30.0), (1L, 50.0), (7L, 30.0), (2L, 10.0), (9L, 50.0),
    (3L, 70.0), (8L, 10.0), (4L, 40.0), (6L, 40.0), (10L, 20.0),
    (11L, 60.0), (12L, 5.0), (13L, 90.0))
    .toDF("id", "price").repartition(4)

  private def hasUnpartitionedWindow(plan: org.apache.spark.sql.DataFrame): Boolean = {
    // look THROUGH AdaptiveSparkPlanExec: it has no children, so a plain
    // collect over the AQE-wrapped plan finds no WindowExec at all and
    // the assertion would be vacuous
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scan(a.executedPlan)
      case w: WindowExec if w.partitionSpec.isEmpty => true
      case other => other.children.exists(scan)
    }
    scan(plan.queryExecution.executedPlan)
  }

  test("globalRowNumber equals row_number over a global window") {
    val expected = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("price"), col("id"))).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val got = Ranking.globalRowNumber(df, Seq(col("price"), col("id")), "rn",
        numPartitions = 4)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got === expected)
    assert(!hasUnpartitionedWindow(
      Ranking.globalRowNumber(df, Seq(col("price"), col("id")), "rn", 4)))
  }

  test("globalRunningSum equals sum over a global running window") {
    val src = (1L to 200L).map(i => (i, (i * 37) % 23 + 1)).toDF("id", "v")
      .repartition(7)
    val expected = src
      .withColumn("c", sum(col("v")).over(
        Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "c").as[(Long, Long)].collect().toMap
    val out = Ranking.globalRunningSum(src, "v", Seq(col("id")), "c",
      numPartitions = 5)
    assert(out.select("id", "c").as[(Long, Long)].collect().toMap === expected)
    assert(!hasUnpartitionedWindow(out))
  }

  test("globalRowNumber handles descending orderings") {
    val expected = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("price").desc, col("id"))).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val got = Ranking.globalRowNumber(df,
        Seq(col("price").desc, col("id")), "rn", numPartitions = 4)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("globalNtile equals ntile over a global window (uneven buckets)") {
    // 13 rows / 4 buckets: sizes 4,3,3,3 — exercises the remainder branch
    val expected = df
      .withColumn("q", ntile(4).over(
        Window.orderBy(col("price").desc, col("id"))).cast("long"))
      .select("id", "q").as[(Long, Long)].collect().toMap
    val got = Ranking.globalNtile(df, 4,
        Seq(col("price").desc, col("id")), "q", numPartitions = 4)
      .select("id", "q").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("globalNtile with more buckets than rows assigns one row per bucket") {
    val tiny = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "price")
    val got = Ranking.globalNtile(tiny, 5, Seq(col("price"), col("id")), "q", 2)
      .select("id", "q").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L))
  }

  test("globalLead equals lead over a global window, incl. partition boundaries") {
    val expected = df
      .withColumn("nxt", lead(col("price"), 1).over(
        Window.orderBy(col("price"), col("id"))))
      .select("id", "nxt").as[(Long, Option[Double])].collect().toMap
    val lead4 = Ranking.globalLead(df, "price",
      Seq(col("price"), col("id")), "nxt", numPartitions = 4)
    val got = lead4.select("id", "nxt").as[(Long, Option[Double])].collect().toMap
    assert(got === expected)
    assert(!hasUnpartitionedWindow(lead4))
  }

  test("globalLead with more partitions than rows (empty partitions skipped)") {
    val tiny = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "price")
    val got = Ranking.globalLead(tiny, "price", Seq(col("price"), col("id")),
        "nxt", numPartitions = 8)
      .select("id", "nxt").as[(Long, Option[Double])].collect().toMap
    assert(got === Map(1L -> Some(2.0), 2L -> Some(3.0), 3L -> None))
  }

  test("single-split fast path: no construction-time actions, window-exact values") {
    // a frame that fits one scan split resolves to width 1: the op
    // must become a pure transformation (the stitched variant pays a
    // checkpoint job + a stats collect job DURING CONSTRUCTION)
    val src = (1L to 120L).map(i => (i, (i * 37) % 23 + 1)).toDF("id", "v")
      .repartition(5)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    val (rn, rs, ld, nt, ks) =
      try {
        val r = (
          Ranking.globalRowNumber(src, Seq(col("id")), "rn"),
          Ranking.globalRunningSum(src, "v", Seq(col("id")), "c"),
          Ranking.globalLead(src, "v", Seq(col("id")), "nxt"),
          Ranking.globalNtile(src, 4, Seq(col("id")), "q"),
          Ranking.keyedRunningSum(
            src.withColumn("k", (col("id") % 3).cast("string")),
            "k", "v", Seq(col("id")), "c"))
        Thread.sleep(300) // drain the listener bus
        r
      } finally spark.sparkContext.removeSparkListener(l)
    assert(jobs.get() === 0,
      s"small-frame ranking ran ${jobs.get()} construction-time jobs")
    // values: each op equals its single-partition window twin
    val wAll = Window.orderBy(col("id"))
    assert(rn.select("id", "rn").as[(Long, Long)].collect().toMap ===
      src.withColumn("rn", row_number().over(wAll).cast("long"))
        .select("id", "rn").as[(Long, Long)].collect().toMap)
    assert(rs.select("id", "c").as[(Long, Long)].collect().toMap ===
      src.withColumn("c", sum(col("v")).over(
          wAll.rowsBetween(Window.unboundedPreceding, 0)))
        .select("id", "c").as[(Long, Long)].collect().toMap)
    assert(ld.select("id", "nxt").as[(Long, Option[Long])].collect().toMap ===
      src.withColumn("nxt", lead(col("v"), 1).over(wAll))
        .select("id", "nxt").as[(Long, Option[Long])].collect().toMap)
    assert(nt.select("id", "q").as[(Long, Long)].collect().toMap ===
      src.withColumn("q", ntile(4).over(wAll).cast("long"))
        .select("id", "q").as[(Long, Long)].collect().toMap)
    val srcK = src.withColumn("k", (col("id") % 3).cast("string"))
    assert(ks.select("id", "c").as[(Long, Long)].collect().toMap ===
      srcK.withColumn("c", sum(col("v")).over(
          Window.partitionBy("k").orderBy("id")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select("id", "c").as[(Long, Long)].collect().toMap)
    // the fast path is still a PARTITIONED window (no WindowExec
    // single-partition warning class)
    assert(!hasUnpartitionedWindow(rn))
  }

  test("globalNtile/globalRowNumber match the window versions at sf0.01 scale") {
    // regression for the repartitionByRange boundary-seed pitfall: the
    // stats action and the output action must see the SAME partitioning
    // (Ranking pins it with localCheckpoint) — without that, this test
    // fails with whole-partition row-number shifts
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val ord = Seq(col("o_totalprice").desc, col("o_orderkey"))
    val expected = orders.select(col("o_orderkey"),
        ntile(4).over(Window.orderBy(ord: _*)).cast("long").as("q"))
      .as[(Long, Long)].collect().toMap
    val got = Ranking.globalNtile(orders, 4, ord, "q")
      .select("o_orderkey", "q").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("keyless derivePulseTimes and AsOfJoin plans have no unpartitioned window") {
    val logs = Seq(("click", 100L, 1L), ("click", 200L, 2L), ("view", 150L, 3L))
      .toDF("event_type", "ts_us", "event_id")
    val pulses = EventTime.derivePulseTimes(logs, "event_type", "ts_us",
      "click", tieBreak = Seq("event_id"))
    assert(!hasUnpartitionedWindow(pulses))
    assert(pulses.select("pulse_index", "pulse_time").as[(Long, Long)]
      .collect().toSet === Set((0L, 100L), (1L, 200L)))

    val left = Seq((10L, 120L), (11L, 250L)).toDF("id", "t")
    val joined = AsOfJoin.backward(left, pulses.select("pulse_time", "pulse_index"),
      "t", "pulse_time", Nil, bucketWidth = 100L, rightCols = Seq("pulse_index"))
    assert(!hasUnpartitionedWindow(joined))
    assert(joined.select("id", "pulse_index").as[(Long, Long)].collect().toSet ===
      Set((10L, 0L), (11L, 1L)))
  }

  test("keyedRunningSum equals the per-key window and spreads hot keys") {
    val src = (1L to 300L).map { i =>
      (i, if (i % 3 == 0) "hot" else s"k${i % 7}", (i * 31) % 17 + 1)
    }.toDF("id", "key", "v").repartition(6)
    val expected = src.withColumn("c", sum(col("v")).over(
        Window.partitionBy("key").orderBy("id")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "c").as[(Long, Long)].collect().toMap
    val out = Ranking.keyedRunningSum(src, "key", "v", Seq(col("id")), "c",
      numPartitions = 5)
    assert(out.select("id", "c").as[(Long, Long)].collect().toMap === expected)
    // the stitched window partitions by (range-partition id, key) — a
    // key-only partitionSpec would funnel each key through one reducer
    val keyOnly = out.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.size < 2 => w
    }
    assert(keyOnly.isEmpty)
  }

  test("keyedRunningSum: null values and a null key match the window") {
    val withNulls = Seq(
      (1L, Some("a"), Some(5L)), (2L, Some("a"), None),
      (3L, Some("a"), Some(2L)), (4L, None, Some(7L)), (5L, None, Some(1L)))
      .toDF("id", "key", "v")
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select("id", "c").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
    val expected = asMap(withNulls.withColumn("c", sum(col("v")).over(
      Window.partitionBy("key").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, 0))))
    val got = asMap(Ranking.keyedRunningSum(
      withNulls, "key", "v", Seq(col("id")), "c", numPartitions = 3))
    assert(got === expected)
    assert(got(5L) === 8L) // the null-key group accumulated across rows
  }
}

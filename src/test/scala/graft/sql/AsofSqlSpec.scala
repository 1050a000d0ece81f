package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.AsOfJoin

/** The ASOF JOIN SQL syntax must produce exactly what the Scala operator
  * produces, for keyed and keyless joins, and pass non-ASOF SQL through
  * untouched.
  */
class AsofSqlSpec extends SparkSuite {
  import spark.implicits._

  private def mkViews(): Unit = {
    Seq((1L, 105L, "a"), (2L, 250L, "a"), (3L, 160L, "b"), (4L, 95L, "b"))
      .toDF("id", "t", "k").createOrReplaceTempView("asof_left")
    Seq((100L, 10L, "a"), (200L, 11L, "a"), (150L, 20L, "b"))
      .toDF("pt", "pidx", "k").createOrReplaceTempView("asof_right")
  }

  test("keyed ASOF SQL caps last intervals per key (far-apart timelines, width 1)") {
    // mirrors AsOfJoinSpec's per-key-cap regression: key 'b' lives 10^12
    // time units after 'a'; a global cap would explode a's last interval
    // onto ~10^12 width-1 buckets and never finish
    val far = 1000000000000L
    Seq(("a", 5L, 1L), ("b", far + 5L, 2L))
      .toDF("k", "t", "id").createOrReplaceTempView("asof_far_left")
    Seq(("a", 1L, 10L), ("b", far + 1L, 20L))
      .toDF("k", "rt", "v").createOrReplaceTempView("asof_far_right")
    val out = spark.sql("""
      SELECT id, v FROM asof_far_left ASOF JOIN asof_far_right
        MATCH_CONDITION (t >= rt) USING (k) WITHIN 1
      ORDER BY id""").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 10L), (2L, 20L)))
  }

  test("keyed ASOF JOIN SQL matches AsOfJoin.backward") {
    mkViews()
    val sqlOut = spark.sql("""
      SELECT id, t, pt, pidx
      FROM asof_left ASOF JOIN asof_right
        MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      ORDER BY id""").as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    val scalaOut = AsOfJoin.backward(
        spark.table("asof_left"), spark.table("asof_right"),
        leftTime = "t", rightTime = "pt", keys = Seq("k"),
        bucketWidth = 50L, rightCols = Seq("pidx"))
      .select("id", "t", "pt", "pidx").orderBy("id")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(sqlOut === scalaOut)
    // spot-check semantics: id=4 (t=95, key b) precedes b's first pulse
    assert(sqlOut === Seq(
      (1L, 105L, Some(100L), Some(10L)),
      (2L, 250L, Some(200L), Some(11L)),
      (3L, 160L, Some(150L), Some(20L)),
      (4L, 95L, None, None)))
  }

  test("keyless ASOF JOIN with default bucket width from conf") {
    mkViews()
    spark.conf.set(AsofSqlRewrite.BucketConf, "100")
    try {
      val out = spark.sql("""
        SELECT id, pt FROM asof_left ASOF JOIN asof_right
          MATCH_CONDITION (t >= pt)
        ORDER BY id""").as[(Long, Option[Long])].collect().toSeq
      assert(out === Seq(
        (1L, Some(100L)), (2L, Some(200L)), (3L, Some(150L)), (4L, None)))
    } finally spark.conf.unset(AsofSqlRewrite.BucketConf)
  }

  test("ASOF JOIN composes inside a larger statement (agg over the join)") {
    mkViews()
    val out = spark.sql("""
      SELECT k, COUNT(pidx) AS n_matched
      FROM asof_left ASOF JOIN asof_right
        MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      GROUP BY k ORDER BY k""").as[(String, Long)].collect().toSeq
    assert(out === Seq(("a", 2L), ("b", 1L)))
  }

  test("non-ASOF SQL is passed through untouched") {
    assert(AsofSqlRewrite(spark, "SELECT 1 AS x") === "SELECT 1 AS x")
    assert(spark.sql("SELECT 1 AS x").as[Int].head() === 1)
  }

  test("qualified MATCH_CONDITION columns are accepted (qualifiers stripped)") {
    mkViews()
    val out = spark.sql("""
      SELECT id, pidx FROM asof_left ASOF JOIN asof_right
        MATCH_CONDITION (asof_left.t >= asof_right.pt) USING (k) WITHIN 50
      ORDER BY id""").as[(Long, Option[Long])].collect().toSeq
    assert(out.map(_._2) === Seq(Some(10L), Some(11L), Some(20L), None))
  }
}

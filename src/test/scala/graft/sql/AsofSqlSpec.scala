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

  test("keyless ASOF SQL never plans a single-partition window over the data") {
    // The r4 audit flagged the keyless route's `LEAD(rt) OVER (ORDER BY
    // rt)`: one partition holding the whole right side. It is now
    // partitioned by time bucket; the only empty-partition-spec window
    // allowed in the plan is the bucket-min stitch, which must sit above
    // an aggregate (one row per non-empty bucket), never raw rows.
    mkViews()
    spark.conf.set(AsofSqlRewrite.BucketConf, "100")
    try {
      val df = spark.sql("""
        SELECT id, pt FROM asof_left ASOF JOIN asof_right
          MATCH_CONDITION (t >= pt)""")
      import org.apache.spark.sql.execution.window.WindowExec
      val plan = df.queryExecution.sparkPlan
      val windows = plan.collect { case w: WindowExec => w }
      assert(windows.nonEmpty)
      val globals = windows.filter(_.partitionSpec.isEmpty)
      assert(globals.nonEmpty, "bucket-min stitch window missing")
      globals.foreach { w =>
        val aggsBelow = w.child.collect {
          case p if p.nodeName.toLowerCase.contains("aggregate") => p
        }
        assert(aggsBelow.nonEmpty,
          s"single-partition window consumes raw rows:\n$w")
      }
      // and at least one window is partitioned (the bucketed LEAD)
      assert(windows.exists(_.partitionSpec.nonEmpty))
    } finally spark.conf.unset(AsofSqlRewrite.BucketConf)
  }

  test("keyless ASOF SQL matches across bucket boundaries and empty buckets") {
    // right times land in buckets 0, 0, 3 (width 10): the last row of
    // bucket 0 must take its interval end from bucket 3's min across the
    // two empty buckets in between
    Seq((1L, 4L), (2L, 7L), (3L, 8L), (4L, 31L), (5L, 99L))
      .toDF("id", "t").createOrReplaceTempView("asof_kb_left")
    Seq((3L, 10L), (6L, 11L), (30L, 12L))
      .toDF("rt", "v").createOrReplaceTempView("asof_kb_right")
    val out = spark.sql("""
      SELECT id, v FROM asof_kb_left ASOF JOIN asof_kb_right
        MATCH_CONDITION (t >= rt) WITHIN 10
      ORDER BY id""").as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (1L, Some(10L)),   // t=4  -> rt=3
      (2L, Some(11L)),   // t=7  -> rt=6 (last of bucket 0, ends at 30)
      (3L, Some(11L)),   // t=8  -> rt=6
      (4L, Some(12L)),   // t=31 -> rt=30
      (5L, Some(12L))))  // t=99 -> open last interval, capped at max(t)+1
  }

  test("forward ASOF (<=) matches AsOfMergeJoin.forward, keyed") {
    mkViews()
    val sqlOut = spark.sql("""
      SELECT id, t, pt, pidx
      FROM asof_left ASOF JOIN asof_right
        MATCH_CONDITION (t <= pt) USING (k) WITHIN 50
      ORDER BY id""").as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    val scalaOut = graft.plans.AsOfMergeJoin.forward(
        spark.table("asof_left"), spark.table("asof_right"),
        leftTime = "t", rightTime = "pt", keys = Seq("k"),
        rightCols = Seq("pidx"))
      .select("id", "t", "pt", "pidx").orderBy("id")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(sqlOut === scalaOut)
    assert(sqlOut === Seq(
      (1L, 105L, Some(200L), Some(11L)),  // earliest pulse at-or-after
      (2L, 250L, None, None),             // nothing after the last pulse
      (3L, 160L, None, None),
      (4L, 95L, Some(150L), Some(20L))))
  }

  test("forward keyless ASOF stitches across buckets and empty buckets") {
    Seq((1L, 4L), (2L, 7L), (3L, 11L), (4L, 31L), (5L, 99L))
      .toDF("id", "t").createOrReplaceTempView("asof_kf_left")
    Seq((3L, 10L), (6L, 11L), (30L, 12L))
      .toDF("rt", "v").createOrReplaceTempView("asof_kf_right")
    val out = spark.sql("""
      SELECT id, v FROM asof_kf_left ASOF JOIN asof_kf_right
        MATCH_CONDITION (t <= rt) WITHIN 10
      ORDER BY id""").as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (1L, Some(11L)),   // t=4  -> rt=6 (earliest at-or-after)
      (2L, Some(12L)),   // t=7  -> rt=30, crossing two empty buckets
      (3L, Some(12L)),   // t=11 -> rt=30
      (4L, None),        // t=31 -> past the last pulse
      (5L, None)))
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

  test("aliased relations are accepted (AS optional, qualifiers stripped)") {
    mkViews()
    val expected = spark.sql("""
      SELECT id, t, pt, pidx
      FROM asof_left ASOF JOIN asof_right
        MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      ORDER BY id""").collect().toSeq
    val aliased = spark.sql("""
      SELECT id, t, pt, pidx
      FROM asof_left l ASOF JOIN asof_right AS r
        MATCH_CONDITION (l.t >= r.pt) USING (k) WITHIN 50
      ORDER BY id""").collect().toSeq
    assert(aliased === expected)
  }

  test("subquery relations are lifted and rewritten (left, right, both)") {
    mkViews()
    val expected = spark.sql("""
      SELECT id, t, pt, pidx
      FROM asof_left ASOF JOIN asof_right
        MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      ORDER BY id""").collect().toSeq
    val subLeft = spark.sql("""
      SELECT id, t, pt, pidx
      FROM (SELECT * FROM asof_left) l ASOF JOIN asof_right
        MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      ORDER BY id""").collect().toSeq
    assert(subLeft === expected)
    val subRight = spark.sql("""
      SELECT id, t, pt, pidx
      FROM asof_left ASOF JOIN (SELECT pt, pidx, k FROM asof_right) AS r
        MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      ORDER BY id""").collect().toSeq
    assert(subRight === expected)
    // both sides, no aliases, with a WHERE inside the subquery (nested
    // parens + a string containing a paren must not break the balance)
    val subBoth = spark.sql("""
      SELECT id, t, pt, pidx
      FROM (SELECT * FROM asof_left WHERE k <> '(never)')
        ASOF JOIN (SELECT pt, pidx, k FROM asof_right WHERE pt IN (SELECT pt FROM asof_right))
        MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      ORDER BY id""").collect().toSeq
    assert(subBoth === expected)
  }

  test("ASOF JOIN inside a CTE body is rewritten in place") {
    mkViews()
    val expected = spark.sql("""
      SELECT id, pidx FROM asof_left ASOF JOIN asof_right
        MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      ORDER BY id""").collect().toSeq
    val cte = spark.sql("""
      WITH joined AS (
        SELECT id, pidx FROM asof_left ASOF JOIN asof_right
          MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      )
      SELECT id, pidx FROM joined ORDER BY id""").collect().toSeq
    assert(cte === expected)
    // and a CTE feeding a subquery relation of ANOTHER asof join still
    // resolves (CTE name as a plain relation)
    val viaCte = spark.sql("""
      WITH lefts AS (SELECT * FROM asof_left)
      SELECT id, pidx FROM lefts ASOF JOIN asof_right
        MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      ORDER BY id""").collect().toSeq
    assert(viaCte === expected)
  }

  test("unsupported ASOF shapes raise a clear graft-side error") {
    mkViews()
    // a table-valued function is NOT a liftable subquery — the error
    // must name the limitation, not fall through to a generic Spark
    // syntax error
    val e = intercept[IllegalArgumentException] {
      spark.sql("""
        SELECT * FROM range(10) ASOF JOIN
          asof_right MATCH_CONDITION (id >= pt) USING (k)""")
    }
    assert(e.getMessage.contains("graft ASOF JOIN: unsupported shape"))
    assert(e.getMessage.contains("temp view"))
    // missing MATCH_CONDITION: same clear error
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("SELECT * FROM asof_left ASOF JOIN asof_right USING (k)")
    }
    assert(e2.getMessage.contains("graft ASOF JOIN: unsupported shape"))
    // but the words inside a string literal or a comment are DATA, not a
    // join — no error, query runs
    assert(spark.sql("SELECT 'uses ASOF JOIN here' AS s").count() === 1L)
    assert(spark.sql(
      "SELECT id FROM asof_left -- TODO try ASOF JOIN later\nWHERE id = 1")
      .count() === 1L)
    // an apostrophe inside a line comment must not open a phantom string
    // that swallows a following real-but-unsupported ASOF JOIN (the old
    // regex scrub blanked quotes BEFORE stripping comments and did)
    val e3 = intercept[IllegalArgumentException] {
      spark.sql(
        "SELECT * FROM asof_left -- don't mind this comment\n" +
          "ASOF JOIN asof_right USING (k)")
    }
    assert(e3.getMessage.contains("graft ASOF JOIN: unsupported shape"))
    // ...and a commented apostrophe never hides commented-out ASOF text
    assert(spark.sql(
      "SELECT id FROM asof_left -- don't ASOF JOIN here\nWHERE id = 1")
      .count() === 1L)
    // backtick-quoted identifiers are masked as identifiers, not code
    assert(spark.sql(
      "SELECT id AS `weird ASOF JOIN name` FROM asof_left WHERE id = 1")
      .count() === 1L)
  }

  test("non-ASOF SQL is passed through untouched") {
    assert(AsofSqlRewrite(spark, "SELECT 1 AS x") === "SELECT 1 AS x")
    assert(spark.sql("SELECT 1 AS x").as[Int].head() === 1)
  }

  test("dot-qualified table names resolve (global_temp database)") {
    Seq((1L, 105L, "a"), (4L, 95L, "b"))
      .toDF("id", "t", "k").createOrReplaceGlobalTempView("asof_gl")
    Seq((100L, 10L, "a"), (150L, 20L, "b"))
      .toDF("pt", "pidx", "k").createOrReplaceGlobalTempView("asof_gr")
    val out = spark.sql("""
      SELECT id, pidx
      FROM global_temp.asof_gl ASOF JOIN global_temp.asof_gr
        MATCH_CONDITION (t >= pt) USING (k) WITHIN 50
      ORDER BY id""").as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq((1L, Some(10L)), (4L, None)))
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

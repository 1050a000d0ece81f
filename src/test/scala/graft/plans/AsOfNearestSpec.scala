package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Nearest-direction as-of (plans/AsOfMergeJoin.nearest): definitional
  * oracle on plain Scala, tie goes backward, one-sided rows fall back,
  * keyless-right rows stay null. */
class AsOfNearestSpec extends SparkSuite {
  import spark.implicits._

  private def nearestOracle(lt: Long, rights: Seq[Long]): Option[Long] =
    if (rights.isEmpty) None
    else Some(rights.minBy(rt =>
      (math.abs(rt - lt), if (rt <= lt) 0 else 1)))

  test("picks the closer side; backward wins exact ties") {
    val left = Seq(("k", 10L, 1L), ("k", 14L, 2L), ("k", 15L, 3L),
      ("k", 100L, 4L)).toDF("k", "lt", "lid")
    val right = Seq(("k", 0L, "r0"), ("k", 12L, "r12"), ("k", 18L, "r18"))
      .toDF("k", "rt", "tag")
    val got = AsOfMergeJoin.nearest(left, right, "lt", "rt", Seq("k"),
        Seq("tag"))
      .orderBy("lid").collect()
      .map(r => (r.getAs[Long]("lid"), r.getAs[String]("tag"),
        r.getAs[Long]("rt"))).toSeq
    // lid 1: |10-12|=2 vs |10-0|=10 -> r12 forward
    // lid 2: back 12 (gap 2) vs fwd 18 (gap 4) -> r12
    // lid 3: back 12 (gap 3) vs fwd 18 (gap 3) -> TIE -> backward r12
    // lid 4: only backward (18)
    assert(got == Seq((1L, "r12", 12L), (2L, "r12", 12L),
      (3L, "r12", 12L), (4L, "r18", 18L)))
  }

  test("matches the definitional oracle on a random fixture") {
    val rnd = new scala.util.Random(7)
    val lefts = (0 until 300).map(i =>
      (s"k${i % 5}", rnd.nextInt(1000).toLong, i.toLong))
    val rights = (0 until 80).map(i =>
      (s"k${i % 5}", rnd.nextInt(1000).toLong)).distinct
    val got = AsOfMergeJoin.nearest(
        lefts.toDF("k", "lt", "lid").repartition(7),
        rights.toDF("k", "rt").repartition(3),
        "lt", "rt", Seq("k"), Seq("rt"))
      .collect()
      .map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("rt")).map(_.toLong)).toMap
    lefts.foreach { case (k, lt, lid) =>
      val expected = nearestOracle(lt, rights.filter(_._1 == k).map(_._2))
      assert(got(lid) == expected, s"lid=$lid k=$k lt=$lt")
    }
  }

  test("left rows whose key has no right rows keep nulls") {
    val left = Seq(("lonely", 5L, 1L)).toDF("k", "lt", "lid")
    val right = Seq(("other", 5L, "x")).toDF("k", "rt", "tag")
    val r = AsOfMergeJoin.nearest(left, right, "lt", "rt", Seq("k"),
      Seq("tag")).head()
    assert(r.getAs[String]("tag") == null &&
      r.getAs[java.lang.Long]("rt") == null)
  }
}

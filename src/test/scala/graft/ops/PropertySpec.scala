package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Property-style equivalence tests: random fixtures (scalacheck Gen,
  * FIXED seeds so every run sees the same data — a flaky generative test
  * is worse than none) checked against oracles computed in PLAIN SCALA,
  * not Spark. The fixture specs pin known shapes; these pin the
  * operators against their mathematical definitions on shapes nobody
  * hand-picked — skewed keys, duplicate times, empty keys, degenerate
  * widths.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // -- as-of joins ---------------------------------------------------------

  private val timelineGen: Gen[(List[(String, Long, Long)], List[(String, Long, Long)])] =
    for {
      nl <- Gen.choose(30, 120)
      nr <- Gen.choose(5, 60)
      keys <- Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))
      lts <- Gen.listOfN(nl, Gen.zip(Gen.oneOf(keys), Gen.choose(0L, 5000L)))
      rts <- Gen.listOfN(nr, Gen.zip(Gen.oneOf(keys), Gen.choose(0L, 5000L)))
    } yield (
      lts.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      // right must be unique per (key, time) — the operator's contract
      rts.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong * 10 + 7) }
        .groupBy(r => (r._1, r._2)).map(_._2.head).toList)

  /** Pure-Scala as-of oracle: latest right at-or-before (backward) or
    * earliest at-or-after (forward) within the key. */
  private def asofOracle(left: List[(String, Long, Long)],
                         right: List[(String, Long, Long)],
                         forward: Boolean): Set[(Long, Option[Long])] =
    left.map { case (k, lt, lid) =>
      val cands = right.filter(r => r._1 == k &&
        (if (forward) r._2 >= lt else r._2 <= lt))
      val pick = if (cands.isEmpty) None
        else Some(if (forward) cands.minBy(r => (r._2, r._3))
                  else cands.maxBy(r => (r._2, -r._3)))
      (lid, pick.map(_._3))
    }.toSet

  test("AsOfJoin.backward == the plain-Scala oracle on random timelines") {
    for (seed <- Seq(1L, 2L, 3L); width <- Seq(1L, 64L, 4096L)) {
      val (l, r) = sample(timelineGen, seed)
      val got = AsOfJoin.backward(
          l.toDF("k", "lt", "lid"), r.toDF("k", "rt", "rv"),
          leftTime = "lt", rightTime = "rt", keys = Seq("k"),
          bucketWidth = width, rightCols = Seq("rv"))
        .select("lid", "rv").as[(Long, Option[Long])].collect().toSet
      assert(got === asofOracle(l, r, forward = false),
        s"seed=$seed width=$width")
    }
  }

  test("AsOfMergeJoin backward AND forward == the same oracle") {
    for (seed <- Seq(4L, 5L); fwd <- Seq(false, true)) {
      val (l, r) = sample(timelineGen, seed)
      val run = if (fwd) graft.plans.AsOfMergeJoin.forward _
                else (a: org.apache.spark.sql.DataFrame,
                      b: org.apache.spark.sql.DataFrame,
                      c: String, d: String, e: Seq[String], f: Seq[String]) =>
                  graft.plans.AsOfMergeJoin.backward(a, b, c, d, e, f)
      val got = run(l.toDF("k", "lt", "lid"), r.toDF("k", "rt", "rv"),
          "lt", "rt", Seq("k"), Seq("rv"))
        .select("lid", "rv").as[(Long, Option[Long])].collect().toSet
      assert(got === asofOracle(l, r, forward = fwd), s"seed=$seed fwd=$fwd")
    }
  }

  // -- range join ----------------------------------------------------------

  test("RangeJoin.pointInInterval == brute force on random intervals") {
    val gen = for {
      pts <- Gen.listOfN(150, Gen.choose(0L, 2000L))
      ivs <- Gen.listOfN(50, Gen.zip(Gen.choose(0L, 2000L), Gen.choose(0L, 400L)))
    } yield (
      pts.zipWithIndex.map { case (p, i) => (i.toLong, p) },
      ivs.zipWithIndex.map { case ((s, len), i) => (i.toLong, s, s + len) })
    for (seed <- Seq(11L, 12L, 13L); width <- Seq(1L, 128L, 8192L)) {
      val (pts, ivs) = sample(gen, seed)
      val got = RangeJoin.pointInInterval(
          pts.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
          "p", "s", "e", keys = Nil, bucketWidth = width)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = (for {
        (pid, p) <- pts; (iid, s, e) <- ivs
        if p >= s && p < e
      } yield (pid, iid)).sorted
      assert(got === want, s"seed=$seed width=$width")
    }
  }

  // -- connected components ------------------------------------------------

  test("Dedup.connectedComponents == plain union-find on random graphs") {
    val gen = for {
      n <- Gen.choose(20, 200)
      edges <- Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 60L), Gen.choose(0L, 60L)))
    } yield edges.filter(e => e._1 != e._2)
    for (seed <- Seq(21L, 22L, 23L)) {
      val edges = sample(gen, seed)
      val got = graft.dedup.Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      // plain union-find, min-id representative
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
          parent(hi) = lo }
      }
      edges.foreach { case (a, b) => union(a, b) }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id)).toMap
      assert(got === want, s"seed=$seed")
    }
  }

  // -- distributed ranking -------------------------------------------------

  test("globalRowNumber / globalNtile == the sorted-index oracle") {
    val gen = Gen.listOfN(300, Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 1000000L)))
    for (seed <- Seq(31L, 32L)) {
      val rows = sample(gen, seed).zipWithIndex
        .map { case ((v, salt), i) => (i.toLong, v, salt) }
      val df = rows.toDF("id", "v", "salt").repartition(7)
      val order = Seq(col("v"), col("id"))
      val rn = Ranking.globalRowNumber(df, order, "rn")
        .select("id", "rn").as[(Long, Long)].collect().toMap
      val sortedIds = rows.sortBy(r => (r._2, r._1)).map(_._1)
      val wantRn = sortedIds.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      assert(rn === wantRn, s"seed=$seed rowNumber")
      for (k <- Seq(1, 3, 7)) {
        val nt = Ranking.globalNtile(df, k, order, "nt")
          .select("id", "nt").as[(Long, Long)].collect().toMap
        // SQL NTILE: first (n % k) buckets get (n/k + 1) rows
        val n = rows.size; val base = n / k; val rem = n % k
        val wantNt = sortedIds.zipWithIndex.map { case (id, i) =>
          val bucket = if (i < (base + 1) * rem) i / (base + 1) + 1
                       else rem + (i - (base + 1) * rem) / base + 1
          id -> bucket.toLong
        }.toMap
        assert(nt === wantNt, s"seed=$seed ntile k=$k")
      }
    }
  }
}

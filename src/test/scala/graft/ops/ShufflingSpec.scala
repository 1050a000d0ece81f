package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ShufflingSpec extends SparkSuite {
  import spark.implicits._

  private val ids = (0L until 1000L).toDF("id")

  test("shuffled: a deterministic permutation that is not the input order") {
    val s1 = Shuffling.shuffled(ids, "id", "seedA")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    // permutation of 0..n-1
    assert(s1.values.toSeq.sorted === (0L until 1000L))
    // replay-stable
    val s2 = Shuffling.shuffled(ids, "id", "seedA")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(s1 === s2)
    // a different seed gives a different permutation
    val s3 = Shuffling.shuffled(ids, "id", "seedB")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(s1 !== s3)
    // actually shuffled: the identity permutation would have every id at
    // its own position
    assert(s1.count { case (id, pos) => id == pos } < 50)
  }

  test("sharded: balanced sizes, round-robin consistency with the global order") {
    val out = Shuffling.sharded(ids, "id", "seedA", nShards = 7)
      .select("id", "shard", "pos_in_shard").as[(Long, Long, Long)]
      .collect()
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet === (0L until 7L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    // reconstruct the global position: pos = pos_in_shard * 7 + shard
    // must be the same permutation shuffled() assigns
    val global = Shuffling.shuffled(ids, "id", "seedA")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    out.foreach { case (id, shard, pis) =>
      assert(pis * 7 + shard === global(id), s"id=$id")
    }
  }

  test("mixCorpora: rate-proportional multiplicities, deterministic interleave") {
    val a = (0L until 300L).toDF("id")
    val b = (1000L until 2000L).toDF("id")
    val mix = Shuffling.mixCorpora(Seq((a, 2.3), (b, 0.5)), "id", "m1")
      .localCheckpoint()
    val n = mix.count()
    // positions are a clean 0..n-1 sequence
    assert(mix.select("pos").as[Long].collect().sorted === (0L until n))
    // per-source multiplicities: every source-A id appears 2 or 3 times
    // (~2.3 mean), source-B ids 0 or 1 times (~0.5 mean)
    val aCounts = mix.filter($"source_id" === 0L).groupBy("id").count()
      .select("count").as[Long].collect()
    assert(aCounts.forall(c => c == 2L || c == 3L))
    assert(aCounts.length === 300)
    val aTotal = aCounts.sum.toDouble / 300
    assert(aTotal > 2.1 && aTotal < 2.5, s"mean copies $aTotal")
    val bTotal = mix.filter($"source_id" === 1L).count().toDouble / 1000
    assert(bTotal > 0.4 && bTotal < 0.6, s"source-B rate $bTotal")
    // deterministic: same seed, same full ordering
    val again = Shuffling.mixCorpora(Seq((a, 2.3), (b, 0.5)), "id", "m1")
      .select("pos", "source_id", "id", "copy")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val first = mix.select("pos", "source_id", "id", "copy")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(again === first)
    // genuinely interleaved: the first 100 positions contain both sources
    assert(first.take(100).map(_._2).toSet === Set(0L, 1L))
  }

  test("curriculumOrder: easy phases first, in-phase shuffle, contiguous positions") {
    // difficulty = id % 400 so ties exist; 2000 rows into 4 phases of 500
    val rows = (0L until 2000L).map(i => (i, i % 400)).toDF("id", "diff")
    val out = Shuffling.curriculumOrder(rows, "id", "diff", phases = 4, "cur")
      .select("id", "diff", "phase", "pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length === 2000)
    // positions are exactly 0..1999
    assert(out.map(_._4).sorted.toSeq === (0L until 2000L))
    // phases are contiguous position blocks of 500, in phase order
    val byPos = out.sortBy(_._4)
    assert(byPos.map(_._3).toSeq === (1L to 4L).flatMap(p => Seq.fill(500)(p)))
    // monotone difficulty ACROSS phases: every phase-p difficulty <= every
    // phase-(p+1) difficulty (ntile over a total order)
    val maxByPhase = out.groupBy(_._3).view.mapValues(_.map(_._2).max).toMap
    val minByPhase = out.groupBy(_._3).view.mapValues(_.map(_._2).min).toMap
    (1L to 3L).foreach(p => assert(maxByPhase(p) <= minByPhase(p + 1)))
    // within a phase the order is shuffled, not difficulty-sorted
    val phase1 = byPos.filter(_._3 === 1L).map(_._2).toSeq
    assert(phase1 !== phase1.sorted, "in-phase order must be decorrelated")
    // replay-stable
    val again = Shuffling.curriculumOrder(rows, "id", "diff", phases = 4, "cur")
      .select("id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(again === out.map(t => (t._1, t._4)).sortBy(_._1))
    // seed changes the in-phase order but not phase membership
    val other = Shuffling.curriculumOrder(rows, "id", "diff", phases = 4, "x")
      .select("id", "phase", "pos").as[(Long, Long, Long)].collect()
    assert(other.map(t => (t._1, t._2)).sortBy(_._1)
      === out.map(t => (t._1, t._3)).sortBy(_._1))
    assert(other.sortBy(_._3).map(_._1).toSeq !== byPos.map(_._1).toSeq)
  }
}

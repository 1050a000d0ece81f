package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Product quantization (ann/Pq): recall against the exact integer
  * top-k on a clustered fixture, index/search split equivalence,
  * compression shape, determinism. */
class PqSpec extends SparkSuite {
  import spark.implicits._

  private val Dim = 16
  private val rnd = new scala.util.Random(11)

  /** 4 well-separated cluster centers + jittered members. */
  private lazy val vectors: Seq[(Long, Seq[Float])] = {
    val centers = Seq.tabulate(4)(c =>
      Array.tabulate(Dim)(i => if (i % 4 == c) 1.0f else 0.05f))
    (0 until 240).map { id =>
      val c = centers(id % 4)
      (id.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f).toSeq)
    }
  }

  private lazy val df = vectors.toDF("vec_id", "embedding").repartition(5)

  private def exactTopK(probe: Long, k: Int): Seq[Long] = {
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 1e7 + 0.5).toLong)
    val pe = quant(vectors.find(_._1 == probe).get._2)
    vectors.filter(_._1 != probe)
      .map { case (id, v) => (quant(v).zip(pe).map { case (a, b) => a * b }.sum, id) }
      .sortBy { case (dotV, id) => (-dotV, id) }
      .take(k).map(_._2)
  }

  test("ADC top-k recalls the exact integer top-k on clustered data") {
    val got = Pq.pqTopKPortable(df, df.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 10, m = 4, kSub = 8, dim = Dim)
      .collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Long]("neighbor_id")).toSeq).toMap
    val recalls = (0L until 8L).map { p =>
      val exact = exactTopK(p, 10).toSet
      got(p).count(exact) / 10.0
    }
    // ADC over 4 blocks of a 16-dim clustered space: same-cluster
    // neighbors dominate; require a healthy average floor
    assert(recalls.sum / recalls.size >= 0.6, s"recalls $recalls")
  }

  test("index/search split ≡ one-shot; codes table is m rows per vector") {
    val anchors = Pq.pqAnchors(df, "vec_id", "embedding", kSub = 8)
      .localCheckpoint()
    val codes = Pq.pqCodes(df, anchors, "vec_id", "embedding",
      m = 4, dim = Dim).localCheckpoint()
    assert(codes.count() == 240L * 4)
    assert(codes.groupBy("neighbor_id").count()
      .filter(col("count") =!= 4).count() == 0L)
    // every code points at a real anchor
    assert(codes.select("cidx").distinct().collect()
      .map(_.getInt(0)).forall(c => c >= 1 && c <= 8))
    val split = Pq.pqSearch(anchors, codes, df.filter(col("vec_id") < 4),
        "vec_id", "embedding", k = 5, m = 4, dim = Dim)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).toSet
    val oneShot = Pq.pqTopKPortable(df, df.filter(col("vec_id") < 4),
        "vec_id", "embedding", k = 5, m = 4, kSub = 8, dim = Dim)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(split == oneShot)
  }

  test("results are partitioning-invariant (integer substrate)") {
    def run(parts: Int) = Pq.pqTopKPortable(df.repartition(parts),
        df.filter(col("vec_id") === 0L), "vec_id", "embedding",
        k = 8, m = 4, kSub = 8, dim = Dim)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("adc"))).toSet
    assert(run(2) == run(11))
  }
}

package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** INT8 scalar quantization (ann/Quantize): calibration, sign-split
  * integer encode, reconstruction-error bounds, and dot-ranked search
  * fidelity. */
class QuantizeSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 8

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private val rnd = new scala.util.Random(3)
  private def randVec(): Seq[Float] =
    Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)

  test("codes stay in [-127, 127]; the max-|value| dimension hits ±127") {
    val data = vecs((1L to 50L).map(i => (i, randVec())): _*)
    val scales = Quantize.int8CalibrateDims(data, "embedding", dim)
    val enc = Quantize.int8EncodeDims(data, "vec_id", "embedding", scales)
    val codes = enc.select(explode(col("codes"))).as[Long].collect()
    assert(codes.forall(c => c >= -127 && c <= 127))
    assert(codes.exists(c => c == 127 || c == -127),
      "the calibrating extremes must map to full scale")
  }

  test("reconstruction error is bounded by one quantization step per dim") {
    val data = vecs((1L to 40L).map(i => (i, randVec())): _*)
    val scales = Quantize.int8CalibrateDims(data, "embedding", dim)
    val enc = Quantize.int8EncodeDims(data, "vec_id", "embedding", scales)
    // per-dim |err| <= scale/127 + 1 (integer floor twice) => the
    // per-vector sum is bounded by sum(scale_d/127 + 2)
    val bound = scales.map(_ / 127L + 2L).sum
    val worst = enc.agg(max(col("abs_err"))).head().getLong(0)
    assert(worst <= bound, s"reconstruction error $worst > bound $bound")
  }

  test("a dead dimension never divides by zero; codes there are 0") {
    val data = vecs(
      (1L, Seq(0f, 0.5f, 0f, -0.25f, 0f, 0f, 0f, 0f)),
      (2L, Seq(0f, -0.5f, 0f, 0.25f, 0f, 0f, 0f, 0f)))
    val scales = Quantize.int8CalibrateDims(data, "embedding", dim)
    val enc = Quantize.int8EncodeDims(data, "vec_id", "embedding", scales)
      .orderBy("vec_id").collect()
    val c1 = enc(0).getSeq[Long](1)
    assert(c1(0) === 0L && c1(2) === 0L)
    assert(c1(1) === 127L && c1(3) === -127L)
  }

  test("int8 dot top-k matches exact cosine top-k on well-separated data") {
    // three tight clusters: int8 at per-tensor scale must preserve the
    // cluster-mate ranking (the loss is within-cluster jitter only)
    val data = vecs((0L until 30L).map { i =>
      val c = (i % 3).toInt
      val base = Array.fill(dim)(0f)
      base(c) = 1f
      base(c + 3) = 0.5f
      // jitter well ABOVE the int8 step (~max/127 ≈ 0.008) — sub-step
      // orderings legitimately scramble — and L2-NORMALIZED, so the
      // exact-cosine reference and the int8 DOT rank the same metric
      // (the production deployment shape: normalize, then dot)
      val jittered = base.map(x =>
        x + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
      val norm = math.sqrt(jittered.map(x => x.toDouble * x).sum).toFloat
      (i, jittered.toSeq.map(x => x / norm))
    }: _*)
    val g = Quantize.int8CalibrateTensor(data, "embedding")
    val got = Quantize.int8TopK(data, data.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 5, scale = g)
    val exact = Similarity.bruteForceTopK(data,
      data.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
    val a = got.select("probe_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val b = exact.select("probe_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val overlap = (a & b).size.toDouble / b.size
    assert(overlap >= 0.8, s"int8 search overlap $overlap < 0.8")
    // every retrieved neighbor shares the probe's cluster
    got.select("probe_id", "neighbor_id").as[(Long, Long)].collect()
      .foreach { case (p, n) => assert(p % 3 === n % 3) }
  }

  test("plans: encode and search stay UDF-free and keyed") {
    val data = vecs((1L to 10L).map(i => (i, randVec())): _*)
    val scales = Quantize.int8CalibrateDims(data, "embedding", dim)
    val enc = Quantize.int8EncodeDims(data, "vec_id", "embedding", scales)
    val g = Quantize.int8CalibrateTensor(data, "embedding")
    val topk = Quantize.int8TopK(data, data.filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 3, scale = g)
    Seq(enc, topk).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"))
    }
  }
}

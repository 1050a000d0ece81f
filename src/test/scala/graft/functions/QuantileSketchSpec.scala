package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Sketches

/** Mergeable quantile sketches (functions/QuantileSketch + the
  * ops/Sketches table forms): rank-error bounds, merge ≡ bound on the
  * union, KB-bounded sketch rows, empty/NaN contracts. */
class QuantileSketchSpec extends SparkSuite {
  import spark.implicits._

  private val eps = 0.001

  /** True rank interval of `q` in `data`: [#(< q)+1, #(<= q)]. */
  private def rankOk(data: Seq[Double], q: Double, phi: Double): Boolean = {
    val n = data.size.toLong
    val le = data.count(_ <= q).toLong
    val lt = data.count(_ < q).toLong
    le >= phi * n - eps * n - 1 && (lt + 1) <= phi * n + eps * n + 1
  }

  test("one-shot sketch answers within the GK rank bound") {
    val data = (0 until 5000).map(i => ((i * 37) % 5000).toDouble)
    val df = data.toDF("v").repartition(7)
    val sk = df.agg(QuantileSketch.sketch(col("v"), eps).as("qsk"))
    val qs = sk.agg(QuantileSketch
        .mergeQuantiles(col("qsk"), Seq(0.1, 0.5, 0.99), eps).as("q"))
      .head().getSeq[Double](0)
    Seq(0.1, 0.5, 0.99).zip(qs).foreach { case (phi, q) =>
      assert(rankOk(data, q, phi), s"phi=$phi got $q")
    }
  }

  test("epoch sketches merge to corpus-wide quantiles within the bound") {
    val data = (0 until 3000).map(i => ((i * 13) % 977).toDouble)
    val df = data.zipWithIndex
      .map { case (v, i) => (v, i % 5) }.toDF("v", "epoch")
    val table = Sketches.quantileSketchTable(
      df.withColumn("g", lit("all")), "v", Seq("g", "epoch"), eps)
    assert(table.count() == 5L)
    val merged = Sketches.quantileMergeEstimate(
        table, Seq("g"), Seq(0.5, 0.9), eps)
      .head().getSeq[Double](1)
    assert(rankOk(data, merged(0), 0.5))
    assert(rankOk(data, merged(1), 0.9))
  }

  test("sketch rows stay KB-sized regardless of input cardinality") {
    val df = spark.range(200000).select(col("id").cast("double").as("v"))
    val bytes = df.agg(QuantileSketch.sketch(col("v"), 0.01).as("qsk"))
      .head().getAs[Array[Byte]](0)
    assert(bytes.length < 64 * 1024, s"sketch is ${bytes.length} bytes")
  }

  test("empty input yields NaN quantiles, not a crash") {
    val table = Sketches.quantileSketchTable(
      Seq((1.0, "a")).toDF("v", "g").filter(col("g") === "zzz"),
      "v", Seq("g"), eps)
    assert(table.count() == 0L)
    val sk = Seq((1.0, "a")).toDF("v", "g").limit(0)
      .agg(QuantileSketch.sketch(col("v"), eps).as("qsk"))
    val qs = sk.agg(QuantileSketch
        .mergeQuantiles(col("qsk"), Seq(0.5), eps).as("q"))
      .head().getSeq[Double](0)
    assert(qs.head.isNaN)
  }
}

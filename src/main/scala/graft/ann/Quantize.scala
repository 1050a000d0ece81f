package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INT8 scalar quantization of embedding columns — the 4× storage leg
  * between full fp32 vectors (256 B at dim 64) and PQ codes (8 B):
  * the standard vector-store compression that keeps per-DIMENSION
  * resolution (PQ collapses sub-vectors to centroids). Production
  * retrieval stacks ship exactly this shape: int8 codes serve the
  * scan, full vectors (or nothing) serve the rerank.
  *
  * ENGINE-PORTABLE INTEGER SUBSTRATE: floats enter through the same
  * `round(x · 1e7)` integer quantization the portable ANN family uses
  * (bit-exact across engines), and every calibration/encode/dot step
  * after that is integer arithmetic — magnitudes divide with positive
  * integer division and the sign is reapplied (Spark's `div` truncates
  * toward zero while DuckDB's `//` floors, so NEGATIVE division is the
  * one cross-engine trap; routing |x| through the division sidesteps
  * it). DuckDB rederives codes, reconstruction errors, and the int8
  * top-k VALUES exactly.
  *
  * Calibration collects one bounded row per dimension (≤ `dim` rows —
  * the tokenizer-table shape, never data-sized); encode/search are
  * pure codegen column expressions over the corpus. 100 TB shape:
  * calibrate once (one scan, map-side-combined per-dim max), broadcast
  * the scale vector, encode/search shuffle nothing beyond the ranking
  * window.
  */
object Quantize {

  /** Float vector → exact integer substrate (`round(x · 1e7)`). */
  private def quantVec(vec: Column): Column =
    transform(vec, x =>
      floor(x.cast("double") * 10000000.0 + 0.5).cast("long"))

  /** sign-split integer scaling: `sign(x) · ((|x| · num) div den)` —
    * the division always sees non-negative operands. */
  private def scaled(x: Column, num: Column, den: Column): Column =
    when(x < 0, -expr_div(-x * num, den)).otherwise(expr_div(x * num, den))
  private def expr_div(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long") // exactly divisible -> exact

  /** Per-DIMENSION max-|value| calibration on the integer substrate:
    * one scan, map-side-combined; returns the length-`dim` scale
    * vector (index d holds max|q_d| over the corpus, floored at 1 so
    * a dead dimension never divides by zero). Bounded collect: `dim`
    * values. */
  def int8CalibrateDims(corpus: DataFrame, vecCol: String,
                        dim: Int): Seq[Long] = {
    val per = corpus
      .select(posexplode(quantVec(col(vecCol))).as(Seq("d", "q")))
      .groupBy(col("d")).agg(max(abs(col("q"))).as("m"))
      .collect().map(r => r.getInt(0) -> math.max(1L, r.getLong(1))).toMap
    (0 until dim).map(d => per.getOrElse(d, 1L))
  }

  /** The corpus-wide max-|value| (per-TENSOR calibration — the form
    * whose int8 dot is rank-faithful to the true dot). */
  def int8CalibrateTensor(corpus: DataFrame, vecCol: String): Long = {
    val m = corpus
      .select(aggregate(quantVec(col(vecCol)), lit(0L),
        (a, x) => greatest(a, abs(x))).as("m"))
      .agg(max(col("m"))).head().getLong(0)
    math.max(1L, m)
  }

  /** Encode under PER-DIMENSION scales: `(id, codes, abs_err)` where
    * `codes[d] = sign · ((|q_d| · 127) div scale_d)` ∈ [-127, 127] and
    * `abs_err = Σ_d |q_d - codes[d] · scale_d div 127|` — the exact
    * integer reconstruction-error ledger on the 1e7 substrate. */
  def int8EncodeDims(corpus: DataFrame, idCol: String, vecCol: String,
                     scales: Seq[Long]): DataFrame = {
    val cal = array(scales.map(lit): _*)
    val q = quantVec(col(vecCol))
    val codes = zip_with(q, cal, (x, m) => scaled(x, lit(127L), m))
    val recon = zip_with(codes, cal, (c, m) => scaled(c, m, lit(127L)))
    corpus.select(col(idCol).as("vec_id"),
      codes.as("codes"),
      aggregate(zip_with(q, recon, (a, b) => abs(a - b)), lit(0L),
        (acc, e) => acc + e).as("abs_err"))
  }

  /** Top-k by INT8 DOT under one per-tensor scale — the search the
    * codes store serves (4× lighter scans; exact rerank composes via
    * [[Pq.rerankExact]] on the survivors when recall must be exact).
    * Returns `(probe_id, neighbor_id, dot8, rank)`, deterministic
    * tie-breaks, self excluded. */
  def int8TopK(corpus: DataFrame, probes: DataFrame, idCol: String,
               vecCol: String, k: Int, scale: Long): DataFrame = {
    def codes(df: DataFrame, out: String) = df.select(
      col(idCol).as(out),
      transform(quantVec(col(vecCol)),
        x => scaled(x, lit(127L), lit(scale))).as(s"__c_$out"))
    val c = codes(corpus, "neighbor_id")
    val p = codes(probes, "probe_id")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("dot8").desc, col("neighbor_id"))
    c.crossJoin(broadcast(p))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("dot8",
        aggregate(zip_with(col("__c_neighbor_id"), col("__c_probe_id"),
          (a, b) => a * b), lit(0L), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "dot8", "rank")
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native signature expressions for the LSH dedup family.
  *
  * Why these exist: Spark's higher-order functions (`transform`/`aggregate`
  * lambdas) are evaluated *interpreted* — they never enter whole-stage
  * codegen. A MinHash signature written that way costs
  * O(shingles x numHashes) interpreted lambda dispatches per document and
  * dominated the benchmark (~97 s at sf0.1). These expressions do the same
  * arithmetic in one tight JVM loop via `doGenCode`, touching each shingle
  * exactly twice (two xxhash64 evaluations) regardless of signature size.
  */

/** sig[j] = min over shingles of (h1 + j*h2) mod p, p = 2^31-1, where
  * h1/h2 are xxhash64 of the shingle with seeds 42/1. Input array<string>,
  * output array<long> of length `numHashes`. Empty/null-only input yields
  * sentinel p (no shingle can produce it, so distinct docs never collide
  * on emptiness alone vs real signatures).
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  final val P = 2147483647L // 2^31 - 1

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val h1 = Math.floorMod(
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L), P)
        val h2 = Math.floorMod(
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 1L), P)
        var j = 0
        var v = h1 // (h1 + j*h2) mod P, updated incrementally: +h2 each step
        while (j < k) {
          if (v < mins(j)) mins(j) = v
          v += h2
          if (v >= P) v -= P
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def col(c: Column, numHashes: Int): Column =
    GraftColumnShim.column(MinHashSig(GraftColumnShim.expression(c), numHashes))
}

/** LSH band hashes of a MinHash signature: split the array<long> into
  * `bands` contiguous bands and hash each one, returning array<long> of
  * length `bands`. Values are BIT-IDENTICAL to the column formulation
  * `xxhash64(slice(sig, b*r+1, r))` (Spark hashes an array<long> by
  * folding XXH64.hashLong over the elements from seed 42), but computed
  * in one compiled pass — the `transform(sequence(...), b ->
  * xxhash64(slice(...)))` lambda it replaces is interpreted and measured
  * 133 s vs 13 s for the signature pass itself on a 500k-doc corpus.
  */
case class BandHashes(child: Expression, bands: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_hashes expects ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_hashes"

  override protected def nullSafeEval(input: Any): Any =
    BandHashes.compute(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BandHashes.compute($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

object BandHashes {
  def compute(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    // Fail loudly on both API surfaces (the Column path has its own
    // require; the SQL-registered graft_band_hashes lands here directly):
    // a signature length not divisible by bands would silently drop
    // trailing hashes, and bands > n would emit the bare seed per band.
    if (bands <= 0 || n == 0 || n % bands != 0)
      throw new IllegalArgumentException(
        s"graft_band_hashes: signature length $n not divisible into $bands bands")
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    var j = 0
    while (b < bands) {
      var h = 42L // xxhash64's seed, matching the Column formulation
      var k = 0
      while (k < r) {
        h = XXH64.hashLong(sig.getLong(j), h)
        j += 1
        k += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  def col(c: Column, bands: Int): Column =
    GraftColumnShim.column(BandHashes(GraftColumnShim.expression(c), bands))
}

/** 64-bit SimHash over an array of tokens: per-bit +-1 votes of each
  * token's xxhash64, sign of the vote becomes the bit. Same rationale as
  * MinHashSig: one compiled pass instead of 64 interpreted lambda scans.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def col(c: Column): Column =
    GraftColumnShim.column(SimHashSig(GraftColumnShim.expression(c)))
}

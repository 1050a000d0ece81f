package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane LSH sketch as a native codegen expression: `bits`
  * sign bits of hyperplane projections packed into a long bucket id.
  * Hyperplane components are a deterministic hash fold (same formula as
  * the SQL formulation it replaces: xxhash64("p_d") folded into [-1, 1)),
  * cached per (bits, dim) — no RNG state, reproducible across executors
  * and runs. One fused loop instead of bits x dim interpreted lambda
  * dispatches per row.
  */
case class LshBucket(child: Expression, bits: Int, table: Int = 0)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")
  require(table >= 0, "table must be >= 0")

  private def elem(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(false)
    case ArrayType(DoubleType, _) => Some(true)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(child.dataType).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket expects ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  private lazy val isDouble = elem(child.dataType).get

  override protected def nullSafeEval(input: Any): Any =
    LshBucket.compute(input.asInstanceOf[ArrayData], isDouble, bits, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBucket.compute($c, $isDouble, $bits, $table)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  private val planeCache =
    new ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** weight(p, d) = pmod(xxhash64(utf8("p_d"), 42), 2000) / 1000 - 1 for
    * table 0 (the historical sketch, unchanged); table t > 0 salts the
    * seed string ("t<t>_p_d") for an INDEPENDENT hyperplane set — the
    * OR-construction lever [[graft.ann.Similarity.lshTopK]] unions
    * candidates across.
    */
  private def planes(bits: Int, dim: Int, table: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((bits, dim, table), { _ =>
      Array.tabulate(bits, dim) { (p, d) =>
        val s = UTF8String.fromString(
          if (table == 0) s"${p}_${d}" else s"t${table}_${p}_${d}")
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        Math.floorMod(h, 2000L).toDouble / 1000.0 - 1.0
      }
    })

  def compute(vec: ArrayData, isDouble: Boolean, bits: Int, table: Int): Long = {
    val dim = vec.numElements()
    val w = planes(bits, dim, table)
    var bucket = 0L
    var p = 0
    while (p < bits) {
      val wp = w(p)
      var dot = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isDouble) vec.getDouble(d) else vec.getFloat(d).toDouble
        dot += x * wp(d)
        d += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def col(c: Column, bits: Int, table: Int = 0): Column =
    GraftColumnShim.column(LshBucket(GraftColumnShim.expression(c), bits, table))
}

/** [[LshBucket]]'s ENGINE-PORTABLE twin (the `PortableMinHashSig` role
  * for the random-hyperplane sketch): the vector is quantized to exact
  * BIGINTs — `floor(x * 1e7 + 0.5)` per element, the `ann_exact`
  * substrate — and dotted against md5-derived INTEGER hyperplane
  * weights
  *
  * {{{ w(t, p, d) = (first 15 md5 hex nibbles of "lshw_<t>_<p>_<d>"
  *                   as a non-negative BIGINT) % 2000 - 1000 }}}
  *
  * so every projection is an exact 64-bit integer sum and the sign test
  * `dot >= 0` is reproducible bit-for-bit in ANY engine with md5 — in
  * DuckDB: `CAST(concat('0x', substring(md5('lshw_'||t||'_'||p||'_'||d),
  * 1, 15)) AS BIGINT) % 2000 - 1000`. Magnitudes stay far from
  * overflow: |element| <= ~1e7+eps quantized from unit-normalized
  * floats, |w| <= 1000, dim 64 -> |dot| <= ~6.4e12.
  *
  * This is the AUDIT/ORACLE path (what the `ann_lsh` driver entry
  * compares cross-engine at any corpus scale); the production sketch
  * stays [[LshBucket]]'s xxhash64 planes + float dot.
  */
case class PortableLshBucket(child: Expression, bits: Int, table: Int = 0)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")
  require(table >= 0, "table must be >= 0")

  private def elem(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(false)
    case ArrayType(DoubleType, _) => Some(true)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(child.dataType).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_portable_lsh_bucket expects ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_portable_lsh_bucket"

  private lazy val isDouble = elem(child.dataType).get

  override protected def nullSafeEval(input: Any): Any =
    PortableLshBucket.compute(input.asInstanceOf[ArrayData], isDouble, bits, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableLshBucket.compute($c, $isDouble, $bits, $table)")

  override protected def withNewChildInternal(newChild: Expression): PortableLshBucket =
    copy(child = newChild)
}

object PortableLshBucket {
  private val planeCache =
    new ConcurrentHashMap[(Int, Int, Int), Array[Array[Long]]]()

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First 15 md5 hex nibbles of the UTF-8 seed string as a
    * non-negative long (bytes 0..7 big-endian, dropping byte 7's low
    * nibble — the same 60-bit read as `PortableMinHashSig`), then
    * `% 2000 - 1000` into an integer weight in [-1000, 999].
    */
  private[graft] def weight(seed: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(seed.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v0 = 0L
    var b = 0
    while (b < 8) { v0 = (v0 << 8) | (d(b) & 0xFFL); b += 1 }
    (v0 >>> 4) % 2000L - 1000L
  }

  private def planes(bits: Int, dim: Int, table: Int): Array[Array[Long]] =
    planeCache.computeIfAbsent((bits, dim, table), { _ =>
      Array.tabulate(bits, dim) { (p, d) => weight(s"lshw_${table}_${p}_${d}") }
    })

  def compute(vec: ArrayData, isDouble: Boolean, bits: Int, table: Int): Long = {
    val dim = vec.numElements()
    val w = planes(bits, dim, table)
    var bucket = 0L
    var p = 0
    while (p < bits) {
      val wp = w(p)
      var dot = 0L
      var d = 0
      while (d < dim) {
        val x = if (isDouble) vec.getDouble(d) else vec.getFloat(d).toDouble
        dot += Math.floor(x * 1e7 + 0.5).toLong * wp(d)
        d += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def col(c: Column, bits: Int, table: Int = 0): Column =
    GraftColumnShim.column(PortableLshBucket(GraftColumnShim.expression(c), bits, table))
}

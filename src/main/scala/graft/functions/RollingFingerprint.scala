package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint: the minimum of all rolling polynomial
  * hashes of `windowSize`-byte windows over the UTF-8 text. Identical
  * passages produce identical window hashes, so near-identical documents
  * collide on the min with high probability — the classic winnowing /
  * MOSS scheme.
  *
  * Implemented as a native Catalyst Expression with `doGenCode` (not a
  * Scala UDF): stays inside whole-stage codegen, no boxing, no
  * serialization of a closure per row. Each input byte is touched once
  * (O(n) rolling update), so the scan stays I/O-bound at 100 TB.
  *
  * The reference has no direct equivalent (its fingerprinting lives in the
  * content-hash dedup path); this is part of the LLM-pipeline operator
  * family layered on top.
  */
case class RollingFingerprint(child: Expression, windowSize: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_fingerprint expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String], windowSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingFingerprint.compute($c, $windowSize)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  private final val Base = 1000003L

  /** Min over rolling polynomial hashes of all `w`-byte windows.
    * Static so generated code can call it directly.
    */
  def compute(s: UTF8String, w: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val win = math.min(w, n)
    // precompute Base^(win-1) for the rolling subtract
    var pow = 1L
    var i = 1
    while (i < win) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < win) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var minH = h
    i = win
    while (i < n) {
      h = (h - (bytes(i - win) & 0xffL) * pow) * Base + (bytes(i) & 0xffL)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native pair-similarity expressions for the dedup verify path.
  *
  * The Column formulation of exact-Jaccard verification —
  * `size(array_intersect(a,b)) / size(array_union(a,b))` — builds TWO
  * hash sets and materializes TWO intermediate arrays per pair; at
  * millions of candidate pairs that allocation dominated the verify join
  * (measured 145 s for 1.8M pairs at 500k docs). These expressions
  * compute the same numbers in one set-build per pair with no
  * intermediate arrays, inside whole-stage codegen.
  */

/** Exact Jaccard similarity of two string arrays treated as SETS
  * (duplicates ignored, like array_intersect/array_union semantics).
  * Returns |A ∩ B| / |A ∪ B| as a double — bit-identical to the Column
  * formulation: both are a single IEEE division of the two exact ints.
  * Empty ∪ empty yields 0.0 (the Column form yields NaN there; callers
  * always shingle non-empty text, where WordShingles emits [''], so the
  * union is never empty in practice).
  */
case class JaccardSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaccard expects two ARRAY<STRING>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardSim.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val set = new java.util.HashSet[UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (!a.isNullAt(i)) set.add(a.getUTF8String(i))
      i += 1
    }
    val sizeA = set.size
    val seenB = new java.util.HashSet[UTF8String]()
    var inter = 0
    var onlyB = 0
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (!b.isNullAt(i)) {
        val s = b.getUTF8String(i)
        if (seenB.add(s)) {
          if (set.contains(s)) inter += 1 else onlyB += 1
        }
      }
      i += 1
    }
    val union = sizeA + onlyB
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def col(a: Column, b: Column): Column =
    GraftColumnShim.column(JaccardSim(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}

/** Fraction of equal components between two MinHash signatures — the
  * standard unbiased estimator of Jaccard similarity. Used to PREFILTER
  * band-join candidates before the exact shingle verify: signatures are
  * already computed for banding, are 16x smaller than shingle arrays, and
  * comparing them is 64 long-compares — so discarding the (overwhelming)
  * low-similarity false positives here avoids shuffling shingle sets for
  * them at all.
  */
case class SigAgreement(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sig_agreement expects two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sig_agreement"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigAgreement.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SigAgreement.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

object SigAgreement {
  def compute(a: ArrayData, b: ArrayData): Double = {
    // Signatures from different numHashes configurations are not
    // comparable — truncating to the common prefix would yield a
    // plausible-looking but meaningless estimate. Fail loudly instead.
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"graft_sig_agreement: signature lengths differ " +
          s"(${a.numElements()} vs ${b.numElements()}); both sides must be " +
          "built with the same numHashes")
    val n = a.numElements()
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  def col(a: Column, b: Column): Column =
    GraftColumnShim.column(SigAgreement(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Dot product of a feature-vector column (ARRAY<BIGINT> or
  * ARRAY<DOUBLE>) with a LITERAL coefficient array, as one native codegen
  * call: `Σ_i fv[i] * coeffs[i]`.
  *
  * This replaces the `(0 until k).map(i => fv.getItem(i) * lit(c(i)))
  * .reduce(_ + _)` column formulation used for literal-coefficient model
  * scoring (DSIR log-ratio weights, logistic-regression logits). The
  * reduce builds a depth-k nested Add tree; one copy compiles, but when a
  * FILTER references the scored column Catalyst substitutes the whole
  * tree into the predicate, the stage carries it TWICE, and the generated
  * method blows past the JVM's JIT size limit — the entire stage
  * (including upstream shingling) then runs deoptimized. Measured on the
  * 500k-doc scale corpus: scoring+lottery filter 17.6 s with the Add-tree
  * logit vs interpreted-size codegen here (one references[] lookup and a
  * tight loop), where the same pass is scan-bound.
  *
  * Elements beyond `coeffs.length` are ignored; a vector shorter than
  * `coeffs` contributes only its present elements (missing = 0) — both
  * sides bounded, no exception path in the hot loop.
  */
case class DotLiteral(child: Expression, coeffs: Array[Double])
  extends UnaryExpression {
  require(coeffs != null && coeffs.nonEmpty, "coeffs must be non-empty")

  private lazy val fromLong: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dot_literal expects ARRAY<BIGINT> or ARRAY<DOUBLE>, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_literal"

  override protected def nullSafeEval(input: Any): Any =
    DotLiteral.compute(input.asInstanceOf[ArrayData], coeffs, fromLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("coeffs", coeffs, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DotLiteral.compute($c, $ref, $fromLong)")
  }

  override protected def withNewChildInternal(newChild: Expression): DotLiteral =
    copy(child = newChild)
}

object DotLiteral {
  def compute(fv: ArrayData, coeffs: Array[Double], fromLong: Boolean): Double = {
    val n = math.min(fv.numElements(), coeffs.length)
    var acc = 0.0
    var i = 0
    if (fromLong) {
      while (i < n) {
        if (!fv.isNullAt(i)) acc += fv.getLong(i) * coeffs(i)
        i += 1
      }
    } else {
      while (i < n) {
        if (!fv.isNullAt(i)) acc += fv.getDouble(i) * coeffs(i)
        i += 1
      }
    }
    acc
  }

  def col(c: Column, coeffs: Array[Double]): Column =
    GraftColumnShim.column(DotLiteral(GraftColumnShim.expression(c), coeffs))
}

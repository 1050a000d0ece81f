package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Language-profile scoring in ONE byte-level pass: counts every profile
  * substring (overlapping start positions, same semantics as the
  * `(?=...)` lookahead `regexp_count` it replaces) and returns the argmax
  * `struct(score, lang)` with ties broken to the lexicographically
  * largest language — exactly `greatest()` over per-language score
  * structs.
  *
  * Why native: the Column formulation ran 28 regexp_count lookaheads per
  * document — ~28 regex-machine passes dominating the curation front end
  * (annotate scan measured ~5 s for 15 MB at 32 threads; this expression
  * reduces it to plain byte compares in whole-stage codegen).
  *
  * IEEE-exactness contract: per-language scores are summed in the same
  * left-associated order as the previous `reduce(_ + _)` over
  * `count * weight` terms, so results (and the DuckDB oracles derived
  * from them) are bit-identical.
  */
case class TrigramLangScore(
    child: Expression,
    profiles: Seq[(String, String, Double)])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lang_score expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("lang", StringType, nullable = false)))
  override def prettyName: String = "graft_lang_score"

  @transient private lazy val compiled = TrigramLangScore.Compiled(profiles)

  override protected def nullSafeEval(input: Any): Any =
    compiled.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langProfiles", compiled,
      classOf[TrigramLangScore.Compiled].getName)
    defineCodeGen(ctx, ev, c => s"$ref.eval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramLangScore =
    copy(child = newChild)
}

object TrigramLangScore {

  /** Profile table precompiled to byte patterns, grouped per language in
    * ascending language order with entries in profile order (the same
    * grouping `langIdNgramCols` used for its Column reduce).
    */
  final case class Compiled(profiles: Seq[(String, String, Double)]) {
    private val langs: Array[String] =
      profiles.map(_._1).distinct.sorted.toArray
    private val langUtf8: Array[UTF8String] =
      langs.map(UTF8String.fromString)
    private val pats: Array[Array[Array[Byte]]] =
      langs.map(l => profiles.filter(_._1 == l)
        .map(_._2.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)
    private val weights: Array[Array[Double]] =
      langs.map(l => profiles.filter(_._1 == l).map(_._3).toArray)

    /** Overlapping occurrence count (every start position — byte-level is
      * UTF-8 safe: a valid pattern never matches at a non-boundary).
      */
    private def countOcc(text: Array[Byte], pat: Array[Byte]): Int = {
      if (pat.length == 0 || pat.length > text.length) return 0
      var c = 0
      var i = 0
      val last = text.length - pat.length
      while (i <= last) {
        var j = 0
        while (j < pat.length && text(i + j) == pat(j)) j += 1
        if (j == pat.length) c += 1
        i += 1
      }
      c
    }

    def eval(text: UTF8String): InternalRow = {
      val bytes = text.getBytes
      var bestScore = 0.0
      var bestIdx = 0
      var l = 0
      while (l < langs.length) {
        val lp = pats(l)
        val lw = weights(l)
        var s = 0.0
        var k = 0
        while (k < lp.length) {
          s += countOcc(bytes, lp(k)).toDouble * lw(k)
          k += 1
        }
        // greatest() over (score, lang) structs: strictly greater score
        // wins; equal score -> the later (lexicographically larger) lang
        if (l == 0 || s >= bestScore) { bestScore = s; bestIdx = l }
        l += 1
      }
      new GenericInternalRow(Array[Any](bestScore, langUtf8(bestIdx)))
    }
  }

  def col(c: Column, profiles: Seq[(String, String, Double)]): Column =
    GraftColumnShim.column(
      TrigramLangScore(GraftColumnShim.expression(c), profiles))
}

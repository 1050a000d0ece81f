package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as a native codegen expression: one pass over the
  * UTF-8 bytes — tokenize on space runs, emit each n-token window joined
  * by single spaces. Replaces the interpreted
  * split + transform(sequence, slice, concat_ws) pipeline that cost
  * O(words * n) lambda dispatches per document.
  *
  * Texts with fewer than n tokens produce one shingle (the whole token
  * sequence), matching Dedup.withShingles' fallback.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** The ONE space-run tokenizer shared by every word-gram expression
  * ([[WordShingles]], [[GramStats]]): byte-level split on runs of ASCII
  * 0x20 (UTF-8 safe — 0x20 never occurs inside a multi-byte sequence),
  * plus the single-space token join both use to build gram strings. Any
  * tokenizer change lands in both expressions by construction, keeping
  * the documented `GramStats(text, n) ≡ aggregate(graft_shingles(text,
  * n))` invariant.
  */
private[functions] object SpaceTokens {
  /** (starts, ends) byte offsets of each token. */
  def tokenize(bytes: Array[Byte])
      : (java.util.ArrayList[Int], java.util.ArrayList[Int]) = {
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && bytes(i) != ' ') i += 1
        ends.add(i)
      }
    }
    (starts, ends)
  }

  /** Tokens [from, until) joined by single spaces. */
  def joined(bytes: Array[Byte],
             starts: java.util.ArrayList[Int], ends: java.util.ArrayList[Int],
             from: Int, until: Int): UTF8String = {
    var size = until - 1 - from // separators
    var t = from
    while (t < until) { size += ends.get(t) - starts.get(t); t += 1 }
    val out = new Array[Byte](size)
    var pos = 0
    t = from
    while (t < until) {
      if (t > from) { out(pos) = ' '; pos += 1 }
      val l = ends.get(t) - starts.get(t)
      System.arraycopy(bytes, starts.get(t), out, pos, l)
      pos += l
      t += 1
    }
    UTF8String.fromBytes(out)
  }
}

object WordShingles {
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.getBytes
    val (starts, ends) = SpaceTokens.tokenize(bytes)
    val nTokens = starts.size()
    if (nTokens == 0) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))

    def joined(from: Int, until: Int): UTF8String =
      SpaceTokens.joined(bytes, starts, ends, from, until)

    if (nTokens < n) return new GenericArrayData(Array[Any](joined(0, nTokens)))
    val shingles = new Array[Any](nTokens - n + 1)
    var s = 0
    while (s <= nTokens - n) {
      shingles(s) = joined(s, s + n)
      s += 1
    }
    new GenericArrayData(shingles)
  }

  def col(c: Column, n: Int): Column =
    GraftColumnShim.column(WordShingles(GraftColumnShim.expression(c), n))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding as a native codegen expression: tokenize on space runs
  * (the engine's canonical tokenizer — [[SpaceTokens]]), then run the
  * classic greedy merge loop per word against a LITERAL merge-rank table
  * carried as a codegen reference object (the same literal-model pattern
  * as [[DotLiteral]]). Map-only inside the scan: no joins, no UDF, no
  * driver participation, streamable.
  *
  * `countOnly = true` returns the token count (INT) without
  * materializing the token array — the cheap path for token budgeting.
  *
  * Symbols are UTF-16 units (a surrogate pair splits into two initial
  * symbols; merges can rejoin it) with the classic `</w>` end-of-word
  * sentinel glued to each word's last symbol.
  */
case class BpeEncode(child: Expression, merges: Array[(String, String)],
                     countOnly: Boolean, byteLevel: Boolean = false)
    extends UnaryExpression {

  @transient private lazy val ranks = BpeEncode.rankMap(merges)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType =
    if (countOnly) IntegerType else ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe"

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    if (countOnly) BpeEncode.countTokens(t, ranks, byteLevel)
    else BpeEncode.computeTokens(t, ranks, byteLevel)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    if (countOnly)
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.BpeEncode.countTokens($c, $ref, $byteLevel)")
    else
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.BpeEncode.computeTokens($c, $ref, $byteLevel)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** pair → priority; keys are `a + ' ' + b` - symbols come from space-run
    * words, so a space can never occur INSIDE a symbol and the
    * separator is unambiguous.
    */
  def rankMap(merges: Array[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + " " + merges(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Greedy BPE for one word: repeatedly merge ALL (non-overlapping,
    * left-to-right) occurrences of the best-ranked adjacent pair until no
    * pair is in the table. Empty word → no tokens.
    */
  def encodeWord(word: String,
                 ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty[String]
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    syms(syms.length - 1) = syms(syms.length - 1) + "</w>"
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 &&
              isPair(ranks, syms(i), syms(i + 1), bestRank)) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
        continue = syms.length >= 2
      }
    }
    syms
  }

  private def isPair(ranks: java.util.HashMap[String, Integer],
                     a: String, b: String, rank: Int): Boolean = {
    val r = ranks.get(a + " " + b)
    r != null && r.intValue() == rank
  }

  def computeTokens(text: UTF8String,
                    ranks: java.util.HashMap[String, Integer],
                    byteLevel: Boolean): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    eachWord(text) { w0 =>
      val w = if (byteLevel) graft.text.ByteLevel.encode(w0) else w0
      val toks = encodeWord(w, ranks)
      var i = 0
      while (i < toks.length) { out += UTF8String.fromString(toks(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  def countTokens(text: UTF8String,
                  ranks: java.util.HashMap[String, Integer],
                  byteLevel: Boolean): Int = {
    var n = 0
    eachWord(text) { w0 =>
      val w = if (byteLevel) graft.text.ByteLevel.encode(w0) else w0
      n += encodeWord(w, ranks).length
    }
    n
  }

  /** Apply `f` to each space-run word of `text` (same tokenization as
    * [[SpaceTokens]], via String for per-char symbol access).
    */
  private def eachWord(text: UTF8String)(f: String => Unit): Unit = {
    val s = text.toString
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      if (i < len) {
        val start = i
        while (i < len && s.charAt(i) != ' ') i += 1
        f(s.substring(start, i))
      }
    }
  }

  def col(c: Column, merges: Array[(String, String)],
          countOnly: Boolean, byteLevel: Boolean = false): Column =
    GraftColumnShim.column(
      BpeEncode(GraftColumnShim.expression(c), merges, countOnly, byteLevel))
}

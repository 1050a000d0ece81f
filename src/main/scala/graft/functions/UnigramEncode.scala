package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (Viterbi) encoding as a native codegen expression: space-
  * run words, then per word the globally most probable segmentation
  * under a LITERAL piece→log-prob table carried as a codegen reference
  * object (the [[BpeEncode]] pattern). Viterbi runs in the LOG domain
  * — sums, never products — so any word length encodes without
  * underflow. Characters outside the vocabulary segment as single-char
  * UNK pieces at a floor score (strictly below every real piece), so
  * encoding is lossless on arbitrary input. Ties break
  * deterministically: higher score, then FEWER pieces, then the longer
  * trailing piece.
  */
case class UnigramEncode(child: Expression, pieces: Array[(String, Double)],
                         maxPieceLen: Int, countOnly: Boolean,
                         byteFallback: Boolean = false)
    extends UnaryExpression {

  @transient private lazy val scores = UnigramEncode.scoreMap(pieces)
  @transient private lazy val unk = UnigramEncode.unkScoreOf(pieces)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_unigram expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType =
    if (countOnly) IntegerType else ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram"

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    if (countOnly)
      UnigramEncode.countTokens(t, scores, maxPieceLen, unk, byteFallback)
    else
      UnigramEncode.computeTokens(t, scores, maxPieceLen, unk, byteFallback)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scores", scores, "java.util.HashMap")
    if (countOnly)
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.UnigramEncode.countTokens($c, $ref, $maxPieceLen, ${unk}D, $byteFallback)")
    else
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.UnigramEncode.computeTokens($c, $ref, $maxPieceLen, ${unk}D, $byteFallback)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {

  def scoreMap(pieces: Array[(String, Double)]): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i)._1, java.lang.Double.valueOf(pieces(i)._2))
      i += 1
    }
    m
  }

  /** UNK floor: strictly below the worst real piece, so a real piece
    * always beats an UNK fallback of the same span. */
  def unkScoreOf(pieces: Array[(String, Double)]): Double =
    if (pieces.isEmpty) -100.0
    else pieces.iterator.map(_._2).min - 10.0

  /** The 256 byte-fallback piece literals, `<0x00>`..`<0xFF>` — the
    * SentencePiece byte_fallback convention (Kudo 2018 §4 + the
    * sentencepiece `--byte_fallback` flag). */
  val BytePieces: Array[String] =
    Array.tabulate(256)(b => f"<0x$b%02X>")

  /** Expand every maximal RUN of out-of-vocabulary single-UTF-16-unit
    * tokens into its UTF-8 bytes as `<0xNN>` pieces. Runs (not units)
    * so a surrogate PAIR reunites before byte conversion — converting
    * a lone surrogate would mojibake to '?'. In-vocabulary tokens pass
    * through untouched. */
  private def byteExpand(toks: Array[String],
                         scores: java.util.HashMap[String, java.lang.Double])
      : Array[String] = {
    var any = false
    var k = 0
    while (k < toks.length && !any) {
      if (toks(k).length == 1 && scores.get(toks(k)) == null) any = true
      k += 1
    }
    if (!any) return toks
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (toks(i).length == 1 && scores.get(toks(i)) == null) {
        val run = new java.lang.StringBuilder()
        while (i < toks.length && toks(i).length == 1 &&
               scores.get(toks(i)) == null) {
          run.append(toks(i)); i += 1
        }
        val bytes = run.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8)
        var b = 0
        while (b < bytes.length) {
          out += BytePieces(bytes(b) & 0xff); b += 1
        }
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  /** Viterbi segmentation of one word. Deterministic tie-breaks:
    * score, then fewer pieces, then the longer trailing piece. */
  def encodeWord(word: String,
                 scores: java.util.HashMap[String, java.lang.Double],
                 maxPieceLen: Int, unkScore: Double): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty[String]
    val best = new Array[Double](n + 1)
    val cnt = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var chosen = Double.NegativeInfinity
      var chosenCnt = Int.MaxValue
      var chosenBack = -1
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val s = scores.get(word.substring(i, j))
        val pieceScore: Double =
          if (s != null) s.doubleValue()
          else if (j - i == 1) unkScore
          else Double.NaN
        if (!pieceScore.isNaN && back(i) != -2) {
          val sc = best(i) + pieceScore
          val c = cnt(i) + 1
          // better score, or equal score with fewer pieces; on a full
          // tie the FIRST candidate (smallest i = longest trailing
          // piece) was kept, since i only ascends here
          val better = sc > chosen ||
            (sc == chosen && c < chosenCnt)
          if (chosenBack == -1 || better) {
            chosen = sc; chosenCnt = c; chosenBack = i
          }
        }
        i += 1
      }
      if (chosenBack == -1) { back(j) = -2 } // unreachable (cannot happen
      else {                                  // with single-char UNKs)
        best(j) = chosen; cnt(j) = chosenCnt; back(j) = chosenBack
      }
      j += 1
    }
    val out = new Array[String](cnt(n))
    var pos = n
    var k = cnt(n) - 1
    while (pos > 0) {
      val i = back(pos)
      out(k) = word.substring(i, pos)
      pos = i; k -= 1
    }
    out
  }

  /** [[encodeWord]] plus byte-fallback expansion when requested. */
  def encodeWordFb(word: String,
                   scores: java.util.HashMap[String, java.lang.Double],
                   maxPieceLen: Int, unkScore: Double,
                   byteFallback: Boolean): Array[String] = {
    val toks = encodeWord(word, scores, maxPieceLen, unkScore)
    if (byteFallback) byteExpand(toks, scores) else toks
  }

  def computeTokens(text: UTF8String,
                    scores: java.util.HashMap[String, java.lang.Double],
                    maxPieceLen: Int, unkScore: Double,
                    byteFallback: Boolean): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    eachWord(text) { w =>
      val toks = encodeWordFb(w, scores, maxPieceLen, unkScore, byteFallback)
      var i = 0
      while (i < toks.length) { out += UTF8String.fromString(toks(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  def countTokens(text: UTF8String,
                  scores: java.util.HashMap[String, java.lang.Double],
                  maxPieceLen: Int, unkScore: Double,
                  byteFallback: Boolean): Int = {
    var n = 0
    eachWord(text) { w =>
      n += encodeWordFb(w, scores, maxPieceLen, unkScore, byteFallback).length
    }
    n
  }

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

  def col(c: Column, pieces: Array[(String, Double)], maxPieceLen: Int,
          countOnly: Boolean, byteFallback: Boolean = false): Column =
    GraftColumnShim.column(UnigramEncode(
      GraftColumnShim.expression(c), pieces, maxPieceLen, countOnly,
      byteFallback))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece encoding as a native codegen expression: tokenize on space
  * runs (the engine's canonical tokenizer — [[SpaceTokens]]), then run
  * greedy LONGEST-MATCH-FIRST segmentation per word against a LITERAL
  * vocabulary carried as a codegen reference object (the same
  * literal-model pattern as [[BpeEncode]]). Non-initial pieces carry the
  * `##` continuation prefix; a word with no valid segmentation (or
  * longer than `maxCharsPerWord`) becomes ONE `unk` token — the
  * published MaxMatch inference rule (Schuster & Nakajima 2012; the
  * BERT WordPiece the HuggingFace tokenizers library documents).
  * Map-only inside the scan: no joins, no UDF, no driver participation,
  * streamable.
  *
  * `countOnly = true` returns the token count (INT) without
  * materializing the token array — the cheap path for token budgeting.
  */
case class WpEncode(child: Expression, vocab: Array[String],
                    countOnly: Boolean, unk: String = "[UNK]",
                    maxCharsPerWord: Int = 100)
    extends UnaryExpression {

  @transient private lazy val vocabSet = WpEncode.vocabSet(vocab)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType =
    if (countOnly) IntegerType else ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece"

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    if (countOnly) WpEncode.countTokens(t, vocabSet, unk, maxCharsPerWord)
    else WpEncode.computeTokens(t, vocabSet, unk, maxCharsPerWord)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocab", vocabSet, "java.util.HashSet")
    val unkRef = ctx.addReferenceObj("unk", unk, "java.lang.String")
    if (countOnly)
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.WpEncode.countTokens($c, $ref, $unkRef, $maxCharsPerWord)")
    else
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.WpEncode.computeTokens($c, $ref, $unkRef, $maxCharsPerWord)")
  }

  override protected def withNewChildInternal(newChild: Expression): WpEncode =
    copy(child = newChild)
}

object WpEncode {

  def vocabSet(vocab: Array[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { s.add(vocab(i)); i += 1 }
    s
  }

  /** Greedy longest-match-first segmentation of one word (no
    * whitespace): take the longest vocabulary prefix, then repeat on the
    * remainder with the `##` continuation prefix; any position with no
    * match collapses the WHOLE word to one `unk` token. Empty word → no
    * tokens.
    */
  def encodeWord(word: String, vocab: java.util.HashSet[String],
                 unk: String, maxCharsPerWord: Int): Array[String] = {
    if (word.isEmpty) return Array.empty[String]
    if (word.length > maxCharsPerWord) return Array(unk)
    val out = new scala.collection.mutable.ArrayBuffer[String](4)
    var start = 0
    val len = word.length
    while (start < len) {
      var end = len
      var found: String = null
      while (end > start && found == null) {
        val raw = word.substring(start, end)
        val piece = if (start > 0) "##" + raw else raw
        if (vocab.contains(piece)) found = piece else end -= 1
      }
      if (found == null) return Array(unk)
      out += found
      start = end
    }
    out.toArray
  }

  def computeTokens(text: UTF8String, vocab: java.util.HashSet[String],
                    unk: String, maxCharsPerWord: Int): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    eachWord(text) { w =>
      val toks = encodeWord(w, vocab, unk, maxCharsPerWord)
      var i = 0
      while (i < toks.length) { out += UTF8String.fromString(toks(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  def countTokens(text: UTF8String, vocab: java.util.HashSet[String],
                  unk: String, maxCharsPerWord: Int): Int = {
    var n = 0
    eachWord(text) { w => n += encodeWord(w, vocab, unk, maxCharsPerWord).length }
    n
  }

  /** Apply `f` to each space-run word of `text` (same tokenization as
    * [[SpaceTokens]], via String for substring access).
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

  def col(c: Column, vocab: Array[String], countOnly: Boolean,
          unk: String = "[UNK]", maxCharsPerWord: Int = 100): Column =
    GraftColumnShim.column(WpEncode(GraftColumnShim.expression(c), vocab,
      countOnly, unk, maxCharsPerWord))
}

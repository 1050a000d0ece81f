package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for dedup keys — the step every exact /
  * near-dedup pass needs before hashing, or visually-identical documents
  * ("café" composed vs decomposed, case variants, stray whitespace runs)
  * land in different hash buckets and silently survive deduplication.
  *
  * Contract (applied in this order, the stable part of the dedup key):
  *  1. Unicode NFD decomposition, then every combining mark (general
  *     category Mn) is dropped — composed and decomposed spellings of the
  *     same accented letter become the same base letter ("é" -> "e");
  *  2. lowercase (Locale.ROOT, locale-independent);
  *  3. every whitespace run (space/tab/newline/CR/FF/VT) collapses to a
  *     single space, and leading/trailing whitespace is trimmed.
  *
  * Why native: this is per-row scan-side work on the hottest column in
  * the corpus; as a codegen expression it rides whole-stage codegen like
  * the other graft text kernels (no UDF serialization, no extra pass).
  * Java's Normalizer allocates per call, but only for rows that actually
  * contain non-ASCII or uppercase bytes — the pure-ASCII-lowercase fast
  * path below returns the input buffer untouched.
  *
  * Registered in SQL as `graft_normalize_text` via
  * [[graft.GraftExtensions]].
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_normalize_text expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${NormalizeText.getClass.getName.stripSuffix("$")}.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** True when every byte is ASCII, already lowercase, with no tabs /
    * newlines, no leading/trailing space and no double spaces — the
    * common case for already-clean corpora; the input is returned as-is.
    */
  private def isCleanAscii(b: Array[Byte]): Boolean = {
    var i = 0
    var prevSpace = true // treat position -1 as space: rejects leading space
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c >= 0x80 || (c >= 'A' && c <= 'Z')) return false
      if (c < 0x20) return false // tab/newline/CR/FF/VT/controls
      if (c == ' ') { if (prevSpace) return false; prevSpace = true }
      else prevSpace = false
      i += 1
    }
    !prevSpace || b.length == 0 // rejects trailing space
  }

  /** The normalization kernel (see class doc for the contract). Public
    * and static so generated code can call it directly.
    */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    if (isCleanAscii(bytes)) return s
    val str = s.toString
    val decomposed =
      if (Normalizer.isNormalized(str, Normalizer.Form.NFD)) str
      else Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    var pendingSpace = false
    var emitted = false
    while (i < decomposed.length) {
      val cp = decomposed.codePointAt(i)
      i += Character.charCount(cp)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) {
        if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
            cp == '\f' || cp == 0x0b) {
          pendingSpace = emitted // leading whitespace never emits
        } else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.appendCodePoint(Character.toLowerCase(cp))
          emitted = true
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  def col(c: Column): Column =
    GraftColumnShim.column(NormalizeText(GraftColumnShim.expression(c)))
}

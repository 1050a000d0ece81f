package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset sniffing + decoding for RAW web-crawl bytes — the step that
  * belongs BEFORE `htmlStrip`/`curateWeb` when the source hands you
  * payload bytes rather than text (a real WARC's HTTP payload is bytes;
  * a wrong decode turns every é into Ã© and silently poisons dedup,
  * language ID and quality scoring downstream).
  *
  * Sniffing follows the WHATWG encoding-standard shape, restricted to
  * what is decidable WITHOUT an external confidence model:
  *  1. BOM wins: `EF BB BF` → utf-8-bom, `FF FE` → utf-16le,
  *     `FE FF` → utf-16be (decoded via the JDK's charset machinery).
  *  2. Otherwise a strict one-pass RFC 3629 UTF-8 scan (overlongs,
  *     surrogates and > U+10FFFF rejected; malformed lead bytes counted
  *     and resynchronized byte-wise): all-ASCII → `ascii`; valid with
  *     multibyte sequences → `utf-8`.
  *  3. Invalid UTF-8 falls back to `windows-1252` — the WHATWG default
  *     for unlabeled web content — decoded through the JDK's own
  *     windows-1252 table (no hand-transcribed mapping to get wrong).
  *
  * `n_bad` counts the bytes the UTF-8 scan rejected (the evidence for
  * the fallback; 0 on the BOM and valid paths), `n_multibyte` the
  * well-formed multibyte sequences (the evidence FOR utf-8 — an
  * all-ASCII doc is equally valid latin-1, which is why it gets its own
  * class). One pass, inlined into whole-stage codegen.
  */
object Encoding {

  /** (charset, nBad, nMultibyte). Pure classification — no allocation
    * beyond the scan. */
  def sniff(b: Array[Byte]): (String, Int, Int) = {
    val n = b.length
    if (n >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
        (b(2) & 0xff) == 0xbf) return ("utf-8-bom", 0, 0)
    if (n >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)
      return ("utf-16le", 0, 0)
    if (n >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      return ("utf-16be", 0, 0)
    var i = 0; var bad = 0; var multi = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else {
        // (needed continuations, low/high bound for the FIRST one)
        val (need, lo, hi) =
          if (c >= 0xc2 && c <= 0xdf) (1, 0x80, 0xbf)
          else if (c == 0xe0) (2, 0xa0, 0xbf)
          else if ((c >= 0xe1 && c <= 0xec) || c == 0xee || c == 0xef)
            (2, 0x80, 0xbf)
          else if (c == 0xed) (2, 0x80, 0x9f) // no UTF-16 surrogates
          else if (c == 0xf0) (3, 0x90, 0xbf)
          else if (c >= 0xf1 && c <= 0xf3) (3, 0x80, 0xbf)
          else if (c == 0xf4) (3, 0x80, 0x8f)
          else (-1, 0, 0) // 0x80-0xC1 lead, 0xF5+: always invalid
        var ok = need > 0 && i + need < n
        if (ok) {
          val first = b(i + 1) & 0xff
          ok = first >= lo && first <= hi
          var j = 2
          while (ok && j <= need) {
            val cont = b(i + j) & 0xff
            ok = cont >= 0x80 && cont <= 0xbf
            j += 1
          }
        }
        if (ok) { multi += 1; i += need + 1 }
        else { bad += 1; i += 1 } // resync on the next byte
      }
    }
    if (bad > 0) ("windows-1252", bad, multi)
    else if (multi > 0) ("utf-8", 0, multi)
    else ("ascii", 0, 0)
  }

  /** Sniff + decode in one call: the text is produced by the charset
    * the sniff chose (BOM stripped on the BOM paths). */
  def sniffDecode(b: Array[Byte]): (String, Int, Int, String) = {
    val (cs, bad, multi) = sniff(b)
    val text = cs match {
      case "utf-8-bom" =>
        new String(b, 3, b.length - 3, java.nio.charset.StandardCharsets.UTF_8)
      case "utf-16le" => new String(b, 2, b.length - 2,
        java.nio.charset.StandardCharsets.UTF_16LE)
      case "utf-16be" => new String(b, 2, b.length - 2,
        java.nio.charset.StandardCharsets.UTF_16BE)
      case "windows-1252" =>
        new String(b, java.nio.charset.Charset.forName("windows-1252"))
      case _ => new String(b, java.nio.charset.StandardCharsets.UTF_8)
    }
    (cs, bad, multi, text)
  }

  /** Codegen entry point. */
  def decodeRow(b: Array[Byte]): InternalRow = {
    val (cs, bad, multi, text) = sniffDecode(b)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(cs), bad, multi, UTF8String.fromString(text)))
  }
}

/** `graft_sniff_decode(content BINARY) ->
  * STRUCT<charset, n_bad, n_multibyte, text>` — [[Encoding.sniffDecode]]
  * inlined into whole-stage codegen (one static call per row). */
case class SniffDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sniff_decode expects BINARY, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("charset", StringType, nullable = false),
    StructField("n_bad", IntegerType, nullable = false),
    StructField("n_multibyte", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sniff_decode"

  override protected def nullSafeEval(input: Any): Any =
    Encoding.decodeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Encoding.decodeRow($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): SniffDecode =
    copy(child = newChild)
}

object SniffDecode {
  def col(c: Column): Column =
    GraftColumnShim.column(SniffDecode(GraftColumnShim.expression(c)))
}

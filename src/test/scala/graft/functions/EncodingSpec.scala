package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Charset sniff/decode contracts: strict RFC 3629 classes (overlongs,
  * surrogates, range cap), BOM precedence, windows-1252 fallback via
  * the JDK table, resynchronization counting, and the SQL surface. */
class EncodingSpec extends SparkSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("ascii / utf-8 / fallback classes with evidence counts") {
    assert(Encoding.sniff("hello".getBytes("UTF-8")) == ("ascii", 0, 0))
    assert(Encoding.sniff("héllo wörld".getBytes("UTF-8")) == ("utf-8", 0, 2))
    // 4-byte astral plane char
    assert(Encoding.sniff("a😀b".getBytes("UTF-8")) ==
      ("utf-8", 0, 1))
    // bare latin-1 byte → fallback, one bad byte
    assert(Encoding.sniff(bytes('c', 'a', 'f', 0xe9, ' ', 'x')) ==
      ("windows-1252", 1, 0))
    // mixed: one valid multibyte AND one bad byte still falls back
    val mixed = "é".getBytes("UTF-8") ++ bytes(0x93)
    assert(Encoding.sniff(mixed) == ("windows-1252", 1, 1))
    assert(Encoding.sniff(Array.empty[Byte]) == ("ascii", 0, 0))
  }

  test("strict RFC 3629: overlongs, surrogates, beyond-U+10FFFF refused") {
    // overlong '/' (C0 AF)
    assert(Encoding.sniff(bytes(0xc0, 0xaf))._1 == "windows-1252")
    // overlong 3-byte (E0 80 80)
    assert(Encoding.sniff(bytes(0xe0, 0x80, 0x80))._1 == "windows-1252")
    // UTF-16 surrogate D800 (ED A0 80)
    assert(Encoding.sniff(bytes(0xed, 0xa0, 0x80))._1 == "windows-1252")
    // F4 90 80 80 = U+110000, beyond the cap
    assert(Encoding.sniff(bytes(0xf4, 0x90, 0x80, 0x80))._1 == "windows-1252")
    // truncated sequence at end of input
    assert(Encoding.sniff(bytes('a', 0xc3)) == ("windows-1252", 1, 0))
    // boundary ACCEPTS: U+0080 (C2 80), U+FFFF (EF BF BF), U+10FFFF
    assert(Encoding.sniff(bytes(0xc2, 0x80)) == ("utf-8", 0, 1))
    assert(Encoding.sniff(bytes(0xef, 0xbf, 0xbf)) == ("utf-8", 0, 1))
    assert(Encoding.sniff(bytes(0xf4, 0x8f, 0xbf, 0xbf)) == ("utf-8", 0, 1))
  }

  test("BOMs win; decode strips them; utf-16 both endiannesses") {
    val utf8bom = bytes(0xef, 0xbb, 0xbf) ++ "hi".getBytes("UTF-8")
    assert(Encoding.sniffDecode(utf8bom) == ("utf-8-bom", 0, 0, "hi"))
    val le = bytes(0xff, 0xfe) ++ "hi".getBytes("UTF-16LE")
    assert(Encoding.sniffDecode(le) == ("utf-16le", 0, 0, "hi"))
    val be = bytes(0xfe, 0xff) ++ "hi".getBytes("UTF-16BE")
    assert(Encoding.sniffDecode(be) == ("utf-16be", 0, 0, "hi"))
  }

  test("windows-1252 decode uses the JDK table (C1 smart quotes)") {
    val (cs, bad, _, text) =
      Encoding.sniffDecode(bytes(0x93) ++ "ok".getBytes("UTF-8") ++ bytes(0x94))
    assert(cs == "windows-1252" && bad == 2)
    assert(text == "“ok”")
  }

  test("SQL surface: graft_sniff_decode over a binary column") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain".getBytes("UTF-8")),
      (2L, "café".getBytes("UTF-8")),
      (3L, bytes('x', 0xe9))).toDF("id", "content")
    val out = df.selectExpr("id", "graft_sniff_decode(content) AS s")
      .selectExpr("id", "s.charset", "s.text").orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("ascii", "utf-8", "windows-1252"))
    assert(out(2).getString(2) == "xé")
  }
}

package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite
import graft.functions.NormalizeText

/** The r10 text-hygiene trio: canonical dedup-key normalization
  * (NormalizeText), HTML boilerplate stripping, and the C4 blocklist
  * gate. The cross-engine relations are oracle-checked (text_normalize,
  * dedup_normalized, html_strip, blocklist_filter); these pin the
  * unicode contract, edge cases, and plan shapes no ASCII oracle can
  * reach.
  */
class NormalizeCleanSpec extends SparkSuite {
  import spark.implicits._

  private def norm(s: String): String =
    NormalizeText.normalize(UTF8String.fromString(s)).toString

  test("composed and decomposed accent spellings normalize identically") {
    val composed = "Caf\u00e9 d\u00e9j\u00e0 vu"
    val decomposed = "Cafe\u0301 de\u0301ja\u0300 vu"
    assert(norm(composed) === norm(decomposed))
    assert(norm(composed) === "cafe deja vu")
  }

  test("case, whitespace runs, and mixed unicode whitespace collapse") {
    assert(norm("  Hello\t\tWORLD \r\n again ") === "hello world again")
    assert(norm("") === "")
    assert(norm(" \t \n ") === "")
    // non-decomposable letters survive untouched (contract: only
    // combining marks are stripped, ø/ß have no NFD decomposition)
    assert(norm("Straße Øl") === "straße øl")
  }

  test("clean ASCII fast path returns the identical string") {
    val clean = "already clean lowercase text."
    assert(norm(clean) === clean)
  }

  test("null propagates and the SQL registration works") {
    val out = spark.sql(
      "SELECT graft_normalize_text('  MiXeD   Casé ') AS n, " +
      "graft_normalize_text(CAST(NULL AS STRING)) AS nn")
      .collect().head
    assert(out.getString(0) === "mixed case")
    assert(out.isNullAt(1))
  }

  test("normalizeDocs is map-only and collapses planted variants") {
    val docs = Seq(
      (1L, "The Quick  Brown Fox"),
      (2L, "  the quick brown fox "),
      (3L, "the quick brown fox"),
      (4L, "something else entirely")).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeDocs(docs, "text", "doc_id")
    val keys = out.select("doc_id", "norm_text").as[(Long, String)]
      .collect().toMap
    assert(keys(1L) === keys(2L) && keys(2L) === keys(3L))
    assert(keys(4L) !== keys(1L))
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"), s"normalize must be map-only:\n$plan")
  }

  test("htmlStrip removes blocks/tags, decodes entities in HTML order") {
    val docs = Seq(
      (1L, "<p>a &amp;lt; b</p>"), // &amp;lt; -> literal '&lt;' (not '<')
      (2L, "<script>ignore <b>this</b></script>kept"),
      (3L, "no markup at all"),
      (4L, "<ul><li>x</li><li>y</li></ul>")).toDF("doc_id", "text")
    val out = TextAnalysis.htmlStrip(docs, "text", "doc_id")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 === "a &lt; b")
    assert(out(2L)._1 === "kept")
    assert(out(3L) === (("no markup at all", 0L)))
    assert(out(4L)._1 === "x y")
    assert(out(1L)._2 === 2L) // <p> and </p>
  }

  test("markdownStrip: links keep text, images drop, fences keep content") {
    val docs = Seq(
      (1L, "# H1\nSee [the docs](http://docs.example) now"),
      (2L, "![alt](img.png) stays? no"),
      (3L, "```py\nx = 1\n```\nafter"),
      (4L, "- a\n- b **bold** `code`"),
      (5L, "plain snake_case text")).toDF("doc_id", "text")
    val out = TextAnalysis.markdownStrip(docs, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === (("H1 See the docs now", 1L, 0L)))
    assert(out(2L) === (("stays? no", 1L, 1L))) // image counts as a link too
    assert(out(3L)._1 === "x = 1 after") // fence markers gone, content kept
    assert(out(4L)._1 === "a b bold code")
    assert(out(5L)._1 === "plain snake_case text") // underscores untouched
  }

  test("sentence segmentation: portable split, blanks dropped, C4 gate") {
    val docs = Seq(
      (1L, "One. Two! Three?"),
      (2L, "Only one sentence"),
      (3L, "Trailing... dots. "),
      (4L, "")).toDF("doc_id", "text")
    val stats = TextAnalysis.sentenceStats(docs, "text", "doc_id")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(stats(1L) === ((3L, true)))
    assert(stats(2L) === ((1L, false)))
    assert(stats(3L) === ((2L, false))) // "Trailing" + "dots"; blank dropped
    assert(stats(4L) === ((0L, false)))
    val ex = TextAnalysis.explodeSentences(docs, "text", "doc_id")
      .as[(Long, Int, String)].collect()
    assert(ex.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq ===
      Seq("One", "Two", "Three"))
    assert(!ex.exists(_._1 == 4L)) // blank doc explodes to no rows
  }

  test("blocklistFlags is word-exact: no substring false positives") {
    val docs = Seq(
      (1L, "totally fine text"),
      (2L, "contains zorblag here"),
      (3L, "Zorblag ZORBLAG zorblag"), // case-insensitive, counted thrice
      (4L, "zorblagged is a different word")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFlags(docs, "text", Seq("Zorblag"))
      .select("doc_id", "n_words", "n_blocked", "kept")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out(1L) === ((0L, true)))
    assert(out(2L) === ((1L, false)))
    assert(out(3L) === ((3L, false)))
    assert(out(4L) === ((0L, true))) // "zorblagged" is not "zorblag"
  }
}

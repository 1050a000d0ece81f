package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** WARC/WET ingestion (sources/WarcIO): writer→reader roundtrips, gzip
  * members, malformed-record audit, warcinfo filtering, and composition
  * with the URL curation family. */
class WarcIOSpec extends SparkSuite {

  private def tempDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_wet")

  private val recs = Seq(
    ("https://a.example.com/1", "2024-01-01T00:00:00Z", "hello world"),
    ("https://b.example.org/2", "2024-01-02T00:00:00Z",
      "multi line body\nsecond line\nthird"),
    ("https://a.example.com/3", "2024-01-03T00:00:00Z", ""))

  test("writer→reader roundtrip: records, headers, multi-line bodies") {
    val dir = tempDir()
    WarcIO.writeWetFile(dir.resolve("part-0.wet"), recs)
    val all = WarcIO.readWetRecords(spark, dir.toString)
    assert(all.count() == 4L) // warcinfo + 3 conversions
    assert(all.filter(col("warc_type") === "warcinfo").count() == 1L)
    val byUrl = all.filter(col("warc_type") === "conversion")
      .collect().map(r => r.getAs[String]("url") -> r).toMap
    recs.foreach { case (url, date, text) =>
      val r = byUrl(url)
      assert(r.getAs[String]("warc_date") == date)
      assert(r.getAs[Long]("content_length") == text.getBytes("UTF-8").length)
      assert(r.getAs[String]("text") == text, url)
    }
  }

  test("gzipped members read through the codec") {
    val dir = tempDir()
    WarcIO.writeWetFile(dir.resolve("part-0.wet.gz"), recs, gzip = true)
    val corpus = WarcIO.wetCorpus(spark, dir.toString)
    assert(corpus.count() == 3L)
    assert(corpus.filter(col("url") === "https://b.example.org/2")
      .head().getAs[String]("text").contains("second line"))
  }

  test("wetCorpus drops warcinfo and assigns deterministic doc ids") {
    val dir = tempDir()
    WarcIO.writeWetFile(dir.resolve("p.wet"), recs)
    val ids1 = WarcIO.wetCorpus(spark, dir.toString)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = WarcIO.wetCorpus(spark, dir.toString)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2 && ids1.distinct.size == 3)
  }

  test("malformed record (no blank line) keeps NULL text for the audit") {
    val dir = tempDir()
    val crlf = "\r\n"
    val bad = "WARC/1.0" + crlf +
      "WARC-Type: conversion" + crlf +
      "WARC-Target-URI: https://broken.example.com/x" + crlf +
      "Content-Length: 5" + crlf // no blank line, no body
    java.nio.file.Files.write(dir.resolve("bad.wet"),
      (bad + WarcIO.wetBytes(recs.take(1)).map(_.toChar).mkString).getBytes("UTF-8"))
    val all = WarcIO.readWetRecords(spark, dir.toString)
    val broken = all.filter(col("url") === "https://broken.example.com/x")
    assert(broken.count() == 1L)
    assert(broken.filter(col("text").isNull).count() == 1L)
    // the well-formed record in the same file still parses
    assert(all.filter(col("url") === "https://a.example.com/1" &&
      col("text") === "hello world").count() == 1L)
  }

  test("composes with the URL curation family") {
    val dir = tempDir()
    WarcIO.writeWetFile(dir.resolve("p.wet"), recs)
    val flagged = graft.text.Web.urlFlags(
      WarcIO.wetCorpus(spark, dir.toString), "url",
      blockedDomains = Seq("example.org"))
    val kept = flagged.filter(col("kept")).select("url")
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("https://a.example.com/1", "https://a.example.com/3"))
  }

  test("streaming twin parses identically to the batch path") {
    val dir = tempDir()
    WarcIO.writeWetFile(dir.resolve("p0.wet"), recs.take(2))
    WarcIO.writeWetFile(dir.resolve("p1.wet"), recs.drop(2))
    val q = WarcIO.streamWetCorpus(spark, dir.toString)
      .writeStream.format("memory").queryName("wet_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("wet_stream")
      .select("url", "warc_date", "content_length", "text")
      .collect().map(_.toSeq).toSet
    val batch = WarcIO.wetCorpus(spark, dir.toString)
      .select("url", "warc_date", "content_length", "text")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.size == 3)
  }

  test("length_ok audits framing; body-final newlines survive") {
    val dir = tempDir()
    WarcIO.writeWetFile(dir.resolve("p.wet"), Seq(
      ("https://a.example.com/nl", "2024-01-01T00:00:00Z", "line one\n"),
      // a body quoting a WARC version line at line start: the record
      // splits there and BOTH fragments must fail the length audit
      ("https://a.example.com/quote", "2024-01-01T00:00:00Z",
        "docs about warc:\r\nWARC/1.0\r\nWARC-Type: conversion\r\n\r\nquoted"),
      ("https://a.example.com/ok", "2024-01-01T00:00:00Z", "fine")))
    val recs2 = WarcIO.readWetRecords(spark, dir.toString)
      .filter(col("warc_type") =!= "warcinfo")
    // the newline-terminated body survives exactly
    val nl = recs2.filter(col("url") === "https://a.example.com/nl").head()
    assert(nl.getAs[String]("text") == "line one\n")
    assert(nl.getAs[Boolean]("length_ok"))
    assert(recs2.filter(col("url") === "https://a.example.com/ok")
      .head().getAs[Boolean]("length_ok"))
    // collision fragments flagged
    val bad = recs2.filter(!col("length_ok"))
    assert(bad.count() >= 2)
  }

  test("full-WARC response records split into status/type/payload") {
    val dir = tempDir()
    WarcIO.writeWarcFile(dir.resolve("c.warc"), Seq(
      ("https://cap.example.org/1", "2024-02-01T00:00:00Z", 200,
        "text/html", "<html><body>hello\ncrawl</body></html>"),
      ("https://cap.example.org/2", "2024-02-01T00:00:00Z", 404,
        "text/plain", "not found")))
    val got = WarcIO.warcResponses(spark, dir.toString)
      .collect().map(r => r.getAs[String]("url") -> r).toMap
    val a = got("https://cap.example.org/1")
    assert(a.getAs[Int]("http_status") == 200)
    assert(a.getAs[String]("content_type") == "text/html")
    assert(a.getAs[String]("payload") == "<html><body>hello\ncrawl</body></html>")
    assert(a.getAs[Boolean]("length_ok"))
    assert(got("https://cap.example.org/2").getAs[Int]("http_status") == 404)
    // composes with the HTML stripper
    val stripped = graft.text.TextAnalysis.htmlStrip(
      WarcIO.warcResponses(spark, dir.toString)
        .filter(col("content_type") === "text/html")
        .select(col("doc_id"), col("payload").as("text")),
      "text", "doc_id")
    assert(stripped.head().getAs[String]("clean_text") == "hello crawl")
  }

  test("fixture corpus matches its content formulas") {
    val corpus = WarcIO.wetCorpus(spark, WetFixtures.oracleCorpus())
    assert(corpus.count() == WetFixtures.N.toLong)
    val r = corpus.filter(col("url") === WetFixtures.url(7)).head()
    assert(r.getAs[String]("text") == WetFixtures.text(7))
    assert(r.getAs[Long]("content_length") == WetFixtures.text(7).length)
  }
}

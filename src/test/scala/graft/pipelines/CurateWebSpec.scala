package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** curateWeb: the raw-crawl front end (URL gate → HTML strip →
  * blocklist → sentence gate → standard curation). Pins gate precedence,
  * the strip-before-dedup property (markup variants of one page become
  * exact duplicates only after stripping), and null fall-through.
  */
class CurateWebSpec extends SparkSuite {
  import spark.implicits._

  // loose curation config so only the web gates and dedup decide
  private val cfg = TrainingDataPipeline.Config(
    allowedLangs = Set("en", "unknown", "other"),
    minQuality = 0.0, minTokens = 1, maxTokens = 1000000)

  private val body =
    "the quick brown fox and the lazy dog of lore. " +
    "it jumps over the fence again! is that not enough?"

  private def fixture = Seq(
    (1L, s"<html><body><p>$body</p></body></html>", "https://ok.example.com/a"),
    (2L, s"<p>$body</p>", "http://ads.tracker.test/t"), // blocked domain
    (3L, s"<p>$body zorblag</p>", "https://ok.example.com/b"), // blocked word
    (4L, "<p>just one sentence here.</p>", "https://ok.example.com/c"), // < 2 sents
    (5L, s"<div class=x><p>$body</p></div>", "https://ok.example.com/d") // markup variant of 1
  ).toDF("doc_id", "text", "url")

  private def run() = TrainingDataPipeline.curateWeb(
    fixture, "text", "doc_id",
    urlCol = Some("url"), blockedDomains = Seq("tracker.test"),
    wordBlocklist = Seq("zorblag"), minSentences = 2, cfg = cfg)
    .select("doc_id", "keep", "drop_reason")
    .as[(Long, Boolean, Option[String])].collect()
    .map(r => r._1 -> ((r._2, r._3))).toMap

  test("gate precedence and one row per input doc") {
    val out = run()
    assert(out.size === 5)
    assert(out(2L) === ((false, Some("blocked_domain"))))
    assert(out(3L) === ((false, Some("blocked_word"))))
    assert(out(4L) === ((false, Some("too_few_sentences"))))
    assert(out(1L)._1 || out(5L)._1, "one of the markup variants survives")
  }

  test("markup variants are exact duplicates only after stripping") {
    val out = run()
    // docs 1 and 5 differ byte-wise but strip to identical text: exactly
    // one survives, the other is an exact_dup (min-id survivor policy)
    assert(out(1L) === ((true, None)))
    assert(out(5L) === ((false, Some("exact_dup"))))
  }

  test("web-gated docs never reach curate: annotation columns are null") {
    val rows = TrainingDataPipeline.curateWeb(
      fixture, "text", "doc_id",
      urlCol = Some("url"), blockedDomains = Seq("tracker.test"),
      wordBlocklist = Seq("zorblag"), minSentences = 2, cfg = cfg)
      .filter(col("drop_reason") === "blocked_domain")
      .select("lang_pred", "quality_score", "n_ws_tokens").collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)))
  }

  test("null text and null url fall through the web gates") {
    val docs = Seq((1L, Option.empty[String], Option.empty[String]))
      .toDF("doc_id", "text", "url")
    val out = TrainingDataPipeline.curateWeb(
      docs, "text", "doc_id",
      urlCol = Some("url"), blockedDomains = Seq("tracker.test"),
      wordBlocklist = Seq("zorblag"), minSentences = 2, cfg = cfg)
      .select("doc_id", "drop_reason").as[(Long, Option[String])].collect()
    assert(out.length === 1)
    // the web gates pass (nothing to decide); curate's own gates own it
    assert(!Set("blocked_domain", "blocked_word", "too_few_sentences")
      .contains(out.head._2.orNull))
  }

  test("curateStreamWeb: stream decisions match the batch web gates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "url", "ts")
    val query = TrainingDataPipeline.curateStreamWeb(
        stream, "text", "doc_id", "ts",
        urlCol = Some("url"), blockedDomains = Seq("tracker.test"),
        wordBlocklist = Seq("zorblag"), minSentences = 2,
        watermark = "10 seconds", cfg = cfg)
      .writeStream.format("memory").queryName("csw")
      .outputMode(OutputMode.Append).start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    input.addData(fixture.select("doc_id", "text", "url")
      .as[(Long, String, String)].collect().toSeq
      .map(r => (r._1, r._2, r._3, t(r._1))): _*)
    query.processAllAvailable()
    query.stop()
    val streamKept = spark.table("csw").select("doc_id").as[Long]
      .collect().toSet
    // batch parity modulo the near-dup stage (streaming has none; the
    // fixture's only dup pair is an EXACT dup after stripping, which
    // the within-watermark content-hash dedup does catch — doc 1 wins
    // arrival order, matching batch's min-id survivor here)
    val batchKept = TrainingDataPipeline.curateWeb(
        fixture, "text", "doc_id",
        urlCol = Some("url"), blockedDomains = Seq("tracker.test"),
        wordBlocklist = Seq("zorblag"), minSentences = 2, cfg = cfg)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(streamKept === batchKept)
  }

  test("curateStreamWeb → IcebergLite.sink: exactly-once Iceberg table " +
      "across a kill/restart replay, ≡ the batch twin") {
    import graft.sources.IcebergLite
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files
      .createTempDirectory("graft_web_iceberg").toString
    val inDir = s"$base/in"
    val tableDir = s"$base/table"
    val vocab = Vector("the", "quick", "brown", "fox", "jumps", "over",
      "a", "lazy", "dog", "and", "then", "sings")
    // per-doc UNIQUE tokens every 3rd word so the batch twin's
    // NEAR-dedup stage (absent in streaming) has no cross-doc pairs to
    // drop — parity must hold on the exact-dup + gate decisions alone
    def docText(i: Long): String = {
      val words = (0 until 24).map(j =>
        if (j % 3 == 0) s"tag${i}x$j"
        else vocab(((i * 7 + j * 5) % vocab.size).toInt)).mkString(" ")
      s"<html><body><p>$words.</p><p>closing line number five!</p></body></html>"
    }
    def doc(i: Long): (Long, String, String, java.sql.Timestamp) = (i,
      if (i == 6) docText(5) else docText(i), // 6 strips ≡ 5 → dedup drop
      if (i == 4) "http://ads.tracker.test/x" else s"https://ok.example.com/p$i",
      new java.sql.Timestamp(i * 1000))
    def writeFile(ids: Seq[Long]): Unit =
      spark.createDataFrame(ids.map(doc))
        .toDF("doc_id", "text", "url", "ts")
        .repartition(1).write.mode("append").parquet(inDir)

    def runStream(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, url STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val q = TrainingDataPipeline.curateStreamWeb(
          stream, "text", "doc_id", "ts",
          urlCol = Some("url"), blockedDomains = Seq("tracker.test"),
          minSentences = 2, watermark = "10 seconds", cfg = cfg)
        .drop("url")
        .writeStream
        .foreachBatch(IcebergLite.sink(tableDir))
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // phase A: two input files → two micro-batches → two snapshots
    writeFile(Seq(1L, 2L, 3L))
    writeFile(Seq(4L, 5L, 6L))
    runStream()
    val snapsA = IcebergLite.snapshotIds(spark, tableDir)
    assert(snapsA.size == 2)
    // kill/replay: a crash after commit re-delivers the last batch —
    // the sink's commit key makes the replay a structural no-op
    val replay = IcebergLite.readTable(spark, tableDir)
    IcebergLite.sink(tableDir)(replay, 1L)
    assert(IcebergLite.snapshotIds(spark, tableDir) == snapsA)
    // phase B: restart from the SAME checkpoint with one more file —
    // only the new batch lands, as the next snapshot
    writeFile(Seq(7L, 8L, 9L))
    runStream()
    assert(IcebergLite.snapshotIds(spark, tableDir).size == 3)

    // the stream-ingested table ≡ the batch twin, read back purely
    // through the Iceberg metadata chain
    val streamed = IcebergLite.readTable(spark, tableDir)
    val streamKept = streamed.select("doc_id").as[Long].collect().toSet
    val batchKept = TrainingDataPipeline.curateWeb(
        spark.createDataFrame((1L to 9L).map(doc))
          .toDF("doc_id", "text", "url", "ts"),
        "text", "doc_id", urlCol = Some("url"),
        blockedDomains = Seq("tracker.test"), minSentences = 2, cfg = cfg)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(streamKept === batchKept)
    assert(!streamKept.contains(4L) && !streamKept.contains(6L))
    // the landed schema is the curation annotation contract
    assert(streamed.columns.toSet.contains("content_hash") &&
      streamed.columns.toSet.contains("quality_score"))
  }

  test("robots gating composes as the FIRST gate (batch + stream parity)") {
    // r15: the RFC 9309 gate precedes every content gate. Doc 2 is on
    // a blocked domain AND robots-disallowed — robots wins the reason.
    val rules = graft.text.Robots.rulesTable(
      Seq(("ads.tracker.test", "User-agent: *\nDisallow: /"),
        ("ok.example.com", "User-agent: *\nDisallow: /b"))
        .toDF("host", "txt"), "host", "txt")
    val out = TrainingDataPipeline.curateWeb(
        fixture, "text", "doc_id",
        urlCol = Some("url"), blockedDomains = Seq("tracker.test"),
        wordBlocklist = Seq("zorblag"), minSentences = 2, cfg = cfg,
        robotsRules = Some(rules))
      .select("doc_id", "keep", "drop_reason")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 === true)
    assert(out(2L) === ((false, Some("robots_disallowed"))),
      "robots outranks the domain blocklist")
    assert(out(3L) === ((false, Some("robots_disallowed"))),
      "per-path disallow gates /b before the word blocklist sees it")
    assert(out(4L) === ((false, Some("too_few_sentences"))))
    assert(out.size == 5)

    // streaming twin: stream-static join, same survivors
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)](spark)
    val query = TrainingDataPipeline.curateStreamWeb(
        input.toDF().toDF("doc_id", "text", "url", "ts"),
        "text", "doc_id", "ts", urlCol = Some("url"),
        blockedDomains = Seq("tracker.test"),
        wordBlocklist = Seq("zorblag"), minSentences = 2,
        watermark = "10 seconds", cfg = cfg,
        robotsRules = Some(rules))
      .writeStream.format("memory").queryName("cwr")
      .outputMode(OutputMode.Append).start()
    val rows = fixture.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2),
        new java.sql.Timestamp(r.getLong(0) * 1000)))
    input.addData(rows.toIndexedSeq: _*)
    query.processAllAvailable()
    query.stop()
    val streamKept = spark.table("cwr").select("doc_id")
      .as[Long].collect().toSet
    val batchKept = out.filter(_._2._1).keySet
    assert(streamKept === batchKept)
  }

  test("cleanWebCorpus carries the stripped text of survivors") {
    val kept = TrainingDataPipeline.cleanWebCorpus(
      fixture, "text", "doc_id",
      urlCol = Some("url"), blockedDomains = Seq("tracker.test"),
      wordBlocklist = Seq("zorblag"), minSentences = 2, cfg = cfg)
      .as[(Long, String)].collect().toMap
    assert(kept.keySet === Set(1L))
    assert(kept(1L) === body)
  }
}

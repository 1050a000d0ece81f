package graft.pipelines

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite

class CurateStreamSpec extends SparkSuite {
  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and then runs far away " * 5

  test("curateStream keeps good docs, filters bad ones, dedups within watermark") {
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val kept = TrainingDataPipeline.curateStream(
      stream, "text", "doc_id", "ts", watermark = "10 seconds")
    val query = kept.writeStream.format("memory").queryName("cs")
      .outputMode(OutputMode.Append).start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    input.addData(
      (1L, goodText, t(1)),
      (2L, "tiny", t(2)),            // fails length
      (3L, goodText + " tail", t(3)),
      (4L, goodText, t(4)))          // exact dup of 1 within watermark
    query.processAllAvailable()
    query.stop()
    val ids = spark.table("cs").select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 3L))
    // annotations survive onto the kept stream
    val cols = spark.table("cs").columns.toSet
    assert(Set("lang_pred", "quality_score", "n_ws_tokens", "content_hash")
      .subsetOf(cols))
  }

  test("curateStreamWithDecontamination drops eval-overlapping docs per-row") {
    val evalSet = Seq(
      (100L, "evalprefix " + goodText + " evalsuffix")).toDF("doc_id", "text")
    val bloom = graft.dedup.Dedup.evalShingleBloom(
      evalSet, "text", "doc_id", n = 8)
    // the repetition test pins this shape as passing every curateStream
    // gate — so a drop here can only be the contamination gate
    val clean = (0 until 40).map(i => s"alpha$i beta$i").mkString(" ")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val query = TrainingDataPipeline.curateStreamWithDecontamination(
        stream, "text", "doc_id", "ts", bloom, n = 8, minShared = 3,
        watermark = "10 seconds")
      .writeStream.format("memory").queryName("csd")
      .outputMode(OutputMode.Append).start()
    input.addData(
      (1L, goodText, new java.sql.Timestamp(1000)),       // contaminated
      (2L, clean, new java.sql.Timestamp(2000)))          // clean, kept
    query.processAllAvailable()
    query.stop()
    val kept = spark.table("csd").select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
    // the per-row gate agrees with the batch scan's decision here
    val batch = graft.dedup.Dedup.crossCorpusContamination(
        Seq((1L, goodText), (2L, clean)).toDF("doc_id", "text"), evalSet,
        "text", "doc_id", n = 8, minShared = 3)
      .select("id_a").as[Long].collect().toSet
    assert(batch === Set(1L))
  }

  test("curateStream honors the Gopher repetition thresholds") {
    // r4 ADVICE: the streaming path silently ignored
    // maxDupWordFrac/maxTopBigramFrac. A doc made of one repeated word
    // must now be dropped when the dup-word gate is configured.
    // all-distinct words: dup-word fraction 0 (goodText itself is a 5x
    // repeat and would rightly fail a 0.3 dup-word gate)
    val varied = (0 until 40).map(i => s"alpha$i beta$i").mkString(" ")
    val repetitive = ("spam " * 80).trim + " filler tail so length passes"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val query = TrainingDataPipeline.curateStream(
        stream, "text", "doc_id", "ts", watermark = "10 seconds",
        cfg = TrainingDataPipeline.Config(maxDupWordFrac = 0.3))
      .writeStream.format("memory").queryName("cs3")
      .outputMode(OutputMode.Append).start()
    input.addData(
      (1L, varied, new java.sql.Timestamp(1000)),
      (2L, repetitive, new java.sql.Timestamp(2000)))
    query.processAllAvailable()
    query.stop()
    val kept = spark.table("cs3").select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
    // and the same config drops it in the batch path (shared gate)
    val batch = TrainingDataPipeline.curate(
        Seq((1L, varied), (2L, repetitive)).toDF("doc_id", "text"),
        "text", "doc_id",
        TrainingDataPipeline.Config(maxDupWordFrac = 0.3))
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(batch === Set(1L))
  }

  test("curateStream composes with the near-dedup fold (the documented split)") {
    // The scaladoc's "standard split": this front end curates on
    // arrival, and the LSH near-dedup — a corpus self-join streaming
    // cannot express with bounded state — runs as the maintained-table
    // fold. Pin the composition end-to-end: stream -> curateStream ->
    // foreachBatch(IncrementalNearDedup.sink), then the maintained
    // table holds exactly the kept docs' signatures and the reported
    // pairs equal a batch near-dedup run over the same kept set.
    val sigDir = java.nio.file.Files
      .createTempDirectory("curate_fold").toString + "/sigs"
    val inc = new graft.dedup.IncrementalNearDedup(spark, sigDir,
      minJaccard = 0.5)
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val kept = TrainingDataPipeline.curateStream(
      input.toDF().toDF("doc_id", "text", "ts"),
      "text", "doc_id", "ts", watermark = "10 seconds")
    val query = kept.writeStream
      .foreachBatch(inc.sink("text", "doc_id") { (p, _) =>
        pairs ++= p.select("id_a", "id_b").as[(Long, Long)].collect()
      })
      .outputMode(OutputMode.Append).start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // batch 1: two keepers (one near-dup family), one length-reject
    input.addData(
      (1L, goodText, t(1)),
      (2L, "tiny", t(2)),
      (3L, goodText + " tail", t(3)))
    query.processAllAvailable()
    // batch 2: a cross-batch near-dup of doc 1 + an unrelated keeper
    // (stopword-rich so it passes the language/quality gates, but with
    // no shingle overlap with the fox text)
    val other =
      "we walked along the river while the evening light was fading " +
        "and it felt like the whole town had gone quiet for a moment " * 4
    input.addData(
      (4L, goodText + " coda", t(20)),
      (5L, other, t(21)))
    query.processAllAvailable()
    query.stop()
    // the maintained table holds exactly the kept docs' signatures
    assert(inc.corpusSignatures.get.select("id").as[Long]
      .collect().toSet === Set(1L, 3L, 4L, 5L))
    // pairs across ALL folds == one batch near-dedup over the kept set
    val keptDocs = Seq((1L, goodText), (3L, goodText + " tail"),
      (4L, goodText + " coda"), (5L, other)).toDF("doc_id", "text")
    val want = graft.dedup.Dedup.minHashCandidates(keptDocs, "text",
        "doc_id", minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.toSet === want)
    assert(want.contains((1L, 3L)) && want.contains((1L, 4L)),
      "fixture must exercise within-batch AND cross-batch near-dup pairs")
  }

  test("curateStreamNearDedup FLAGS near-dups on arrival; flags ⊆ batch drops") {
    // r13 verdict task 5: the stream no longer just defers near-dedup
    // to compaction — each micro-batch folds into the maintained table
    // and the delivered batch carries is_near_dup on arrival.
    val sigDir = java.nio.file.Files
      .createTempDirectory("curate_flag").toString + "/sigs"
    val inc = new graft.dedup.IncrementalNearDedup(spark, sigDir,
      minJaccard = 0.5)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val query = input.toDF().toDF("doc_id", "text", "ts").writeStream
      .foreachBatch(TrainingDataPipeline.curateStreamNearDedup(
        "text", "doc_id", "ts", inc) { (annotated, _) =>
        seen ++= annotated.select("doc_id", "is_near_dup")
          .as[(Long, Boolean)].collect()
      })
      .outputMode(OutputMode.Append).start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val other =
      "we walked along the river while the evening light was fading " +
        "and it felt like the whole town had gone quiet for a moment " * 4
    // batch 1: a near-dup family within the batch + a length reject
    input.addData(
      (1L, goodText, t(1)),
      (2L, "tiny", t(2)),
      (3L, goodText + " tail", t(3)))
    query.processAllAvailable()
    // batch 2: a CROSS-batch near-dup of doc 1 (flagged on arrival,
    // against the maintained corpus) + an unrelated keeper
    input.addData(
      (4L, goodText + " coda", t(20)),
      (5L, other, t(21)))
    query.processAllAvailable()
    query.stop()
    val flags = seen.toMap
    // min-id-wins: 1 keeps, 3 flags (within batch 1); 4 flags against
    // the CORPUS (cross-batch); 5 unique; 2 never reaches the fold
    assert(flags === Map(1L -> false, 3L -> true, 4L -> true, 5L -> false))
    // the documented bound: stream-flagged ⊆ the batch pipeline's
    // near-dup drop set over the same kept corpus
    val batchDrops = TrainingDataPipeline.curate(
        Seq((1L, goodText), (3L, goodText + " tail"),
          (4L, goodText + " coda"), (5L, other)).toDF("doc_id", "text"),
        "text", "doc_id")
      .filter(col("drop_reason") === "near_dup")
      .select("doc_id").as[Long].collect().toSet
    val streamFlagged = flags.filter(_._2).keySet
    assert(streamFlagged.subsetOf(batchDrops),
      s"stream flagged $streamFlagged, batch drops $batchDrops")
    // the maintained table still holds every kept doc's signatures —
    // flagging composes with (does not replace) the fold
    assert(inc.corpusSignatures.get.select("id").as[Long]
      .collect().toSet === Set(1L, 3L, 4L, 5L))
  }

  test("reconcileNearDupFlags: stream + compaction ≡ batch drops exactly") {
    // r14 verdict task 4: with NON-monotone arrival (a smaller-id doc
    // arrives after its larger-id near-dup partner) the stream cannot
    // flag the already-delivered larger id — the ⊆ bound. The
    // compaction-time reconcile against the accumulated pair table
    // must close it to set EQUALITY with the batch drop set.
    val sigDir = java.nio.file.Files
      .createTempDirectory("curate_retro").toString + "/sigs"
    val inc = new graft.dedup.IncrementalNearDedup(spark, sigDir,
      minJaccard = 0.5)
    val delivered = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val pairRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val sink = TrainingDataPipeline.curateStreamNearDedup(
      "text", "doc_id", "ts", inc,
      onPairs = (p, _) =>
        pairRows ++= p.select("id_a", "id_b").as[(Long, Long)].collect()) {
      (annotated, _) =>
        delivered ++= annotated.select("doc_id", "is_near_dup")
          .as[(Long, Boolean)].collect()
    }
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val other =
      "we walked along the river while the evening light was fading " +
        "and it felt like the whole town had gone quiet for a moment " * 4
    // batch 1 delivers the LARGER id of a future pair, unflagged
    sink(Seq((10L, goodText, t(1)), (5L, other, t(2)))
      .toDF("doc_id", "text", "ts"), 0L)
    // batch 2: the smaller-id near-dup arrives — min-id-wins keeps it,
    // and the stream has no way to retro-flag 10
    sink(Seq((4L, goodText + " tail", t(20)))
      .toDF("doc_id", "text", "ts"), 1L)
    val flags = delivered.toMap
    assert(flags === Map(10L -> false, 5L -> false, 4L -> false),
      "fixture must exercise the lost-flag shape (no flags in-stream)")
    // compaction: one join against the accumulated pair table
    val deliveredDf = delivered.toSeq.toDF("doc_id", "is_near_dup")
    val reconciled = TrainingDataPipeline.reconcileNearDupFlags(
        deliveredDf, "doc_id", pairRows.toSeq.toDF("id_a", "id_b"))
      .select("doc_id", "is_near_dup").as[(Long, Boolean)].collect().toMap
    val batchDrops = TrainingDataPipeline.curate(
        Seq((10L, goodText), (5L, other), (4L, goodText + " tail"))
          .toDF("doc_id", "text"),
        "text", "doc_id")
      .filter(col("drop_reason") === "near_dup")
      .select("doc_id").as[Long].collect().toSet
    assert(reconciled.filter(_._2).keySet === batchDrops,
      s"reconciled ${reconciled.filter(_._2).keySet} vs batch $batchDrops")
    assert(batchDrops === Set(10L),
      "fixture must make the batch drop exactly the stream-missed id")
    // idempotent under replayed (duplicated) pair emissions
    val twice = TrainingDataPipeline.reconcileNearDupFlags(
        deliveredDf, "doc_id",
        (pairRows.toSeq ++ pairRows.toSeq).toDF("id_a", "id_b"))
      .select("doc_id", "is_near_dup").as[(Long, Boolean)].collect().toMap
    assert(twice === reconciled)
  }

  test("curateStreamNearDedup replays deliver the same flags (epoch-keyed fold)") {
    val sigDir = java.nio.file.Files
      .createTempDirectory("curate_flag_rp").toString + "/sigs"
    val inc = new graft.dedup.IncrementalNearDedup(spark, sigDir,
      minJaccard = 0.5)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
    val sink = TrainingDataPipeline.curateStreamNearDedup(
      "text", "doc_id", "ts", inc) { (annotated, epoch) =>
      seen ++= annotated.select("doc_id", "is_near_dup")
        .as[(Long, Boolean)].collect().map(x => (epoch, x._1, x._2))
    }
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val b1 = Seq((1L, goodText, t(1)), (3L, goodText + " tail", t(3)))
      .toDF("doc_id", "text", "ts")
    sink(b1, 0L)
    sink(b1, 0L) // checkpoint replay of the same epoch
    // the fold is exactly-once on the table; onBatch is at-least-once
    // with IDENTICAL flags on the replay
    assert(seen.filter(_._1 == 0L).toSet ===
      Set((0L, 1L, false), (0L, 3L, true)))
    assert(seen.size == 4 && seen.toSet.size == 2)
    assert(inc.corpusSignatures.get.count() == 2L)
  }

  test("streaming decisions agree with the batch front end") {
    val docs = Seq(
      (1L, goodText), (2L, "x"), (3L, goodText + " more words here"))
      .toDF("doc_id", "text")
    // the streaming front end intentionally omits near-dedup (a corpus
    // self-join is a batch compaction concern), so compare against the
    // batch decisions modulo the near_dup reason
    val batchKept = TrainingDataPipeline.curate(docs, "text", "doc_id")
      .filter(col("keep") || col("drop_reason") === "near_dup")
      .select("doc_id").as[Long].collect().toSet

    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val query = TrainingDataPipeline.curateStream(
        stream, "text", "doc_id", "ts", watermark = "10 seconds")
      .writeStream.format("memory").queryName("cs2")
      .outputMode(OutputMode.Append).start()
    input.addData((1L, goodText, new java.sql.Timestamp(1000)),
      (2L, "x", new java.sql.Timestamp(2000)),
      (3L, goodText + " more words here", new java.sql.Timestamp(3000)))
    query.processAllAvailable()
    query.stop()
    val streamKept = spark.table("cs2").select("doc_id").as[Long].collect().toSet
    assert(streamKept === batchKept)
  }

  test("curateStreamWithQuality applies the trained gate per-row in-stream") {
    import graft.ops.QualityFilter
    // separable vocabularies, both passing the language gate, each doc
    // unique (stopwords + distinct content rotation)
    def curated(i: Long): String =
      (0 until 40).map(w => Seq("the", "careful", "essay", "explains",
        "clearly", "with", "evidence", "and", "structure")((w.toInt + i.toInt) % 9))
        .mkString(" ") + s" marker$i"
    def crawl(i: Long): String =
      (0 until 40).map(w => Seq("you", "win", "the", "free", "casino",
        "bonus", "now", "and", "buy")((w.toInt + i.toInt) % 9))
        .mkString(" ") + s" marker$i"
    val model = QualityFilter.trainQualityModel(
      (0L until 40L).map(i => (i, curated(i))).toDF("doc_id", "text"),
      (0L until 40L).map(i => (i + 100, crawl(i))).toDF("doc_id", "text"),
      "text", "doc_id")

    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val query = TrainingDataPipeline.curateStreamWithQuality(
        stream, "text", "doc_id", "ts", model, alpha = 2.0,
        watermark = "10 seconds",
        cfg = TrainingDataPipeline.Config(minQuality = 0.0))
      .writeStream.format("memory").queryName("csq")
      .outputMode(OutputMode.Append).start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    input.addData(
      (200L until 240L).map(i => (i, curated(i), t(i))) ++
      (400L until 440L).map(i => (i, crawl(i), t(i))): _*)
    query.processAllAvailable()
    query.stop()
    val out = spark.table("csq")
    val kept = out.select("doc_id").as[Long].collect().toSet
    val curatedKept = kept.count(_ < 300L)
    val crawlKept = kept.count(_ >= 400L)
    // the trained gate tilts hard: reference-vocab docs mostly survive,
    // crawl-vocab docs mostly drop (alpha=2 keep prob ~0.9 at p≈1,
    // ~0.25 at p≈0)
    assert(curatedKept >= 30, s"curated kept $curatedKept/40")
    assert(crawlKept <= 18, s"crawl kept $crawlKept/40")
    assert(curatedKept > 2 * crawlKept, s"$curatedKept vs $crawlKept")
    // the classifier probability rides on the output stream
    assert(out.columns.contains("classifier_prob"))
    // streaming decisions ≡ the batch score+lottery on the same rows
    val batchDocs = ((200L until 240L).map(i => (i, curated(i))) ++
      (400L until 440L).map(i => (i, crawl(i)))).toDF("doc_id", "text")
    val batchKept = QualityFilter.paretoLotteryKeep(
        QualityFilter.scoreQuality(batchDocs, "text", "doc_id", model),
        "quality_prob", "doc_id", alpha = 2.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === batchKept)
  }
}

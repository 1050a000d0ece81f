package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

class NgramLmSpec extends SparkSuite {
  import spark.implicits._

  private val reference = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"))
    .toDF("doc_id", "text")

  test("train counts bigrams, contexts, vocab exactly") {
    val m = NgramLm.train(reference, "text")
    // "the cat","cat sat","sat on","on the","the mat" +
    // "the dog","dog sat","sat on","on the","the rug"
    val big = m.bigrams.as[(String, Long)].collect().toMap
    assert(big("sat on") === 2L && big("on the") === 2L)
    assert(big("the cat") === 1L && big("the rug") === 1L)
    assert(big.values.sum === 10L)
    val ctx = m.contexts.as[(String, Long)].collect().toMap
    // context counts are Σ_w2 c2: "the"→4 (cat,dog,mat?,rug? — mat/rug
    // end their docs, so "the" contexts are the cat/the dog/the mat/the rug)
    assert(ctx("the") === 4L)
    assert(ctx("sat") === 2L && ctx("on") === 2L)
    // V: the cat sat on mat dog rug = 7 distinct tokens
    assert(m.vocabSize === 7L)
  }

  test("score: hand-checked cross-entropy, OOV counts, short-doc contract") {
    val m = NgramLm.train(reference, "text")
    val docs = Seq(
      (10L, "the cat sat"),     // bigrams: "the cat"(c2=1,c1=4) "cat sat"(1,1)
      (11L, "purple elephants"),// one fully-OOV bigram
      (12L, "word"),            // no bigrams
      (13L, "")                 // no tokens at all
    ).toDF("doc_id", "text")
    val rows = NgramLm.score(docs, "text", "doc_id", m)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "n_oov_bigrams", "cross_entropy")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((10L, 2L, 0L), (11L, 1L, 1L), (12L, 0L, 0L), (13L, 0L, 0L)))
    val ce10 = rows(0)._4.get
    val expected10 = -(math.log(2.0 / 11.0) + math.log(2.0 / 8.0)) / 2.0
    assert(math.abs(ce10 - expected10) < 1e-12, s"$ce10 vs $expected10")
    // fully-OOV: (0+1)/(0+7) per bigram
    val ce11 = rows(1)._4.get
    assert(math.abs(ce11 - (-math.log(1.0 / 7.0))) < 1e-12)
    assert(rows(2)._4.isEmpty && rows(3)._4.isEmpty)
    // reference text itself scores lower (more likely) than OOV text
    assert(ce10 < ce11)
  }

  test("minCount prunes bigrams but keeps context normalization") {
    val m = NgramLm.train(reference, "text", minCount = 2L)
    assert(m.bigrams.count() === 2L) // only "sat on", "on the"
    // contexts still reflect the FULL reference ("the" → 4)
    assert(m.contexts.filter($"w1" === "the").as[(String, Long)].head()._2 === 4L)
  }

  test("filterByPerplexity keeps reference-like docs, gates the rest") {
    val m = NgramLm.train(reference, "text")
    val docs = Seq(
      (10L, "the cat sat on the rug"),
      (11L, "zz yy xx ww vv uu"),
      (12L, "one")
    ).toDF("doc_id", "text")
    val kept = NgramLm.filterByPerplexity(docs, "text", "doc_id", m,
        maxCrossEntropy = 1.7)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(10L, 12L)) // short doc passes by default
    val strict = NgramLm.filterByPerplexity(docs, "text", "doc_id", m,
        maxCrossEntropy = 1.7, keepShort = false)
      .select("doc_id").as[Long].collect().toSet
    assert(strict === Set(10L))
  }

  test("curateWithPerplexity: audit reason, precedence, short-doc pass") {
    import graft.pipelines.TrainingDataPipeline
    // reference-vocab docs (with per-doc unique prefixes so dedup stages
    // don't collapse them) vs gibberish docs; one too-short doc
    def refLike(i: Long): String =
      (0 until 8).map(w => s"u${i}x$w").mkString(" ") +
        " the cat sat on the mat and the dog sat on the rug"
    def gibberish(i: Long): String =
      (0 until 20).map(w => s"g${i}z$w").mkString(" ") + " the and on"
    val docs = ((0L until 10L).map(i => (i, refLike(i))) ++
        (100L until 110L).map(i => (i, gibberish(i))) ++
        Seq((999L, "too short")))
      .toDF("doc_id", "text")
    val out = TrainingDataPipeline.curateWithPerplexity(
        // refLike ce ≈ 1.67 (mixed in-model/OOV bigrams), gibberish
        // ≈ 1.97 (≈ the ln(V)=1.95 OOV ceiling — V is tiny here)
        docs, "text", "doc_id", reference, maxCrossEntropy = 1.8,
        cfg = TrainingDataPipeline.Config(minQuality = 0.0))
      .localCheckpoint()
    assert(out.filter($"doc_id" === 999L)
      .select("drop_reason").as[String].head() === "length")
    // gibberish docs (mostly OOV bigrams → ce near ln V) drop as
    // perplexity; reference-like docs keep
    val dropped = out.filter($"drop_reason" === "perplexity")
      .select("doc_id").as[Long].collect().toSet
    assert(dropped.forall(_ >= 100L), s"only gibberish should drop: $dropped")
    assert(dropped.size >= 8, s"most gibberish docs should drop: $dropped")
    assert(out.filter($"keep" && $"doc_id" < 10L).count() >= 8L)
    // audit column rides along for every scored survivor
    assert(out.filter($"drop_reason" === "perplexity" &&
      $"lm_cross_entropy".isNull).count() === 0L)
  }

  test("scoreCounts: exact integer sums, OOV and short-doc contracts") {
    val m = NgramLm.train(reference, "text")
    val docs = Seq(
      (10L, "the cat sat"),   // "the cat"(c2=1,c1=4) "cat sat"(c2=1,c1=1)
      (11L, "the zebra sat"), // both bigrams OOV; ctx "the"=4, "zebra" absent
      (12L, "hello"))         // no bigrams → NULL-sums row survives
      .toDF("doc_id", "text")
    val out = NgramLm.scoreCounts(docs, "text", "doc_id", m)
      .select("doc_id", "n_bigrams", "n_oov_bigrams", "sum_num", "sum_den")
      .collect().map(r => r.getLong(0) -> r).toMap
    // V=7: sum_num = Σ(c2+1), sum_den = Σ(c1+V)
    val r10 = out(10L)
    assert((r10.getLong(1), r10.getLong(2), r10.getLong(3), r10.getLong(4))
      === ((2L, 0L, 4L, 19L)))
    val r11 = out(11L)
    assert((r11.getLong(1), r11.getLong(2), r11.getLong(3), r11.getLong(4))
      === ((2L, 2L, 2L, 18L)))
    val r12 = out(12L)
    assert(r12.getLong(1) === 0L && r12.isNullAt(3) && r12.isNullAt(4))
  }

  test("scoring plan: model joins broadcast, no shuffle on a token key") {
    val m = NgramLm.train(reference, "text")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = NgramLm.score(docs, "text", "doc_id", m)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), s"model joins must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized token-key shuffle join:\n$plan")
  }
}

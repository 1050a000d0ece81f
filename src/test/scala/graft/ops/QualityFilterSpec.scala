package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class QualityFilterSpec extends SparkSuite {
  import spark.implicits._

  // separable vocabularies: "curated" docs draw from one word set,
  // "crawl" docs from another, with deterministic variety per doc
  private def curated(i: Long): String =
    (0 until 30).map(w => Seq("the", "careful", "essay", "explains",
      "clearly", "with", "evidence", "and", "structure")((w.toInt + i.toInt) % 9))
      .mkString(" ")
  private def crawl(i: Long): String =
    (0 until 30).map(w => Seq("click", "buy", "now", "cheap", "winner",
      "casino", "free", "pills", "deal")((w.toInt + i.toInt) % 9))
      .mkString(" ")

  private def model = QualityFilter.trainQualityModel(
    (0L until 40L).map(i => (i, curated(i))).toDF("doc_id", "text"),
    (0L until 40L).map(i => (i + 100, crawl(i))).toDF("doc_id", "text"),
    "text", "doc_id")

  test("held-out docs from each vocabulary separate cleanly") {
    val m = model
    val held = ((50L until 60L).map(i => (i, curated(i), 1.0)) ++
        (150L until 160L).map(i => (i, crawl(i), 0.0)))
      .toDF("doc_id", "text", "truth")
    val scored = QualityFilter.scoreQuality(held, "text", "doc_id", m)
      .join(held.select("doc_id", "truth"), "doc_id")
      .select("truth", "quality_prob").as[(Double, Double)].collect()
    val correct = scored.count { case (truth, p) =>
      (truth == 1.0 && p > 0.5) || (truth == 0.0 && p < 0.5) }
    assert(correct >= 18, s"held-out accuracy ${correct}/20 too low")
    // probabilities, not raw scores
    assert(scored.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
  }

  test("corpus scoring is map-only literal codegen (no Exchange, no MLlib)") {
    val m = model
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = QualityFilter.scoreQuality(docs, "text", "doc_id", m)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"),
      s"scoring must be map-only:\n$plan")
    assert(!plan.toLowerCase.contains("logisticregression"),
      "the fitted model must collapse to literals, not an MLlib transform")
  }

  test("curateWithQuality: lottery drops audit as quality_lottery, earlier reasons win") {
    import graft.pipelines.TrainingDataPipeline
    // Corpus shaped like the real use case: crawl docs dominate (the
    // internally-sampled negatives are then mostly true negatives), both
    // vocabularies carry stopwords so the language gate passes, and every
    // doc gets a globally-unique token prefix so neither exact nor
    // near-dedup collapses a class (pure rotations differ only in phase —
    // same bigram multiset, Jaccard ≈ 1). One doc fails the length gate.
    def crawlEn(i: Long): String =
      (0 until 30).map(w => Seq("you", "win", "the", "free", "casino",
        "bonus", "now", "and", "buy")((w.toInt + i.toInt) % 9))
        .mkString(" ")
    def uniq(i: Long): String =
      (0 until 10).map(w => s"u${i}x$w").mkString(" ")
    val docs = ((0L until 20L).map(i => (i, uniq(i) + " " + curated(i))) ++
        (200L until 300L).map(i => (i, uniq(i) + " " + crawlEn(i))) ++
        Seq((999L, "too short")))
      .toDF("doc_id", "text")
    val reference = (500L until 540L).map(i => (i, curated(i)))
      .toDF("doc_id", "text")
    def run() = TrainingDataPipeline.curateWithQuality(
        docs, "text", "doc_id", reference, alpha = 2.0,
        cfg = TrainingDataPipeline.Config(minQuality = 0.0))
      .localCheckpoint()
    val out = run()
    // earlier-stage reason is preserved, not overwritten by the lottery
    val short = out.filter($"doc_id" === 999L)
      .select("drop_reason").as[String].head()
    assert(short === "length")
    // every curation SURVIVOR carries a classifier probability (docs
    // dropped by earlier stages were never scored)
    assert(out.filter(($"keep" || $"drop_reason" === "quality_lottery") &&
      $"classifier_prob".isNull).count() === 0L)
    // the lottery tilts: crawl-vocab docs are dropped as quality_lottery
    // at a much higher rate than curated-vocab docs (alpha=2 keep prob is
    // (1 + (1-p))^-2: ~0.9 at p≈0.95, ~0.25 at p≈0)
    def lotteryDrops(lo: Long, hi: Long) = out.filter(
      $"doc_id" >= lo && $"doc_id" < hi && $"drop_reason" === "quality_lottery")
      .count()
    val curatedDrops = lotteryDrops(0L, 20L)
    val crawlDrops = lotteryDrops(200L, 300L)
    assert(curatedDrops <= 7,
      s"lottery should mostly keep reference-like docs: curated=$curatedDrops/20")
    assert(crawlDrops >= 55,
      s"lottery should mostly drop crawl docs: crawl=$crawlDrops/100")
    // determinism: same inputs → same keep set
    assert(run().filter($"keep").select("doc_id").as[Long].collect().toSet ===
      out.filter($"keep").select("doc_id").as[Long].collect().toSet)
  }

  test("pareto lottery is deterministic, tilts by score, keeps some tail") {
    val scored = ((0L until 300L).map(i => (i, 0.9)) ++
        (1000L until 1300L).map(i => (i, 0.05)))
      .toDF("doc_id", "quality_prob")
    def kept() = QualityFilter.paretoLotteryKeep(
        scored, "quality_prob", "doc_id", alpha = 9.0)
      .select("doc_id").as[Long].collect().toSet
    val k1 = kept()
    assert(k1 === kept(), "lottery must be replay-stable")
    val hi = k1.count(_ < 1000L)
    val lo = k1.count(_ >= 1000L)
    // alpha=9: P[keep | 0.9] = P[pareto > 0.1] ~ 0.42; P[keep | 0.05] ~ 0.62^9 ~ 0.013
    assert(hi > 60 && hi < 220, s"high-score keep count $hi out of band")
    assert(lo < 30, s"low-score keep count $lo out of band")
    assert(hi.toDouble / 300 > 5 * (lo.toDouble / 300),
      "keep rate must tilt strongly toward high scores")
    // score >= 1 always keeps (pareto draw is > 0)
    val certain = QualityFilter.paretoLotteryKeep(
        Seq((1L, 1.0)).toDF("doc_id", "quality_prob"),
        "quality_prob", "doc_id")
      .count()
    assert(certain === 1L)
  }

  test("lotteryKeepExactExpr: integer decision ≡ float rule away from ulp boundaries") {
    import org.apache.spark.sql.functions.col
    val ids = spark.range(0, 5000).select(col("id").as("doc_id"),
      (col("id") % 100).cast("int").as("k"))
    val both = ids.select(col("doc_id"), col("k"),
      QualityFilter.lotteryKeepExactExpr(col("k"), col("doc_id"), alpha = 9)
        .as("exact_keep"),
      QualityFilter.lotteryKeepExpr(
          col("k").cast("double") / 100.0, col("doc_id"), alpha = 9.0)
        .as("float_keep"))
    // the exact form is the float rule with pow() eliminated; on 5000
    // md5 draws no id lands within a pow-ulp of the keep boundary, so
    // the decisions agree row for row
    assert(both.filter(col("exact_keep") =!= col("float_keep")).count() === 0L)
    // tilt survives the substrate change: k=99 keeps far more than k=0
    val kept = both.filter(col("exact_keep")).groupBy("k").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse(99, 0L) > 35L, s"k=99 keep ~91%: ${kept.get(99)}")
    assert(kept.getOrElse(0, 0L) < 5L, s"k=0 keep ~0.2%: ${kept.get(0)}")
  }

  test("lotteryKeepExactExpr rejects fractional and out-of-range scores loudly") {
    import org.apache.spark.sql.functions.col
    // the likely misuse: the sibling API's 0..1 float score would
    // silently truncate to 0/1 — must raise instead
    val floats = Seq((1L, 0.57), (2L, 0.9)).toDF("doc_id", "p")
    val e1 = intercept[Exception] {
      floats.filter(QualityFilter.lotteryKeepExactExpr(col("p"), col("doc_id")))
        .count()
    }
    assert(e1.getMessage != null)
    val big = Seq((1L, 250)).toDF("doc_id", "k")
    intercept[Exception] {
      big.filter(QualityFilter.lotteryKeepExactExpr(col("k"), col("doc_id")))
        .count()
    }
    // in-domain integer-valued doubles pass (0.0/100.0 are 0%/100%)
    val ok = Seq((1L, 100.0), (2L, 0.0)).toDF("doc_id", "k")
    val kept = ok.filter(
        QualityFilter.lotteryKeepExactExpr(col("k"), col("doc_id")))
      .count()
    assert(kept === 1L) // k=100 keeps (q=1), k=0 almost surely drops
    // a NULL score propagates (row drops in the filter) instead of
    // aborting the job — the unscorable-doc contract of the float sibling
    val withNull = Seq((1L, Some(100)), (2L, None))
      .toDF("doc_id", "k")
    assert(withNull.filter(
        QualityFilter.lotteryKeepExactExpr(col("k"), col("doc_id")))
      .select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("paretoLotteryDiagnostics: kept column ≡ the filter's keep set, substrate consistent") {
    import org.apache.spark.sql.functions.col
    val scored = spark.range(0, 3000).select(col("id").as("doc_id"),
      (col("id") % 100).cast("int").as("k"))
    val diag = QualityFilter.paretoLotteryDiagnostics(
      scored, "k", "doc_id", alpha = 9)
    assert(diag.schema.fields.map(f => f.name -> f.dataType.typeName).toSeq ===
      Seq("doc_id" -> "long", "k" -> "long", "m" -> "long",
          "quotient" -> "long", "kept" -> "long"))
    assert(diag.count() === 3000L, "diagnostics cover ALL docs, unfiltered")
    val keptSet = diag.filter(col("kept") === 1L)
      .select("doc_id").as[Long].collect().toSet
    val filterSet = QualityFilter.paretoLotteryKeepExact(
        scored, "k", "doc_id", alpha = 9)
      .select("doc_id").as[Long].collect().toSet
    assert(keptSet === filterSet,
      "diagnostic kept must be the same decision as the filter")
    // substrate identity: kept ⟺ 16^15 − m <= quotient, and m in [0, 16^15)
    val bad = diag.filter(
      (col("kept") === 1L) =!= (lit(1152921504606846976L) - col("m") <= col("quotient"))
        || col("m") < 0L || col("m") >= 1152921504606846976L).count()
    assert(bad === 0L)
    // NULL score → NULL substrate row, not a dropped row
    val withNull = Seq((1L, Some(50)), (2L, None)).toDF("doc_id", "k")
    val nd = QualityFilter.paretoLotteryDiagnostics(withNull, "k", "doc_id")
    assert(nd.count() === 2L)
    assert(nd.filter(col("doc_id") === 2L && col("kept").isNull).count() === 1L)
  }

  test("paretoLotteryDiagnostics is id-type-generic like its siblings") {
    // string ids must flow through un-cast (an id->long cast would null
    // them, or throw under ANSI) and make the SAME decision as the
    // filter path keyed on the same ids
    val scored = (0 until 200)
      .map(i => (s"doc-$i", i % 100)).toDF("doc_id", "k")
    val diag = QualityFilter.paretoLotteryDiagnostics(scored, "k", "doc_id")
    assert(diag.schema("doc_id").dataType ===
      org.apache.spark.sql.types.StringType)
    val keptSet = diag.filter(col("kept") === 1L)
      .select("doc_id").as[String].collect().toSet
    val filterSet = QualityFilter.paretoLotteryKeepExact(
        scored, "k", "doc_id")
      .select("doc_id").as[String].collect().toSet
    assert(keptSet === filterSet && keptSet.nonEmpty)
  }
}

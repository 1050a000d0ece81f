package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Span-corruption contracts: reconstruction identity, determinism,
  * sentinel numbering, rate behavior, edge docs, map-only plan. */
class SpanCorruptionSpec extends SparkSuite {
  import spark.implicits._

  private def toks(n: Int): Array[String] =
    Array.tabulate(n)(i => s"t$i")

  test("reconstruction identity on many docs and seeds") {
    for (seed <- Seq(1L, 42L); n <- Seq(0, 1, 5, 40, 300)) {
      val t = toks(n)
      val (in, tgt) = SpanCorruption.corruptTokens(t, seed, s"d$n",
        corruptRate = 0.15, meanSpanLen = 3)
      assert(SpanCorruption.reconstruct(in, tgt).toSeq == t.toSeq,
        s"seed=$seed n=$n")
      // targets end with the terminator sentinel
      assert(tgt.last.startsWith("<extra_id_"))
    }
  }

  test("masking is deterministic and seed-sensitive") {
    val t = toks(200)
    val a = SpanCorruption.corruptTokens(t, 7L, "d", 0.15, 3)
    val b = SpanCorruption.corruptTokens(t, 7L, "d", 0.15, 3)
    val c = SpanCorruption.corruptTokens(t, 8L, "d", 0.15, 3)
    assert(a._1.toSeq == b._1.toSeq && a._2.toSeq == b._2.toSeq)
    assert(a._1.toSeq != c._1.toSeq)
  }

  test("sentinels are consecutively numbered and never overlap") {
    val (in, tgt) = SpanCorruption.corruptTokens(toks(500), 3L, "d", 0.3, 3)
    val sentinelsIn = in.filter(_.startsWith("<extra_id_"))
    assert(sentinelsIn.nonEmpty)
    sentinelsIn.zipWithIndex.foreach { case (s, k) =>
      assert(s == s"<extra_id_$k>")
    }
    // target sentinel sequence mirrors the input's plus the terminator
    assert(tgt.filter(_.startsWith("<extra_id_")).toSeq ==
      sentinelsIn.toSeq :+ s"<extra_id_${sentinelsIn.length}>")
  }

  test("corrupted-token fraction tracks the rate") {
    val t = toks(5000)
    val (in, _) = SpanCorruption.corruptTokens(t, 11L, "d", 0.15, 3)
    val kept = in.count(!_.startsWith("<extra_id_"))
    val corrupted = (t.length - kept).toDouble / t.length
    assert(corrupted > 0.08 && corrupted < 0.25, s"fraction $corrupted")
  }

  test("adjacent spans merge into ONE sentinel (the T5 contract)") {
    // inputs must never hold two consecutive sentinels — contiguous
    // noise runs are one span in T5's noise_span_to_unique_sentinel
    var sawMerge = false
    val maxSingle = 2 * 3 - 1 // longest single span at meanSpanLen=3
    for (seed <- 1L to 40L) {
      val t = toks(400)
      val (in, tgt) = SpanCorruption.corruptTokens(t, seed, "d", 0.3, 3)
      in.sliding(2).foreach { w =>
        assert(!(w.length == 2 && w.forall(_.startsWith("<extra_id_"))),
          s"seed=$seed: consecutive sentinels in inputs")
      }
      assert(SpanCorruption.reconstruct(in, tgt).toSeq == t.toSeq)
      // a target span longer than any single draw proves a merge ran
      var cur = 0
      tgt.foreach { x =>
        if (x.startsWith("<extra_id_")) {
          if (cur > maxSingle) sawMerge = true; cur = 0
        } else cur += 1
      }
    }
    assert(sawMerge, "no seed in 1..40 exercised the merge path")
  }

  test("Spark frame: map-only, reconstruction holds corpus-wide") {
    val docs = (0L until 50L).map(id =>
      (id, Array.tabulate(20 + (id % 30).toInt)(i => s"w${id}_$i")))
      .toDF("doc_id", "tokens")
    val out = SpanCorruption.corruptDocs(spark, docs, "tokens", "doc_id",
      seed = 5L)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val joined = out.join(docs, "doc_id").collect()
    joined.foreach { r =>
      val in = r.getSeq[String](r.fieldIndex("inputs")).toArray
      val tgt = r.getSeq[String](r.fieldIndex("targets")).toArray
      val orig = r.getSeq[String](r.fieldIndex("tokens")).toArray
      assert(SpanCorruption.reconstruct(in, tgt).toSeq == orig.toSeq)
      assert(r.getInt(r.fieldIndex("n_spans")) ==
        in.count(_.startsWith("<extra_id_")))
    }
  }
}

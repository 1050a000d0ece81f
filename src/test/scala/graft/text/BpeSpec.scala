package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("trainOnTable learns the classic toy merges deterministically") {
    // Sennrich-style fixture: {low:5, lower:2, newest:6, widest:3}
    val table = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainOnTable(table, 4)
    // pair counts round 1: (e,s)=9, (s,t</w>)=9, (w,e)=8(newest 6 + widest... )
    // deterministic tie-break: (e,s) beats (s,t</w>) lexicographically
    assert(merges(0) === ("e", "s"))
    assert(merges(1) === ("es", "t</w>"))
    // then (l,o)=7 from low+lower
    assert(merges(2) === ("l", "o"))
    assert(merges.length === 4)
  }

  test("encodeWord applies merges greedily by rank; unseen words fall to chars") {
    val model = Bpe.BpeModel(Array(("e", "s"), ("es", "t</w>"), ("l", "o"),
      ("lo", "w</w>")))
    assert(model.encodeWord("low") === Seq("low</w>"))
    assert(model.encodeWord("newest") === Seq("n", "e", "w", "est</w>"))
    assert(model.encodeWord("zzz") === Seq("z", "z", "z</w>"))
    assert(model.encodeWord("") === Seq.empty)
  }

  test("corpus-trained model encodes distributed, count matches array length") {
    val docs = (0L until 200L).map { i =>
      (i, Seq("low", "lower", "newest", "widest", "new", "wide")
        .drop((i % 3).toInt).mkString(" "))
    }.toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 20)
    // the tiny vocabulary exhausts its mergeable pairs before 20 rounds —
    // training stops early rather than padding
    assert(model.merges.length >= 10 && model.merges.length <= 20)
    val out = Bpe.encodeDocs(docs, "text", "doc_id", model).localCheckpoint()
    // count column ≡ token array length, row for every doc
    assert(out.count() === 200L)
    assert(out.filter(size(col("bpe_tokens")) =!= col("n_bpe_tokens"))
      .count() === 0L)
    // common whole words compress to single tokens under 20 merges
    val toks = out.filter($"doc_id" === 0L)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(toks.contains("low</w>") || toks.contains("newest</w>"),
      s"expected whole-word tokens, got $toks")
    // every token sequence reassembles to the original text (lossless)
    val reassembled = out.join(docs, "doc_id")
      .select(col("doc_id"),
        regexp_replace(concat_ws("", col("bpe_tokens")),
          lit("</w>"), lit(" ")).as("rt"),
        col("text"))
      .withColumn("rt", trim(col("rt")))
      .filter(col("rt") =!= trim(regexp_replace(col("text"), lit(" +"), lit(" "))))
    assert(reassembled.count() === 0L, "BPE must be lossless")
  }

  test("encoding plan is map-only (native expression inside the scan)") {
    val model = Bpe.BpeModel(Array(("e", "s"), ("l", "o")))
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = Bpe.encodeDocs(docs, "text", "doc_id", model)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"), s"encoding must be map-only:\n$plan")
    assert(plan.contains("graft_bpe"), s"native expression must appear:\n$plan")
  }

  test("null and whitespace-only text: zero tokens, no crash") {
    // word-final symbols carry </w>, so a merge reaching the last char
    // must name it explicitly — ("a","b") alone would never fire on "ab"
    val model = Bpe.BpeModel(Array(("a", "b</w>")))
    val docs = Seq((1L, null: String), (2L, "   "), (3L, "ab"))
      .toDF("doc_id", "text")
    val out = Bpe.encodeDocs(docs, "text", "doc_id", model)
      .orderBy("doc_id")
      .select("n_bpe_tokens").as[Option[Long]].collect()
    assert(out === Seq(None, Some(0L), Some(1L)))
  }
}

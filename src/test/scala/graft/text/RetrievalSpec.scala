package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  // N=3 docs, S=9 tokens, avgdl=3; df(a)=df(b)=df(c)=2
  private def docs = Seq(
    (1L, "a b a"),
    (2L, "a c"),
    (3L, "b b b c")).toDF("doc_id", "text")

  private val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5)) // all terms
  private def tfNorm(tf: Double, dl: Double): Double =
    tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))

  test("buildIndex postings carry tf and dl; stats count the corpus") {
    val (post, stats) = Retrieval.buildIndex(docs, "text", "doc_id")
    val rows = post.select("term", "doc_id", "tf", "dl")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(rows === Set(
      ("a", 1L, 2L, 3L), ("b", 1L, 1L, 3L),
      ("a", 2L, 1L, 2L), ("c", 2L, 1L, 2L),
      ("b", 3L, 3L, 4L), ("c", 3L, 1L, 4L)))
    assert(stats.as[(Long, Long)].head() === ((3L, 9L)))
  }

  test("docFrequencies and tfidf match the hand computation") {
    val (post, _) = Retrieval.buildIndex(docs, "text", "doc_id")
    val dfs = Retrieval.docFrequencies(post)
      .as[(String, Long)].collect().toMap
    assert(dfs === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    val w = Retrieval.tfidf(docs, "text", "doc_id")
      .filter(col("doc_id") === 1 && col("term") === "a")
      .select("tfidf").as[Double].head()
    assert(math.abs(w - 2.0 * math.log(3.0 / 2.0)) < 1e-12)
  }

  test("bm25TopK ranks by the hand-computed scores") {
    val queries = Seq((7L, "a b")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id",
        queries, "qid", "qtext", k = 3)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(out.map(r => (r._2, r._4)).toSeq === Seq((1L, 1L), (3L, 2L), (2L, 3L)))
    val expected1 = idf * (tfNorm(2, 3) + tfNorm(1, 3))
    assert(math.abs(out(0)._3 - expected1) < 1e-12)
    val expected3 = idf * tfNorm(3, 4)
    assert(math.abs(out(1)._3 - expected3) < 1e-12)
  }

  test("duplicate query terms count once; unknown terms score nothing") {
    val queries = Seq((1L, "a a a"), (2L, "zzz")).toDF("qid", "qtext")
    val (post, stats) = Retrieval.buildIndex(docs, "text", "doc_id")
    val scored = Retrieval.bm25Scores(post, stats, queries, "qid", "qtext")
    val s1 = scored.filter(col("query_id") === 1 && col("doc_id") === 1)
      .select("score").as[Double].head()
    assert(math.abs(s1 - idf * tfNorm(2, 3)) < 1e-12)
    assert(scored.filter(col("query_id") === 2).isEmpty)
  }

  test("empty documents index to no postings but count in the stats") {
    val withEmpty = docs.unionByName(Seq((9L, "")).toDF("doc_id", "text"))
    val (post, stats) = Retrieval.buildIndex(withEmpty, "text", "doc_id")
    assert(post.filter(col("doc_id") === 9).isEmpty)
    assert(stats.as[(Long, Long)].head() === ((4L, 9L)))
  }

  test("top-k truncates per query independently") {
    val queries = Seq((1L, "a"), (2L, "b")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id",
        queries, "qid", "qtext", k = 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    // query a: d1 (tf 2) wins; query b: d3 (tf 3, but longer) vs d1 —
    // tfNorm(3,4)=1.4667 > tfNorm(1,3)=1.0, so d3 wins
    assert(out === Set((1L, 1L), (2L, 3L)))
  }

  test("tfidfExact: hand-computed ppm weights; ordering agrees with the ln form on df-distinct terms") {
    // df(a)=3, df(b)=2, df(c)=1 — strictly distinct dfs, so both the
    // ppm-rational idf proxy and ln(n/df) induce strict (and equal) orders
    val d = Seq((1L, "a b c"), (2L, "a b"), (3L, "a")).toDF("doc_id", "text")
    val w = Retrieval.tfidfExact(d, "text", "doc_id")
      .filter(col("doc_id") === 1)
      .select("term", "w").as[(String, Long)].collect().toMap
    // tf=1 each; w = (1e6 * 3) div df
    assert(w === Map("a" -> 1000000L, "b" -> 1500000L, "c" -> 3000000L))
    val lnW = Retrieval.tfidf(d, "text", "doc_id")
      .filter(col("doc_id") === 1)
      .select("term", "tfidf").as[(String, Double)].collect().toMap
    assert(w.toSeq.sortBy(_._2).map(_._1) === lnW.toSeq.sortBy(_._2).map(_._1))
  }

  test("bm25TermScoresExact: hand-computed ppm integers; bm25TopKExact rank agrees with the float ranker here") {
    val queries = Seq((7L, "a b")).toDF("qid", "qtext")
    val (post, stats) = Retrieval.buildIndex(docs, "text", "doc_id")
    val s = Retrieval.bm25TermScoresExact(post, stats, queries, "qid", "qtext")
      .select("doc_id", "term", "s_int").as[(Long, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // idf_ppm = (1e6*(2*3-2*2+1)) div (2*2+1) = 600000 for both terms;
    // tfnorm_ppm = (1e6*22*tf*9) div (90*tf + 27 + 9*dl*3)
    assert(s((1L, "a")) === 600000L * 1375000L) // tf=2, dl=3
    assert(s((1L, "b")) === 600000L * 1000000L) // tf=1, dl=3
    assert(s((2L, "a")) === 600000L * 1157894L) // tf=1, dl=2 (floor div)
    assert(s((3L, "b")) === 600000L * 1466666L) // tf=3, dl=4 (floor div)
    val ranks = Retrieval.bm25TopKExact(docs, "text", "doc_id",
        queries, "qid", "qtext", k = 3)
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    // same order the float bm25TopK test pins: 1, 3, 2
    assert(ranks === Map(1L -> 1L, 3L -> 2L, 2L -> 3L))
  }

  test("exact-substrate Long products overflow LOUDLY under ANSI, never wrap") {
    // tf * n_tokens past ~4.2e11 exceeds Long range inside
    // 1e6*22*tf*n_tokens; ANSI mode (the session default) must throw,
    // not silently produce a wrapped score
    val post = Seq(("a", 1L, 10000000L, 100L)).toDF("term", "doc_id", "tf", "dl")
    val stats = Seq((1000000L, 100000000000L)).toDF("n_docs", "n_tokens")
    val queries = Seq((1L, "a")).toDF("qid", "qtext")
    val e = intercept[Throwable] {
      Retrieval.bm25TermScoresExact(post, stats, queries, "qid", "qtext").collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(t =>
      t.isInstanceOf[ArithmeticException] ||
        Option(t.getMessage).exists(_.toLowerCase.contains("overflow"))))
  }
}

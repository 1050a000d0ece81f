package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Unigram-LM tokenizer contracts: EM monotonicity on a fixed
  * vocabulary, Viterbi segmentation of an obviously-compositional
  * corpus, losslessness incl. out-of-alphabet UNK fallback, vocabulary
  * bounds, determinism, and the map-only encode plan. */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  private val toyTable: Array[(String, Long)] = Array(
    ("abab", 50L), ("ababab", 30L), ("abba", 5L), ("baba", 8L), ("cd", 12L))

  test("EM log-likelihood is non-decreasing on a fixed vocabulary") {
    // vocab large enough that nothing is pruned: one EM block + the
    // final pass, all on the same piece set
    val (_, lls) = Unigram.trainOnTable(toyTable, vocabSize = 1000,
      maxPieceLen = 4, emIters = 4)
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"log-likelihood decreased: $lls")
    }
  }

  test("compositional corpus: 'ab' dominates and Viterbi uses it") {
    val (model, _) = Unigram.trainOnTable(toyTable, vocabSize = 8,
      maxPieceLen = 3, emIters = 3)
    val probs = model.pieces.toMap
    // 'ab' must be in the vocabulary and outscore 'ba'
    assert(probs.contains("ab"))
    assert(!probs.contains("ba") || probs("ab") > probs("ba"))
    assert(model.encodeWord("ababab") == Seq("ab", "ab", "ab"))
    // lossless on every training word
    toyTable.foreach { case (w, _) =>
      assert(model.encodeWord(w).mkString == w, w)
    }
  }

  test("vocabulary bound holds; single chars always survive pruning") {
    val (model, _) = Unigram.trainOnTable(toyTable, vocabSize = 6,
      maxPieceLen = 4, emIters = 2)
    val chars = toyTable.flatMap(_._1.toCharArray).map(_.toString).distinct
    assert(model.pieces.length <= math.max(6, chars.length) + chars.length)
    chars.foreach(c => assert(model.pieces.exists(_._1 == c), s"char $c"))
  }

  test("UNK fallback: out-of-alphabet chars encode lossless at floor score") {
    val (model, _) = Unigram.trainOnTable(toyTable, vocabSize = 8,
      maxPieceLen = 3, emIters = 2)
    assert(model.encodeWord("abxzab").mkString == "abxzab")
    assert(model.encodeWord("abxzab").contains("x"))
    // a real piece always beats an UNK of the same span
    assert(model.encodeWord("ab") == Seq("ab"))
  }

  test("training is deterministic") {
    val (m1, _) = Unigram.trainOnTable(toyTable, vocabSize = 8,
      maxPieceLen = 3, emIters = 3)
    val (m2, _) = Unigram.trainOnTable(toyTable, vocabSize = 8,
      maxPieceLen = 3, emIters = 3)
    assert(m1.pieces.toSeq == m2.pieces.toSeq)
  }

  test("Spark pipeline: train on a frame, encode map-only, lossless") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cats sat there"),
      (3L, "that cat is the cat"), (4L, "sat that hat"),
      (5L, "the thesis rests"))
      .toDF("doc_id", "text")
    val model = Unigram.train(docs, "text", vocabSize = 40,
      maxWords = 100, emIters = 2)
    val enc = Unigram.encodeDocs(docs, "text", "doc_id", model)
      .join(docs, "doc_id")
      .select(col("doc_id"),
        (concat_ws("", col("uni_tokens")) ===
          regexp_replace(col("text"), " +", "")).as("lossless"),
        col("n_uni_tokens"),
        size(split(trim(col("text")), " +")).cast("long").as("n_words"))
      .collect()
    enc.foreach { r =>
      assert(r.getBoolean(1), s"doc ${r.getLong(0)} not lossless")
      assert(r.getLong(2) >= r.getLong(3), "fewer tokens than words")
    }
    // encode plan stays map-only: no exchange, no join
    val plan = Unigram.encodeDocs(docs, "text", "doc_id", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

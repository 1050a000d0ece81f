package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

class WordPieceSpec extends SparkSuite {
  import spark.implicits._

  test("trainOnTable: the published likelihood example picks ##gs first") {
    // the HF tokenizers course fixture: {hug:10, pug:5, pun:12, bun:4,
    // hugs:5}. Pair frequencies all involve ##u (freq 36) except
    // (##g,##s): 5/(20*5) = 1/20 beats every 1/36 — the first merged
    // token is ##gs, exactly as the published walkthrough derives.
    val table = Array(("hug", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hugs", 5L))
    val vocab = WordPiece.trainOnTable(table, 8)
    // alphabet first (sorted), then the merge
    assert(vocab.take(7).toSeq ===
      Seq("##g", "##n", "##s", "##u", "b", "h", "p"))
    assert(vocab(7) === "##gs")
  }

  test("trainOnTable: exact-score ties break pair-lexicographically") {
    // after ##gs, every remaining pair scores exactly 1/36 — the
    // winner must be the lexicographically smallest pair (##u,##g),
    // i.e. BigInt cross-multiplication finds the tie a double would too,
    // and the tie-break is deterministic
    val table = Array(("hug", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hugs", 5L))
    val vocab = WordPiece.trainOnTable(table, 9)
    assert(vocab(8) === "##ug")
  }

  test("encodeWord: greedy longest-match-first with ## continuations") {
    val m = WordPiece.WpModel(Array("ab", "##c", "a", "##b", "##bc"))
    assert(m.encodeWord("abc") === Seq("ab", "##c"))
    assert(m.encodeWord("a") === Seq("a"))
    assert(m.encodeWord("") === Seq.empty)
    // greedy, NOT optimal: "ab" wins the prefix, leaving "##c"; with
    // no "##c" in vocab the word collapses to [UNK] even though
    // a + ##bc segments it — the documented MaxMatch semantics
    val m2 = WordPiece.WpModel(Array("ab", "a", "##bc"))
    assert(m2.encodeWord("abc") === Seq("[UNK]"))
  }

  test("encodeWord: unmatched and over-length words collapse to one unk") {
    val m = WordPiece.WpModel(Array("h", "##i"), maxCharsPerWord = 10)
    assert(m.encodeWord("hi") === Seq("h", "##i"))
    assert(m.encodeWord("ho") === Seq("[UNK]"))
    assert(m.encodeWord("h" * 11) === Seq("[UNK]"))
    // within the cap but no ##h continuation: the whole word is unk
    assert(m.encodeWord("h" * 10) === Seq("[UNK]"))
    val m3 = WordPiece.WpModel(Array("h", "##h"), maxCharsPerWord = 10)
    assert(m3.encodeWord("h" * 10) === "h" +: Seq.fill(9)("##h"))
  }

  test("consistent: holds with UNKs, rejects wrong streams") {
    val m = WordPiece.WpModel(Array("hug", "##s", "h"))
    assert(WordPiece.consistent(Seq("hug", "hugs"),
      Seq("hug", "hug", "##s"), m))
    assert(WordPiece.consistent(Seq("hug", "zq"),
      Seq("hug", "[UNK]"), m))
    // missing tokens, extra tokens, wrong spelling all rejected
    assert(!WordPiece.consistent(Seq("hug", "hugs"), Seq("hug"), m))
    assert(!WordPiece.consistent(Seq("hug"), Seq("hug", "##s"), m))
    assert(!WordPiece.consistent(Seq("hugs"), Seq("hug", "##s", "##s"), m))
    assert(!WordPiece.consistent(Seq("hugs"), Seq("h", "hug", "##s"), m))
  }

  test("consistent: a word starting with literal ## takes its first piece verbatim") {
    // the surface-form ambiguity the published convention shares: an
    // INITIAL piece may itself begin with '##' when the word does; the
    // walker must take a word's first piece verbatim, not reject it as
    // a misplaced continuation
    val m = WordPiece.WpModel(Array("##x", "##y", "a"))
    assert(m.encodeWord("##x") === Seq("##x"))
    assert(WordPiece.consistent(Seq("##x", "a"), Seq("##x", "a"), m))
    // a continuation-shaped token is still required after the first
    assert(!WordPiece.consistent(Seq("ax"), Seq("a", "x"), m))
  }

  test("corpus-trained model encodes distributed; identities hold") {
    val docs = (0L until 200L).map { i =>
      (i, Seq("low", "lower", "newest", "widest", "new", "wide")
        .drop((i % 3).toInt).mkString(" "))
    }.toDF("doc_id", "text")
    val model = WordPiece.train(docs, "text", vocabSize = 30)
    assert(model.vocab.length <= 30)
    assert(model.vocab.distinct.length === model.vocab.length)
    val out = WordPiece.encodeDocs(docs, "text", "doc_id", model)
      .localCheckpoint()
    assert(out.count() === 200L)
    // count column ≡ token array length
    assert(out.filter(size(col("wp_tokens")) =!= col("n_wp_tokens"))
      .count() === 0L)
    // the training corpus itself encodes UNK-free and losslessly
    val joined = out.join(docs, "doc_id")
      .select(col("doc_id"), col("wp_tokens"), col("text"))
      .as[(Long, Seq[String], String)].collect()
    joined.foreach { case (id, toks, text) =>
      assert(!toks.contains("[UNK]"), s"doc $id: $toks")
      assert(WordPiece.decodeTokens(toks) === text.replaceAll(" +", ""),
        s"doc $id")
      assert(WordPiece.consistent(
        text.split(" +").filter(_.nonEmpty).toSeq, toks, model))
    }
    // 30-piece vocab over this 6-word corpus compresses whole words
    val toks0 = joined.find(_._1 == 0L).get._2
    assert(toks0.exists(t => t.length >= 3 && !t.startsWith("##")),
      s"expected multi-char pieces, got $toks0")
  }

  test("native expression matches the driver-side algorithm; nulls pass") {
    val model = WordPiece.WpModel(Array("ab", "##c", "a", "##b", "h",
      "##i", "hi"))
    val df = Seq((0L, "abc a hi"), (1L, "  zq  ab "), (2L, null))
      .toDF("id", "text")
    val got = df.select(col("id"),
        WordPiece.tokensCol(model, col("text")).as("t"),
        WordPiece.tokenCountCol(model, col("text")).as("n"))
      .orderBy("id").collect()
    assert(got(0).getSeq[String](1) === Seq("ab", "##c", "a", "hi"))
    assert(got(0).getInt(2) === 4)
    assert(got(1).getSeq[String](1) === Seq("[UNK]", "ab"))
    assert(got(1).getInt(2) === 2)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
    // parity against the driver-side walk on arbitrary words
    val words = Seq("abc", "cab", "hihi", "aaa", "", "habich")
    words.foreach { w =>
      val viaDf = Seq(Tuple1(w)).toDF("text")
        .select(WordPiece.tokensCol(model, col("text"))).head().getSeq[String](0)
      assert(viaDf === model.encodeWord(w), s"word '$w'")
    }
  }

  test("tokenizer IO: a loaded model encodes identically; type tag refuses") {
    val docs = (0L until 50L).map(i => (i, s"alpha beta gamma g$i"))
      .toDF("doc_id", "text")
    val model = WordPiece.train(docs, "text", vocabSize = 40,
      unk = "<unk>", maxCharsPerWord = 64)
    val dir = java.nio.file.Files.createTempDirectory("wp").toString
    val p = s"$dir/wp.json"
    TokenizerIO.saveWordPiece(model, p)
    val loaded = TokenizerIO.loadWordPiece(p)
    assert(loaded.vocab.toSeq === model.vocab.toSeq)
    assert(loaded.unk === model.unk)
    assert(loaded.maxCharsPerWord === model.maxCharsPerWord)
    Seq("alpha", "gamma", "zzz9", "g7").foreach { w =>
      assert(loaded.encodeWord(w) === model.encodeWord(w), s"word '$w'")
    }
    intercept[IllegalArgumentException] { TokenizerIO.loadBpe(p) }
    intercept[IllegalArgumentException] { TokenizerIO.loadUnigram(p) }
    TokenizerIO.saveBpe(Bpe.BpeModel(Array(("a", "b"))), s"$dir/b.json")
    intercept[IllegalArgumentException] {
      TokenizerIO.loadWordPiece(s"$dir/b.json")
    }
  }
}

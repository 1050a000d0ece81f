package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.RollingFingerprint
import org.apache.spark.unsafe.types.UTF8String

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("textStats counts chars/words exactly") {
    val out = TextAnalysis.textStats(Seq((1L, "one two three")).toDF("doc_id", "text"),
        "text", "doc_id")
      .select("n_chars", "n_words", "avg_word_len").as[(Long, Long, Double)].head()
    assert(out._1 === 13L)
    assert(out._2 === 3L)
    assert(math.abs(out._3 - 11.0 / 3) < 1e-12)
  }

  test("tokenCounts: whitespace, BPE-ish regex, chars/4 estimate") {
    val out = TextAnalysis.tokenCounts(
        Seq((1L, "abcd efgh, x123!")).toDF("doc_id", "text"), "text", "doc_id")
      .select("n_ws_tokens", "n_bpe_tokens", "n_bpe_est")
      .as[(Long, Long, Long)].head()
    // bpe-ish: abcd | efgh | , | x | 123 | !  -> 6
    assert(out === ((3L, 6L, 4L))) // ceil(16/4) = 4
  }

  test("buildVocab ranks by count desc then word; encodeDocs maps OOV to -1") {
    val docs = Seq(
      (1L, "b a b c b a"),
      (2L, "a c zz a")).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", minCount = 2L)
    // counts: b=3 a=4 c=2 zz=1 -> a(4):0, b(3):1, c(2):2; zz filtered
    val v = vocab.select("word", "n", "token_id")
      .as[(String, Long, Long)].collect().toSet
    assert(v === Set(("a", 4L, 0L), ("b", 3L, 1L), ("c", 2L, 2L)))
    val enc = TextAnalysis.encodeDocs(docs, "text", "doc_id", vocab)
      .orderBy("doc_id").select("token_ids").as[Seq[Long]].collect().toSeq
    assert(enc === Seq(Seq(1L, 0L, 1L, 2L, 1L, 0L), Seq(0L, 2L, -1L, 0L)))
  }

  test("vocab/encode/chunk tokenize on space runs — no empty tokens") {
    // Runs of spaces plus leading/trailing spaces must behave like the
    // native SpaceTokens tokenizer (WordShingles/GramStats), not inject
    // "" tokens into vocabulary counts or encodings.
    val docs = Seq((1L, "  a  b a "), (2L, "b")).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", minCount = 1L)
    val v = vocab.select("word", "n").as[(String, Long)].collect().toSet
    assert(v === Set(("a", 2L), ("b", 2L)))
    val enc = TextAnalysis.encodeDocs(docs, "text", "doc_id", vocab)
      .orderBy("doc_id").select("token_ids").as[Seq[Long]].collect().toSeq
    assert(enc === Seq(Seq(0L, 1L, 0L), Seq(1L)))
    val chunks = TextAnalysis.chunkDocs(docs, "text", "doc_id", chunkWords = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_text").as[(Long, String)].collect().toSeq
    assert(chunks === Seq((1L, "a b"), (1L, "a"), (2L, "b")))
  }

  test("encodeDocs keeps one row per document for NULL/empty/all-space text") {
    val docs = Seq((1L, "a b"), (2L, null), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(
      docs.filter($"text".isNotNull), "text", minCount = 1L)
    val enc = TextAnalysis.encodeDocs(docs, "text", "doc_id", vocab)
      .orderBy("doc_id").select("doc_id", "token_ids")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(enc === Seq(
      (1L, Seq(0L, 1L)), (2L, Seq.empty), (3L, Seq.empty), (4L, Seq.empty)))
  }

  test("buildVocab topV keeps the highest-ranked words only") {
    val docs = Seq((1L, "x x x y y z")).toDF("doc_id", "text")
    val v = TextAnalysis.buildVocab(docs, "text", minCount = 1L, topV = 2L)
      .select("word", "token_id").as[(String, Long)].collect().toSet
    assert(v === Set(("x", 0L), ("y", 1L)))
  }

  test("chunkDocs: overlapping word windows, short last chunk") {
    // 7 words, chunkWords=4, overlap=2 -> stride 2, starts 0,2,4,6
    val out = TextAnalysis.chunkDocs(
        Seq((1L, "w0 w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text"),
        "text", "doc_id", chunkWords = 4, overlapWords = 2)
      .orderBy("chunk_id")
      .select("chunk_id", "word_start", "n_chunk_words", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 4L, "w0 w1 w2 w3"),
      (1L, 2L, 4L, "w2 w3 w4 w5"),
      (2L, 4L, 3L, "w4 w5 w6"),
      (3L, 6L, 1L, "w6")))
  }

  test("chunkDocs without overlap partitions the words exactly") {
    val out = TextAnalysis.chunkDocs(
        Seq((1L, "a b c d e")).toDF("doc_id", "text"),
        "text", "doc_id", chunkWords = 2)
      .orderBy("chunk_id").select("chunk_text").as[String].collect().toSeq
    assert(out === Seq("a b", "c d", "e"))
  }

  test("packSequences maps docs onto the packed token stream, straddles included") {
    // stream: doc1 [0,1000) doc2 [1000,1500) doc3 [1500,2500) doc5 [2500,2600)
    // with maxTokens=1024: doc1 seq0; doc2 seq0; doc3 seqs 1-2; doc5 seq 2
    val docs = Seq((1L, 1000L), (2L, 500L), (3L, 1000L), (4L, 0L), (5L, 100L))
      .toDF("doc_id", "n")
    val out = TextAnalysis.packSequences(docs, "doc_id", "n", 1024L)
      .orderBy("doc_id")
      .select("doc_id", "tok_start", "seq_first", "seq_last", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 1000L, 0L, 1L, 2L),   // straddles the 1024 cut
      (3L, 1500L, 1L, 2L, 2L),
      (5L, 2500L, 2L, 2L, 1L)))  // zero-token doc 4 dropped
  }

  test("sequenceBoundaries: within-seq ranges tile every cut sequence") {
    // stream (maxTokens=4): doc1 [0,5) seqs 0-1; doc2 [5,8) seq 1;
    // doc3 [8,12) seq 2
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 4L)).toDF("doc_id", "n")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "n", 4L)
    val got = TextAnalysis.sequenceBoundaries(packed, "doc_id", 4L)
      .orderBy("seq_id", "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 1L, 0L, 4L),   // doc1 fills seq 0
      (1L, 1L, 0L, 1L),   // doc1's tail
      (1L, 2L, 1L, 4L),   // doc2 completes seq 1
      (2L, 3L, 0L, 4L)))  // doc3 alone in seq 2
    // the ranges tile each sequence: contiguous, gap-free, full-width
    // (the last sequence here happens to end exactly at the cut)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 === 0L)
      sorted.sliding(2).foreach {
        case Seq((_, _, _, e), (_, _, s2, _)) => assert(e === s2)
        case _ =>
      }
    }
  }

  test("packSequences with copy tie-breakers packs upsampled epochs distinctly") {
    // two copies of doc 1 (500 tokens each), one of doc 2: stream is
    // (1,c0)[0,500) (1,c1)[500,1000) (2,c0)[1000,1300)
    val docs = Seq((1L, 0L, 500L), (1L, 1L, 500L), (2L, 0L, 300L))
      .toDF("doc_id", "copy", "n")
    val out = TextAnalysis.packSequences(docs, "doc_id", "n", 1024L,
        extraOrderCols = Seq("copy"))
      .orderBy("doc_id", "copy")
      .select("doc_id", "copy", "tok_start")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L, 0L), (1L, 1L, 500L), (2L, 0L, 1000L)))
  }

  test("repetitionStats: duplicate/top fractions over words and bigrams") {
    // "a b a b a": words {a:3, b:2} n=5 distinct=2 max=3
    // bigrams: "a b","b a","a b","b a" -> n=4 distinct=2 max=2
    val out = TextAnalysis.repetitionStats(
        Seq((1L, "a b a b a")).toDF("doc_id", "text"), "text", "doc_id")
      .select("n_words", "n_distinct_words", "top_word_frac", "dup_word_frac",
        "top_bigram_frac", "dup_bigram_frac")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(out === ((5L, 2L, 3.0 / 5, 3.0 / 5, 2.0 / 4, 2.0 / 4)))
  }

  test("repetitionStats: unique text scores zero; 1-word doc stays defined") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, "text", "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "dup_word_frac", "top_word_frac", "dup_bigram_frac")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(out(0) === ((1L, 0.0, 0.25, 0.0)))
    // single word: WordShingles' fallback emits one whole-sequence bigram
    assert(out(1) === ((2L, 0.0, 1.0, 0.0)))
  }

  test("langId thresholds stopword hits") {
    val df = Seq(
      (1L, "word the word and word of word"),
      (2L, "palabra uno dos tres cuatro")).toDF("doc_id", "text")
    val rows = TextAnalysis.langId(df, "text", "doc_id")
      .select("doc_id", "en_hits", "lang_pred").as[(Long, Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(1L) === ((3L, "en")))
    assert(rows(2L) === ((0L, "other")))
  }

  test("langIdNgram scores trigrams against broadcast profiles") {
    val df = Seq(
      (1L, "the thing and the other thing of note"),
      (2L, "der einzige schlüssel und die schöne aussicht"),
      (3L, "zzzz qqqq xxxx")).toDF("doc_id", "text")
    val rows = TextAnalysis.langIdNgram(df, "text", "doc_id")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(rows(1L) === "en")
    assert(rows(2L) === "de")
    assert(rows(3L) === "unknown")
  }

  test("qualityScore stays in [0, 1] and rewards well-formed text") {
    val df = Seq(
      (1L, ("the quick brown fox. " * 15).trim),   // long, clean
      (2L, "x. y. z.")).toDF("doc_id", "text")      // short, punctuation heavy
    val rows = TextAnalysis.qualityScore(df, "text", "doc_id")
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(rows(1L) > rows(2L))
    assert(rows.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq((1L, "Hello World"), (2L, "hello    world"), (3L, "other")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(df, "text", "doc_id")
      .select("doc_id", "fingerprint").as[(Long, String)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("RollingFingerprint: expression output equals brute-force window min") {
    def brute(s: String, w: Int): Long = {
      val bytes = s.getBytes("UTF-8")
      val win = math.min(w, bytes.length)
      (0 to bytes.length - win).map { i =>
        bytes.slice(i, i + win).foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))
      }.min
    }
    val texts = Seq("hello world, this is a fingerprint test", "abc", "aaaaaaaaaa")
    texts.foreach { t =>
      assert(RollingFingerprint.compute(UTF8String.fromString(t), 8) === brute(t, 8))
    }
    // and through SQL via GraftExtensions registration
    val viaSql = Seq((1L, texts.head)).toDF("id", "text")
      .selectExpr("graft_rolling_fingerprint(text, 8)").as[Long].head()
    assert(viaSql === brute(texts.head, 8))
    // shared-window property: appending text can only keep or lower the min
    val base = RollingFingerprint.compute(UTF8String.fromString(texts.head), 8)
    val longer = RollingFingerprint.compute(UTF8String.fromString(texts.head + " suffix"), 8)
    assert(longer <= base)
  }

  test("c4Clean: line rules keep punctuated >=minWords lines only") {
    val doc =
      "This first line has five words.\n" +    // kept
      "short line\n" +                          // < 5 words, no punct
      "Too short but punctuated.\n" +           // 4 words, ends '.'
      "this line has five words but no terminal punctuation\n" + // no punct
      "Please enable JavaScript to view comments.\n" + // js rule
      "\n" +                                    // empty
      "   \n" +                                 // spaces only
      "Does a question line with enough words survive?\n" + // kept
      "Last line stays even without trailing newline, five words plus." // kept
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val row = TextAnalysis.c4Clean(df, "text", "doc_id").head()
    assert(row.getLong(1) === 1L) // kept
    assert(row.getString(2) ===
      "This first line has five words.\n" +
      "Does a question line with enough words survive?\n" +
      "Last line stays even without trailing newline, five words plus.")
    assert(row.getLong(3) === 3L) // n_lines_kept
    assert(row.getLong(4) === 8L) // n_lines_total (non-empty lines)
  }

  test("c4Clean: doc-level drops, edge docs, and minWords dial") {
    val docs = Seq(
      (1L, "A fine sentence of five words. But then some { code } appears."),
      (2L, "Lorem Ipsum dolor sit amet consectetur adipiscing elit today."),
      (3L, ""),
      (4L, "short only\nno punct here at all\nstill bad"),
      (5L, "One two three. Four five six.")).toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(docs, "text", "doc_id", minWords = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 0L && out(0).getString(2) === "") // braces
    assert(out(1).getLong(1) === 0L)                               // lorem ipsum
    assert(out(2).getLong(1) === 1L && out(2).getString(2) === ""
      && out(2).getLong(3) === 0L && out(2).getLong(4) === 0L)     // empty doc
    assert(out(3).getLong(1) === 1L && out(3).getString(2) === ""
      && out(3).getLong(3) === 0L && out(3).getLong(4) === 3L)     // all lines bad
    // minWords=3: the single 6-word punctuated line passes
    assert(out(4).getString(2) === "One two three. Four five six.")
  }

  test("gopherQualityFlags: each rule trips on its own fixture") {
    val good = ("the quick brown fox jumps over the lazy dog and " * 6).trim
    val docs = Seq(
      (1L, good),                                       // all rules pass
      (2L, "too few words of the and"),                 // word-count fail
      (3L, ("a b c d " * 15).trim + " the and of"),     // mean-word-len < 3
      (4L, good + " " + ("# " * 20).trim),              // symbol ratio fail
      (5L, good + "\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j\n- k"), // bullets
      (6L, good + "\nends with...\nalso ends...\nplain line here"), // ellipsis lines
      (7L, good + " " + ("123 456 789 " * 20).trim),    // alpha-word frac fail
      (8L, good.replace(" the ", " xx ").replace(" and ", " yy "))) // stopwords
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityFlags(docs, "text", "doc_id",
        minWords = 30L).orderBy("doc_id").collect()
    def f(i: Int, name: String): Long =
      out(i).getLong(out(i).fieldIndex(name))
    assert(f(0, "gopher_pass") === 1L)
    assert(f(1, "ok_word_count") === 0L && f(1, "gopher_pass") === 0L)
    assert(f(2, "ok_mean_word_len") === 0L)
    assert(f(3, "ok_symbol_ratio") === 0L && f(0, "ok_symbol_ratio") === 1L)
    assert(f(4, "ok_bullet_lines") === 0L && f(0, "ok_bullet_lines") === 1L)
    assert(f(5, "ok_ellipsis_lines") === 0L && f(0, "ok_ellipsis_lines") === 1L)
    assert(f(6, "ok_alpha_words") === 0L && f(0, "ok_alpha_words") === 1L)
    assert(f(7, "ok_stopwords") === 0L && f(0, "ok_stopwords") === 1L)
  }
}

package graft.text

import java.nio.file.Files

import graft.SparkSuite

/** Tokenizer artifact round trips: a loaded model must encode
  * BIT-IDENTICALLY to the trained one, across both families, with
  * cross-loading refused by name. */
class TokenizerIOSpec extends SparkSuite {
  import spark.implicits._

  private def tmpFile(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_tok_$tag")
    d.toFile.deleteOnExit()
    s"$d/model.json"
  }

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"), (2L, "the cats sat there"),
    (3L, "that mat is the cat's"), (4L, "sat that hat \"x\"\n"),
    (5L, "café thesis rests")).toDF("doc_id", "text")

  test("BPE model round trip: identical merges and encodings") {
    val model = Bpe.train(docs, "text", numMerges = 60, maxWords = 100)
    val path = tmpFile("bpe")
    TokenizerIO.saveBpe(model, path)
    val back = TokenizerIO.loadBpe(path)
    assert(back.merges.toSeq == model.merges.toSeq)
    for (w <- Seq("the", "cats", "café", "zxq", "\"x\""))
      assert(back.encodeWord(w) == model.encodeWord(w), w)
  }

  test("unigram model round trip: bit-identical log-probs and encodings") {
    val model = Unigram.train(docs, "text", vocabSize = 40, maxWords = 100)
    val path = tmpFile("uni")
    TokenizerIO.saveUnigram(model, path)
    val back = TokenizerIO.loadUnigram(path)
    assert(back.maxPieceLen == model.maxPieceLen)
    assert(back.pieces.toSeq == model.pieces.toSeq) // exact doubles
    for (w <- Seq("the", "cats", "café", "zxq"))
      assert(back.encodeWord(w) == model.encodeWord(w), w)
  }

  test("cross-loading refuses by name") {
    val bpe = Bpe.train(docs, "text", numMerges = 5, maxWords = 100)
    val path = tmpFile("cross")
    TokenizerIO.saveBpe(bpe, path)
    assert(intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigram(path)
    }.getMessage.contains("not unigram"))
    val uni = Unigram.train(docs, "text", vocabSize = 20, maxWords = 100)
    TokenizerIO.saveUnigram(uni, path)
    assert(intercept[IllegalArgumentException] {
      TokenizerIO.loadBpe(path)
    }.getMessage.contains("not bpe"))
  }
}

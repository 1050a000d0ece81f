package graft.text

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

/** Tokenizer model persistence — the "train once, ship the artifact"
  * step between the corpus job that fits a tokenizer and every later
  * job (packing, budgeting, encoding, streaming curation) that applies
  * it. Models serialize to a single JSON file: merges in priority order
  * for BPE, the vocabulary for WordPiece, (piece, log-prob) pairs for
  * unigram — log-probs as Java
  * `Double.toString` round-trip text, so a loaded model encodes
  * BIT-IDENTICALLY to the trained one (pinned by tests). A type tag
  * refuses cross-loading by name.
  */
object TokenizerIO {

  private val om = new ObjectMapper()

  private def q(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  def saveBpe(model: Bpe.BpeModel, path: String): Unit = {
    val body = model.merges
      .map { case (a, b) => s"[${q(a)}, ${q(b)}]" }
      .mkString("[", ", ", "]")
    write(path,
      s"""{"type": "bpe", "byte_level": ${model.byteLevel}, "merges": $body}""")
  }

  def loadBpe(path: String): Bpe.BpeModel = {
    val node = om.readTree(read(path))
    val typ = Option(node.get("type")).map(_.asText()).getOrElse("?")
    require(typ == "bpe", s"tokenizer file at $path is '$typ', not bpe")
    val it = node.get("merges").elements()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) {
      val p = it.next()
      merges += ((p.get(0).asText(), p.get(1).asText()))
    }
    Bpe.BpeModel(merges.toArray,
      Option(node.get("byte_level")).exists(_.asBoolean()))
  }

  def saveUnigram(model: Unigram.UnigramModel, path: String): Unit = {
    val body = model.pieces
      .map { case (p, lp) => s"[${q(p)}, ${q(lp.toString)}]" }
      .mkString("[", ", ", "]")
    write(path, s"""{"type": "unigram", "max_piece_len": ${model.maxPieceLen},
      "byte_fallback": ${model.byteFallback},
      "pieces": $body}""")
  }

  def loadUnigram(path: String): Unigram.UnigramModel = {
    val node = om.readTree(read(path))
    val typ = Option(node.get("type")).map(_.asText()).getOrElse("?")
    require(typ == "unigram",
      s"tokenizer file at $path is '$typ', not unigram")
    val it = node.get("pieces").elements()
    val pieces = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    while (it.hasNext) {
      val p = it.next()
      // log-probs travel as Double.toString text: exact round-trip,
      // immune to any json float formatting
      pieces += ((p.get(0).asText(),
        java.lang.Double.parseDouble(p.get(1).asText())))
    }
    Unigram.UnigramModel(pieces.toArray, node.get("max_piece_len").asInt(),
      Option(node.get("byte_fallback")).exists(_.asBoolean()))
  }

  def saveWordPiece(model: WordPiece.WpModel, path: String): Unit = {
    val body = model.vocab.map(q).mkString("[", ", ", "]")
    write(path,
      s"""{"type": "wordpiece", "unk": ${q(model.unk)},
      "max_chars_per_word": ${model.maxCharsPerWord},
      "vocab": $body}""")
  }

  def loadWordPiece(path: String): WordPiece.WpModel = {
    val node = om.readTree(read(path))
    val typ = Option(node.get("type")).map(_.asText()).getOrElse("?")
    require(typ == "wordpiece",
      s"tokenizer file at $path is '$typ', not wordpiece")
    val it = node.get("vocab").elements()
    val vocab = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) vocab += it.next().asText()
    WordPiece.WpModel(vocab.toArray, node.get("unk").asText(),
      node.get("max_chars_per_word").asInt())
  }

  private def write(path: String, body: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, body.getBytes(UTF_8))
  }

  private def read(path: String): Array[Byte] =
    Files.readAllBytes(Paths.get(path))
}

package graft.text

/** The GPT-2 byte↔unicode bijection (Radford et al. 2019, encoder.py
  * `bytes_to_unicode`): every possible BYTE maps to a distinct PRINTABLE
  * unicode code point — printable latin bytes (`!`..`~`, `¡`..`¬`,
  * `®`..`ÿ`) map to themselves, the remaining 68 (controls, space, DEL,
  * the latin-1 gap) map to 256, 257, … in byte order. Running a
  * char-level tokenizer over the MAPPED text gives it a closed
  * 256-symbol base alphabet: ANY input — emoji, CJK unseen at train
  * time, binary-ish junk — decomposes into base symbols, so encoding is
  * lossless with zero UNKs and every token has a stable id. The inverse
  * map restores the exact UTF-8 bytes.
  *
  * Reference behavior: public GPT-2 `encoder.py`; no nexus-processor
  * counterpart (the reference has no tokenizer surface).
  */
object ByteLevel {

  /** byte (0..255) → mapped code point. */
  val byteToCp: Array[Int] = {
    val printable =
      (33 to 126) ++ (161 to 172) ++ (174 to 255) // the GPT-2 keep-set
    val keep = printable.toSet
    val out = new Array[Int](256)
    var next = 256
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b
      else { out(b) = next; next += 1 }
      b += 1
    }
    out
  }

  /** mapped code point → byte. */
  private[text] val cpToByte: Map[Int, Int] =
    byteToCp.zipWithIndex.map { case (cp, b) => cp -> b }.toMap

  /** Map a string's UTF-8 bytes to the byte-level alphabet (each byte
    * one BMP char — all mapped points are < 0x144). */
  def encode(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteToCp(bytes(i) & 0xff).toChar)
      i += 1
    }
    sb.toString
  }

  /** Inverse of [[encode]]: mapped chars → bytes → UTF-8 string. Chars
    * outside the bijection's image refuse loudly (they cannot come from
    * encode, so their presence means corrupted tokens). */
  def decode(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = cpToByte.getOrElse(s.charAt(i).toInt,
        sys.error(f"byte-level: char U+${s.charAt(i).toInt}%04X " +
          "outside the byte alphabet"))
      bytes(i) = b.toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}

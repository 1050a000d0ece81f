package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM AIFF codec (Apple AIFF-1.3 on EA IFF 85 — the big-endian
  * cousin of RIFF/WAV and the other uncompressed audio container a
  * scraped corpus contains): `FORM`/`AIFF` chunk walk with even
  * padding, the `COMM` common chunk whose sample rate is an 80-bit
  * IEEE 754 EXTENDED float (1 sign + 15 exponent bits biased 16383 +
  * 64 mantissa bits with an EXPLICIT integer bit — the one format
  * detail that separates AIFF parsers that work from ones that read
  * 0 Hz), and `SSND` sound data as big-endian signed MSB-justified
  * PCM.
  *
  * Decodes onto the one [[WavCodec.Pcm]] substrate, so every feature
  * and the energy-delta fingerprint are bit-identical across a WAV,
  * FLAC or AIFF encoding of the same samples. Subset: 8/16/24-bit PCM
  * `AIFF`; compressed `AIFC` forms, nonzero SSND offsets/block sizes
  * and non-integral sample rates refuse by name.
  *
  * Reference behavior: nexus-processor has no audio path; this is
  * builder-brief multimodal surface (the WavCodec/FlacCodec pattern).
  */
object AiffCodec {

  def isAiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F' && b(11) == 'F'

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def putBe16(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += ((v >> 8) & 0xff).toByte; out += (v & 0xff).toByte
  }
  private def putBe32(out: ArrayBuffer[Byte], v: Long): Unit = {
    out += ((v >> 24) & 0xff).toByte; out += ((v >> 16) & 0xff).toByte
    out += ((v >> 8) & 0xff).toByte; out += (v & 0xff).toByte
  }

  /** Encode an integral sample rate as the COMM chunk's 80-bit
    * extended float: exponent = 16383 + 63 - leadingZeros, mantissa =
    * rate shifted so the explicit integer bit is bit 63. */
  private[multimodal] def extendedOf(rate: Int): Array[Byte] = {
    require(rate > 0, "aiff: sample rate must be positive")
    val lz = java.lang.Long.numberOfLeadingZeros(rate.toLong)
    val exponent = 16383 + (63 - lz)
    val mantissa = rate.toLong << lz
    val out = new Array[Byte](10)
    out(0) = ((exponent >> 8) & 0x7f).toByte // sign 0
    out(1) = (exponent & 0xff).toByte
    var i = 0
    while (i < 8) {
      out(2 + i) = ((mantissa >>> (56 - 8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Decode the 80-bit extended float to an integral sample rate;
    * fractional and out-of-int-range rates refuse by name. */
  private[multimodal] def rateOf(b: Array[Byte], at: Int): Int = {
    require((b(at) & 0x80) == 0, "aiff: negative sample rate")
    val exponent = ((b(at) & 0x7f) << 8) | (b(at + 1) & 0xff)
    var mantissa = 0L
    var i = 0
    while (i < 8) {
      mantissa = (mantissa << 8) | (b(at + 2 + i) & 0xffL); i += 1
    }
    if (exponent == 0 && mantissa == 0) return 0
    // value = mantissa * 2^(exponent - 16383 - 63)
    val shift = exponent - 16383 - 63
    require(shift <= 0 && shift >= -63,
      s"aiff: sample rate exponent $exponent out of integral range")
    val down = -shift
    require(down < 64 && (mantissa & ((1L << down) - 1)) == 0,
      "aiff: non-integral sample rates are out of subset")
    val v = mantissa >>> down
    require(v <= Int.MaxValue, "aiff: sample rate overflows Int")
    v.toInt
  }

  /** Encode PCM as a spec-conformant AIFF (COMM + SSND, zero SSND
    * offset/block size, even chunk padding). */
  def encode(p: WavCodec.Pcm): Array[Byte] = {
    require(p.bitsPerSample == 8 || p.bitsPerSample == 16 ||
      p.bitsPerSample == 24, s"aiff: ${p.bitsPerSample}-bit (8/16/24)")
    require(p.channels > 0 && p.samples.length % p.channels == 0,
      "aiff: sample count must be a channel multiple")
    val bytesPer = p.bitsPerSample / 8
    val frames = p.samples.length / p.channels

    val comm = new ArrayBuffer[Byte](18)
    putBe16(comm, p.channels)
    putBe32(comm, frames.toLong)
    putBe16(comm, p.bitsPerSample)
    comm ++= extendedOf(p.sampleRate)

    val ssnd = new ArrayBuffer[Byte](8 + p.samples.length * bytesPer)
    putBe32(ssnd, 0L); putBe32(ssnd, 0L) // offset, blockSize
    val lim = 1 << (p.bitsPerSample - 1)
    p.samples.foreach { s =>
      require(s >= -lim && s < lim,
        s"aiff: sample $s outside ${p.bitsPerSample}-bit range")
      var i = bytesPer - 1
      while (i >= 0) { ssnd += ((s >> (8 * i)) & 0xff).toByte; i -= 1 }
    }

    def chunk(id: String, body: ArrayBuffer[Byte]): ArrayBuffer[Byte] = {
      val out = new ArrayBuffer[Byte](body.length + 8)
      id.foreach(c => out += c.toByte)
      putBe32(out, body.length.toLong)
      out ++= body
      if ((body.length & 1) == 1) out += 0 // even padding per IFF
      out
    }
    val body = chunk("COMM", comm) ++ chunk("SSND", ssnd)
    val out = new ArrayBuffer[Byte](body.length + 12)
    "FORM".foreach(c => out += c.toByte)
    putBe32(out, (body.length + 4).toLong)
    "AIFF".foreach(c => out += c.toByte)
    out ++= body
    out.toArray
  }

  /** Parse an AIFF to PCM. Everything outside the subset refuses by
    * name; declared frame counts are checked against the sound data. */
  def decode(bytes: Array[Byte]): WavCodec.Pcm = {
    if (bytes != null && bytes.length >= 12 &&
        bytes(8) == 'A' && bytes(9) == 'I' && bytes(10) == 'F' &&
        bytes(11) == 'C')
      throw new IllegalArgumentException(
        "aiff: compressed AIFC forms are out of subset")
    require(isAiff(bytes), "aiff: bad FORM/AIFF signature")
    val formEnd = {
      val sz = be32(bytes, 4)
      require(8 + sz <= bytes.length, "aiff: FORM size beyond buffer")
      (8 + sz).toInt
    }
    var channels = -1; var frames = -1L; var bits = -1; var rate = -1
    var data: Array[Byte] = null
    var p = 12
    while (p + 8 <= formEnd) {
      val id = new String(bytes, p, 4, "US-ASCII")
      val szL = be32(bytes, p + 4)
      require(szL <= (formEnd - p - 8).toLong,
        s"aiff: chunk '$id' overruns the form")
      val sz = szL.toInt
      id match {
        case "COMM" =>
          require(sz >= 18, "aiff: COMM too short")
          channels = be16(bytes, p + 8)
          frames = be32(bytes, p + 10)
          bits = be16(bytes, p + 14)
          rate = rateOf(bytes, p + 16)
        case "SSND" =>
          require(sz >= 8, "aiff: SSND too short")
          val offset = be32(bytes, p + 8)
          val blockSize = be32(bytes, p + 12)
          require(offset == 0 && blockSize == 0,
            "aiff: nonzero SSND offset/blockSize is out of subset")
          data = java.util.Arrays.copyOfRange(bytes, p + 16, p + 8 + sz)
        case _ => () // NAME/ANNO/MARK and friends hopped by size
      }
      p += 8 + sz + (sz & 1)
    }
    require(channels > 0 && bits > 0 && rate > 0, "aiff: missing COMM")
    require(bits == 8 || bits == 16 || bits == 24,
      s"aiff: $bits-bit samples are out of subset (8/16/24)")
    require(data != null, "aiff: missing SSND")
    val bytesPer = bits / 8
    require(data.length % bytesPer == 0,
      s"aiff: SSND length ${data.length} not a multiple of the " +
        s"$bytesPer-byte sample size")
    val n = data.length / bytesPer
    require(n.toLong == frames * channels,
      s"aiff: COMM declares $frames frames × $channels ch, " +
        s"SSND holds $n samples")
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      var v = 0
      var j = 0
      while (j < bytesPer) { v = (v << 8) | (data(i * bytesPer + j) & 0xff); j += 1 }
      // sign-extend from the top sample bit (AIFF 8-bit is SIGNED,
      // unlike WAV's unsigned 8-bit)
      val shift = 32 - bits
      samples(i) = (v << shift) >> shift
      i += 1
    }
    WavCodec.Pcm(channels, rate, bits, samples)
  }
}

package graft.multimodal

import java.io.ByteArrayOutputStream

/** REAL WAV PCM sample codec, pure JVM — the audio twin of
  * [[PngCodec]]'s de-stubbing: RIFF/WAVE PCM is a header plus raw
  * little-endian samples, fully decodable without codec libraries.
  * Supported subset (loud errors outside it): format tag 1 (PCM,
  * 8-bit unsigned / 16-bit signed / 24-bit signed), and the two G.711
  * LOSSY companded formats — tag 7 (µ-law) and tag 6 (A-law), the
  * telephony formats whose expansion is fully formula-defined (ITU-T
  * G.711 segmented companding — no empirical tables, which is what
  * makes them implementable from the public spec where MP3/AAC are
  * not); G.711 streams decode to 16-bit PCM. Any channel count; other
  * compressed format tags refuse by name.
  *
  * On the samples: exact INTEGER features (per-frame energy, zero
  * crossings, peak — the oracle substrate: every number is rederivable
  * from a generator's sample formula in SQL) and a 64-bit energy-delta
  * FINGERPRINT (bit i = energy of frame i > frame i+1 — the dHash idea
  * on audio), which feeds the same banded near-dup join the image
  * hashes use ([[Multimodal.imageNearDups]] is hash-generic).
  */
object WavCodec {

  /** Interleaved sign-extended samples (one Int per sample-channel). */
  final case class Pcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
                       samples: Array[Int])

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  // ---- G.711 companding (µ-law / A-law — ITU-T G.711) ---------------------

  /** The two G.711 expansion/compression pairs. LOSSY by quantization,
    * but the decode lattice is exact integers and `encode ∘ decode` is
    * the identity on all 256 codes (pinned) — which is what lets a SQL
    * oracle rederive decoded samples from a code formula. Both follow
    * the classic segmented-companding formulation (sign, 3-bit segment
    * exponent, 4-bit mantissa) on the 16-bit linear domain. */
  object G711 {
    /** µ-law code → 16-bit linear (±32124 full scale; code 0xFF = 0). */
    def mulawDecode(code: Int): Int = {
      val u = ~code & 0xff
      val exp = (u >> 4) & 7
      val mant = u & 0xf
      val t = (((mant << 3) + 132) << exp) - 132
      if ((u & 0x80) != 0) -t else t
    }

    /** 16-bit linear → µ-law code (nearest lattice point below;
      * exact inverse of [[mulawDecode]] on the lattice). */
    def mulawEncode(s0: Int): Int = {
      val sign = if (s0 < 0) 0x80 else 0
      var s = math.min(if (s0 < 0) -s0 else s0, 32635)
      s += 132
      val exp = math.max(0, 31 - Integer.numberOfLeadingZeros(s) - 7)
      val mant = (s >> (exp + 3)) & 0xf
      ~(sign | (exp << 4) | mant) & 0xff
    }

    /** A-law code → 16-bit linear (±32256 full scale; no zero — the
      * smallest magnitudes are ±8). */
    def alawDecode(code: Int): Int = {
      val a = code ^ 0x55
      val exp = (a >> 4) & 7
      val t0 = (a & 0xf) << 4
      val t = exp match {
        case 0 => t0 + 8
        case 1 => t0 + 0x108
        case e => (t0 + 0x108) << (e - 1)
      }
      if ((a & 0x80) != 0) t else -t
    }

    /** 16-bit linear → A-law code (exact inverse of [[alawDecode]] on
      * the lattice). */
    def alawEncode(s0: Int): Int = {
      val mask = if (s0 >= 0) 0xd5 else 0x55
      val mag13 = math.min(if (s0 >= 0) s0 else -s0, 32767) >> 3
      var seg = 0
      while (seg < 8 && mag13 > ((0x20 << seg) - 1)) seg += 1
      if (seg >= 8) (0x7f ^ mask)
      else {
        val mant =
          if (seg < 2) (mag13 >> 1) & 0xf else (mag13 >> seg) & 0xf
        ((seg << 4) | mant) ^ mask
      }
    }
  }

  /** Encode 16-bit PCM as a G.711 WAV (`law` = "mu" → format tag 7,
    * "a" → tag 6): one companded byte per sample, 18-byte fmt chunk
    * (cbSize 0, the non-PCM WAV convention). */
  def encodeG711(p: Pcm, law: String): Array[Byte] = {
    require(p.bitsPerSample == 16, "G.711 compresses 16-bit PCM")
    require(p.samples.length % p.channels == 0,
      "sample count must be a whole number of frames")
    val tag = law match {
      case "mu" => 7
      case "a" => 6
      case other => sys.error(s"unknown G.711 law '$other' (mu|a)")
    }
    val out = new ByteArrayOutputStream(46 + p.samples.length)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, s.length)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    ascii("RIFF"); le32(4 + (8 + 18) + (8 + p.samples.length).toLong)
    ascii("WAVE")
    ascii("fmt "); le32(18)
    le16(tag)
    le16(p.channels)
    le32(p.sampleRate.toLong)
    le32(p.sampleRate.toLong * p.channels)
    le16(p.channels) // block align: one byte per sample-channel
    le16(8)
    le16(0) // cbSize
    ascii("data"); le32(p.samples.length.toLong)
    var i = 0
    while (i < p.samples.length) {
      out.write(if (tag == 7) G711.mulawEncode(p.samples(i))
        else G711.alawEncode(p.samples(i)))
      i += 1
    }
    out.toByteArray
  }

  // ---- encode ------------------------------------------------------------

  def encode(p: Pcm): Array[Byte] = {
    require(Set(8, 16, 24).contains(p.bitsPerSample),
      s"unsupported PCM width ${p.bitsPerSample} (8/16/24)")
    require(p.samples.length % p.channels == 0,
      "sample count must be a whole number of frames")
    val bytesPer = p.bitsPerSample / 8
    val blockAlign = p.channels * bytesPer
    val dataSize = p.samples.length * bytesPer
    val out = new ByteArrayOutputStream(44 + dataSize)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, s.length)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    ascii("RIFF"); le32(4 + (8 + 16) + (8 + dataSize).toLong); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1) // PCM
    le16(p.channels)
    le32(p.sampleRate.toLong)
    le32(p.sampleRate.toLong * blockAlign)
    le16(blockAlign)
    le16(p.bitsPerSample)
    ascii("data"); le32(dataSize.toLong)
    var i = 0
    while (i < p.samples.length) {
      val s = p.samples(i)
      p.bitsPerSample match {
        case 8 => out.write((s + 128) & 0xff) // 8-bit PCM is UNSIGNED
        case 16 => out.write(s & 0xff); out.write((s >> 8) & 0xff)
        case 24 =>
          out.write(s & 0xff); out.write((s >> 8) & 0xff)
          out.write((s >> 16) & 0xff)
      }
      i += 1
    }
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------------

  def decode(wav: Array[Byte]): Pcm = {
    require(isWav(wav), "not a RIFF/WAVE file")
    def le16(i: Int): Int = (wav(i) & 0xff) | ((wav(i + 1) & 0xff) << 8)
    def le32(i: Int): Long =
      (wav(i) & 0xffL) | ((wav(i + 1) & 0xffL) << 8) |
        ((wav(i + 2) & 0xffL) << 16) | ((wav(i + 3) & 0xffL) << 24)
    var i = 12L
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var fmtTag = 0
    var dataAt = -1
    var dataLen = 0
    while (i + 8 <= wav.length) {
      val j = i.toInt
      val typ = new String(wav, j, 4, "US-ASCII")
      val size = le32(j + 4)
      typ match {
        case "fmt " =>
          fmtTag = le16(j + 8)
          require(fmtTag == 1 || fmtTag == 6 || fmtTag == 7,
            s"unsupported WAV format tag $fmtTag " +
              "(PCM, A-law, µ-law only)")
          channels = le16(j + 10)
          sampleRate = le32(j + 12).toInt
          bits = le16(j + 22)
          if (fmtTag == 1)
            require(Set(8, 16, 24).contains(bits),
              s"unsupported PCM width $bits (8/16/24)")
          else require(bits == 8,
            s"G.711 streams are 8 bits per companded sample, got $bits")
        case "data" =>
          dataAt = j + 8
          dataLen = math.min(size, (wav.length - dataAt).toLong).toInt
        case _ => // LIST/INFO etc. hop
      }
      i += 8L + size + (size & 1L)
    }
    require(channels > 0 && dataAt >= 0, "missing fmt or data chunk")
    if (fmtTag != 1) {
      // G.711: one companded byte per sample, expanded to 16-bit linear
      val samples = new Array[Int](dataLen)
      var k = 0
      while (k < dataLen) {
        val c = wav(dataAt + k) & 0xff
        samples(k) = if (fmtTag == 7) G711.mulawDecode(c)
          else G711.alawDecode(c)
        k += 1
      }
      return Pcm(channels, sampleRate, 16, samples)
    }
    val bytesPer = bits / 8
    val n = dataLen / bytesPer
    val samples = new Array[Int](n)
    var k = 0
    while (k < n) {
      val at = dataAt + k * bytesPer
      samples(k) = bits match {
        case 8 => (wav(at) & 0xff) - 128
        case 16 => ((wav(at) & 0xff) | (wav(at + 1) << 8)).toShort.toInt
        case 24 =>
          val v = (wav(at) & 0xff) | ((wav(at + 1) & 0xff) << 8) |
            ((wav(at + 2) & 0xff) << 16)
          (v << 8) >> 8 // sign-extend 24 → 32
      }
      k += 1
    }
    Pcm(channels, sampleRate, bits, samples)
  }

  // ---- exact integer features --------------------------------------------

  /** Mono mix by integer averaging (exact: truncating div). */
  def monoMix(p: Pcm): Array[Int] =
    if (p.channels == 1) p.samples
    else {
      val frames = p.samples.length / p.channels
      Array.tabulate(frames) { f =>
        var s = 0L
        var c = 0
        while (c < p.channels) { s += p.samples(f * p.channels + c); c += 1 }
        (s / p.channels).toInt
      }
    }

  /** Per-frame sum of squared mono samples over `nWindows` equal
    * windows (remainder samples land in the last window) — exact Longs. */
  def windowEnergies(p: Pcm, nWindows: Int): Array[Long] = {
    require(nWindows >= 1)
    val mono = monoMix(p)
    val out = new Array[Long](nWindows)
    val per = math.max(1, mono.length / nWindows)
    var i = 0
    while (i < mono.length) {
      val w = math.min(i / per, nWindows - 1)
      out(w) += mono(i).toLong * mono(i)
      i += 1
    }
    out
  }

  /** Sign changes over the mono mix (sign(0) counts as positive). */
  def zeroCrossings(p: Pcm): Long = {
    val mono = monoMix(p)
    var n = 0L
    var i = 1
    while (i < mono.length) {
      if ((mono(i) < 0) != (mono(i - 1) < 0)) n += 1
      i += 1
    }
    n
  }

  /** Peak absolute mono sample. */
  def peak(p: Pcm): Int = {
    val mono = monoMix(p)
    var m = 0
    var i = 0
    while (i < mono.length) { m = math.max(m, math.abs(mono(i))); i += 1 }
    m
  }

  /** 64-bit energy-delta fingerprint: 65 windows, bit i = window i has
    * MORE energy than window i+1 — loudness-profile dHash, exact
    * integer comparisons, robust to uniform gain (scaling all samples
    * scales every energy equally, preserving each comparison). */
  def fingerprint(p: Pcm): Long = {
    val e = windowEnergies(p, 65)
    var h = 0L
    var i = 0
    while (i < 64) {
      if (e(i) > e(i + 1)) h |= 1L << i
      i += 1
    }
    h
  }
}

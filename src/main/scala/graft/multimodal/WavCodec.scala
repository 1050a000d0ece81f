package graft.multimodal

import java.io.ByteArrayOutputStream

/** REAL WAV PCM sample codec, pure JVM — the audio twin of
  * [[PngCodec]]'s de-stubbing: RIFF/WAVE PCM is a header plus raw
  * little-endian samples, fully decodable without codec libraries.
  * Supported subset (loud errors outside it): format tag 1 (PCM),
  * 8-bit unsigned / 16-bit signed / 24-bit signed, any channel count;
  * compressed formats (format tag ≠ 1) refuse by name.
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
    var dataAt = -1
    var dataLen = 0
    while (i + 8 <= wav.length) {
      val j = i.toInt
      val typ = new String(wav, j, 4, "US-ASCII")
      val size = le32(j + 4)
      typ match {
        case "fmt " =>
          val tag = le16(j + 8)
          require(tag == 1,
            s"unsupported WAV format tag $tag (PCM only)")
          channels = le16(j + 10)
          sampleRate = le32(j + 12).toInt
          bits = le16(j + 22)
          require(Set(8, 16, 24).contains(bits),
            s"unsupported PCM width $bits (8/16/24)")
        case "data" =>
          dataAt = j + 8
          dataLen = math.min(size, (wav.length - dataAt).toLong).toInt
        case _ => // LIST/INFO etc. hop
      }
      i += 8L + size + (size & 1L)
    }
    require(channels > 0 && dataAt >= 0, "missing fmt or data chunk")
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

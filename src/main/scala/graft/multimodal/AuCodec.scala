package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM Sun/NeXT AU (`.au`/`.snd`) codec — the fifth audio
  * container a scraped corpus meets (the oldest still-alive one: a
  * 24-byte big-endian header, an annotation gap, raw samples). Subset:
  * encoding 1 (8-bit G.711 µ-law — expanded through the shared
  * [[WavCodec.G711]] tables, so an AU and a µ-law WAV of the same
  * stream land on IDENTICAL samples), 2 (8-bit linear signed) and
  * 3 (16-bit linear big-endian); the unknown-length sentinel
  * (0xFFFFFFFF) resolves against the actual payload. Everything else
  * refuses by name. Decodes onto the one [[WavCodec.Pcm]] substrate —
  * features and fingerprints bit-identical across containers.
  *
  * Reference behavior: nexus-processor has no audio path; builder-
  * brief multimodal surface (the AiffCodec pattern).
  */
object AuCodec {

  def isAu(b: Array[Byte]): Boolean =
    b != null && b.length >= 24 &&
      b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Encode PCM as an AU stream (`encoding` 1 = µ-law from 16-bit
    * samples, 2 = 8-bit linear, 3 = 16-bit linear BE). */
  def encode(p: WavCodec.Pcm, encoding: Int = 3): Array[Byte] = {
    val out = new ByteArrayOutputStream(32 + p.samples.length * 2)
    def be(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    val dataSize = encoding match {
      case 1 =>
        require(p.bitsPerSample == 16, "au: mu-law compresses 16-bit PCM")
        p.samples.length.toLong
      case 2 =>
        require(p.bitsPerSample == 8, "au: encoding 2 is 8-bit linear")
        p.samples.length.toLong
      case 3 =>
        require(p.bitsPerSample == 16, "au: encoding 3 is 16-bit linear")
        p.samples.length * 2L
      case other => sys.error(s"au: encoding $other is out of subset")
    }
    out.write(".snd".getBytes("US-ASCII"), 0, 4)
    be(24L); be(dataSize); be(encoding.toLong)
    be(p.sampleRate.toLong); be(p.channels.toLong)
    p.samples.foreach { s =>
      encoding match {
        case 1 => out.write(WavCodec.G711.mulawEncode(s))
        case 2 =>
          require(s >= -128 && s <= 127, s"au: 8-bit sample $s out of range")
          out.write(s & 0xff)
        case _ => out.write((s >> 8) & 0xff); out.write(s & 0xff)
      }
    }
    out.toByteArray
  }

  /** Parse an AU stream to PCM; out-of-subset encodings and truncated
    * payloads refuse by name. */
  def decode(bytes: Array[Byte]): WavCodec.Pcm = {
    require(isAu(bytes), "au: bad .snd signature")
    val dataOffset = be32(bytes, 4)
    val declared = be32(bytes, 8)
    val encoding = be32(bytes, 12).toInt
    val rate = be32(bytes, 16)
    val channels = be32(bytes, 20).toInt
    require(dataOffset >= 24 && dataOffset <= bytes.length,
      s"au: data offset $dataOffset out of range")
    require(rate > 0 && rate <= Int.MaxValue, s"au: bad sample rate $rate")
    require(channels > 0, s"au: bad channel count $channels")
    val avail = bytes.length - dataOffset.toInt
    // 0xFFFFFFFF = unknown length (the spec's streaming sentinel)
    val dataSize =
      if (declared == 0xffffffffL) avail.toLong
      else {
        require(declared <= avail,
          s"au: declared $declared data bytes, only $avail present")
        declared
      }
    val off = dataOffset.toInt
    encoding match {
      case 1 =>
        val n = dataSize.toInt
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) = WavCodec.G711.mulawDecode(bytes(off + i) & 0xff)
          i += 1
        }
        require(n % channels == 0, "au: sample count not a channel multiple")
        WavCodec.Pcm(channels, rate.toInt, 16, samples)
      case 2 =>
        val n = dataSize.toInt
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) { samples(i) = bytes(off + i).toInt; i += 1 }
        require(n % channels == 0, "au: sample count not a channel multiple")
        WavCodec.Pcm(channels, rate.toInt, 8, samples)
      case 3 =>
        require(dataSize % 2 == 0,
          "au: 16-bit payload length is odd")
        val n = (dataSize / 2).toInt
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) =
            ((bytes(off + 2 * i) << 8) | (bytes(off + 2 * i + 1) & 0xff))
          i += 1
        }
        require(n % channels == 0, "au: sample count not a channel multiple")
        WavCodec.Pcm(channels, rate.toInt, 16, samples)
      case other =>
        sys.error(s"au: encoding $other is out of subset (1/2/3)")
    }
  }
}

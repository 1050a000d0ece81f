package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import org.apache.spark.sql.functions._

/** AIFF wire-format roundtrips: 80-bit extended-float sample rates,
  * big-endian signed samples per width, even padding, named refusals,
  * and cross-container feature identity on the shared Pcm substrate. */
class AiffCodecSpec extends AnyFunSuite {

  private def pcm(bits: Int, n: Int = 61, ch: Int = 1): WavCodec.Pcm = {
    val lim = (1 << (bits - 1)) - 1
    WavCodec.Pcm(ch, 8000, bits,
      Array.tabulate(n * ch)(i => ((i * 2654435761L) % (2L * lim + 1) - lim).toInt))
  }

  test("extended-float sample rate corners round-trip exactly") {
    for (rate <- Seq(1, 8000, 11025, 22050, 44100, 48000, 96000, 192000,
        Int.MaxValue)) {
      val enc = AiffCodec.extendedOf(rate)
      assert(AiffCodec.rateOf(enc, 0) == rate, s"rate $rate")
    }
  }

  test("roundtrip per width; 8-bit is signed (unlike WAV)") {
    for (bits <- Seq(8, 16, 24); ch <- Seq(1, 2)) {
      val p = pcm(bits, 61, ch)
      val back = AiffCodec.decode(AiffCodec.encode(p))
      assert(back.channels == ch && back.sampleRate == 8000 &&
        back.bitsPerSample == bits, s"$bits-bit/$ch-ch header")
      assert(back.samples.toSeq == p.samples.toSeq, s"$bits-bit/$ch-ch")
    }
    // odd body length exercises the IFF even-padding rule
    val odd = WavCodec.Pcm(1, 8000, 8, Array(1, -2, 3))
    val bytes = AiffCodec.encode(odd)
    assert(bytes.length % 2 == 0)
    assert(AiffCodec.decode(bytes).samples.toSeq == Seq(1, -2, 3))
  }

  test("refusals are loud and named") {
    val good = AiffCodec.encode(pcm(16))
    assert(!AiffCodec.isAiff("FORMxxxxWAVE".getBytes("US-ASCII")))

    val aifc = good.clone(); aifc(11) = 'C'.toByte
    assert(intercept[IllegalArgumentException] {
      AiffCodec.decode(aifc)
    }.getMessage.contains("AIFC"))

    // declared/actual frame mismatch: bump COMM numSampleFrames
    val short = good.clone()
    // COMM payload starts at 20 (FORM hdr 12 + chunk hdr 8); frames at +2
    short(20 + 5) = (short(20 + 5) + 1).toByte
    assert(intercept[IllegalArgumentException] {
      AiffCodec.decode(short)
    }.getMessage.contains("frames"))

    // non-integral sample rate: set a mantissa bit below the shift
    val frac = good.clone()
    frac(20 + 8 + 9) = 0x01 // lowest mantissa byte of the 80-bit rate
    assert(intercept[IllegalArgumentException] {
      AiffCodec.decode(frac)
    }.getMessage.contains("non-integral"))
  }

  test("SSND length not a sample multiple refuses, never truncates") {
    // craft: +1 byte in SSND (16-bit → odd payload), sizes kept
    // consistent (SSND sz += 1, pad byte appended, FORM sz += 2) so
    // the only violation is the sample-multiple one
    val good = AiffCodec.encode(pcm(16))
    val bad = new Array[Byte](good.length + 2)
    System.arraycopy(good, 0, bad, 0, good.length)
    def bumpBe32(at: Int, by: Int): Unit = {
      val v = (((bad(at) & 0xffL) << 24) | ((bad(at + 1) & 0xffL) << 16) |
        ((bad(at + 2) & 0xffL) << 8) | (bad(at + 3) & 0xffL)) + by
      bad(at) = ((v >> 24) & 0xff).toByte; bad(at + 1) = ((v >> 16) & 0xff).toByte
      bad(at + 2) = ((v >> 8) & 0xff).toByte; bad(at + 3) = (v & 0xff).toByte
    }
    bumpBe32(4, 2)  // FORM size: +1 data byte +1 IFF pad
    bumpBe32(42, 1) // SSND chunk size (COMM is 12+8+18 → SSND hdr at 38)
    assert(intercept[IllegalArgumentException] {
      AiffCodec.decode(bad)
    }.getMessage.contains("not a multiple"))
  }
}

/** decodeAudio sniffs AIFF next to WAV/FLAC; all three land on one Pcm
  * substrate with identical features and fingerprints. */
class MultimodalAiffSpec extends SparkSuite {
  import spark.implicits._

  test("WAV, FLAC and AIFF encodings of the same samples agree on every feature") {
    val samples = Array.tabulate(512)(i =>
      (math.sin(i / 7.0) * 12000).toInt)
    val p = WavCodec.Pcm(1, 8000, 16, samples)
    val df = Seq(
      (1L, WavCodec.encode(p)),
      (2L, FlacCodec.encode(p, blockSize = 128)),
      (3L, AiffCodec.encode(p))).toDF("media_id", "content")
    val out = Multimodal.decodeAudio(spark, df, "media_id", "content")
      .orderBy("media_id")
      .select("channels", "sample_rate", "bits_per_sample", "n_frames",
        "energy", "zero_crossings", "peak", "afingerprint")
      .collect()
    assert(out.length == 3)
    assert(out(0).toSeq == out(1).toSeq && out(1).toSeq == out(2).toSeq)
  }
}

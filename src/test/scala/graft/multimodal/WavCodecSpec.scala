package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The REAL WAV PCM codec (WavCodec): roundtrips at every width,
  * chunk-hop tolerance, refusals, exact integer features, and the
  * gain-invariant energy-delta fingerprint feeding the banded
  * near-dup join. */
class WavCodecSpec extends AnyFunSuite {
  import WavCodec._

  private def tone(n: Int, ch: Int)(f: (Int, Int) => Int): Pcm =
    Pcm(ch, 8000, 16, Array.tabulate(n * ch)(i => f(i / ch, i % ch)))

  test("encode/decode roundtrip at 8, 16, and 24 bits, mono and stereo") {
    for ((bits, lim) <- Seq((8, 127), (16, 30000), (24, 7000000));
         ch <- Seq(1, 2)) {
      val samples = Array.tabulate(200 * ch)(i =>
        ((i * 37 + 11) % (2 * lim)) - lim)
      val p = Pcm(ch, 44100, bits, samples)
      val back = decode(encode(p))
      assert(back.channels == ch && back.sampleRate == 44100 &&
        back.bitsPerSample == bits)
      assert(back.samples.toSeq == samples.toSeq, s"bits $bits ch $ch")
    }
  }

  test("decode hops ancillary chunks (the AudioFixtures LIST shape)") {
    // the header-fixture writer puts a LIST/INFO chunk before data and
    // zeroed PCM — the sample decoder must agree with the header walk
    val wav = AudioFixtures.wav(2, 22050, 16, nFrames = 64,
      payload = "annotations".getBytes("US-ASCII"))
    val p = decode(wav)
    assert(p.channels == 2 && p.sampleRate == 22050 &&
      p.bitsPerSample == 16)
    assert(p.samples.length == 128 && p.samples.forall(_ == 0))
  }

  test("compressed formats refuse by name") {
    val ok = encode(tone(16, 1)((t, _) => t))
    // format tag lives at fmt data offset: 12 + 8
    val bad = ok.clone(); bad(20) = 85 // format tag 85 = MP3
    val e = intercept[RuntimeException](decode(bad))
    assert(e.getMessage.contains("format tag"))
  }

  test("integer features are exact") {
    val p = tone(100, 1)((t, _) => if (t % 4 < 2) 10 else -10)
    assert(windowEnergies(p, 1).head == 100L * 100)
    assert(peak(p) == 10)
    // sign flips every 2 samples: crossings at t = 2,4,...,98
    assert(zeroCrossings(p) == 49L)
    // stereo mono-mix averages exactly
    val st = Pcm(2, 8000, 16, Array.tabulate(8)(i => if (i % 2 == 0) 6 else 2))
    assert(monoMix(st).toSeq == Seq(4, 4, 4, 4))
  }

  test("fingerprint is gain-invariant and discriminative") {
    def sig(seed: Int) = tone(650, 1)((t, _) =>
      (((seed * 2654435761L + t * t * 31L) >>> 9) % 2001L - 1000L).toInt)
    val a = sig(1)
    val louder = Pcm(1, 8000, 16, a.samples.map(_ * 3))
    val b = sig(2)
    assert(fingerprint(a) == fingerprint(louder))
    assert(java.lang.Long.bitCount(
      fingerprint(a) ^ fingerprint(b)) >= 12, "distinct signals differ")
    assert(fingerprint(a) == fingerprint(decode(encode(a))))
  }
}

/** Spark-side audio pipeline over the real codec. */
class MultimodalAudioSpec extends SparkSuite {
  import spark.implicits._
  import WavCodec._

  private def wav(seed: Long): Array[Byte] =
    encode(Pcm(1, 8000, 16, Array.tabulate(256) { t =>
      (((seed * 31 + t.toLong * t * 7) % 2000) - 1000).toInt
    }))

  test("decodeAudio: exact features; non-WAV rows go null; dedup rides") {
    val blobs = Seq((1L, wav(5L)), (2L, wav(5L)), (3L, wav(9L)),
      (4L, "nope".getBytes("UTF-8"))).toDF("media_id", "content")
    val out = Multimodal.decodeAudio(spark, blobs, "media_id", "content")
      .orderBy("media_id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 8000 &&
      out(0).getLong(4) == 256L)
    val expect = (0 until 256).map { t =>
      val s = (5L * 31 + t.toLong * t * 7) % 2000 - 1000; s * s
    }.sum
    assert(out(0).getLong(5) == expect)
    assert(out(3).isNullAt(8) && out(3).getInt(1) == 0)
    // identical audio → identical fingerprint → hamming-0 near-dup
    // through the SAME banded join the image hashes use
    val dups = Multimodal.imageNearDups(
      Multimodal.decodeAudio(spark, blobs, "media_id", "content"),
      "media_id", hashCol = "afingerprint").collect()
    assert(dups.length == 1 && dups.head.getLong(0) == 1L &&
      dups.head.getLong(1) == 2L && dups.head.getInt(2) == 0)
  }

  // ---- G.711 µ-law / A-law -------------------------------------------------

  test("G.711: encode is the exact inverse of decode on all 256 codes") {
    for (c <- 0 until 256) {
      // one inherent exception: µ-law has TWO zero codes (0x7f is
      // "negative zero") — encode(0) returns the canonical 0xff
      val expectMu = if (c == 0x7f) 0xff else c
      assert(G711.mulawEncode(G711.mulawDecode(c)) == expectMu, s"mu code $c")
      assert(G711.alawEncode(G711.alawDecode(c)) == c, s"a code $c")
    }
  }

  test("G.711 anchors and shape (the ITU-T table corners)") {
    assert(G711.mulawDecode(0x00) == -32124) // full negative scale
    assert(G711.mulawDecode(0x80) == 32124) // full positive scale
    assert(G711.mulawDecode(0xff) == 0) // µ-law has a true zero
    assert(G711.alawDecode(0x55) == -8) // A-law has none: min magnitudes
    assert(G711.alawDecode(0xd5) == 8)
    assert(G711.alawDecode(0x2a) == -32256) // full scale
    assert(G711.alawDecode(0xaa) == 32256)
    // decode is strictly monotone over each law's magnitude ramp
    val muPos = (0 until 128).map(c => G711.mulawDecode(0xff - c))
    assert(muPos == muPos.sorted && muPos.distinct.size == 128)
    val aPos = (0 until 128).map(c => G711.alawDecode((c | 0x80) ^ 0x55))
    assert(aPos == aPos.sorted && aPos.distinct.size == 128)
  }

  test("G.711 quantization error is bounded across the 16-bit range") {
    var s = -32124
    while (s <= 32124) {
      val mu = G711.mulawDecode(G711.mulawEncode(s))
      assert(math.abs(mu - s) <= 512, s"mu err at $s: $mu")
      val a = G711.alawDecode(G711.alawEncode(s))
      assert(math.abs(a - s) <= 512, s"a err at $s: $a")
      s += 7
    }
  }

  test("G.711 WAV roundtrip: tags 7/6 decode to the expansion lattice") {
    for (law <- Seq("mu", "a")) {
      // lattice samples (decode outputs) survive the full WAV chain
      // exactly — the property the SQL oracle rides
      val codes = Array.tabulate(300)(i => (i * 7 + 3) % 256)
      val lattice = codes.map(c =>
        if (law == "mu") G711.mulawDecode(c) else G711.alawDecode(c))
      val bytes = encodeG711(Pcm(1, 8000, 16, lattice), law)
      assert(isWav(bytes))
      val back = decode(bytes)
      assert(back.bitsPerSample == 16 && back.sampleRate == 8000)
      assert(back.samples.toSeq == lattice.toSeq, s"law $law")
    }
    // non-lattice input: decodes to the nearest lattice point, stereo
    val p = Pcm(2, 16000, 16, Array.tabulate(64)(i => i * 997 - 31000))
    val back = decode(encodeG711(p, "mu"))
    assert(back.channels == 2)
    assert(p.samples.zip(back.samples).forall {
      case (x, y) => math.abs(x - y) <= 512
    })
    intercept[RuntimeException](encodeG711(p, "alaw"))
  }
}

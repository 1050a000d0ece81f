package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Wire-format roundtrips + named refusals for the r14 containers:
  * YUV4MPEG2 raw-frame video and Sun AU audio. */
class Y4mAuCodecSpec extends AnyFunSuite {

  private def frame(w: Int, h: Int, c420: Boolean, seed: Int): Array[Byte] = {
    val cSize = if (c420) (w / 2) * (h / 2) else w * h
    Array.tabulate(w * h + 2 * cSize)(i => ((seed * 31 + i * 7) % 251).toByte)
  }

  test("y4m roundtrip: geometry, frame rate, exact planes, both chroma layouts") {
    for (c420 <- Seq(true, false)) {
      val v = Y4mCodec.Y4m(16, 8, 30, 1, c420,
        (0 until 5).map(s => frame(16, 8, c420, s)))
      val back = Y4mCodec.decode(Y4mCodec.encode(v))
      assert(back.width == 16 && back.height == 8)
      assert(back.fpsNum == 30 && back.fpsDen == 1)
      assert(back.c420 == c420)
      assert(back.frames.length == 5)
      back.frames.zip(v.frames).foreach { case (g, w2) =>
        assert(g.toSeq == w2.toSeq)
      }
    }
  }

  test("y4m refusals are loud and named") {
    val good = Y4mCodec.encode(Y4mCodec.Y4m(16, 8, 25, 1, c420 = true,
      Seq(frame(16, 8, c420 = true, 1))))
    assert(!Y4mCodec.isY4m("RIFFxxxx".getBytes("US-ASCII")))
    // interlaced streams are out of subset
    val interlaced = new String(good.takeWhile(_ != '\n'), "US-ASCII")
      .replace("Ip", "It") + "\n"
    intercept[RuntimeException] {
      Y4mCodec.decode(interlaced.getBytes("US-ASCII") ++
        good.dropWhile(_ != '\n').drop(1))
    }
    // unknown colourspace
    val mono = new String(good.takeWhile(_ != '\n'), "US-ASCII")
      .replace("C420jpeg", "Cmono") + "\n"
    assert(intercept[RuntimeException] {
      Y4mCodec.decode(mono.getBytes("US-ASCII") ++
        good.dropWhile(_ != '\n').drop(1))
    }.getMessage.contains("out of subset"))
    // truncated frame payload
    assert(intercept[IllegalArgumentException] {
      Y4mCodec.decode(good.dropRight(1))
    }.getMessage.contains("truncated"))
    // C420 with odd dims refuses at encode AND decode
    intercept[IllegalArgumentException] {
      Y4mCodec.encode(Y4mCodec.Y4m(15, 8, 25, 1, c420 = true, Nil))
    }
  }

  private def pcm16(n: Int = 64): WavCodec.Pcm =
    WavCodec.Pcm(1, 8000, 16,
      Array.tabulate(n)(i => ((i * 2654435761L) % 60000 - 30000).toInt))

  test("au roundtrip per encoding; unknown-length sentinel resolves") {
    // 16-bit linear BE: exact
    val p = pcm16()
    val back3 = AuCodec.decode(AuCodec.encode(p, encoding = 3))
    assert(back3.samples.toSeq == p.samples.toSeq)
    assert(back3.sampleRate == 8000 && back3.channels == 1 &&
      back3.bitsPerSample == 16)
    // 8-bit linear: exact on its range
    val p8 = WavCodec.Pcm(2, 11025, 8,
      Array.tabulate(32)(i => (i * 7) % 250 - 125))
    val back2 = AuCodec.decode(AuCodec.encode(p8, encoding = 2))
    assert(back2.samples.toSeq == p8.samples.toSeq)
    assert(back2.channels == 2 && back2.bitsPerSample == 8)
    // mu-law: quantized exactly like the WAV G.711 path
    val enc1 = AuCodec.encode(p, encoding = 1)
    val back1 = AuCodec.decode(enc1)
    val viaWav = WavCodec.decode(WavCodec.encodeG711(p, "mu"))
    assert(back1.samples.toSeq == viaWav.samples.toSeq,
      "AU mu-law and WAV mu-law must land on identical samples")
    // unknown-length sentinel (0xFFFFFFFF) resolves to the payload
    val sent = AuCodec.encode(p, encoding = 3)
    sent(8) = 0xff.toByte; sent(9) = 0xff.toByte
    sent(10) = 0xff.toByte; sent(11) = 0xff.toByte
    assert(AuCodec.decode(sent).samples.toSeq == p.samples.toSeq)
  }

  test("au refusals are loud and named") {
    val good = AuCodec.encode(pcm16(), encoding = 3)
    assert(!AuCodec.isAu("FORMxxxxAIFF".getBytes("US-ASCII")))
    // unsupported encoding (4 = 24-bit)
    val e4 = good.clone(); e4(15) = 4
    assert(intercept[RuntimeException] {
      AuCodec.decode(e4)
    }.getMessage.contains("out of subset"))
    // declared size beyond the payload
    val big = good.clone(); big(8) = 0x7f.toByte
    assert(intercept[IllegalArgumentException] {
      AuCodec.decode(big)
    }.getMessage.contains("only"))
    intercept[RuntimeException] { AuCodec.encode(pcm16(), encoding = 9) }
  }
}

/** Cross-container identity on the shared substrates: a Y4M and an AVI
  * of the same content land on the same temporal-fingerprint path; an
  * AU, WAV, FLAC and AIFF of the same samples agree on every feature. */
class MultimodalY4mAuSpec extends SparkSuite {
  import org.apache.spark.sql.functions.{col, expr}
  import spark.implicits._

  test("decodeVideos handles y4m; fingerprints ride the shared banded join") {
    // 3 families of 2 identical y4m streams + 1 avi row: all decode
    val blobs = (0L until 7L).map { id =>
      if (id == 6L) {
        val fr = (0 until 3).map(s => JpegCodec.encodePlanes(
          Array(Array.fill(16 * 16)(40 + s * 10),
            Array.fill(16 * 16)(100), Array.fill(16 * 16)(90)),
          16, 16, quality = 100, subsample420 = true))
        (id, AviCodec.encodeMjpeg(fr, 16, 16, usPerFrame = 40000L))
      } else {
        val fam = id / 2
        val frames = (0 until 4).map { f =>
          val base = ((fam * 37 + f * 11) % 200).toInt + 20
          Array.tabulate(16 * 8 + 2 * 32)(i =>
            ((base + i * (fam + 1)) % 240).toByte)
        }
        (id, Y4mCodec.encode(Y4mCodec.Y4m(16, 8, 25, 1, c420 = true, frames)))
      }
    }.toDF("media_id", "content")
    val dec = Multimodal.decodeVideos(spark, blobs, "media_id", "content")
      .orderBy("media_id").collect()
    assert(dec.forall(r => !r.isNullAt(r.fieldIndex("vfingerprint"))))
    assert(dec(0).getInt(1) == 16 && dec(0).getInt(2) == 8) // y4m dims
    assert(dec(0).getLong(4) == 40000L) // 25 fps → 40ms per frame
    assert(dec(6).getInt(3) == 3) // the avi row's frame count
    // family members share fingerprints; the shared banded join finds
    // exactly the 3 within-family pairs
    val pairs = Multimodal.imageNearDups(
        Multimodal.decodeVideos(spark, blobs, "media_id", "content"),
        "media_id", hashCol = "vfingerprint")
      .filter(expr("media_id_a div 2 = media_id_b div 2"))
    assert(pairs.count() == 3L)
    // videoFrames samples y4m frames with luma phash
    val frames = Multimodal.videoFrames(spark,
      blobs.filter(col("media_id") === 0L), "media_id", "content", stride = 2)
    assert(frames.count() == 2L)
    assert(frames.select("width").distinct().head().getInt(0) == 16)
  }

  test("AU lands on the same Pcm substrate: features agree across containers") {
    val samples = Array.tabulate(128)(i =>
      ((i * 2654435761L) % 60000 - 30000).toInt)
    val p = WavCodec.Pcm(1, 8000, 16, samples)
    val blobs = Seq(
      (0L, WavCodec.encode(p)),
      (1L, FlacCodec.encode(p, blockSize = 64)),
      (2L, AiffCodec.encode(p)),
      (3L, AuCodec.encode(p, encoding = 3))).toDF("media_id", "content")
    val rows = Multimodal.decodeAudio(spark, blobs, "media_id", "content")
      .select("energy", "zero_crossings", "peak", "afingerprint")
      .distinct().collect()
    assert(rows.length == 1,
      s"containers disagree on features: ${rows.mkString(", ")}")
    // the lossy pair: AU mu-law ≡ WAV mu-law bit-for-bit
    val lossy = Seq(
      (0L, WavCodec.encodeG711(p, "mu")),
      (1L, AuCodec.encode(p, encoding = 1))).toDF("media_id", "content")
    assert(Multimodal.decodeAudio(spark, lossy, "media_id", "content")
      .select("energy", "zero_crossings", "peak", "afingerprint")
      .distinct().count() == 1L)
  }
}

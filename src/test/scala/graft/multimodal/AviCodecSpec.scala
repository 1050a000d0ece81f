package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Wire-format roundtrips for the pure-JVM MJPEG AVI codec: RIFF walk,
  * LIST nesting, even-chunk padding, idx1 emission, header agreement —
  * every decode is by the independent parser over bytes the encoder
  * produced from the public AVI RIFF reference, with frame payloads
  * from the already-spec-tested JpegCodec. */
class AviCodecSpec extends AnyFunSuite {

  private def jpegFrame(w: Int, h: Int, seed: Int): Array[Byte] =
    JpegCodec.encodePlanes(Array(
      Array.tabulate(w * h) { i =>
        val bx = (i % w) / 8; val by = (i / w) / 8
        ((seed * 13 + bx * 17 + by * 29) % 216) + 20
      },
      Array.tabulate(w * h)(i => ((seed * 7 + ((i % w) / 16) * 31) % 200) + 28),
      Array.tabulate(w * h)(i => ((seed * 11 + ((i % w) / 16) * 23) % 200) + 30)),
      w, h, quality = 100, subsample420 = true)

  private def findSeq(hay: Array[Byte], needle: String): Int = {
    val n = needle.getBytes("US-ASCII")
    hay.indices.find(i => i + n.length <= hay.length &&
      n.indices.forall(j => hay(i + j) == n(j))).getOrElse(-1)
  }

  test("roundtrip: header fields + byte-exact frame payloads") {
    val w = 32; val h = 16
    val frames = (0 until 5).map(f => jpegFrame(w, h, f))
    val bytes = AviCodec.encodeMjpeg(frames, w, h, usPerFrame = 40000L)
    assert(AviCodec.isAvi(bytes))
    val avi = AviCodec.decode(bytes)
    assert((avi.width, avi.height, avi.usPerFrame) == (w, h, 40000L))
    assert(avi.frames.length == 5)
    avi.frames.zip(frames).foreach { case (got, want) =>
      assert(got.toSeq == want.toSeq)
    }
    // every recovered frame decodes through the JPEG chain
    val img = JpegCodec.decode(avi.frames(3))
    assert((img.width, img.height, img.channels) == (w, h, 3))
  }

  test("odd-length frames are padded to even chunk boundaries") {
    val w = 32; val h = 16
    val base = jpegFrame(w, h, 9)
    // JPEG tolerates trailing bytes after EOI; force an odd payload
    val odd = if (base.length % 2 == 1) base else base :+ 0x00.toByte
    assert(odd.length % 2 == 1)
    val bytes = AviCodec.encodeMjpeg(Seq(odd, base, odd), w, h)
    assert(bytes.length % 2 == 0)
    val avi = AviCodec.decode(bytes)
    assert(avi.frames.map(_.length) == Vector(odd.length, base.length, odd.length))
    assert(avi.frames(0).toSeq == odd.toSeq)
  }

  test("idx1 entries point at the frame chunks (offsets from 'movi')") {
    val w = 32; val h = 16
    val frames = (0 until 3).map(f => jpegFrame(w, h, f + 40))
    val bytes = AviCodec.encodeMjpeg(frames, w, h)
    val moviAt = findSeq(bytes, "movi")
    val idxAt = findSeq(bytes, "idx1")
    assert(moviAt > 0 && idxAt > moviAt)
    def le32(i: Int): Long = ((bytes(i) & 0xffL)) |
      ((bytes(i + 1) & 0xffL) << 8) | ((bytes(i + 2) & 0xffL) << 16) |
      ((bytes(i + 3) & 0xffL) << 24)
    val nEntries = (le32(idxAt + 4) / 16).toInt
    assert(nEntries == 3)
    (0 until nEntries).foreach { e =>
      val rec = idxAt + 8 + e * 16
      assert(new String(bytes, rec, 4, "US-ASCII") == "00dc")
      assert(le32(rec + 4) == 0x10L) // AVIIF_KEYFRAME
      val off = le32(rec + 8).toInt
      // offset is relative to the 'movi' fourcc position
      assert(new String(bytes, moviAt + off, 4, "US-ASCII") == "00dc")
      assert(le32(moviAt + off + 4) == le32(rec + 12))
    }
  }

  test("refusals are loud and named") {
    val w = 32; val h = 16
    val good = AviCodec.encodeMjpeg(Seq(jpegFrame(w, h, 1)), w, h)

    assert(!AviCodec.isAvi("RIFFxxxxWAVE".getBytes("US-ASCII")))
    assert(intercept[IllegalArgumentException] {
      AviCodec.decode("RIFFxxxxWAVEdata".getBytes("US-ASCII"))
    }.getMessage.contains("signature"))

    // non-MJPG codec: patch the strh handler fourcc
    val xvid = good.clone()
    val strhAt = findSeq(xvid, "strh")
    // handler fourcc sits 4 bytes into the strh payload (after fccType)
    "XVID".getBytes("US-ASCII").copyToArray(xvid, strhAt + 8 + 4)
    assert(intercept[IllegalArgumentException] {
      AviCodec.decode(xvid)
    }.getMessage.contains("XVID"))

    // audio stream type
    val auds = good.clone()
    "auds".getBytes("US-ASCII").copyToArray(auds, strhAt + 8)
    assert(intercept[IllegalArgumentException] {
      AviCodec.decode(auds)
    }.getMessage.contains("auds"))

    // uncompressed frames
    val db = good.clone()
    val dcAt = findSeq(db, "00dc")
    db(dcAt + 3) = 'b'.toByte
    assert(intercept[IllegalArgumentException] {
      AviCodec.decode(db)
    }.getMessage.contains("00db"))

    // frame-count mismatch: bump avih dwTotalFrames
    val short = good.clone()
    val avihAt = findSeq(short, "avih")
    short(avihAt + 8 + 16) = 7
    assert(intercept[IllegalArgumentException] {
      AviCodec.decode(short)
    }.getMessage.contains("frames"))

    assert(intercept[IllegalArgumentException] {
      AviCodec.encodeMjpeg(Seq(Array[Byte](1, 2, 3)), w, h)
    }.getMessage.contains("not JPEG"))

    // a crafted near-2^32 chunk size must refuse, not stall the walk
    val huge = good.clone()
    val dcAt2 = findSeq(huge, "00dc")
    huge(dcAt2 + 4) = 0xf8.toByte; huge(dcAt2 + 5) = 0xff.toByte
    huge(dcAt2 + 6) = 0xff.toByte; huge(dcAt2 + 7) = 0xff.toByte
    assert(intercept[IllegalArgumentException] {
      AviCodec.decode(huge)
    }.getMessage.contains("overruns"))
  }
}

/** The Spark-side video pipeline over the real codec boundary:
  * decodeVideos / videoFrames exactness vs direct per-frame decode, the
  * temporal fingerprint's order sensitivity, and video near-dup through
  * the same banded join as images/audio. */
class MultimodalVideoSpec extends SparkSuite {
  import spark.implicits._

  private def jpegFrame(w: Int, h: Int, seed: Int): Array[Byte] =
    JpegCodec.encodePlanes(Array(
      Array.tabulate(w * h) { i =>
        val bx = (i % w) / 8; val by = (i / w) / 8
        ((seed * 13 + bx * 17 + by * 29) % 216) + 20
      },
      Array.tabulate(w * h)(i => ((seed * 7 + ((i % w) / 16) * 31) % 200) + 28),
      Array.tabulate(w * h)(i => ((seed * 11 + ((i % w) / 16) * 23) % 200) + 30)),
      w, h, quality = 100, subsample420 = true)

  private def avi(seeds: Seq[Int]): Array[Byte] =
    AviCodec.encodeMjpeg(seeds.map(s => jpegFrame(32, 16, s)), 32, 16)

  // uniform-gray frames: mass ∝ the gray value, so the up/down pattern
  // (hence the fingerprint) is exactly predictable
  private def grayAvi(values: Seq[Int]): Array[Byte] =
    AviCodec.encodeMjpeg(values.map { v =>
      JpegCodec.encodePlanes(Array(
        Array.fill(32 * 16)(v), Array.fill(32 * 16)(128),
        Array.fill(32 * 16)(128)), 32, 16,
        quality = 100, subsample420 = true)
    }, 32, 16)

  private def directSums(frames: Seq[Array[Byte]]): (Array[Long], Seq[Long]) = {
    val sums = new Array[Long](3)
    val mass = frames.map { fj =>
      val img = JpegCodec.decode(fj)
      var m = 0L
      val n = img.pixels.length / img.channels
      (0 until n).foreach { i =>
        (0 until 3).foreach { c =>
          val v = img.pixels(i * 3 + c) & 0xff
          sums(c) += v; m += v
        }
      }
      m
    }
    (sums, mass)
  }

  test("decodeVideos: exact sums, frame count, fingerprint; null through") {
    val seeds = Seq(3, 11, 5, 20)
    val frames = seeds.map(s => jpegFrame(32, 16, s))
    val df = Seq((1L, AviCodec.encodeMjpeg(frames, 32, 16, 40000L)),
      (2L, "not a video".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "content")
    val out = Multimodal.decodeVideos(spark, df, "media_id", "content")
      .orderBy("media_id").collect()
    val (sums, mass) = directSums(frames)
    val r1 = out(0)
    assert(r1.getInt(1) == 32 && r1.getInt(2) == 16)
    assert(r1.getInt(3) == 4 && r1.getLong(4) == 40000L)
    assert((r1.getLong(5), r1.getLong(6), r1.getLong(7)) ==
      (sums(0), sums(1), sums(2)))
    val wantFp = (0 until 3).map(i =>
      if (mass(i) > mass(i + 1)) 1L << i else 0L).sum
    assert(r1.getLong(8) == wantFp)
    assert(out(1).isNullAt(5) && out(2).isNullAt(8))
  }

  test("fingerprint is order-sensitive: reversed frames differ") {
    // asymmetric up/down pattern (a palindromic one fingerprints the
    // same reversed): forward → bit 2 only; reversed → bits 0, 2, 3
    val values = Seq(10, 200, 210, 20, 30)
    val df = Seq((1L, grayAvi(values)), (2L, grayAvi(values.reverse)))
      .toDF("media_id", "content")
    val fp = Multimodal.decodeVideos(spark, df, "media_id", "content")
      .orderBy("media_id").select("vfingerprint", "sum_c0").collect()
    assert(fp(0).getLong(1) == fp(1).getLong(1)) // plain sums agree
    def want(vs: Seq[Int]): Long =
      vs.sliding(2).zipWithIndex.collect {
        case (Seq(a, b), i) if a > b => 1L << i
      }.sum
    assert(fp(0).getLong(0) == want(values))
    assert(fp(1).getLong(0) == want(values.reverse))
    assert(fp(0).getLong(0) != fp(1).getLong(0)) // the fingerprint differs
  }

  test("videoFrames: stride sampling with per-frame exactness") {
    val seeds = Seq(7, 13, 2, 8, 21)
    val frames = seeds.map(s => jpegFrame(32, 16, s))
    val df = Seq((5L, AviCodec.encodeMjpeg(frames, 32, 16)))
      .toDF("media_id", "content")
    val rows = Multimodal.videoFrames(spark, df, "media_id", "content",
      stride = 2).orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    rows.foreach { r =>
      val img = JpegCodec.decode(frames(r.getInt(1)))
      val want = new Array[Long](3)
      (0 until img.pixels.length / 3).foreach { i =>
        (0 until 3).foreach(c => want(c) += img.pixels(i * 3 + c) & 0xff)
      }
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) ==
        (want(0), want(1), want(2)), s"frame ${r.getInt(1)}")
      assert(r.getLong(7) == PngCodec.pHash(img))
    }
  }

  test("video near-dup rides the banded join on the temporal fingerprint") {
    // uniform-gray frames: mass is directly proportional to the gray
    // value, so the up/down pattern (hence the fingerprint) is exact
    def grayAvi(values: Seq[Int]): Array[Byte] =
      AviCodec.encodeMjpeg(values.map { v =>
        JpegCodec.encodePlanes(Array(
          Array.fill(32 * 16)(v), Array.fill(32 * 16)(128),
          Array.fill(32 * 16)(128)), 32, 16,
          quality = 100, subsample420 = true)
      }, 32, 16)
    val values = Seq(10, 200, 20, 210, 30, 220, 40, 230)
    val a = grayAvi(values)
    val b = grayAvi(values) // same content: fingerprint equal
    val c = grayAvi(values.reverse) // reversed timeline: fingerprint differs
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("media_id", "content")
    val dec = Multimodal.decodeVideos(spark, df, "media_id", "content")
    val fps = dec.orderBy("media_id").select("vfingerprint")
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
    val dups = Multimodal.imageNearDups(dec, "media_id",
      hashCol = "vfingerprint", maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups.contains((1L, 2L)))
    assert(!dups.contains((1L, 3L)) && !dups.contains((2L, 3L)))
  }
}

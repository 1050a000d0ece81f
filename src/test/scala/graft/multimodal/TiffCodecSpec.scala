package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Baseline-TIFF wire format: endianness, IFD walk, strip reassembly,
  * inline-vs-offset values, WhiteIsZero inversion, named refusals. */
class TiffCodecSpec extends AnyFunSuite {

  private def rgb(w: Int, h: Int, seed: Int): PngCodec.Image =
    PngCodec.Image(w, h, 3, Array.tabulate(w * h * 3)(i =>
      ((seed * 31 + i * 7) % 256).toByte))

  test("roundtrip: RGB and gray through two-strip little-endian files") {
    for ((w, h) <- Seq((5, 4), (1, 1), (7, 3))) {
      val img = rgb(w, h, w + h)
      val back = TiffCodec.decode(TiffCodec.encode(img))
      assert(back.width == w && back.height == h && back.channels == 3)
      assert(back.pixels.toSeq == img.pixels.toSeq, s"${w}x$h rgb")
      val gray = PngCodec.Image(w, h, 1,
        Array.tabulate(w * h)(i => ((w * 13 + i * 5) % 256).toByte))
      val backG = TiffCodec.decode(TiffCodec.encode(gray))
      assert(backG.channels == 1 && backG.pixels.toSeq == gray.pixels.toSeq)
    }
  }

  test("big-endian MM files and WhiteIsZero decode correctly") {
    // hand-build: MM, 2x2 gray, one strip, photometric 0 (WhiteIsZero)
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def be16(v: Int): Unit = { out += ((v >> 8) & 0xff).toByte; out += (v & 0xff).toByte }
    def be32(v: Int): Unit = { be16((v >> 16) & 0xffff); be16(v & 0xffff) }
    out += 'M'.toByte; out += 'M'.toByte; be16(42); be32(12)
    out ++= Seq[Byte](10, 20, 30, 40) // pixels at offset 8
    // IFD at 12: 7 entries
    be16(7)
    def entry(tag: Int, typ: Int, count: Int, v: Int): Unit = {
      be16(tag); be16(typ); be32(count)
      if (typ == 3) { be16(v); be16(0) } else be32(v)
    }
    entry(256, 3, 1, 2); entry(257, 3, 1, 2)
    entry(258, 3, 1, 8); entry(259, 3, 1, 1)
    entry(262, 3, 1, 0) // WhiteIsZero
    entry(273, 4, 1, 8); entry(279, 4, 1, 4)
    be32(0)
    val img = TiffCodec.decode(out.toArray)
    assert(img.width == 2 && img.height == 2 && img.channels == 1)
    // inverted: 255-10, 255-20, ...
    assert(img.pixels.map(_ & 0xff).toSeq == Seq(245, 235, 225, 215))
  }

  test("refusals are loud and named") {
    val good = TiffCodec.encode(rgb(4, 4, 1))
    assert(!TiffCodec.isTiff("BM......".getBytes("US-ASCII")))
    // compression tag value -> LZW (5): IFD entry order is fixed by
    // the encoder (tag 259 is entry index 3); value at entry+8
    val ifdAt = {
      val b = good
      (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
        ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
    }
    val lzw = good.clone()
    lzw(ifdAt + 2 + 3 * 12 + 8) = 5
    assert(intercept[IllegalArgumentException] {
      TiffCodec.decode(lzw)
    }.getMessage.contains("out of subset"))
    // a second IFD is multi-page: refuse
    val multi = good.clone()
    val nEntries = (multi(ifdAt) & 0xff) | ((multi(ifdAt + 1) & 0xff) << 8)
    multi(ifdAt + 2 + nEntries * 12) = 8
    assert(intercept[IllegalArgumentException] {
      TiffCodec.decode(multi)
    }.getMessage.contains("multi-IFD"))
    // a 0xFFFFFFFF value count refuses by name (review r14: it used
    // to overflow negative and crash .head unnamed)
    val badCount = good.clone()
    val ifd2 = ifdAt // first entry's count field at ifdAt+2+4
    badCount(ifd2 + 2 + 4) = 0xff.toByte; badCount(ifd2 + 2 + 5) = 0xff.toByte
    badCount(ifd2 + 2 + 6) = 0xff.toByte; badCount(ifd2 + 2 + 7) = 0xff.toByte
    assert(intercept[IllegalArgumentException] {
      TiffCodec.decode(badCount)
    }.getMessage.contains("values"))
    // chopping the tail removes the offset-stored strip arrays: loud
    assert(intercept[IllegalArgumentException] {
      TiffCodec.decode(good.dropRight(1))
    }.getMessage.contains("overruns"))
    // chopping the head invalidates the IFD pointer: loud too
    intercept[IllegalArgumentException] { TiffCodec.decode(good.take(20)) }
  }
}

/** TIFF joins the shared substrate: identical pixels across PNG, BMP,
  * PNM and TIFF mean identical features. */
class MultimodalTiffSpec extends SparkSuite {
  import spark.implicits._

  test("decodeImages sniffs tiff; features agree across four lossless containers") {
    val img = PngCodec.Image(8, 6, 3, Array.tabulate(8 * 6 * 3)(i =>
      ((i * 37 + 11) % 256).toByte))
    val blobs = Seq(
      (0L, PngCodec.encode(img)),
      (1L, BmpCodec.encode(img)),
      (2L, PnmCodec.encode(img)),
      (3L, TiffCodec.encode(img))).toDF("media_id", "content")
    val rows = Multimodal.decodeImages(spark, blobs, "media_id", "content")
      .select("width", "height", "channels", "sum_c0", "sum_c1", "sum_c2",
        "ahash", "dhash", "phash")
      .distinct().collect()
    assert(rows.length == 1,
      s"containers disagree on features: ${rows.mkString(", ")}")
  }
}

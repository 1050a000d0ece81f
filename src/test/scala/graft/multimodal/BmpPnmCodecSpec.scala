package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Wire-format roundtrips + named refusals for the r14 image
  * containers: BMP (BI_RGB 24-bit + 8-bit paletted, bottom-up and
  * top-down) and netpbm P5/P6. */
class BmpPnmCodecSpec extends AnyFunSuite {

  private def rgb(w: Int, h: Int, seed: Int): PngCodec.Image =
    PngCodec.Image(w, h, 3, Array.tabulate(w * h * 3)(i =>
      ((seed * 31 + i * 7) % 256).toByte))

  test("bmp 24-bit roundtrip: odd widths exercise row padding") {
    for (w <- Seq(1, 3, 4, 7); h <- Seq(1, 2, 5)) {
      val img = rgb(w, h, w * 10 + h)
      val back = BmpCodec.decode(BmpCodec.encode(img))
      assert(back.width == w && back.height == h && back.channels == 3)
      assert(back.pixels.toSeq == img.pixels.toSeq, s"${w}x$h")
    }
  }

  test("bmp 8-bit paletted and top-down rows decode correctly") {
    // hand-build: 2x2 8-bit paletted, top-down (negative height)
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def le16(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    out += 'B'.toByte; out += 'M'.toByte
    le32(54 + 8 + 8); le16(0); le16(0); le32(54 + 8)
    le32(40); le32(2); le32(-2) // top-down
    le16(1); le16(8); le32(0); le32(8); le32(0); le32(0)
    le32(2); le32(0) // 2 palette entries
    // palette: index 0 = red, index 1 = blue (BGRA quads)
    out ++= Seq[Byte](0, 0, 0xff.toByte, 0) // red
    out ++= Seq[Byte](0xff.toByte, 0, 0, 0) // blue
    // rows (top-down): [0,1] then [1,0], each padded to 4 bytes
    out ++= Seq[Byte](0, 1, 0, 0)
    out ++= Seq[Byte](1, 0, 0, 0)
    val img = BmpCodec.decode(out.toArray)
    assert(img.width == 2 && img.height == 2 && img.channels == 3)
    def px(x: Int, y: Int) = {
      val p = (y * 2 + x) * 3
      (img.pixels(p) & 0xff, img.pixels(p + 1) & 0xff, img.pixels(p + 2) & 0xff)
    }
    assert(px(0, 0) == ((255, 0, 0)) && px(1, 0) == ((0, 0, 255)))
    assert(px(0, 1) == ((0, 0, 255)) && px(1, 1) == ((255, 0, 0)))
  }

  test("bmp refusals are loud and named") {
    val good = BmpCodec.encode(rgb(4, 4, 1))
    assert(!BmpCodec.isBmp("PNG.....".getBytes("US-ASCII") ++ new Array[Byte](60)))
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assert(intercept[IllegalArgumentException] {
      BmpCodec.decode(rle)
    }.getMessage.contains("out of subset"))
    val b16 = good.clone(); b16(28) = 16
    assert(intercept[IllegalArgumentException] {
      BmpCodec.decode(b16)
    }.getMessage.contains("16-bit"))
    assert(intercept[IllegalArgumentException] {
      BmpCodec.decode(good.dropRight(4))
    }.getMessage.contains("truncated"))
  }

  test("pnm P5/P6 roundtrips; comments and whitespace tolerated") {
    val color = rgb(5, 3, 2)
    assert(PnmCodec.decode(PnmCodec.encode(color)).pixels.toSeq ==
      color.pixels.toSeq)
    val gray = PngCodec.Image(4, 2, 1,
      Array.tabulate(8)(i => (i * 30).toByte))
    val back = PnmCodec.decode(PnmCodec.encode(gray))
    assert(back.channels == 1 && back.pixels.toSeq == gray.pixels.toSeq)
    // the netpbm grammar: comments + arbitrary whitespace in the header
    val wild = ("P5 # a comment\n# another\n  4\t2 " +
      "\n255\n").getBytes("US-ASCII") ++ gray.pixels
    assert(PnmCodec.decode(wild).pixels.toSeq == gray.pixels.toSeq)
  }

  test("crafted geometry/palette overflows refuse by name (review r14)") {
    // P6 65536x65536 would overflow Int to 0 and slip the raster check
    assert(intercept[IllegalArgumentException] {
      PnmCodec.decode("P6\n65536 65536\n255\n".getBytes("US-ASCII"))
    }.getMessage.contains("too large"))
    // 8-bit BMP with biClrUsed = 0x80000000: named refusal, never a
    // NegativeArraySizeException
    val img8 = {
      val out = new scala.collection.mutable.ArrayBuffer[Byte]()
      def le16(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
      out += 'B'.toByte; out += 'M'.toByte
      le32(54 + 8 + 8); le16(0); le16(0); le32(54 + 8)
      le32(40); le32(2); le32(2); le16(1); le16(8); le32(0); le32(8)
      le32(0); le32(0); le32(0x80000000); le32(0) // poisoned biClrUsed
      out ++= new Array[Byte](16)
      out.toArray
    }
    assert(intercept[IllegalArgumentException] {
      BmpCodec.decode(img8)
    }.getMessage.contains("palette"))
  }

  test("pnm refusals are loud and named") {
    assert(intercept[RuntimeException] {
      PnmCodec.decode("P3\n1 1\n255\n1 2 3".getBytes("US-ASCII"))
    }.getMessage.contains("ASCII"))
    assert(intercept[IllegalArgumentException] {
      PnmCodec.decode("P5\n2 2\n65535\n".getBytes("US-ASCII") ++
        new Array[Byte](8))
    }.getMessage.contains("maxval"))
    assert(intercept[IllegalArgumentException] {
      PnmCodec.decode("P6\n4 4\n255\n".getBytes("US-ASCII") ++
        new Array[Byte](10))
    }.getMessage.contains("truncated"))
  }
}

/** BMP/PNM land on the shared Image substrate: identical pixels across
  * containers mean identical sums and perceptual hashes. */
class MultimodalBmpPnmSpec extends SparkSuite {
  import org.apache.spark.sql.functions.col
  import spark.implicits._

  test("decodeImages sniffs bmp + pnm; features agree with png of the same pixels") {
    val img = PngCodec.Image(8, 6, 3, Array.tabulate(8 * 6 * 3)(i =>
      ((i * 37 + 11) % 256).toByte))
    val blobs = Seq(
      (0L, PngCodec.encode(img)),
      (1L, BmpCodec.encode(img)),
      (2L, PnmCodec.encode(img))).toDF("media_id", "content")
    val rows = Multimodal.decodeImages(spark, blobs, "media_id", "content")
      .select("width", "height", "channels", "sum_c0", "sum_c1", "sum_c2",
        "ahash", "dhash", "phash")
      .distinct().collect()
    assert(rows.length == 1,
      s"containers disagree on features: ${rows.mkString(", ")}")
    // undecodable payloads still null through
    val mixed = Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "content")
    assert(Multimodal.decodeImages(spark, mixed, "media_id", "content")
      .filter(col("phash").isNull).count() == 1L)
  }
}

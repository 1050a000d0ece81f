package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The REAL WebP-lossless codec (WebpCodec): bit-exact roundtrips
  * through every encoder tool (literals, subtract-green, all 14
  * predictor modes, color cache, dist-1 RLE back-references), edge
  * dims, and named refusals for everything outside the VP8L subset. */
class WebpCodecSpec extends AnyFunSuite {
  import WebpCodec._

  private def raster(w: Int, h: Int, ch: Int)(f: (Int, Int, Int) => Int) =
    PngCodec.Image(w, h, ch, Array.tabulate(w * h * ch) { i =>
      val pix = i / ch; (f(pix % w, pix / w, i % ch) & 0xff).toByte
    })

  private def rgbaOf(img: PngCodec.Image): Seq[Int] = {
    // normalize 3ch to 4ch-with-opaque for comparison with decode output
    val n = img.width * img.height
    (0 until n).flatMap { i =>
      val b = i * img.channels
      Seq(img.pixels(b) & 0xff, img.pixels(b + 1) & 0xff,
        img.pixels(b + 2) & 0xff,
        if (img.channels == 4) img.pixels(b + 3) & 0xff else 255)
    }
  }

  test("plain-literal roundtrip is bit-exact (RGB and RGBA)") {
    for (ch <- Seq(3, 4)) {
      val img = raster(23, 17, ch)((x, y, c) => x * 7 + y * 11 + c * 29)
      val back = decode(encode(img))
      assert(back.width == 23 && back.height == 17 && back.channels == 4)
      assert(rgbaOf(back) == rgbaOf(img), s"ch=$ch")
    }
  }

  test("subtract-green transform roundtrips") {
    val img = raster(16, 9, 3)((x, y, c) => x * 13 + y * 5 + c * 40)
    val back = decode(encode(img, subtractGreen = true))
    assert(rgbaOf(back) == rgbaOf(img))
  }

  test("every predictor mode (0-13) roundtrips") {
    val img = raster(20, 12, 3)((x, y, c) => x * x + y * 3 + c * 17)
    for (mode <- 0 to 13) {
      val back = decode(encode(img, predictorMode = Some(mode)))
      assert(rgbaOf(back) == rgbaOf(img), s"mode $mode")
    }
  }

  test("subtract-green composed with predictor roundtrips") {
    val img = raster(33, 21, 4)((x, y, c) => x * 3 + y * 7 + c * 23)
    for (mode <- Seq(1, 7, 11, 12, 13)) {
      val back = decode(encode(img, subtractGreen = true,
        predictorMode = Some(mode)))
      assert(rgbaOf(back) == rgbaOf(img), s"mode $mode")
    }
  }

  test("color cache roundtrips (few distinct colors, cache hits)") {
    val img = raster(40, 20, 3)((x, y, _) => ((x / 5 + y / 4) % 4) * 60)
    val plain = encode(img)
    val cached = encode(img, cacheBits = 4)
    assert(rgbaOf(decode(cached)) == rgbaOf(img))
    // the cache must actually compress (mostly cache hits after warmup)
    assert(cached.length < plain.length,
      s"cache ${cached.length} !< plain ${plain.length}")
  }

  test("dist-1 RLE back-references roundtrip and compress runs") {
    val img = raster(64, 16, 3)((x, y, c) => if (y % 4 == 0) x + c else 77)
    val plain = encode(img)
    val rled = encode(img, rle = true)
    assert(rgbaOf(decode(rled)) == rgbaOf(img))
    assert(rled.length < plain.length, s"${rled.length} !< ${plain.length}")
  }

  test("all tools combined roundtrip") {
    val img = raster(48, 31, 4)((x, y, c) =>
      if (x % 9 < 4) 120 else x * 5 + y * 9 + c * 31)
    val back = decode(encode(img, subtractGreen = true,
      predictorMode = Some(7), cacheBits = 5, rle = true))
    assert(rgbaOf(back) == rgbaOf(img))
  }

  test("edge dims: 1x1, single row, single column") {
    for ((w, h) <- Seq((1, 1), (37, 1), (1, 29))) {
      val img = raster(w, h, 3)((x, y, c) => x * 31 + y * 17 + c * 7)
      assert(rgbaOf(decode(encode(img))) == rgbaOf(img), s"${w}x$h")
      assert(rgbaOf(decode(encode(img, predictorMode = Some(2)))) ==
        rgbaOf(img), s"${w}x$h pred")
    }
  }

  test("alpha hint and real alpha survive") {
    val img = raster(8, 8, 4)((x, y, c) => if (c == 3) x * 30 else x + y)
    val back = decode(encode(img))
    assert(rgbaOf(back) == rgbaOf(img))
  }

  test("out-of-subset containers and transforms refuse by name") {
    val ok = encode(raster(8, 6, 3)((x, y, c) => x + y + c))
    // VP8L → VP8 (space): lossy
    val lossy = ok.clone()
    lossy(15) = ' '.toByte
    val e1 = intercept[RuntimeException](decode(lossy))
    assert(e1.getMessage.contains("lossy"))
    // VP8L → VP8X: extended
    val ext = ok.clone()
    ext(15) = 'X'.toByte
    val e2 = intercept[RuntimeException](decode(ext))
    assert(e2.getMessage.contains("VP8X"))
    // bad VP8L signature byte
    val badSig = ok.clone()
    badSig(20) = 0x55.toByte
    val e3 = intercept[IllegalArgumentException](decode(badSig))
    assert(e3.getMessage.contains("signature"))
    // not a RIFF at all
    val e4 = intercept[IllegalArgumentException](
      decode(Array[Byte](1, 2, 3, 4)))
    assert(e4.getMessage.contains("RIFF"))

    // hand-build a stream announcing a cross-color transform (type 1)
    def streamWith(transformType: Int): Array[Byte] = {
      val bits = new scala.collection.mutable.ArrayBuffer[Int]
      def put(v: Int, n: Int): Unit =
        (0 until n).foreach(i => bits += ((v >>> i) & 1))
      put(7, 14); put(7, 14) // 8x8
      put(0, 1); put(0, 3) // alpha, version
      put(1, 1); put(transformType, 2) // one transform
      put(3, 3) // whatever follows (size bits / palette size low bits)
      val payload = bits.grouped(8).map(g =>
        g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
      val body = Array(0x2f.toByte) ++ payload
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      def le32(v: Int): Unit =
        (0 until 4).foreach(k => out.write((v >>> (8 * k)) & 0xff))
      le32(4 + 8 + body.length)
      out.write("WEBP".getBytes("US-ASCII"))
      out.write("VP8L".getBytes("US-ASCII"))
      le32(body.length)
      out.write(body, 0, body.length)
      out.toByteArray
    }
    val e5 = intercept[RuntimeException](decode(streamWith(1)))
    assert(e5.getMessage.contains("cross-color"))
    val e6 = intercept[RuntimeException](decode(streamWith(3)))
    assert(e6.getMessage.contains("color-indexing"))
  }

  test("isWebpLossless sniffing discriminates") {
    val webp = encode(raster(4, 4, 3)((x, y, c) => x + y + c))
    assert(isWebpLossless(webp))
    assert(!isWebpLossless(PngCodec.encode(raster(4, 4, 3)((x, y, c) => x))))
    val lossy = webp.clone(); lossy(15) = ' '.toByte
    assert(isWebp(lossy) && !isWebpLossless(lossy))
  }
}

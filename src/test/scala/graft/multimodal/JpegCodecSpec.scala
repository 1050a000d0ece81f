package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The REAL baseline JPEG codec (JpegCodec): exact block-constant
  * roundtrips at quality 100 (the oracle regime), bounded-error lossy
  * roundtrips at lower quality, 4:2:0 subsampling, restart markers,
  * non-multiple-of-8 dims, and named refusals for everything outside
  * the baseline-sequential subset. */
class JpegCodecSpec extends AnyFunSuite {
  import JpegCodec._

  /** Fixed-point BT.601 inverse, mirroring the decoder (and the
    * jpeg_decode oracle SQL). */
  private def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Int) = math.max(0, math.min(255, v))
    (cl(y + ((91881 * (cr - 128) + 32768) >> 16)),
      cl(y - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)),
      cl(y + ((116130 * (cb - 128) + 32768) >> 16)))
  }

  test("gray block-constant image roundtrips EXACTLY at quality 100") {
    val w = 32; val h = 24
    val plane = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      (bx * 37 + by * 53 + 19) % 256
    }
    val jpg = encodePlanes(Array(plane), w, h, quality = 100)
    val img = decode(jpg)
    assert(img.width == w && img.height == h && img.channels == 1)
    assert(img.pixels.map(_ & 0xff).toSeq == plane.toSeq)
  }

  test("4:4:4 color block-constant planes roundtrip exactly (via the " +
    "fixed-point inverse)") {
    val w = 24; val h = 16
    def blk(i: Int, m: Int, a: Int, b: Int, c: Int) = {
      val bx = (i % w) / 8; val by = (i / w) / 8
      (bx * a + by * b + c) % m
    }
    val yP = Array.tabulate(w * h)(i => blk(i, 256, 41, 23, 60))
    val cbP = Array.tabulate(w * h)(i => blk(i, 200, 17, 31, 40))
    val crP = Array.tabulate(w * h)(i => blk(i, 200, 29, 13, 50))
    val img = decode(encodePlanes(Array(yP, cbP, crP), w, h, quality = 100))
    assert(img.channels == 3)
    var i = 0
    while (i < w * h) {
      val (r, g, b) = yccToRgb(yP(i), cbP(i), crP(i))
      assert((img.pixels(i * 3) & 0xff) == r, s"r at $i")
      assert((img.pixels(i * 3 + 1) & 0xff) == g, s"g at $i")
      assert((img.pixels(i * 3 + 2) & 0xff) == b, s"b at $i")
      i += 1
    }
  }

  test("4:2:0 with macroblock-constant chroma roundtrips exactly") {
    val w = 32; val h = 32
    val yP = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      (bx * 31 + by * 47 + 20) % 256
    }
    // chroma constant per 16×16 macroblock → the 2×2 average is exact
    // and the downsampled 8×8 block is constant → DC-only → exact
    val cbP = Array.tabulate(w * h) { i =>
      val mx = (i % w) / 16; val my = (i / w) / 16
      (mx * 39 + my * 27 + 70) % 256
    }
    val crP = Array.tabulate(w * h) { i =>
      val mx = (i % w) / 16; val my = (i / w) / 16
      (mx * 21 + my * 49 + 90) % 256
    }
    val img = decode(encodePlanes(Array(yP, cbP, crP), w, h,
      quality = 100, subsample420 = true))
    var i = 0
    while (i < w * h) {
      val (r, g, b) = yccToRgb(yP(i), cbP(i), crP(i))
      assert((img.pixels(i * 3) & 0xff) == r &&
        (img.pixels(i * 3 + 1) & 0xff) == g &&
        (img.pixels(i * 3 + 2) & 0xff) == b, s"pixel $i")
      i += 1
    }
  }

  test("restart markers: DRI + RSTn roundtrip, predictors reset") {
    val w = 48; val h = 16 // 6 MCUs at 4:4:4 gray → restarts every 2
    val plane = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; ((i / w) / 8 * 91 + bx * 67 + 5) % 256
    }
    val jpg = encodePlanes(Array(plane), w, h, quality = 100,
      restartInterval = 2)
    // the stream must actually contain RST0/RST1 markers
    val hasRst = jpg.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && ((p(1) & 0xff) == 0xd0 || (p(1) & 0xff) == 0xd1))
    assert(hasRst, "no RSTn emitted")
    assert(decode(jpg).pixels.map(_ & 0xff).toSeq == plane.toSeq)
  }

  test("non-multiple-of-8 dims crop correctly (edge-replicated pad)") {
    val w = 21; val h = 13
    val plane = Array.tabulate(w * h)(i => (i * 7) % 251)
    val img = decode(encodePlanes(Array(plane), w, h, quality = 100))
    assert(img.width == w && img.height == h)
    // pixels inside one 8×8 block of a non-constant image are not bit
    // exact at q=100 — every quantizer is 1, so the only error is the
    // ±0.5 coefficient rounding pushed through the IDCT (a few counts)
    val got = img.pixels.map(_ & 0xff)
    var i = 0
    while (i < w * h) {
      assert(math.abs(got(i) - plane(i)) <= 4, s"pixel $i: ${got(i)} vs ${plane(i)}")
      i += 1
    }
  }

  test("lossy roundtrip at quality 85 stays within a sane error bound") {
    val rnd = new scala.util.Random(12345)
    val w = 40; val h = 24
    // smooth gradient + mild noise — the shape quantization handles well
    val px = Array.tabulate(w * h * 3) { i =>
      val pix = i / 3; val x = pix % w; val y = pix / w
      ((x * 4 + y * 3 + (i % 3) * 9 + rnd.nextInt(9)) % 256).toByte
    }
    val img = PngCodec.Image(w, h, 3, px)
    val back = decode(encode(img, quality = 85))
    assert(back.width == w && back.height == h && back.channels == 3)
    val errs = px.indices.map(i =>
      math.abs((back.pixels(i) & 0xff) - (px(i) & 0xff)))
    assert(errs.max <= 48, s"max err ${errs.max}")
    assert(errs.sum.toDouble / errs.length <= 8.0,
      s"mean err ${errs.sum.toDouble / errs.length}")
  }

  test("4:2:0 lossy roundtrip on a smooth image stays bounded") {
    val w = 32; val h = 32
    val px = Array.tabulate(w * h * 3) { i =>
      val pix = i / 3; val x = pix % w; val y = pix / w
      ((128 + 40 * math.sin(x / 6.0) + 30 * math.cos(y / 5.0)).toInt +
        (i % 3) * 5).toByte
    }
    val img = PngCodec.Image(w, h, 3, px)
    val back = decode(encode(img, quality = 80, subsample420 = true))
    val errs = px.indices.map(i =>
      math.abs((back.pixels(i) & 0xff) - (px(i) & 0xff)))
    assert(errs.sum.toDouble / errs.length <= 12.0,
      s"mean err ${errs.sum.toDouble / errs.length}")
  }

  test("out-of-subset streams refuse loudly by name") {
    val w = 16; val h = 8
    val plane = Array.tabulate(w * h)(_ % 256)
    val ok = encodePlanes(Array(plane), w, h)
    def mutated(find: Int, replace: Int): Array[Byte] = {
      val b = ok.clone()
      var i = 2
      var done = false
      while (i + 1 < b.length && !done) {
        if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == find) {
          b(i + 1) = replace.toByte; done = true
        }
        i += 1
      }
      assert(done, f"marker $find%02x not found")
      b
    }
    // SOF0 → SOF3 (lossless)
    val e1 = intercept[RuntimeException](decode(mutated(0xc0, 0xc3)))
    assert(e1.getMessage.contains("lossless"))
    // SOF0 → SOF9 (arithmetic)
    val e2 = intercept[RuntimeException](decode(mutated(0xc0, 0xc9)))
    assert(e2.getMessage.contains("arithmetic"))
    // 12-bit precision
    val b12 = ok.clone()
    var i = 2
    while (!((b12(i) & 0xff) == 0xff && (b12(i + 1) & 0xff) == 0xc0)) i += 1
    b12(i + 4) = 12.toByte
    val e3 = intercept[RuntimeException](decode(b12))
    assert(e3.getMessage.contains("precision"))
    // truncated entropy data
    val e4 = intercept[RuntimeException](
      decode(ok.take(ok.length - 8)))
    assert(e4.getMessage.contains("jpeg"))
    // not a JPEG at all
    val e5 = intercept[IllegalArgumentException](
      decode(Array[Byte](1, 2, 3, 4)))
    assert(e5.getMessage.contains("SOI"))
  }

  test("progressive decode ≡ sequential decode (same coefficients)") {
    // both emission paths quantize identically, so the multi-scan
    // spectral-selection + successive-approximation reassembly must
    // reproduce the sequential decode BIT-EXACTLY — any slip in the
    // DC/AC first/refinement passes or EOB-run accounting breaks this
    val rnd = new scala.util.Random(777)
    val w = 40; val h = 24
    val px = Array.tabulate(w * h * 3) { i =>
      val pix = i / 3; val x = pix % w; val y = pix / w
      ((x * 5 + y * 7 + (i % 3) * 13 + rnd.nextInt(17)) % 256).toByte
    }
    val img = PngCodec.Image(w, h, 3, px)
    for ((q, sub) <- Seq((85, false), (60, true), (100, false))) {
      val seqDec = decode(encode(img, quality = q, subsample420 = sub))
      val proDec = decode(encode(img, quality = q, subsample420 = sub,
        progressive = true))
      assert(seqDec.pixels.toSeq == proDec.pixels.toSeq, s"q=$q sub=$sub")
    }
  }

  test("progressive gray ≡ sequential gray; q100 block-constant exact") {
    val w = 32; val h = 16
    val plane = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      (bx * 43 + by * 59 + 11) % 256
    }
    val pro = decode(encodePlanes(Array(plane), w, h, quality = 100,
      progressive = true))
    assert(pro.pixels.map(_ & 0xff).toSeq == plane.toSeq)
    val sq = decode(encodePlanes(Array(plane), w, h, quality = 60))
    val pr = decode(encodePlanes(Array(plane), w, h, quality = 60,
      progressive = true))
    assert(sq.pixels.toSeq == pr.pixels.toSeq)
  }

  test("progressive exercises EOB runs > 1 (smooth low-detail image)") {
    // a flat image quantized at low quality leaves whole AC bands zero
    // across many consecutive blocks → the encoder must emit EOBn
    // symbols with n ≥ 1 and the decoder must skip runs correctly
    val w = 64; val h = 32
    val px = Array.tabulate(w * h * 3)(i => (120 + (i % 3)).toByte)
    val img = PngCodec.Image(w, h, 3, px)
    val pro = encode(img, quality = 50, progressive = true)
    val seqDec = decode(encode(img, quality = 50))
    assert(decode(pro).pixels.toSeq == seqDec.pixels.toSeq)
    // EOBn (n≥1) symbols appear in some scan's Huffman table: the DHT
    // value list contains 0x10..0xE0 entries only progressive emits
    val hasEobN = pro.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc4) &&
      (0 until pro.length - 1).exists { i =>
        (pro(i) & 0xff) == 0xff && (pro(i + 1) & 0xff) == 0xc4 && {
          val len = ((pro(i + 2) & 0xff) << 8) | (pro(i + 3) & 0xff)
          val vals = (i + 4 + 17) until (i + 2 + len)
          vals.exists { j =>
            val v = pro(j) & 0xff
            v >= 0x10 && v <= 0xe0 && (v & 0xf) == 0
          }
        }
      }
    assert(hasEobN, "no EOBn symbol in any progressive DHT")
  }

  test("progressive 4:2:0 with odd dims roundtrips within float tolerance") {
    val w = 37; val h = 23
    val plane = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      (bx * 67 + by * 29 + 40) % 256
    }
    val cb = Array.fill(w * h)(100)
    val cr = Array.fill(w * h)(140)
    val seqDec = decode(encodePlanes(Array(plane, cb, cr), w, h,
      quality = 100, subsample420 = true))
    val proDec = decode(encodePlanes(Array(plane, cb, cr), w, h,
      quality = 100, subsample420 = true, progressive = true))
    assert(seqDec.pixels.toSeq == proDec.pixels.toSeq)
  }

  test("decoder consumes APPn/COM and 16-bit DQT segments") {
    val w = 16; val h = 8
    val plane = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; (bx * 77 + 33) % 256
    }
    val base = encodePlanes(Array(plane), w, h, quality = 100)
    // splice an APP0 JFIF header and a COM segment right after SOI
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16,
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0, 7,
      'g', 'r', 'a', 'f', 't')
    val spliced = base.take(2) ++ app0 ++ com ++ base.drop(2)
    assert(decode(spliced).pixels.map(_ & 0xff).toSeq == plane.toSeq)
    // rewrite the 8-bit DQT as a 16-bit (Pq=1) table, same values
    val b = spliced
    var i = 2
    while (!((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xdb)) i += 1
    val vals = (0 until 64).map(k => b(i + 5 + k) & 0xff)
    val dqt16 = Array[Byte](0xff.toByte, 0xdb.toByte,
      ((2 + 1 + 128) >> 8).toByte, ((2 + 1 + 128) & 0xff).toByte,
      0x10.toByte) ++ vals.flatMap(v => Seq(0.toByte, v.toByte))
    val with16 = b.take(i) ++ dqt16 ++ b.drop(i + 2 + 67) // 67 = 8-bit DQT len
    assert(decode(with16).pixels.map(_ & 0xff).toSeq == plane.toSeq)
  }
}

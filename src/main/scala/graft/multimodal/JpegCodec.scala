package graft.multimodal

import java.io.ByteArrayOutputStream

import scala.collection.mutable

/** REAL JPEG pixel codec, pure JVM, from the public ITU-T T.81 spec —
  * the de-stubbing of the majority image format of any web crawl
  * (the reference ingests media blobs opaquely; this engine decodes
  * them). Supported subset, loud errors outside it: baseline/extended
  * sequential Huffman (SOF0/SOF1) AND progressive (SOF2 — multi-scan
  * spectral selection + successive approximation, DC/AC first and
  * refinement passes, EOB runs, per-scan DHT redefinition) at 8-bit
  * precision, 1 (grayscale) or 3 (YCbCr) components, any sampling
  * factors where the max/component ratio is integral (covers 4:4:4,
  * 4:2:2, 4:4:0, 4:2:0), 8/16-bit quantization tables, restart
  * markers. Arithmetic coding (SOF9+), lossless, hierarchical, 12-bit,
  * and DNL refuse by name. All scans accumulate into per-component
  * quantized-coefficient buffers; dequant + IDCT run once at the end,
  * so a progressive and a sequential encoding of the same quantized
  * coefficients decode IDENTICALLY (pinned by test).
  *
  * The encoder writes spec-conformant streams (Annex K quantization
  * tables under libjpeg-style quality scaling, the Annex K.3 typical
  * Huffman tables embedded as DHT — roundtrip never depends on table
  * recall, the decoder reads whatever DHT says), used for fixtures,
  * re-encode, and the `jpeg_decode` oracle: at quality 100 every
  * quantizer is 1, so a block-constant image survives the
  * DCT→quantize→Huffman→decode chain EXACTLY (only the DC coefficient
  * is nonzero and it divides by 1), making decoded channel sums
  * rederivable from the block formula alone.
  *
  * Color conversion is fixed-point integer (16.16), so every decoded
  * sample is integer-deterministic and SQL-mirrorable:
  * `r = y + (91881*(cr-128)+32768 >> 16)` etc.
  */
object JpegCodec {

  // ---- public spec constants --------------------------------------------

  /** Zig-zag scan order: zigzag(k) = raster index of the k-th coefficient. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table (raster order). */
  private val StdQuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table (raster order). */
  private val StdQuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
  // HUFFVAL symbol list). The encoder embeds these as DHT; the decoder
  // builds from whatever DHT carries.
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** cos((2x+1) u π / 16) basis, shared by FDCT and IDCT. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8)((u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff

  // ---- bit I/O -----------------------------------------------------------

  /** MSB-first bit writer with 0xFF byte stuffing (F.1.2.3). */
  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (F.1.2.3). */
    def flush(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  /** MSB-first bit reader over entropy-coded data: un-stuffs FF00,
    * surfaces RSTn as a restart event, refuses other markers mid-scan. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var restartSeen: Boolean = false
    def alignAndExpectRestart(idx: Int): Unit = {
      acc = 0; nbits = 0
      require(pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == (0xd0 + (idx % 8)),
        s"jpeg: expected RST${idx % 8} at byte $pos")
      pos += 2
    }
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "jpeg: truncated entropy data")
        val b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "jpeg: truncated after 0xFF")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed literal FF
          else sys.error(f"jpeg: unexpected marker FF$m%02x inside scan")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  // ---- Huffman tables ----------------------------------------------------

  /** Canonical code assignment (C.2): codes per symbol for the encoder. */
  private final class HuffEncoder(bits: Array[Int], vals: Array[Int]) {
    val code = new Array[Int](256)
    val size = new Array[Int](256)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          code(vals(k)) = c
          size(vals(k)) = l
          c += 1; k += 1; i += 1
        }
        c <<= 1
        l += 1
      }
    }
  }

  /** Decode tables per F.2.2.3: mincode/maxcode/valptr per length. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = c
        c += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) c - 1 else -1
        c <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var c = r.bit()
      var l = 1
      while (l < 16 && (maxCode(l) < 0 || c > maxCode(l))) {
        c = (c << 1) | r.bit()
        l += 1
      }
      require(maxCode(l) >= 0 && c <= maxCode(l), "jpeg: invalid Huffman code")
      vals(valPtr(l) + (c - minCode(l)))
    }
  }

  /** EXTEND (F.2.2.1): map a `size`-bit magnitude to its signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private def magnitudeSize(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // ---- DCT ---------------------------------------------------------------

  /** Forward DCT (A.3.3) of a level-shifted 8×8 block, direct form. */
  private def fdct(block: Array[Double], out: Array[Double]): Unit = {
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += block(y * 8 + x) * Cos(u)(x) * Cos(v)(y)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        out(v * 8 + u) = 0.25 * cu * cv * s
        v += 1
      }
      u += 1
    }
  }

  /** Inverse DCT (A.3.3), direct form; emits rounded, clamped, +128
    * level-shifted samples. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val f = coef(v * 8 + u)
            if (f != 0) {
              val cu = if (u == 0) InvSqrt2 else 1.0
              val cv = if (v == 0) InvSqrt2 else 1.0
              s += cu * cv * f * Cos(u)(x) * Cos(v)(y)
            }
            u += 1
          }
          v += 1
        }
        val p = math.round(0.25 * s).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // ---- encoder -----------------------------------------------------------

  /** libjpeg-style quality scaling of an Annex K table: quality 100 →
    * every quantizer 1 (the exactness regime the oracle rides). */
  private def scaleQuant(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"jpeg quality $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map { t =>
      val v = (t * scale + 50) / 100
      if (v < 1) 1 else if (v > 255) 255 else v
    }
  }

  private final case class CompSpec(h: Int, v: Int, qId: Int, dcId: Int,
                                    acId: Int)

  /** Encode planar samples (one full-resolution w×h plane per component,
    * values 0-255) as JPEG. 1 plane → grayscale; 3 planes → taken as
    * Y,Cb,Cr verbatim (callers converting from RGB use [[encode]]).
    * `subsample420` downsamples chroma 2×2 by rounded average.
    * `restartInterval` > 0 emits DRI + RSTn markers (sequential only).
    * `progressive` emits SOF2 with the standard spectral-selection +
    * successive-approximation scan script (per-scan optimal Huffman
    * tables, real EOB runs) — the same quantized coefficients as the
    * sequential path, so both decode identically. */
  def encodePlanes(planes: Array[Array[Int]], w: Int, h: Int,
                   quality: Int = 90, subsample420: Boolean = false,
                   restartInterval: Int = 0,
                   progressive: Boolean = false): Array[Byte] = {
    require(planes.length == 1 || planes.length == 3,
      s"jpeg: ${planes.length} planes (1 gray / 3 YCbCr)")
    require(w > 0 && h > 0 && planes.forall(_.length == w * h),
      "jpeg: plane size does not match dims")
    val nc = planes.length
    val sub = subsample420 && nc == 3
    val specs: Array[CompSpec] =
      if (nc == 1) Array(CompSpec(1, 1, 0, 0, 0))
      else if (sub) Array(CompSpec(2, 2, 0, 0, 0), CompSpec(1, 1, 1, 1, 1),
        CompSpec(1, 1, 1, 1, 1))
      else Array(CompSpec(1, 1, 0, 0, 0), CompSpec(1, 1, 1, 1, 1),
        CompSpec(1, 1, 1, 1, 1))
    val hMax = specs.map(_.h).max
    val vMax = specs.map(_.v).max
    val qTabs = Array(scaleQuant(StdQuantLuma, quality),
      scaleQuant(StdQuantChroma, quality))
    val nQ = if (nc == 1) 1 else 2

    // per-component downsampled planes, padded to whole-MCU multiples
    // by edge replication (the spec leaves pad content free; replication
    // keeps block-constant fixtures block-constant)
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val compW = specs.map(sp => mcusX * 8 * sp.h)
    val compH = specs.map(sp => mcusY * 8 * sp.v)
    val comp = Array.tabulate(nc) { ci =>
      val sp = specs(ci)
      val cw = compW(ci); val ch = compH(ci)
      val srcW = (w * sp.h + hMax - 1) / hMax // ceil(w * h_i / hMax)
      val srcH = (h * sp.v + vMax - 1) / vMax
      val plane = new Array[Int](cw * ch)
      val rx = hMax / sp.h; val ry = vMax / sp.v
      var yy = 0
      while (yy < ch) {
        val sy = math.min(yy, srcH - 1)
        var xx = 0
        while (xx < cw) {
          val sx = math.min(xx, srcW - 1)
          val v =
            if (rx == 1 && ry == 1) planes(ci)(math.min(sy, h - 1) * w +
              math.min(sx, w - 1))
            else {
              // rounded box average over the rx×ry source footprint
              var s = 0
              var n = 0
              var dy = 0
              while (dy < ry) {
                val py = math.min(sy * ry + dy, h - 1)
                var dx = 0
                while (dx < rx) {
                  val px = math.min(sx * rx + dx, w - 1)
                  s += planes(ci)(py * w + px); n += 1
                  dx += 1
                }
                dy += 1
              }
              (s + n / 2) / n
            }
          plane(yy * cw + xx) = v
          xx += 1
        }
        yy += 1
      }
      plane
    }

    val out = new ByteArrayOutputStream(w * h / 2 + 1024)
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    // DQT (one segment per table, Pq=0 8-bit, zigzag order)
    (0 until nQ).foreach { qi =>
      marker(0xdb); u16(2 + 1 + 64)
      out.write(qi)
      (0 until 64).foreach(k => out.write(qTabs(qi)(Zigzag(k))))
    }
    if (progressive) {
      require(restartInterval == 0,
        "jpeg: restart markers unsupported in progressive encode")
      emitProgressive(out, specs, comp, compW, w, h, mcusX, mcusY, qTabs, nc,
        hMax, vMax)
      return out.toByteArray
    }

    // SOF0
    marker(0xc0); u16(8 + 3 * nc)
    out.write(8); u16(h); u16(w); out.write(nc)
    specs.zipWithIndex.foreach { case (sp, ci) =>
      out.write(ci + 1); out.write((sp.h << 4) | sp.v); out.write(sp.qId)
    }
    // DHT: the Annex K.3 typical tables actually used below
    val huffDefs: Seq[(Int, Int, Array[Int], Array[Int])] =
      if (nc == 1) Seq((0, 0, DcLumaBits, DcLumaVals),
        (1, 0, AcLumaBits, AcLumaVals))
      else Seq((0, 0, DcLumaBits, DcLumaVals), (1, 0, AcLumaBits, AcLumaVals),
        (0, 1, DcChromaBits, DcChromaVals), (1, 1, AcChromaBits, AcChromaVals))
    huffDefs.foreach { case (tc, th, bits, vals) =>
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    // SOS
    marker(0xda); u16(6 + 2 * nc)
    out.write(nc)
    specs.zipWithIndex.foreach { case (sp, ci) =>
      out.write(ci + 1); out.write((sp.dcId << 4) | sp.acId)
    }
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl

    val dcEnc = Array(new HuffEncoder(DcLumaBits, DcLumaVals),
      new HuffEncoder(DcChromaBits, DcChromaVals))
    val acEnc = Array(new HuffEncoder(AcLumaBits, AcLumaVals),
      new HuffEncoder(AcChromaBits, AcChromaVals))
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](nc)
    val block = new Array[Double](64)
    val coefF = new Array[Double](64)
    val quantized = new Array[Int](64)
    var mcu = 0
    var restartIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + (restartIdx % 8))
          restartIdx += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < nc) {
          val sp = specs(ci)
          val cw = compW(ci)
          var bv = 0
          while (bv < sp.v) {
            var bh = 0
            while (bh < sp.h) {
              val bx = (mx * sp.h + bh) * 8
              val by = (my * sp.v + bv) * 8
              var i = 0
              while (i < 64) {
                block(i) = comp(ci)((by + i / 8) * cw + bx + i % 8) - 128.0
                i += 1
              }
              fdct(block, coefF)
              val qt = qTabs(sp.qId)
              i = 0
              while (i < 64) {
                quantized(i) = math.round(coefF(i) / qt(i)).toInt
                i += 1
              }
              // DC
              val diff = quantized(0) - dcPred(ci)
              dcPred(ci) = quantized(0)
              val dsz = magnitudeSize(diff)
              val de = dcEnc(specs(ci).dcId)
              bw.put(de.code(dsz), de.size(dsz))
              if (dsz > 0)
                bw.put(if (diff < 0) diff + (1 << dsz) - 1 else diff, dsz)
              // AC run-length (F.1.2.2)
              val ae = acEnc(specs(ci).acId)
              var run = 0
              var k = 1
              while (k < 64) {
                val v = quantized(Zigzag(k))
                if (v == 0) run += 1
                else {
                  while (run >= 16) {
                    bw.put(ae.code(0xf0), ae.size(0xf0)); run -= 16
                  }
                  val sz = magnitudeSize(v)
                  val sym = (run << 4) | sz
                  bw.put(ae.code(sym), ae.size(sym))
                  bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
                  run = 0
                }
                k += 1
              }
              if (run > 0) bw.put(ae.code(0x00), ae.size(0x00)) // EOB
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- progressive emission (SOF2 scan script, G.1.2) --------------------

  private sealed trait Tok
  private final case class Sym(s: Int) extends Tok
  private final case class Raw(v: Int, n: Int) extends Tok

  /** Progressive stream: the libjpeg-style scan script — DC first at
    * Al=1 (interleaved) → luma AC 1-5 → chroma AC full → luma AC 6-63
    * (all Al=1 first passes) → AC refinements → DC refinement. Each
    * entropy scan gets an optimal-ish per-scan Huffman table (all live
    * symbols at one canonical length, all-ones codeword left unused),
    * so EOB runs > 1 are exercised for real. */
  private def emitProgressive(out: ByteArrayOutputStream,
                              specs: Array[CompSpec],
                              comp: Array[Array[Int]], compW: Array[Int],
                              w: Int, h: Int, mcusX: Int, mcusY: Int,
                              qTabs: Array[Array[Int]], nc: Int,
                              hMax: Int, vMax: Int): Unit = {
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xc2); u16(8 + 3 * nc)
    out.write(8); u16(h); u16(w); out.write(nc)
    specs.zipWithIndex.foreach { case (sp, ci) =>
      out.write(ci + 1); out.write((sp.h << 4) | sp.v); out.write(sp.qId)
    }

    // quantized coefficient buffers over the padded block grids
    val blocksWc = specs.map(sp => mcusX * sp.h)
    val blocksHc = specs.map(sp => mcusY * sp.v)
    val bufs = Array.tabulate(nc) { ci =>
      val sp = specs(ci)
      val qt = qTabs(sp.qId)
      val cw = compW(ci)
      val buf = new Array[Int](blocksWc(ci) * blocksHc(ci) * 64)
      val block = new Array[Double](64)
      val coefF = new Array[Double](64)
      var by = 0
      while (by < blocksHc(ci)) {
        var bx = 0
        while (bx < blocksWc(ci)) {
          var i = 0
          while (i < 64) {
            block(i) = comp(ci)((by * 8 + i / 8) * cw + bx * 8 + i % 8) - 128.0
            i += 1
          }
          fdct(block, coefF)
          val base = (by * blocksWc(ci) + bx) * 64
          i = 0
          while (i < 64) {
            buf(base + i) = math.round(coefF(i) / qt(i)).toInt
            i += 1
          }
          bx += 1
        }
        by += 1
      }
      buf
    }
    // real (unpadded) block grid per component — non-interleaved scans
    // iterate exactly these
    val realBW = specs.map(sp => ((w * sp.h + hMax - 1) / hMax + 7) / 8)
    val realBH = specs.map(sp => ((h * sp.v + vMax - 1) / vMax + 7) / 8)

    def flushEobInto(t: mutable.ArrayBuffer[Tok], cnt: Int,
                     br: mutable.ArrayBuffer[Int]): Unit = {
      if (cnt > 0) {
        val n = 31 - Integer.numberOfLeadingZeros(cnt)
        t += Sym(n << 4)
        if (n > 0) t += Raw(cnt - (1 << n), n)
        br.foreach(b => t += Raw(b, 1))
        br.clear()
      }
    }

    def dcFirstTokens(al: Int): mutable.ArrayBuffer[Tok] = {
      val t = mutable.ArrayBuffer.empty[Tok]
      val dcPred = new Array[Int](nc)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var ci = 0
          while (ci < nc) {
            val sp = specs(ci)
            var bv = 0
            while (bv < sp.v) {
              var bh = 0
              while (bh < sp.h) {
                val base = (((my * sp.v + bv) * blocksWc(ci)) +
                  (mx * sp.h + bh)) * 64
                val v = bufs(ci)(base) >> al
                val diff = v - dcPred(ci)
                dcPred(ci) = v
                val sz = magnitudeSize(diff)
                t += Sym(sz)
                if (sz > 0)
                  t += Raw(if (diff < 0) diff + (1 << sz) - 1 else diff, sz)
                bh += 1
              }
              bv += 1
            }
            ci += 1
          }
          mx += 1
        }
        my += 1
      }
      t
    }

    def dcRefineTokens(al: Int): mutable.ArrayBuffer[Tok] = {
      val t = mutable.ArrayBuffer.empty[Tok]
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var ci = 0
          while (ci < nc) {
            val sp = specs(ci)
            var bv = 0
            while (bv < sp.v) {
              var bh = 0
              while (bh < sp.h) {
                val base = (((my * sp.v + bv) * blocksWc(ci)) +
                  (mx * sp.h + bh)) * 64
                t += Raw((bufs(ci)(base) >> al) & 1, 1)
                bh += 1
              }
              bv += 1
            }
            ci += 1
          }
          mx += 1
        }
        my += 1
      }
      t
    }

    def acFirstTokens(ci: Int, ss: Int, se: Int,
                      al: Int): mutable.ArrayBuffer[Tok] = {
      val t = mutable.ArrayBuffer.empty[Tok]
      val noBr = mutable.ArrayBuffer.empty[Int]
      var eobCnt = 0
      var by = 0
      while (by < realBH(ci)) {
        var bx = 0
        while (bx < realBW(ci)) {
          val base = (by * blocksWc(ci) + bx) * 64
          var r = 0
          var k = ss
          while (k <= se) {
            val c = bufs(ci)(base + Zigzag(k))
            val mag = math.abs(c) >> al
            if (mag == 0) r += 1
            else {
              flushEobInto(t, eobCnt, noBr); eobCnt = 0
              while (r > 15) { t += Sym(0xf0); r -= 16 }
              val sz = magnitudeSize(mag)
              t += Sym((r << 4) | sz)
              val v = if (c < 0) -mag else mag
              t += Raw(if (v < 0) v + (1 << sz) - 1 else v, sz)
              r = 0
            }
            k += 1
          }
          if (r > 0) {
            eobCnt += 1
            if (eobCnt == 32767) { flushEobInto(t, eobCnt, noBr); eobCnt = 0 }
          }
          bx += 1
        }
        by += 1
      }
      flushEobInto(t, eobCnt, noBr)
      t
    }

    def acRefineTokens(ci: Int, ss: Int, se: Int,
                       al: Int): mutable.ArrayBuffer[Tok] = {
      val t = mutable.ArrayBuffer.empty[Tok]
      // two correction-bit accumulations, as the scheme requires: bits
      // OWNED by the pending cross-block EOB run (flushed with its EOBn)
      // vs bits of the current block since its last symbol (flushed
      // right after that symbol) — one shared buffer would leak a later
      // block's corrections into the run's flush
      val runBr = mutable.ArrayBuffer.empty[Int]
      val br = mutable.ArrayBuffer.empty[Int]
      var eobCnt = 0
      def flushEob(): Unit = { flushEobInto(t, eobCnt, runBr); eobCnt = 0 }
      var by = 0
      while (by < realBH(ci)) {
        var bx = 0
        while (bx < realBW(ci)) {
          val base = (by * blocksWc(ci) + bx) * 64
          // last newly-significant position (magnitude exactly 1 at
          // this approximation) — zeros beyond it fold into EOB runs
          var eobPos = ss - 1
          var k = ss
          while (k <= se) {
            if (math.abs(bufs(ci)(base + Zigzag(k))) >> al == 1) eobPos = k
            k += 1
          }
          var r = 0
          k = ss
          while (k <= se) {
            val c = bufs(ci)(base + Zigzag(k))
            val mag = math.abs(c) >> al
            if (mag == 0) r += 1
            else {
              while (r > 15 && k <= eobPos) {
                flushEob()
                t += Sym(0xf0)
                br.foreach(b => t += Raw(b, 1)); br.clear()
                r -= 16
              }
              if (mag > 1) br += (mag & 1)
              else {
                flushEob()
                t += Sym((r << 4) | 1)
                t += Raw(if (c < 0) 0 else 1, 1)
                br.foreach(b => t += Raw(b, 1)); br.clear()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || br.nonEmpty) {
            eobCnt += 1
            runBr ++= br
            br.clear()
            if (eobCnt == 32767) flushEob()
          }
          bx += 1
        }
        by += 1
      }
      flushEob()
      t
    }

    /** DHT (when the scan has symbols) + SOS + entropy data. */
    def writeScan(scanComps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int,
                  toks: mutable.ArrayBuffer[Tok]): Unit = {
      val syms = toks.collect { case Sym(s) => s }.distinct.sorted
      val codeOf = new Array[Int](256)
      var codeLen = 0
      if (syms.nonEmpty) {
        // one canonical length for every live symbol; the all-ones
        // codeword stays unused (2^L ≥ n+1), as the spec requires
        codeLen = 1
        while ((1 << codeLen) < syms.length + 1) codeLen += 1
        syms.zipWithIndex.foreach { case (s, i) => codeOf(s) = i }
        val tc = if (ss == 0) 0 else 1
        marker(0xc4); u16(2 + 1 + 16 + syms.length)
        out.write(tc << 4) // class, table id 0
        (1 to 16).foreach(l => out.write(if (l == codeLen) syms.length else 0))
        syms.foreach(out.write)
      }
      marker(0xda); u16(6 + 2 * scanComps.length)
      out.write(scanComps.length)
      scanComps.foreach { ci => out.write(ci + 1); out.write(0) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
      val bw = new BitWriter(out)
      toks.foreach {
        case Sym(s) => bw.put(codeOf(s), codeLen)
        case Raw(v, n) => bw.put(v, n)
      }
      bw.flush()
    }

    val all = (0 until nc).toSeq
    writeScan(all, 0, 0, 0, 1, dcFirstTokens(1))
    if (nc == 1) {
      writeScan(Seq(0), 1, 63, 0, 1, acFirstTokens(0, 1, 63, 1))
      writeScan(Seq(0), 1, 63, 1, 0, acRefineTokens(0, 1, 63, 0))
    } else {
      writeScan(Seq(0), 1, 5, 0, 1, acFirstTokens(0, 1, 5, 1))
      writeScan(Seq(1), 1, 63, 0, 1, acFirstTokens(1, 1, 63, 1))
      writeScan(Seq(2), 1, 63, 0, 1, acFirstTokens(2, 1, 63, 1))
      writeScan(Seq(0), 6, 63, 0, 1, acFirstTokens(0, 6, 63, 1))
      writeScan(Seq(0), 1, 63, 1, 0, acRefineTokens(0, 1, 63, 0))
    }
    writeScan(all, 0, 0, 1, 0, dcRefineTokens(0))
    if (nc == 3) {
      writeScan(Seq(1), 1, 63, 1, 0, acRefineTokens(1, 1, 63, 0))
      writeScan(Seq(2), 1, 63, 1, 0, acRefineTokens(2, 1, 63, 0))
    }
    marker(0xd9) // EOI
  }

  /** Encode an interleaved raster ([[PngCodec.Image]], 1 or 3 channels;
    * RGB is converted to YCbCr with the fixed-point BT.601 forward
    * transform). */
  def encode(img: PngCodec.Image, quality: Int = 90,
             subsample420: Boolean = false,
             restartInterval: Int = 0,
             progressive: Boolean = false): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"jpeg: ${img.channels} channels (1/3)")
    val n = img.width * img.height
    val planes =
      if (img.channels == 1)
        Array(Array.tabulate(n)(i => img.pixels(i) & 0xff))
      else {
        val y = new Array[Int](n); val cb = new Array[Int](n)
        val cr = new Array[Int](n)
        var i = 0
        while (i < n) {
          val r = img.pixels(i * 3) & 0xff
          val g = img.pixels(i * 3 + 1) & 0xff
          val b = img.pixels(i * 3 + 2) & 0xff
          y(i) = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
          cb(i) = clamp(128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16))
          cr(i) = clamp(128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16))
          i += 1
        }
        Array(y, cb, cr)
      }
    encodePlanes(planes, img.width, img.height, quality, subsample420,
      restartInterval, progressive)
  }

  @inline private def clamp(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  // ---- decoder -----------------------------------------------------------

  private final case class FrameComp(id: Int, h: Int, v: Int, qId: Int)

  /** Decode a baseline JPEG to an interleaved raster: grayscale → 1
    * channel, YCbCr → 3-channel RGB via the fixed-point inverse
    * transform (`r = y + (91881*(cr-128)+32768 >> 16)` — integer-exact,
    * SQL-mirrorable). */
  def decode(bytes: Array[Byte]): PngCodec.Image = {
    require(isJpeg(bytes), "jpeg: bad SOI signature")
    var p = 2
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16at(i: Int): Int = (u8(i) << 8) | u8(i + 1)

    val qTabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var comps: Array[FrameComp] = null
    var w = 0
    var h = 0
    var restartInterval = 0

    var sofSeen = false
    var progressive = false
    var scanDone = false
    var compW: Array[Int] = null
    var compH: Array[Int] = null
    var blocksW: Array[Int] = null
    var blocksH: Array[Int] = null
    // per-component QUANTIZED coefficient buffers (block-raster layout:
    // blockIndex*64 + raster index) — scans accumulate here (progressive
    // scans refine across passes), dequant + IDCT happen once at the end
    var coefs: Array[Array[Int]] = null
    var mcusX = 0
    var mcusY = 0
    var hMax = 0
    var vMax = 0
    var anyScan = false

    while (!scanDone) {
      require(p + 1 < bytes.length, "jpeg: truncated before marker")
      require(u8(p) == 0xff, f"jpeg: expected marker, got ${u8(p)}%02x at $p")
      val m = u8(p + 1)
      p += 2
      m match {
        case 0xd8 => // stray SOI
          sys.error("jpeg: unexpected SOI")
        case 0xd9 =>
          require(anyScan, "jpeg: EOI before scan data")
          scanDone = true // progressive: all scans consumed
        case 0xc0 | 0xc1 | 0xc2 => // baseline / ext. sequential / progressive
          progressive = m == 0xc2
          val len = u16at(p)
          require(u8(p + 2) == 8,
            s"jpeg: ${u8(p + 2)}-bit precision is out of subset (8)")
          h = u16at(p + 3); w = u16at(p + 5)
          require(w > 0 && h > 0, "jpeg: zero dimension (DNL out of subset)")
          val nc = u8(p + 7)
          require(nc == 1 || nc == 3,
            s"jpeg: $nc components is out of subset (1 gray / 3 YCbCr)")
          comps = Array.tabulate(nc) { i =>
            val b = p + 8 + 3 * i
            FrameComp(u8(b), u8(b + 1) >> 4, u8(b + 1) & 0xf, u8(b + 2))
          }
          comps.foreach { c =>
            require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
              s"jpeg: sampling ${c.h}x${c.v} out of range")
          }
          hMax = comps.map(_.h).max
          vMax = comps.map(_.v).max
          comps.foreach { c =>
            require(hMax % c.h == 0 && vMax % c.v == 0,
              s"jpeg: non-integral sampling ratio ${c.h}x${c.v} vs " +
                s"${hMax}x$vMax is out of subset")
          }
          sofSeen = true
          mcusX = (w + 8 * hMax - 1) / (8 * hMax)
          mcusY = (h + 8 * vMax - 1) / (8 * vMax)
          compW = comps.map(c => mcusX * 8 * c.h)
          compH = comps.map(c => mcusY * 8 * c.v)
          blocksW = comps.map(c => mcusX * c.h)
          blocksH = comps.map(c => mcusY * c.v)
          coefs = Array.tabulate(comps.length)(i =>
            new Array[Int](blocksW(i) * blocksH(i) * 64))
          p += len
        case 0xc3 => sys.error("jpeg: lossless (SOF3) is out of subset")
        case 0xc5 | 0xc6 | 0xc7 | 0xce | 0xcf =>
          sys.error(f"jpeg: hierarchical/differential SOF$m%02x is out of subset")
        case 0xc9 | 0xca | 0xcb | 0xcd =>
          sys.error(f"jpeg: arithmetic coding (SOF$m%02x) is out of subset")
        case 0xc8 => sys.error("jpeg: JPG (SOF8) is out of subset")
        case 0xcc => sys.error("jpeg: DAC/arithmetic conditioning is out of subset")
        case 0xdb => // DQT
          val len = u16at(p)
          var q = p + 2
          while (q < p + len) {
            val pq = u8(q) >> 4
            val tq = u8(q) & 0xf
            require(pq == 0 || pq == 1, s"jpeg: DQT precision $pq")
            require(tq < 4, s"jpeg: DQT id $tq")
            val tab = new Array[Int](64)
            var k = 0
            while (k < 64) {
              tab(Zigzag(k)) = if (pq == 0) u8(q + 1 + k)
              else u16at(q + 1 + 2 * k)
              k += 1
            }
            qTabs(tq) = tab
            q += 1 + (if (pq == 0) 64 else 128)
          }
          p += len
        case 0xc4 => // DHT
          val len = u16at(p)
          var q = p + 2
          while (q < p + len) {
            val tc = u8(q) >> 4
            val th = u8(q) & 0xf
            require(tc <= 1 && th < 4, s"jpeg: DHT class $tc id $th")
            val bits = Array.tabulate(16)(i => u8(q + 1 + i))
            val nv = bits.sum
            require(nv <= 256, "jpeg: DHT over 256 symbols")
            val vals = Array.tabulate(nv)(i => u8(q + 17 + i))
            val dec = new HuffDecoder(bits, vals)
            if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
            q += 17 + nv
          }
          p += len
        case 0xdd => // DRI
          restartInterval = u16at(p + 2)
          p += u16at(p)
        case 0xdc => sys.error("jpeg: DNL is out of subset")
        case a if a >= 0xe0 && a <= 0xef => p += u16at(p) // APPn
        case 0xfe => p += u16at(p) // COM
        case 0xda => // SOS — one scan (baseline: the only one;
          // progressive: one of several spectral/approximation passes)
          require(sofSeen, "jpeg: SOS before SOF")
          val len = u16at(p)
          val ns = u8(p + 2)
          require(ns >= 1 && ns <= comps.length, s"jpeg: scan components $ns")
          // (component index in frame, DC table id, AC table id)
          val scanSel = Array.tabulate(ns) { i =>
            val b = p + 3 + 2 * i
            val ci = comps.indexWhere(_.id == u8(b))
            require(ci >= 0, s"jpeg: scan names unknown component ${u8(b)}")
            (ci, u8(b + 1) >> 4, u8(b + 1) & 0xf)
          }
          val ss = u8(p + 3 + 2 * ns)
          val se = u8(p + 4 + 2 * ns)
          val ah = u8(p + 5 + 2 * ns) >> 4
          val al = u8(p + 5 + 2 * ns) & 0xf
          if (!progressive) {
            require(ns == comps.length,
              "jpeg: partial sequential scans are out of subset")
            require(ss == 0 && se == 63 && ah == 0 && al == 0,
              "jpeg: sequential scan must cover the full band")
          } else {
            require(ss <= 63 && se <= 63 && ss <= se && ah <= 13 && al <= 13,
              s"jpeg: bad progressive scan band $ss..$se/$ah/$al")
            if (ss == 0)
              require(se == 0, "jpeg: progressive DC scan must have Se=0")
            else
              require(ns == 1,
                "jpeg: progressive AC scans must be single-component")
          }
          p += len

          val r = new BitReader(bytes, p)
          val dcPred = new Array[Int](comps.length)
          var eobrun = 0
          var restartIdx = 0
          var mcu = 0
          def restartIfDue(): Unit =
            if (restartInterval > 0 && mcu > 0 &&
              mcu % restartInterval == 0) {
              r.alignAndExpectRestart(restartIdx)
              restartIdx += 1
              java.util.Arrays.fill(dcPred, 0)
              eobrun = 0
            }

          // -- per-block scan pieces, all writing QUANTIZED values ----
          def fullBlock(base: Int, ci: Int, dcT: HuffDecoder,
                        acT: HuffDecoder): Unit = {
            val buf = coefs(ci)
            val dsz = dcT.decode(r)
            require(dsz <= 15, "jpeg: DC size out of range")
            dcPred(ci) += extend(r.bits(dsz), dsz)
            buf(base) = dcPred(ci)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acT.decode(r)
              val run = rs >> 4
              val sz = rs & 0xf
              if (sz == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += run
                require(k < 64, "jpeg: AC index overflow")
                buf(base + Zigzag(k)) = extend(r.bits(sz), sz)
                k += 1
              }
            }
          }
          def dcScan(base: Int, ci: Int, dcT: HuffDecoder): Unit =
            if (ah == 0) {
              val dsz = dcT.decode(r)
              require(dsz <= 15, "jpeg: DC size out of range")
              dcPred(ci) += extend(r.bits(dsz), dsz)
              coefs(ci)(base) = dcPred(ci) << al
            } else {
              if (r.bit() == 1) coefs(ci)(base) |= 1 << al
            }
          def acFirst(base: Int, ci: Int, acT: HuffDecoder): Unit =
            if (eobrun > 0) eobrun -= 1
            else {
              val buf = coefs(ci)
              var k = ss
              var done = false
              while (k <= se && !done) {
                val rs = acT.decode(r)
                val run = rs >> 4
                val sz = rs & 0xf
                if (sz == 0) {
                  if (run == 15) k += 16 // ZRL
                  else {
                    eobrun = (1 << run) - 1
                    if (run > 0) eobrun += r.bits(run)
                    done = true
                  }
                } else {
                  k += run
                  require(k <= se, "jpeg: AC index overflow")
                  buf(base + Zigzag(k)) = extend(r.bits(sz), sz) << al
                  k += 1
                }
              }
            }
          def acRefine(base: Int, ci: Int, acT: HuffDecoder): Unit = {
            // T.81 G.1.2.3 / the classic refinement walk: correction
            // bits ride along as the run skips over already-nonzero
            // coefficients; EOB runs carry corrections for the rest
            val buf = coefs(ci)
            val p1 = 1 << al
            @inline def correct(idx: Int): Unit =
              if (r.bit() == 1 && (buf(idx) & p1) == 0)
                buf(idx) += (if (buf(idx) >= 0) p1 else -p1)
            var k = ss
            if (eobrun == 0) {
              var done = false
              while (k <= se && !done) {
                val rs = acT.decode(r)
                var run = rs >> 4
                val sz = rs & 0xf
                var newval = 0
                if (sz != 0) {
                  require(sz == 1, "jpeg: AC refinement size must be 1")
                  newval = if (r.bit() == 1) p1 else -p1
                } else if (run != 15) {
                  eobrun = 1 << run
                  if (run > 0) eobrun += r.bits(run)
                  done = true
                }
                if (!done) {
                  // advance past `run` still-zero slots (correcting the
                  // nonzero ones), then drop the new value (if any)
                  var advanced = false
                  while (k <= se && !advanced) {
                    val idx = base + Zigzag(k)
                    if (buf(idx) != 0) correct(idx)
                    else if (run == 0) {
                      if (newval != 0) buf(idx) = newval
                      advanced = true
                    } else run -= 1
                    k += 1
                  }
                }
              }
            }
            if (eobrun > 0) {
              while (k <= se) {
                val idx = base + Zigzag(k)
                if (buf(idx) != 0) correct(idx)
                k += 1
              }
              eobrun -= 1
            }
          }

          def tables(i: Int): (HuffDecoder, HuffDecoder) = {
            val (_, td, ta) = scanSel(i)
            val needDc = ss == 0
            val needAc = !progressive || ss > 0
            val dcT = dcTabs(td)
            val acT = acTabs(ta)
            require(!needDc || ah > 0 || dcT != null,
              s"jpeg: missing DC Huffman table $td")
            require(!needAc || acT != null,
              s"jpeg: missing AC Huffman table $ta")
            (dcT, acT)
          }

          if (ns > 1 || !progressive) {
            // interleaved MCU order (whole frame for sequential; the
            // multi-component DC pass for progressive)
            var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                restartIfDue()
                var i = 0
                while (i < ns) {
                  val ci = scanSel(i)._1
                  val c = comps(ci)
                  val (dcT, acT) = tables(i)
                  var bv = 0
                  while (bv < c.v) {
                    var bh = 0
                    while (bh < c.h) {
                      val base = (((my * c.v + bv) * blocksW(ci)) +
                        (mx * c.h + bh)) * 64
                      if (!progressive) fullBlock(base, ci, dcT, acT)
                      else dcScan(base, ci, dcT)
                      bh += 1
                    }
                    bv += 1
                  }
                  i += 1
                }
                mcu += 1
                mx += 1
              }
              my += 1
            }
          } else {
            // non-interleaved single-component scan: block raster over
            // the component's REAL (unpadded) block grid
            val ci = scanSel(0)._1
            val c = comps(ci)
            val (dcT, acT) = tables(0)
            val bw = ((w * c.h + hMax - 1) / hMax + 7) / 8
            val bh = ((h * c.v + vMax - 1) / vMax + 7) / 8
            var by = 0
            while (by < bh) {
              var bx = 0
              while (bx < bw) {
                restartIfDue()
                val base = (by * blocksW(ci) + bx) * 64
                if (ss == 0) dcScan(base, ci, dcT)
                else if (ah == 0) acFirst(base, ci, acT)
                else acRefine(base, ci, acT)
                mcu += 1
                bx += 1
              }
              by += 1
            }
          }
          p = r.pos
          anyScan = true
          if (!progressive) {
            // EOI (tolerate pad FFs, as emitted by some writers)
            while (p + 1 < bytes.length && u8(p) == 0xff && u8(p + 1) == 0xff)
              p += 1
            require(p + 1 < bytes.length && u8(p) == 0xff && u8(p + 1) == 0xd9,
              "jpeg: missing EOI after scan")
            scanDone = true
          }
        case other =>
          sys.error(f"jpeg: unsupported marker FF$other%02x")
      }
    }

    // dequantize + IDCT every block of every component into its plane
    val planes = Array.tabulate(comps.length)(i =>
      new Array[Int](compW(i) * compH(i)))
    val deq = new Array[Int](64)
    val px = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val qt = qTabs(comps(ci).qId)
      require(qt != null, s"jpeg: missing quant table ${comps(ci).qId}")
      val buf = coefs(ci)
      val cw = compW(ci)
      var by = 0
      while (by < blocksH(ci)) {
        var bx = 0
        while (bx < blocksW(ci)) {
          val base = (by * blocksW(ci) + bx) * 64
          var i = 0
          while (i < 64) { deq(i) = buf(base + i) * qt(i); i += 1 }
          idct(deq, px)
          var j = 0
          while (j < 64) {
            planes(ci)((by * 8 + j / 8) * cw + bx * 8 + j % 8) = px(j)
            j += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }

    // upsample (replication) + color convert to the output raster
    val nc = comps.length
    val out = new Array[Byte](w * h * (if (nc == 1) 1 else 3))
    if (nc == 1) {
      val cw = compW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = planes(0)(y * cw + x).toByte
          x += 1
        }
        y += 1
      }
      PngCodec.Image(w, h, 1, out)
    } else {
      val ry = Array.tabulate(3)(i => vMax / comps(i).v)
      val rx = Array.tabulate(3)(i => hMax / comps(i).h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = planes(0)((y / ry(0)) * compW(0) + x / rx(0))
          val cb = planes(1)((y / ry(1)) * compW(1) + x / rx(1)) - 128
          val cr = planes(2)((y / ry(2)) * compW(2) + x / rx(2)) - 128
          val o = (y * w + x) * 3
          out(o) = clamp(yy + ((91881 * cr + 32768) >> 16)).toByte
          out(o + 1) = clamp(yy - ((22554 * cb + 46802 * cr + 32768) >> 16)).toByte
          out(o + 2) = clamp(yy + ((116130 * cb + 32768) >> 16)).toByte
          x += 1
        }
        y += 1
      }
      PngCodec.Image(w, h, 3, out)
    }
  }
}

package graft.multimodal

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** REAL WebP-lossless (VP8L) pixel codec, pure JVM, from the public
  * "WebP Lossless Bitstream Specification" — closing the last image leg
  * of the multimodal family after PNG/GIF/JPEG. Supported subset, loud
  * errors outside it: the RIFF/VP8L container, LSB-first bitstream,
  * canonical prefix codes (simple and normal forms, full code-length
  * codes with 16/17/18 repeats and the max-symbol short form), LZ77
  * backward references with the 120-entry neighborhood distance map,
  * color cache, and the SUBTRACT-GREEN + PREDICTOR (all 14 modes)
  * transforms with their entropy-coded sub-images. Meta prefix codes
  * (entropy image), the cross-color transform, color-indexing
  * (palette) and lossy VP8/extended VP8X refuse by name.
  *
  * The encoder writes spec-conformant streams (complete two-length
  * canonical codes, optional subtract-green / single-mode predictor /
  * color cache / dist-1 RLE back-references), used for fixtures and the
  * `webp_decode` oracle: VP8L is LOSSLESS, so decoded channel sums are
  * rederivable from the pixel formula alone.
  */
object WebpCodec {

  /** lz77 prefix-value table boundary: codes 0-3 are literal values
    * 1-4; beyond that (2 + (code & 1)) << extra + extra bits. */
  private def lz77Extra(code: Int): Int =
    if (code < 4) 0 else (code - 2) >> 1
  private def lz77Offset(code: Int): Int =
    if (code < 4) code + 1 else ((2 + (code & 1)) << lz77Extra(code)) + 1
  /** Smallest prefix code whose value range contains v, plus the extra
    * bits payload. */
  private def lz77Code(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"lz77 value $v")
    if (v <= 4) (v - 1, 0, 0)
    else {
      var code = 4
      while (lz77Offset(code + 1) <= v) code += 1
      (code, v - lz77Offset(code), lz77Extra(code))
    }
  }

  /** The spec's 120-entry (x, y) close-neighborhood distance map:
    * distance code d ≤ 120 → x + y·width (clamped to ≥ 1). */
  private val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  /** Order in which code-length-code lengths are stored. */
  private val ClcOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private val CacheMul = 0x1e35a7bd

  def isWebp(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 16 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P'

  /** True for the LOSSLESS flavor this codec decodes. */
  def isWebpLossless(bytes: Array[Byte]): Boolean =
    isWebp(bytes) && bytes(12) == 'V' && bytes(13) == 'P' &&
      bytes(14) == '8' && bytes(15) == 'L'

  // ---- bit I/O (LSB-first, per spec) -------------------------------------

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "vp8l: truncated bitstream")
        acc = bytes(pos) & 0xffL
        pos += 1
        nbits = 8
      }
      val b = (acc & 1L).toInt
      acc >>= 1
      nbits -= 1
      b
    }
    /** n-bit LSB-first value. */
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def putBit(b: Int): Unit = {
      acc |= (b & 1) << nbits
      nbits += 1
      if (nbits == 8) { out.write(acc); acc = 0; nbits = 0 }
    }
    /** n-bit LSB-first value. */
    def put(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { putBit((v >>> i) & 1); i += 1 }
    }
    /** Prefix code bits: MSB of the canonical code first. */
    def putCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { putBit((code >>> i) & 1); i -= 1 }
    }
    def flush(): Unit = if (nbits > 0) { out.write(acc); acc = 0; nbits = 0 }
  }

  // ---- canonical prefix codes --------------------------------------------

  /** Canonical decode via tree-walk (first bit read = top of the code),
    * plus the simple 0/1-bit forms. */
  private final class PrefixDecoder(lengths: Array[Int],
                                    simple: Option[Array[Int]]) {
    // canonical assignment: by (length, symbol); decode with
    // mincode/maxcode per length, exactly the JPEG walk but over the
    // LSB-first stream
    private val maxLen = if (lengths.isEmpty) 0 else lengths.max
    private val minCode = new Array[Int](maxLen + 1)
    private val maxCode = new Array[Int](maxLen + 1)
    private val valPtr = new Array[Int](maxLen + 1)
    private val sorted: Array[Int] = {
      val syms = lengths.indices.filter(lengths(_) > 0).toArray
        .sortBy(s => (lengths(s), s))
      var c = 0
      var k = 0
      var l = 1
      while (l <= maxLen) {
        valPtr(l) = k
        minCode(l) = c
        while (k < syms.length && lengths(syms(k)) == l) { c += 1; k += 1 }
        maxCode(l) = if (k > valPtr(l)) c - 1 else -1
        c <<= 1
        l += 1
      }
      syms
    }
    def decode(r: BitReader): Int = simple match {
      case Some(syms) if syms.length == 1 => syms(0)
      case Some(syms) => syms(r.bit())
      case None =>
        var c = r.bit()
        var l = 1
        while (l < maxLen && (maxCode(l) < 0 || c > maxCode(l))) {
          c = (c << 1) | r.bit()
          l += 1
        }
        require(maxCode(l) >= 0 && c <= maxCode(l), "vp8l: invalid prefix code")
        sorted(valPtr(l) + (c - minCode(l)))
    }
  }

  /** Read one prefix code (5.2.1: simple or normal form). */
  private def readPrefixCode(r: BitReader, alphabetSize: Int): PrefixDecoder =
    if (r.bit() == 1) { // simple
      val numSymbols = r.bit() + 1
      val first8 = r.bit()
      val sym0 = r.bits(if (first8 == 1) 8 else 1)
      val syms =
        if (numSymbols == 1) Array(sym0) else Array(sym0, r.bits(8))
      syms.foreach(s => require(s < alphabetSize,
        s"vp8l: simple-code symbol $s outside alphabet $alphabetSize"))
      new PrefixDecoder(Array.empty, Some(syms))
    } else {
      val numCodeLengths = 4 + r.bits(4)
      require(numCodeLengths <= 19, "vp8l: bad code-length count")
      val clcLengths = new Array[Int](19)
      (0 until numCodeLengths).foreach(i => clcLengths(ClcOrder(i)) = r.bits(3))
      val clc = new PrefixDecoder(clcLengths, None)
      val lengths = new Array[Int](alphabetSize)
      var maxSymbol =
        if (r.bit() == 1) {
          val lengthNBits = 2 + 2 * r.bits(3)
          2 + r.bits(lengthNBits)
        } else alphabetSize
      var sym = 0
      var prevLen = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val c = clc.decode(r)
        if (c < 16) {
          lengths(sym) = c
          sym += 1
          if (c != 0) prevLen = c
        } else if (c == 16) {
          val rep = 3 + r.bits(2)
          (0 until rep).foreach { _ =>
            require(sym < alphabetSize, "vp8l: repeat overruns alphabet")
            lengths(sym) = prevLen; sym += 1
          }
        } else {
          val rep = if (c == 17) 3 + r.bits(3) else 11 + r.bits(7)
          sym += rep
          require(sym <= alphabetSize, "vp8l: zero-run overruns alphabet")
        }
      }
      new PrefixDecoder(lengths, None)
    }

  // ---- pixel helpers -----------------------------------------------------

  @inline private def a(p: Int): Int = (p >>> 24) & 0xff
  @inline private def rC(p: Int): Int = (p >>> 16) & 0xff
  @inline private def gC(p: Int): Int = (p >>> 8) & 0xff
  @inline private def bC(p: Int): Int = p & 0xff
  @inline private def argb(aa: Int, rr: Int, gg: Int, bb: Int): Int =
    ((aa & 0xff) << 24) | ((rr & 0xff) << 16) | ((gg & 0xff) << 8) | (bb & 0xff)
  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def average2(x: Int, y: Int): Int =
    argb((a(x) + a(y)) / 2, (rC(x) + rC(y)) / 2, (gC(x) + gC(y)) / 2,
      (bC(x) + bC(y)) / 2)

  private def select(t: Int, l: Int, tl: Int): Int = {
    // p = t + l - tl componentwise; pick the neighbor closer to p
    val pa = math.abs(a(t) + a(l) - a(tl) - a(t)) +
      math.abs(rC(t) + rC(l) - rC(tl) - rC(t)) +
      math.abs(gC(t) + gC(l) - gC(tl) - gC(t)) +
      math.abs(bC(t) + bC(l) - bC(tl) - bC(t))
    val pb = math.abs(a(t) + a(l) - a(tl) - a(l)) +
      math.abs(rC(t) + rC(l) - rC(tl) - rC(l)) +
      math.abs(gC(t) + gC(l) - gC(tl) - gC(l)) +
      math.abs(bC(t) + bC(l) - bC(tl) - bC(l))
    if (pa <= pb) t else l
  }

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int =
    argb(clip255(a(l) + a(t) - a(tl)), clip255(rC(l) + rC(t) - rC(tl)),
      clip255(gC(l) + gC(t) - gC(tl)), clip255(bC(l) + bC(t) - bC(tl)))

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val av = average2(l, t)
    def h(avc: Int, c: Int): Int = clip255(avc + (avc - c) / 2)
    argb(h(a(av), a(tl)), h(rC(av), rC(tl)), h(gC(av), gC(tl)),
      h(bC(av), bC(tl)))
  }

  /** Predictor mode value from the already-reconstructed neighbors. */
  private def predict(mode: Int, l: Int, t: Int, tr: Int, tl: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => average2(average2(l, tr), t)
      case 6 => average2(l, tl)
      case 7 => average2(l, t)
      case 8 => average2(tl, t)
      case 9 => average2(t, tr)
      case 10 => average2(average2(l, tl), average2(t, tr))
      case 11 => select(t, l, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(l, t, tl)
      case m => sys.error(s"vp8l: predictor mode $m out of range")
    }

  @inline private def addPixels(p: Int, pred: Int): Int =
    argb(a(p) + a(pred), rC(p) + rC(pred), gC(p) + gC(pred),
      bC(p) + bC(pred))
  @inline private def subPixels(p: Int, pred: Int): Int =
    argb(a(p) - a(pred), rC(p) - rC(pred), gC(p) - gC(pred),
      bC(p) - bC(pred))

  // ---- decoder -----------------------------------------------------------

  private sealed trait Transform
  private final case class Predictor(sizeBits: Int,
                                     modes: Array[Int],
                                     subW: Int) extends Transform
  private case object SubtractGreen extends Transform

  /** Decode a VP8L stream to a 4-channel RGBA raster. */
  def decode(bytes: Array[Byte]): PngCodec.Image = {
    require(isWebp(bytes), "webp: bad RIFF/WEBP signature")
    val fourcc = new String(bytes, 12, 4, "US-ASCII")
    fourcc match {
      case "VP8L" => ()
      case "VP8 " => sys.error("webp: lossy VP8 is out of subset")
      case "VP8X" => sys.error("webp: extended (VP8X) container is out of subset")
      case f => sys.error(s"webp: unknown chunk '$f'")
    }
    require((bytes(20) & 0xff) == 0x2f, "vp8l: bad signature byte")
    val r = new BitReader(bytes, 21)
    val w = r.bits(14) + 1
    val h = r.bits(14) + 1
    r.bit() // alpha hint
    require(r.bits(3) == 0, "vp8l: version must be 0")

    // transforms (read order = application order; invert in reverse)
    val transforms = mutable.ArrayBuffer.empty[Transform]
    while (r.bit() == 1) {
      r.bits(2) match {
        case 0 =>
          val sizeBits = r.bits(3) + 2
          val subW = (w + (1 << sizeBits) - 1) >> sizeBits
          val subH = (h + (1 << sizeBits) - 1) >> sizeBits
          val modeImg = decodeEntropyImage(r, subW, subH, isMain = false)
          transforms += Predictor(sizeBits, modeImg.map(gC), subW)
        case 1 => sys.error("vp8l: cross-color transform is out of subset")
        case 2 => transforms += SubtractGreen
        case 3 => sys.error("vp8l: color-indexing transform is out of subset")
      }
    }
    var pix = decodeEntropyImage(r, w, h, isMain = true)

    transforms.reverseIterator.foreach {
      case SubtractGreen =>
        var i = 0
        while (i < pix.length) {
          val p = pix(i)
          val g = gC(p)
          pix(i) = argb(a(p), rC(p) + g, g, bC(p) + g)
          i += 1
        }
      case Predictor(sizeBits, modes, subW) =>
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = y * w + x
            val pred =
              if (x == 0 && y == 0) 0xff000000
              else if (y == 0) pix(i - 1) // L
              else if (x == 0) pix(i - w) // T
              else {
                val mode = modes((y >> sizeBits) * subW + (x >> sizeBits))
                val l = pix(i - 1)
                val t = pix(i - w)
                val tl = pix(i - w - 1)
                val tr = if (x + 1 < w) pix(i - w + 1) else pix(y * w)
                predict(mode, l, t, tr, tl)
              }
            pix(i) = addPixels(pix(i), pred)
            x += 1
          }
          y += 1
        }
    }

    val out = new Array[Byte](w * h * 4)
    var i = 0
    while (i < pix.length) {
      out(i * 4) = rC(pix(i)).toByte
      out(i * 4 + 1) = gC(pix(i)).toByte
      out(i * 4 + 2) = bC(pix(i)).toByte
      out(i * 4 + 3) = a(pix(i)).toByte
      i += 1
    }
    PngCodec.Image(w, h, 4, out)
  }

  /** One entropy-coded ARGB image (5.2.2-5.2.3): color-cache bit, [meta
    * prefix bit, main image only], one prefix-code group, pixel loop
    * with literals / LZ77 back-references / cache hits. */
  private def decodeEntropyImage(r: BitReader, w: Int, h: Int,
                                 isMain: Boolean): Array[Int] = {
    val cacheBits = if (r.bit() == 1) r.bits(4) else 0
    require(cacheBits <= 11, s"vp8l: cache bits $cacheBits out of range")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    if (isMain)
      require(r.bit() == 0, "vp8l: meta prefix codes are out of subset")
    val green = readPrefixCode(r, 256 + 24 + cacheSize)
    val red = readPrefixCode(r, 256)
    val blue = readPrefixCode(r, 256)
    val alpha = readPrefixCode(r, 256)
    val dist = readPrefixCode(r, 40)

    val pix = new Array[Int](w * h)
    @inline def remember(p: Int): Unit =
      if (cache != null) cache(((CacheMul * p) >>> (32 - cacheBits))) = p
    var i = 0
    val n = w * h
    while (i < n) {
      val s = green.decode(r)
      if (s < 256) {
        val g = s
        val rr = red.decode(r)
        val bb = blue.decode(r)
        val aa = alpha.decode(r)
        pix(i) = argb(aa, rr, g, bb)
        remember(pix(i))
        i += 1
      } else if (s < 256 + 24) {
        val lenCode = s - 256
        val len = lz77Offset(lenCode) + r.bits(lz77Extra(lenCode))
        val dCode = dist.decode(r)
        val d0 = lz77Offset(dCode) + r.bits(lz77Extra(dCode))
        val d =
          if (d0 > 120) d0 - 120
          else {
            val (dx, dy) = DistanceMap(d0 - 1)
            math.max(1, dy * w + dx)
          }
        require(d <= i, s"vp8l: back-reference distance $d at pixel $i")
        var k = 0
        while (k < len) {
          require(i < n, "vp8l: back-reference overruns image")
          pix(i) = pix(i - d)
          remember(pix(i))
          i += 1
          k += 1
        }
      } else {
        require(cache != null, "vp8l: cache symbol without a color cache")
        val idx = s - 256 - 24
        require(idx < cacheSize, s"vp8l: cache index $idx")
        pix(i) = cache(idx)
        i += 1
      }
    }
    pix
  }

  // ---- encoder -----------------------------------------------------------

  /** Complete two-length canonical code over `n` live symbols (ids
    * 0 until n) in an `alphabet`-sized code: with L = ceil(log2 n), the
    * first 2^L - n symbols take L-1 bits and the rest L, so the Kraft
    * sum is exactly 1 — libwebp's table builder (and this decoder)
    * accept only complete codes. */
  private def twoLevelLengths(alphabet: Int, n: Int): Array[Int] = {
    require(n >= 2 && n <= alphabet, s"code over $n symbols")
    var lBits = 1
    while ((1 << lBits) < n) lBits += 1
    val shorter = (1 << lBits) - n // symbols at lBits-1 bits
    val lengths = new Array[Int](alphabet)
    (0 until shorter).foreach(lengths(_) = lBits - 1)
    (shorter until n).foreach(lengths(_) = lBits)
    lengths
  }

  /** Canonical (code, length) table from lengths. */
  private def canonicalCodes(lengths: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](lengths.length)
    val syms = lengths.indices.filter(lengths(_) > 0).toArray
      .sortBy(s => (lengths(s), s))
    var c = 0
    var prevLen = 0
    syms.foreach { s =>
      c <<= (lengths(s) - prevLen)
      prevLen = lengths(s)
      out(s) = (c, lengths(s))
      c += 1
    }
    out
  }

  /** Write a normal-form prefix code whose symbol lengths live in
    * {0, L, L+1}: the code-length code covers symbols {0, L, L+1}. */
  private def writePrefixCode(bw: BitWriter, lengths: Array[Int]): Unit = {
    val live = lengths.filter(_ > 0).distinct.sorted
    require(live.nonEmpty && live.length <= 2 && live.forall(_ <= 15),
      s"writer supports two-length codes, got ${live.toSeq}")
    bw.putBit(0) // normal form
    // clc lengths: most-common symbol gets 1 bit; 0 and the other get 2
    val clcLengths = new Array[Int](19)
    if (live.length == 1) { clcLengths(live(0)) = 1; clcLengths(0) = 1 }
    else { clcLengths(live(0)) = 1; clcLengths(live(1)) = 2; clcLengths(0) = 2 }
    val numCodeLengths = ClcOrder.zipWithIndex
      .filter { case (o, _) => clcLengths(o) > 0 }.map(_._2).max + 1
    bw.put(numCodeLengths - 4, 4)
    (0 until numCodeLengths).foreach(i => bw.put(clcLengths(ClcOrder(i)), 3))
    bw.putBit(0) // no max-symbol short form
    val clcCodes = canonicalCodes(clcLengths)
    // trailing zero-lengths after the last live symbol can be left
    // unwritten ONLY via the max-symbol form; without it every symbol
    // emits — keep it simple and emit all (clc code for 0 exists)
    lengths.foreach { l =>
      val (code, len) = clcCodes(l)
      bw.putCode(code, len)
    }
  }

  /** Write a simple-form prefix code (1 or 2 symbols). */
  private def writeSimpleCode(bw: BitWriter, syms: Seq[Int]): Unit = {
    require(syms.nonEmpty && syms.length <= 2)
    bw.putBit(1)
    bw.put(syms.length - 1, 1)
    if (syms.head > 1) { bw.putBit(1); bw.put(syms.head, 8) }
    else { bw.putBit(0); bw.put(syms.head, 1) }
    if (syms.length == 2) bw.put(syms(1), 8)
  }

  /** Encode a raster (3- or 4-channel) as VP8L. Transforms and tools:
    * `subtractGreen`, a single global `predictorMode` (0-13), a color
    * cache of `cacheBits`, and `rle` dist-1 back-references for runs of
    * identical pixels — each exercising the matching decode path; all
    * off yields plain literals. Lossless by construction. */
  def encode(img: PngCodec.Image, subtractGreen: Boolean = false,
             predictorMode: Option[Int] = None, cacheBits: Int = 0,
             rle: Boolean = false): Array[Byte] = {
    require(img.channels == 3 || img.channels == 4,
      s"vp8l: ${img.channels} channels (3/4)")
    require(cacheBits >= 0 && cacheBits <= 7, s"cacheBits $cacheBits (0-7)")
    val w = img.width
    val h = img.height
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384, "vp8l: dims")
    val n = w * h
    var pix = new Array[Int](n)
    var i = 0
    while (i < n) {
      val base = i * img.channels
      val aa = if (img.channels == 4) img.pixels(base + 3) & 0xff else 255
      pix(i) = argb(aa, img.pixels(base) & 0xff, img.pixels(base + 1) & 0xff,
        img.pixels(base + 2) & 0xff)
      i += 1
    }
    val hasAlpha = img.channels == 4 && pix.exists(p => a(p) != 255)

    val payload = new ByteArrayOutputStream()
    payload.write(0x2f)
    val bw = new BitWriter(payload)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.putBit(if (hasAlpha) 1 else 0)
    bw.put(0, 3) // version

    // transforms, in application order
    if (subtractGreen) {
      bw.putBit(1); bw.put(2, 2)
      val out = new Array[Int](n)
      i = 0
      while (i < n) {
        val p = pix(i)
        val g = gC(p)
        out(i) = argb(a(p), rC(p) - g, g, bC(p) - g)
        i += 1
      }
      pix = out
    }
    predictorMode.foreach { mode =>
      require(mode >= 0 && mode <= 13, s"predictor mode $mode")
      bw.putBit(1); bw.put(0, 2)
      val sizeBits = 9 // 512-px blocks — one mode pixel per block
      bw.put(sizeBits - 2, 3)
      val subW = (w + 511) >> 9
      val subH = (h + 511) >> 9
      // the mode sub-image: green channel carries the mode
      encodeEntropyImage(bw, Array.fill(subW * subH)(argb(255, 0, mode, 0)),
        subW, isMain = false, cacheBits = 0, rle = false)
      val out = new Array[Int](n)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val idx = y * w + x
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) pix(idx - 1)
            else if (x == 0) pix(idx - w)
            else {
              val l = pix(idx - 1)
              val t = pix(idx - w)
              val tl = pix(idx - w - 1)
              val tr = if (x + 1 < w) pix(idx - w + 1) else pix(y * w)
              predict(mode, l, t, tr, tl)
            }
          out(idx) = subPixels(pix(idx), pred)
          x += 1
        }
        y += 1
      }
      pix = out
    }
    bw.putBit(0) // end of transform list

    encodeEntropyImage(bw, pix, w, isMain = true, cacheBits = cacheBits,
      rle = rle)
    bw.flush()
    val pl = payload.toByteArray

    val out = new ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(k => out.write((v >>> (8 * k)) & 0xff))
    out.write("RIFF".getBytes("US-ASCII"))
    val chunkLen = pl.length
    val padded = chunkLen + (chunkLen & 1)
    le32(4 + 8 + padded)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII"))
    le32(chunkLen)
    out.write(pl, 0, pl.length)
    if ((chunkLen & 1) == 1) out.write(0)
    out.toByteArray
  }

  private def encodeEntropyImage(bw: BitWriter, pix: Array[Int], w: Int,
                                 isMain: Boolean, cacheBits: Int,
                                 rle: Boolean): Unit = {
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    if (cacheBits > 0) { bw.putBit(1); bw.put(cacheBits, 4) }
    else bw.putBit(0)
    if (isMain) bw.putBit(0) // no meta prefix codes
    val greenAlphabet = 256 + 24 + cacheSize
    // live green symbols: literals 0-255, plus length codes when rle,
    // plus cache indices — one two-length code over the full live span
    val greenLive = if (rle || cacheSize > 0) greenAlphabet else 256
    val greenLengths = twoLevelLengths(greenAlphabet, greenLive)
    val chanLengths = twoLevelLengths(256, 256)
    writePrefixCode(bw, greenLengths)
    writePrefixCode(bw, chanLengths) // red
    writePrefixCode(bw, chanLengths) // blue
    writePrefixCode(bw, chanLengths) // alpha
    writeSimpleCode(bw, Seq(1)) // distance: single symbol → d0 = 2 → dist 1
    val greenCodes = canonicalCodes(greenLengths)
    val chanCodes = canonicalCodes(chanLengths)
    val cache = if (cacheSize > 0) Array.fill(cacheSize)(-1) else null

    @inline def remember(p: Int): Unit =
      if (cache != null) cache(((CacheMul * p) >>> (32 - cacheBits))) = p
    def emitGreen(sym: Int): Unit = {
      val (c, l) = greenCodes(sym)
      bw.putCode(c, l)
    }
    var i = 0
    val n = pix.length
    while (i < n) {
      val p = pix(i)
      if (rle && i > 0 && pix(i - 1) == p) {
        var len = 0
        while (i + len < n && pix(i + len) == p) len += 1
        // cap at the largest single length code payload
        val runLen = math.min(len, 4096)
        val (code, extra, extraBits) = lz77Code(runLen)
        emitGreen(256 + code)
        bw.put(extra, extraBits)
        // distance code: simple single-symbol — zero bits emitted
        var k = 0
        while (k < runLen) { remember(p); k += 1 }
        i += runLen
      } else if (cache != null &&
        cache(((CacheMul * p) >>> (32 - cacheBits))) == p) {
        emitGreen(256 + 24 + ((CacheMul * p) >>> (32 - cacheBits)))
        i += 1
      } else {
        emitGreen(gC(p))
        val (cr, lr) = chanCodes(rC(p)); bw.putCode(cr, lr)
        val (cb, lb) = chanCodes(bC(p)); bw.putCode(cb, lb)
        val (ca, la) = chanCodes(a(p)); bw.putCode(ca, la)
        remember(p)
        i += 1
      }
    }
  }
}

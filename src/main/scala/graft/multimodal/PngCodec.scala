package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL PNG pixel codec, pure JVM — the de-stubbing of the multimodal
  * decode boundary for the one mainstream format the JDK can carry end
  * to end (zlib via `java.util.zip`, CRC32 likewise; PNG spec (RFC
  * 2083 / W3C) for the rest). Supported subset, loud errors outside
  * it: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
  * non-interlaced, all five row filters (None/Sub/Up/Average/Paeth).
  * That is what `encode` writes and what the wild's most common PNG
  * shape is; palette/16-bit/interlaced refuse by name.
  *
  * On top of the pixels: grayscale, nearest-neighbor resize, and the
  * three standard perceptual hashes (aHash, dHash, and DCT pHash) —
  * the substrate of image NEAR-DUP detection
  * ([[Multimodal.imageNearDups]] bands the 64-bit hash so candidate
  * generation is a shuffle on band keys, never all-pairs).
  */
object PngCodec {

  /** Decoded raster: row-major, `channels` interleaved bytes/pixel. */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  // ---- encode ------------------------------------------------------------

  /** Spec-conformant PNG from a raster (filter 0 rows, one zlib IDAT,
    * real CRCs) — fixtures and tests roundtrip through [[decode]]. */
  def encode(img: Image): Array[Byte] = {
    val colorType = img.channels match {
      case 1 => 0
      case 3 => 2
      case 4 => 6
      case c => sys.error(s"unsupported channel count $c (1/3/4)")
    }
    require(img.pixels.length == img.width * img.height * img.channels,
      "raster size does not match dims")
    val stride = img.width * img.channels
    val raw = new Array[Byte](img.height * (stride + 1))
    var y = 0
    while (y < img.height) {
      raw(y * (stride + 1)) = 0 // filter: None
      System.arraycopy(img.pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zOut = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val t = typ.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(t)
      crc.update(data)
      out.write(be32(data.length.toLong), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      out.write(be32(crc.getValue), 0, 4)
    }
    chunk("IHDR", be32(img.width.toLong) ++ be32(img.height.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0))
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------------

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, 8), Signature)

  def decode(png: Array[Byte]): Image = {
    require(isPng(png), "not a PNG (bad signature)")
    def u32(p: Int): Long =
      ((png(p) & 0xffL) << 24) | ((png(p + 1) & 0xffL) << 16) |
        ((png(p + 2) & 0xffL) << 8) | (png(p + 3) & 0xffL)
    var p = 8
    var width = 0
    var height = 0
    var channels = 0
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && p + 8 <= png.length) {
      val len = u32(p).toInt
      val typ = new String(png, p + 4, 4, "US-ASCII")
      val dataAt = p + 8
      typ match {
        case "IHDR" =>
          width = u32(dataAt).toInt
          height = u32(dataAt + 4).toInt
          val bitDepth = png(dataAt + 8) & 0xff
          val colorType = png(dataAt + 9) & 0xff
          val interlace = png(dataAt + 12) & 0xff
          require(bitDepth == 8,
            s"unsupported PNG bit depth $bitDepth (8 only)")
          require(interlace == 0,
            "interlaced (Adam7) PNGs are out of subset")
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case 6 => 4
            case 3 => sys.error("palette PNGs are out of subset")
            case c => sys.error(s"unsupported PNG color type $c")
          }
        case "IDAT" => idat.write(png, dataAt, len)
        case "IEND" => done = true
        case _ => // ancillary chunks skip
      }
      p = dataAt + len + 4 // + CRC
    }
    require(width > 0 && height > 0 && channels > 0, "missing IHDR")

    // zlib inflate
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val stride = width * channels
    val raw = new Array[Byte](height * (stride + 1))
    var off = 0
    while (!inf.finished() && off < raw.length) {
      val n = inf.inflate(raw, off, raw.length - off)
      if (n == 0 && inf.needsInput()) sys.error("truncated PNG stream")
      off += n
    }
    inf.end()
    require(off == raw.length,
      s"PNG pixel data short: $off of ${raw.length} bytes")

    // unfilter rows (spec §6: None/Sub/Up/Average/Paeth)
    val out = new Array[Byte](height * stride)
    val bpp = channels
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pp = a + b - c
      val pa = math.abs(pp - a); val pb = math.abs(pp - b)
      val pc = math.abs(pp - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val rawB = raw(rowIn + x) & 0xff
        val left = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val upLeft =
          if (y > 0 && x >= bpp) out(rowOut - stride + x - bpp) & 0xff else 0
        val v = filter match {
          case 0 => rawB
          case 1 => rawB + left
          case 2 => rawB + up
          case 3 => rawB + (left + up) / 2
          case 4 => rawB + paeth(left, up, upLeft)
          case f => sys.error(s"unknown PNG filter $f")
        }
        out(rowOut + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, channels, out)
  }

  // ---- raster ops --------------------------------------------------------

  /** ITU-R BT.601 integer luminance, one int per pixel (alpha ignored). */
  def toGray(img: Image): Array[Int] = {
    val n = img.width * img.height
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val base = i * img.channels
      out(i) = img.channels match {
        case 1 => img.pixels(base) & 0xff
        case _ =>
          val r = img.pixels(base) & 0xff
          val g = img.pixels(base + 1) & 0xff
          val b = img.pixels(base + 2) & 0xff
          (299 * r + 587 * g + 114 * b) / 1000
      }
      i += 1
    }
    out
  }

  /** Nearest-neighbor resize (deterministic integer indexing). */
  def resizeNearest(img: Image, tw: Int, th: Int): Image = {
    require(tw > 0 && th > 0)
    val out = new Array[Byte](tw * th * img.channels)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.width / tw).toInt
        System.arraycopy(img.pixels, (sy * img.width + sx) * img.channels,
          out, (y * tw + x) * img.channels, img.channels)
        x += 1
      }
      y += 1
    }
    Image(tw, th, img.channels, out)
  }

  private def grayAt(img: Image, tw: Int, th: Int): Array[Int] =
    toGray(resizeNearest(img, tw, th))

  /** Average hash: 8×8 gray, bit = pixel above the mean. */
  def aHash(img: Image): Long = {
    val g = grayAt(img, 8, 8)
    val mean = g.sum / 64
    var h = 0L
    var i = 0
    while (i < 64) { if (g(i) > mean) h |= 1L << i; i += 1 }
    h
  }

  /** Difference hash: 9×8 gray, bit = left pixel brighter than right. */
  def dHash(img: Image): Long = {
    val g = grayAt(img, 9, 8)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) > g(y * 9 + x + 1)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** DCT perceptual hash: 32×32 gray → 2D DCT-II → 8×8 low-frequency
    * block (DC excluded), bit = coefficient above the median. */
  def pHash(img: Image): Long = {
    val n = 32
    val g = grayAt(img, n, n)
    // separable DCT-II (doubles; pure function of the pixels, IEEE-
    // deterministic across JVMs)
    val cosT = Array.tabulate(n, n)((k, i) =>
      math.cos((2 * i + 1) * k * math.Pi / (2 * n)))
    val rows = Array.ofDim[Double](n, n)
    var y = 0
    while (y < n) {
      var k = 0
      while (k < n) {
        var s = 0.0
        var x = 0
        while (x < n) { s += g(y * n + x) * cosT(k)(x); x += 1 }
        rows(y)(k) = s
        k += 1
      }
      y += 1
    }
    val coef = Array.ofDim[Double](8, 8)
    var k2 = 0
    while (k2 < 8) {
      var k1 = 0
      while (k1 < 8) {
        var s = 0.0
        var y2 = 0
        while (y2 < n) { s += rows(y2)(k1) * cosT(k2)(y2); y2 += 1 }
        coef(k2)(k1) = s
        k1 += 1
      }
      k2 += 1
    }
    val flat = (for (a <- 0 until 8; b <- 0 until 8 if a != 0 || b != 0)
      yield coef(a)(b)).toArray
    val sorted = flat.sorted
    val median = sorted(flat.length / 2)
    var h = 0L
    var i = 0
    var bit = 0
    while (i < 63) {
      if (flat(i) > median) h |= 1L << bit
      i += 1
      bit += 1
    }
    h
  }
}

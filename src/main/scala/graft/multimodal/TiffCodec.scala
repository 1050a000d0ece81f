package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM baseline TIFF codec (TIFF 6.0 from the public spec — the
  * scanner/scientific interchange container): both byte orders
  * (`II`/`MM`), the IFD entry walk, STRIP-based uncompressed
  * (Compression=1) 8-bit grayscale (PhotometricInterpretation 0/1,
  * with 0 = WhiteIsZero inverted to the canonical black-is-zero) and
  * RGB (Photometric=2, SamplesPerPixel=3, chunky PlanarConfiguration).
  * Multiple strips reassemble in order; inline (≤4-byte) and offset
  * values both handled; value counts > 1 for BitsPerSample read
  * through the offset. Tiles, LZW/PackBits/JPEG compression, palette
  * color, planar=2, >8-bit samples and multi-IFD files refuse by
  * name. Decodes onto the shared [[PngCodec.Image]] substrate.
  *
  * Reference behavior: nexus-processor has no image path; builder-
  * brief multimodal surface (the PngCodec pattern).
  */
object TiffCodec {

  def isTiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
       (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  /** Encode gray (1-channel) or RGB (3-channel) as little-endian
    * baseline TIFF, two strips (exercising strip reassembly). */
  def encode(img: PngCodec.Image): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"tiff: ${img.channels}-channel encode not supported (1/3)")
    val out = new ArrayBuffer[Byte]()
    def le16(v: Int): Unit = {
      out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
    }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    // header: II, 42, IFD offset (after the pixel data)
    val rowBytes = img.width * img.channels
    val strip1Rows = (img.height + 1) / 2
    val strip1 = strip1Rows * rowBytes
    val strip2 = img.height * rowBytes - strip1
    val dataAt = 8
    out += 'I'.toByte; out += 'I'.toByte; le16(42)
    le32(dataAt + img.pixels.length + (img.pixels.length & 1))
    out ++= img.pixels
    if ((img.pixels.length & 1) == 1) out += 0 // word-align the IFD
    val nEntries = 9 // both layouts emit the same nine tags
    le16(nEntries)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      le16(tag); le16(typ); le32(count); le32(value)
    }
    // bits-per-sample for RGB needs 3 SHORTs -> stored after the IFD
    val bpsOffsetAt = dataAt + img.pixels.length +
      (img.pixels.length & 1) + 2 + nEntries * 12 + 4
    entry(256, 3, 1, img.width)            // ImageWidth
    entry(257, 3, 1, img.height)           // ImageLength
    if (img.channels == 3) entry(258, 3, 3, bpsOffsetAt)
    else entry(258, 3, 1, 8)               // BitsPerSample
    entry(259, 3, 1, 1)                    // Compression: none
    entry(262, 3, 1, if (img.channels == 3) 2 else 1) // Photometric
    entry(273, 4, 2, bpsOffsetAt + (if (img.channels == 3) 6 else 0))
    entry(277, 3, 1, img.channels)         // SamplesPerPixel
    entry(278, 3, 1, strip1Rows)           // RowsPerStrip
    entry(279, 4, 2, bpsOffsetAt + (if (img.channels == 3) 6 else 0) + 8)
    le32(0) // next IFD: none
    if (img.channels == 3) { le16(8); le16(8); le16(8) }
    // strip offsets then byte counts (LONG arrays)
    le32(dataAt); le32(dataAt + strip1)
    le32(strip1); le32(strip2)
    out.toArray
  }

  /** Parse a baseline TIFF to a [[PngCodec.Image]]. */
  def decode(bytes: Array[Byte]): PngCodec.Image = {
    require(isTiff(bytes), "tiff: bad II*/MM* signature")
    val le = bytes(0) == 'I'
    def u16(i: Int): Int =
      if (le) (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
      else ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (le) (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      else ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    val ifdAt = u32(4)
    require(ifdAt >= 8 && ifdAt + 2 <= bytes.length, "tiff: bad IFD offset")
    val n = u16(ifdAt.toInt)
    require(ifdAt + 2 + n * 12 + 4 <= bytes.length, "tiff: truncated IFD")
    require(u32(ifdAt.toInt + 2 + n * 12) == 0L,
      "tiff: multi-IFD (multi-page) files are out of subset")

    // tag → (type, count, value-or-offset position)
    var width = -1; var height = -1; var spp = 1
    var compression = 1; var photometric = -1; var rowsPerStrip = -1
    var bpsOk = true
    var stripOffsets: Seq[Long] = Nil
    var stripCounts: Seq[Long] = Nil
    def values(typ: Int, count: Int, at: Int): Seq[Long] = {
      val size = typ match {
        case 3 => 2 // SHORT
        case 4 => 4 // LONG
        case other => sys.error(s"tiff: value type $other is out of subset")
      }
      val src = if (count * size <= 4) at else {
        val off = u32(at)
        require(off + count.toLong * size <= bytes.length,
          "tiff: value array overruns the file")
        off.toInt
      }
      (0 until count).map(k =>
        if (typ == 3) u16(src + k * 2).toLong else u32(src + k * 4))
    }
    var e = ifdAt.toInt + 2
    (0 until n).foreach { _ =>
      val tag = u16(e); val typ = u16(e + 2)
      val countL = u32(e + 4)
      // a crafted 0xFFFFFFFF count would overflow Int negative, read
      // garbage "inline", and crash .head unnamed — bound it loudly
      require(countL >= 1 && countL <= 65536,
        s"tiff: tag $tag declares $countL values (1..65536)")
      val count = countL.toInt
      val vAt = e + 8
      tag match {
        case 256 => width = values(typ, count, vAt).head.toInt
        case 257 => height = values(typ, count, vAt).head.toInt
        case 258 => bpsOk = values(typ, count, vAt).forall(_ == 8L)
        case 259 => compression = values(typ, count, vAt).head.toInt
        case 262 => photometric = values(typ, count, vAt).head.toInt
        case 273 => stripOffsets = values(typ, count, vAt)
        case 277 => spp = values(typ, count, vAt).head.toInt
        case 278 => rowsPerStrip = values(typ, count, vAt).head.toInt
        case 284 =>
          require(values(typ, count, vAt).head == 1L,
            "tiff: planar configuration 2 is out of subset")
        case 279 => stripCounts = values(typ, count, vAt)
        case 322 | 323 | 324 | 325 =>
          sys.error("tiff: tiled layout is out of subset")
        case _ => () // resolution, software, etc. — layout-irrelevant
      }
      e += 12
    }
    require(width > 0 && height > 0, "tiff: missing geometry")
    require(compression == 1,
      s"tiff: compression $compression is out of subset (none only)")
    require(bpsOk, "tiff: only 8-bit samples are in subset")
    require(photometric == 0 || photometric == 1 ||
      (photometric == 2 && spp == 3),
      s"tiff: photometric $photometric with $spp samples is out of subset")
    require(spp == 1 || spp == 3, s"tiff: $spp samples per pixel (1/3)")
    require(stripOffsets.nonEmpty &&
      stripOffsets.size == stripCounts.size, "tiff: missing strip layout")
    val total = width.toLong * height * spp
    require(stripCounts.map(identity).sum == total,
      s"tiff: strips hold ${stripCounts.sum} bytes, geometry needs $total")
    val pixels = new Array[Byte](total.toInt)
    var at = 0
    stripOffsets.zip(stripCounts).foreach { case (off, len) =>
      require(off + len <= bytes.length, "tiff: strip overruns the file")
      System.arraycopy(bytes, off.toInt, pixels, at, len.toInt)
      at += len.toInt
    }
    if (photometric == 0) { // WhiteIsZero: invert to canonical
      var i = 0
      while (i < pixels.length) {
        pixels(i) = (255 - (pixels(i) & 0xff)).toByte; i += 1
      }
    }
    PngCodec.Image(width, height, spp, pixels)
  }
}

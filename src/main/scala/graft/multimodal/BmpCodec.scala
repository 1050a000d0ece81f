package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM BMP codec (the Windows DIB format from the public
  * BITMAPFILEHEADER/BITMAPINFOHEADER layout — the uncompressed image
  * container scrapes still meet constantly). Subset: BI_RGB
  * (compression 0) 24-bit BGR and 8-bit paletted, BITMAPINFOHEADER or
  * larger (the v4/v5 headers extend it compatibly; pixel data starts at
  * the declared offset), bottom-up AND top-down (negative height) row
  * order, 4-byte row padding. RLE, 16/32-bit masks and OS/2 cores
  * refuse by name. Decodes onto the shared [[PngCodec.Image]]
  * substrate (RGB), so BMP rows ride the same sums/hashes/banded
  * near-dup join as every other image container.
  *
  * Reference behavior: nexus-processor has no image path; builder-
  * brief multimodal surface (the PngCodec pattern).
  */
object BmpCodec {

  def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 54 && b(0) == 'B' && b(1) == 'M'

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Encode an RGB (3-channel) or gray (1-channel) image as a 24-bit
    * BI_RGB bottom-up BMP. */
  def encode(img: PngCodec.Image): Array[Byte] = {
    require(img.channels == 3 || img.channels == 1,
      s"bmp: ${img.channels}-channel encode not supported (1/3)")
    val rowBytes = img.width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * img.height
    val out = new ArrayBuffer[Byte](54 + dataSize)
    def le16w(v: Int): Unit = {
      out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
    }
    def le32w(v: Int): Unit = {
      out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
      out += ((v >> 16) & 0xff).toByte; out += ((v >> 24) & 0xff).toByte
    }
    out += 'B'.toByte; out += 'M'.toByte
    le32w(54 + dataSize); le16w(0); le16w(0); le32w(54)
    le32w(40); le32w(img.width); le32w(img.height) // bottom-up
    le16w(1); le16w(24); le32w(0); le32w(dataSize)
    le32w(2835); le32w(2835); le32w(0); le32w(0)
    var y = img.height - 1
    while (y >= 0) { // bottom-up rows
      var x = 0
      while (x < img.width) {
        val p = (y * img.width + x) * img.channels
        val (r, g, b2) =
          if (img.channels == 3)
            (img.pixels(p), img.pixels(p + 1), img.pixels(p + 2))
          else (img.pixels(p), img.pixels(p), img.pixels(p))
        out += b2; out += g; out += r // BGR on the wire
        x += 1
      }
      var k = 0
      while (k < pad) { out += 0; k += 1 }
      y -= 1
    }
    out.toArray
  }

  /** Parse a BMP to an RGB [[PngCodec.Image]]. Out-of-subset forms
    * refuse by name; truncated pixel data is loud. */
  def decode(bytes: Array[Byte]): PngCodec.Image = {
    require(isBmp(bytes), "bmp: bad BM signature")
    val dataOffset = le32(bytes, 10)
    val headerSize = le32(bytes, 14)
    // upper bound keeps 14 + headerSize in Int range AND inside the
    // buffer — a crafted headerSize near 2^31 would otherwise wrap the
    // palette offset negative and die uncontrolled instead of refusing
    require(headerSize >= 40 && headerSize <= bytes.length - 14,
      s"bmp: info header of $headerSize bytes is out of subset " +
        s"(40..${bytes.length - 14})")
    val width = le32(bytes, 18)
    val rawHeight = le32(bytes, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0 && width <= (1 << 20) &&
      height <= (1 << 20), s"bmp: bad geometry ${width}x$rawHeight")
    require(le16(bytes, 26) == 1, "bmp: planes must be 1")
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(compression == 0,
      s"bmp: compression $compression is out of subset (BI_RGB only)")
    require(bpp == 24 || bpp == 8,
      s"bmp: $bpp-bit pixels are out of subset (8/24)")
    val paletteN =
      if (bpp == 8) {
        val declared = le32(bytes, 46)
        if (declared == 0) 256 else declared
      } else 0
    require(paletteN > 0 || bpp == 24,
      s"bmp: palette count $paletteN out of range")
    require(paletteN >= 0 && paletteN <= 256,
      s"bmp: palette of $paletteN entries")
    val palette = new Array[Int](paletteN) // 0xRRGGBB
    var i = 0
    val palAt = 14 + headerSize
    require(palAt + paletteN * 4 <= bytes.length, "bmp: truncated palette")
    while (i < paletteN) {
      val p = palAt + i * 4 // BGRA quads
      palette(i) = ((bytes(p + 2) & 0xff) << 16) |
        ((bytes(p + 1) & 0xff) << 8) | (bytes(p) & 0xff)
      i += 1
    }
    val rowBytes = if (bpp == 24) width * 3 else width
    val stride = (rowBytes + 3) / 4 * 4
    require(dataOffset >= 0 &&
      dataOffset.toLong + stride.toLong * height <= bytes.length,
      "bmp: truncated pixel data")
    val pixels = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val rowAt = dataOffset + srcRow * stride
      var x = 0
      while (x < width) {
        val dst = (y * width + x) * 3
        if (bpp == 24) {
          val p = rowAt + x * 3
          pixels(dst) = bytes(p + 2)     // R
          pixels(dst + 1) = bytes(p + 1) // G
          pixels(dst + 2) = bytes(p)     // B
        } else {
          val idx = bytes(rowAt + x) & 0xff
          require(idx < paletteN, s"bmp: palette index $idx out of range")
          val c = palette(idx)
          pixels(dst) = ((c >> 16) & 0xff).toByte
          pixels(dst + 1) = ((c >> 8) & 0xff).toByte
          pixels(dst + 2) = (c & 0xff).toByte
        }
        x += 1
      }
      y += 1
    }
    PngCodec.Image(width, height, 3, pixels)
  }
}

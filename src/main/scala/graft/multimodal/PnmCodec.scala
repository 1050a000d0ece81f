package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM PNM codec (the netpbm formats — P5 binary graymap and P6
  * binary pixmap, the zero-compression interchange images scientific
  * and ML toolchains write): ASCII header (magic, whitespace/comment-
  * tolerant width/height/maxval) then raw samples. Subset: maxval ≤
  * 255 single-byte samples; the ASCII variants (P1-P3) and 16-bit
  * maxvals refuse by name. Decodes onto the shared [[PngCodec.Image]]
  * substrate.
  *
  * Reference behavior: nexus-processor has no image path; builder-
  * brief multimodal surface (the PngCodec pattern).
  */
object PnmCodec {

  def isPnm(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && b(0) == 'P' &&
      (b(1) == '5' || b(1) == '6')

  /** Encode gray (1-channel → P5) or RGB (3-channel → P6). */
  def encode(img: PngCodec.Image): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"pnm: ${img.channels}-channel encode not supported (1/3)")
    val magic = if (img.channels == 1) "P5" else "P6"
    val header = s"$magic\n${img.width} ${img.height}\n255\n"
      .getBytes("US-ASCII")
    val out = new ArrayBuffer[Byte](header.length + img.pixels.length)
    out ++= header
    out ++= img.pixels
    out.toArray
  }

  /** Parse a P5/P6 stream; refusals are loud and named. */
  def decode(bytes: Array[Byte]): PngCodec.Image = {
    require(bytes != null && bytes.length >= 2 && bytes(0) == 'P',
      "pnm: bad magic")
    val channels = bytes(1) match {
      case '5' => 1
      case '6' => 3
      case '1' | '2' | '3' =>
        sys.error("pnm: ASCII (plain) variants are out of subset")
      case other => sys.error(s"pnm: unknown magic P${other.toChar}")
    }
    // header token reader: whitespace-separated integers, '#' comments
    // run to end of line (the netpbm grammar)
    var p = 2
    def nextInt(): Int = {
      while (p < bytes.length &&
             (bytes(p) == ' ' || bytes(p) == '\t' ||
              bytes(p) == '\n' || bytes(p) == '\r' || bytes(p) == '#')) {
        if (bytes(p) == '#')
          while (p < bytes.length && bytes(p) != '\n') p += 1
        else p += 1
      }
      val start = p
      while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') p += 1
      require(p > start, s"pnm: expected an integer at offset $start")
      new String(bytes, start, p - start, "US-ASCII").toInt
    }
    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    require(width > 0 && height > 0, s"pnm: bad geometry ${width}x$height")
    require(maxval > 0 && maxval <= 255,
      s"pnm: maxval $maxval is out of subset (single-byte samples only)")
    // exactly ONE whitespace byte separates the header from the raster
    require(p < bytes.length &&
      (bytes(p) == ' ' || bytes(p) == '\t' ||
       bytes(p) == '\n' || bytes(p) == '\r'),
      "pnm: missing raster separator")
    p += 1
    // Long arithmetic: a crafted 65536x65536 header would overflow Int
    // to 0 and slip past the truncation check with bogus features
    val n = width.toLong * height * channels
    require(n <= Int.MaxValue, s"pnm: geometry ${width}x$height too large")
    require(p + n <= bytes.length,
      s"pnm: truncated raster (need $n bytes, have ${bytes.length - p})")
    PngCodec.Image(width, height, channels,
      java.util.Arrays.copyOfRange(bytes, p, p + n.toInt))
  }
}

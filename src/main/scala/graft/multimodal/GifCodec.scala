package graft.multimodal

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** REAL GIF pixel codec, pure JVM — the second de-stubbed image format
  * after [[PngCodec]] (reference treats media as opaque blobs; the GIF89a
  * spec is public and the format is fully losslessly decodable with no
  * codec library: LZW + palettes). Supported subset, loud errors outside
  * it: GIF87a/GIF89a, global and local color tables, interlaced and
  * non-interlaced frames, MULTI-FRAME streams (animation — each frame
  * decodes standalone with its logical-screen placement), graphic
  * control / comment / application extensions skipped structurally.
  * Transparency indices are reported but not composited (frames return
  * their own rasters; composition is the caller's policy).
  *
  * Because GIF is lossless over palette indices, decoded channel sums
  * are EXACTLY rederivable from a fixture's index formula + palette —
  * the same oracle discipline as the PNG `image_decode` entry.
  *
  * Encode writes spec-conformant GIF89a (LZW with dictionary resets,
  * sub-block framing, optional interlace) so fixtures roundtrip through
  * the independent decoder.
  */
object GifCodec {

  /** One decoded frame: placement on the logical screen + its own
    * row-major RGB raster (3 bytes/pixel). `transparentIdx` < 0 when the
    * frame declares no transparency. */
  final case class Frame(left: Int, top: Int, width: Int, height: Int,
                         rgb: Array[Byte], transparentIdx: Int)

  /** Decoded stream: logical screen dims + frames in storage order. */
  final case class Gif(width: Int, height: Int, frames: Seq[Frame])

  /** Frame to encode: palette indices over its own w×h raster. */
  final case class IndexedFrame(left: Int, top: Int, width: Int, height: Int,
                                indices: Array[Byte], delayCs: Int = 0,
                                interlace: Boolean = false)

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  // ---- encode ------------------------------------------------------------

  /** Spec-conformant GIF89a: one global color table (`palette` as packed
    * 0xRRGGBB ints, length a power of two ≤ 256), frames LZW-compressed
    * with real dictionary resets. Multi-frame streams get a graphic
    * control extension per frame (delay in centiseconds). */
  def encode(width: Int, height: Int, palette: Array[Int],
             frames: Seq[IndexedFrame]): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1,
      s"palette length ${palette.length} must be a power of two <= 256")
    require(frames.nonEmpty, "at least one frame")
    val gctBits = math.max(1,
      32 - Integer.numberOfLeadingZeros(palette.length - 1))
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    w8(0x80 | ((gctBits - 1) << 4) | (gctBits - 1)) // GCT present
    w8(0) // background color index
    w8(0) // aspect
    val gctLen = 1 << gctBits
    (0 until gctLen).foreach { i =>
      val c = if (i < palette.length) palette(i) else 0
      w8(c >> 16); w8(c >> 8); w8(c)
    }
    frames.foreach { f =>
      require(f.indices.length == f.width * f.height,
        "frame raster size mismatch")
      require(f.indices.forall(i => (i & 0xff) < palette.length),
        "frame index outside palette")
      if (frames.length > 1 || f.delayCs > 0) {
        w8(0x21); w8(0xf9); w8(4)
        w8(0) // no disposal, no transparency
        w16(f.delayCs); w8(0); w8(0)
      }
      w8(0x2c)
      w16(f.left); w16(f.top); w16(f.width); w16(f.height)
      w8(if (f.interlace) 0x40 else 0) // no local color table
      val rows =
        if (f.interlace) interlaceOrder(f.height).toArray
        else (0 until f.height).toArray
      val stream = new Array[Byte](f.indices.length)
      var r = 0
      while (r < rows.length) {
        System.arraycopy(f.indices, rows(r) * f.width, stream,
          r * f.width, f.width)
        r += 1
      }
      val mcs = math.max(2, gctBits)
      w8(mcs)
      val compressed = lzwCompress(stream, mcs)
      var p = 0
      while (p < compressed.length) {
        val n = math.min(255, compressed.length - p)
        w8(n); out.write(compressed, p, n); p += n
      }
      w8(0) // block terminator
    }
    w8(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW: clear/EOI codes, LSB-first bit packing, code width
    * grows 'mcs+1'..12, dictionary reset at 4096. */
  private def lzwCompress(data: Array[Byte], mcs: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = mcs + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    var dict = mutable.LongMap.empty[Int]
    var next = eoi + 1
    emit(clear)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val k = data(i) & 0xff
      if (prefix < 0) prefix = k
      else {
        val key = (prefix.toLong << 8) | k
        dict.get(key) match {
          case Some(code) => prefix = code
          case None =>
            emit(prefix)
            dict(key) = next
            next += 1
            // the decoder's dictionary lags the encoder's by ONE entry
            // (it adds nothing on the first code after clear), so the
            // width grows one entry later than a naive count — the
            // classic GIF-LZW boundary rule
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
            if (next == 4096) {
              emit(clear)
              dict = mutable.LongMap.empty[Int]
              next = eoi + 1
              codeSize = mcs + 1
            }
            prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) emit(prefix)
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------------

  def decode(bytes: Array[Byte]): Gif = {
    require(isGif(bytes), "not a GIF (bad signature)")
    var p = 6
    def u8(): Int = { val v = bytes(p) & 0xff; p += 1; v }
    def u16(): Int = { val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2; v }
    val width = u16()
    val height = u16()
    val packed = u8()
    p += 2 // background index + aspect
    val gct =
      if ((packed & 0x80) != 0) readColorTable(bytes, { val a = p; p += 3 * (2 << (packed & 7)); a }, 2 << (packed & 7))
      else Array.empty[Int]

    val frames = mutable.ArrayBuffer.empty[Frame]
    var transparentIdx = -1
    var done = false
    while (!done && p < bytes.length) {
      u8() match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          val label = u8()
          if (label == 0xf9) { // graphic control: transparency for next frame
            val sz = u8() // 4: packed(1) + delay(2) + transparent idx(1)
            val gcPacked = u8()
            val tIdx = { p += sz - 1; bytes(p - 1) & 0xff }
            transparentIdx = if ((gcPacked & 1) != 0) tIdx else -1
            var n = u8()
            while (n != 0) { p += n; n = u8() }
          } else {
            var n = u8()
            while (n != 0) { p += n; n = u8() }
          }
        case 0x2c => // image descriptor
          val left = u16(); val top = u16()
          val fw = u16(); val fh = u16()
          val fPacked = u8()
          val palette =
            if ((fPacked & 0x80) != 0)
              readColorTable(bytes, { val a = p; p += 3 * (2 << (fPacked & 7)); a }, 2 << (fPacked & 7))
            else gct
          require(palette.nonEmpty, "frame has no color table")
          val mcs = u8()
          require(mcs >= 2 && mcs <= 11, s"bad LZW min code size $mcs")
          // concatenate the data sub-blocks
          val data = new ByteArrayOutputStream()
          var n = u8()
          while (n != 0) { data.write(bytes, p, n); p += n; n = u8() }
          val indices = lzwDecompress(data.toByteArray, mcs, fw * fh)
          val rgb = new Array[Byte](fw * fh * 3)
          val rows =
            if ((fPacked & 0x40) != 0) interlaceOrder(fh).toArray
            else (0 until fh).toArray
          var r = 0
          while (r < rows.length) {
            val destRow = rows(r)
            var x = 0
            while (x < fw) {
              val idx = indices(r * fw + x) & 0xff
              require(idx < palette.length,
                s"pixel index $idx outside the ${palette.length}-entry palette")
              val c = palette(idx)
              val q = (destRow * fw + x) * 3
              rgb(q) = (c >> 16).toByte
              rgb(q + 1) = (c >> 8).toByte
              rgb(q + 2) = c.toByte
              x += 1
            }
            r += 1
          }
          frames += Frame(left, top, fw, fh, rgb, transparentIdx)
          transparentIdx = -1
        case b => sys.error(f"unsupported GIF block introducer 0x$b%02x")
      }
    }
    require(frames.nonEmpty, "GIF stream carries no image")
    Gif(width, height, frames.toSeq)
  }

  private def readColorTable(bytes: Array[Byte], at: Int, n: Int): Array[Int] =
    Array.tabulate(n)(i => ((bytes(at + 3 * i) & 0xff) << 16) |
      ((bytes(at + 3 * i + 1) & 0xff) << 8) | (bytes(at + 3 * i + 2) & 0xff))

  /** Interlaced row storage order (4 passes: every 8th from 0, every 8th
    * from 4, every 4th from 2, every 2nd from 1). */
  private[graft] def interlaceOrder(h: Int): Seq[Int] =
    (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)

  private def lzwDecompress(data: Array[Byte], mcs: Int,
                            expected: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outLen = 0
    // dictionary as (prefix code, suffix byte); roots are implicit
    val prefixes = new Array[Int](4096)
    val suffixes = new Array[Byte](4096)
    var next = eoi + 1
    var codeSize = mcs + 1
    var bitBuf = 0L
    var bitCnt = 0
    var p = 0
    var prev = -1
    val stack = new Array[Byte](4096)

    def writeCode(code: Int): Byte = { // returns the code's FIRST byte
      var sp = 0
      var c = code
      while (c >= clear) { // walk the chain (codes < clear are roots)
        stack(sp) = suffixes(c); sp += 1
        c = prefixes(c)
      }
      val first = c.toByte
      require(outLen + sp + 1 <= expected,
        "LZW output exceeds the frame raster")
      out(outLen) = first; outLen += 1
      while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
      first
    }

    var done = false
    while (!done) {
      while (bitCnt < codeSize && p < data.length) {
        bitBuf |= (data(p) & 0xffL) << bitCnt; bitCnt += 8; p += 1
      }
      if (bitCnt < codeSize) done = true // truncated stream: stop at data end
      else {
        val code = (bitBuf & ((1L << codeSize) - 1)).toInt
        bitBuf >>>= codeSize; bitCnt -= codeSize
        if (code == clear) {
          next = eoi + 1; codeSize = mcs + 1; prev = -1
        } else if (code == eoi) done = true
        else {
          require(code < next || (code == next && prev >= 0),
            s"LZW code $code out of range (next $next)")
          if (prev < 0) {
            require(code < clear, "first code after clear must be a root")
            out(outLen) = code.toByte; outLen += 1
            prev = code
          } else {
            val first =
              if (code < next) writeCode(code)
              else { // KwKwK: code == next
                var c = prev
                while (c >= clear) c = prefixes(c)
                val f = c.toByte
                require(outLen + 1 <= expected,
                  "LZW output exceeds the frame raster")
                // emit prev's expansion then its first byte
                val mark = outLen
                writeCode(prev)
                require(outLen < expected,
                  "LZW output exceeds the frame raster")
                out(outLen) = f; outLen += 1
                val _ = mark
                f
              }
            if (next < 4096) {
              prefixes(next) = prev; suffixes(next) = first
              next += 1
              if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
            }
            prev = code
          }
        }
        if (outLen >= expected) done = true
      }
    }
    require(outLen == expected,
      s"LZW stream decoded $outLen of $expected raster bytes")
    out
  }
}

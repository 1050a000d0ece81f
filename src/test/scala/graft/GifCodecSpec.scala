package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.GifCodec
import graft.multimodal.GifCodec.{Gif, IndexedFrame}

/** Wire-format roundtrips for the pure-JVM GIF codec: LZW with code-width
  * growth and dictionary resets, sub-block framing, interlace, palettes,
  * multi-frame streams — every decode is by the independent parser over
  * bytes the encoder produced from the public GIF89a spec. */
class GifCodecSpec extends AnyFunSuite {

  private def palette(n: Int): Array[Int] =
    Array.tabulate(n)(j => (((j * 5) % 256) << 16) |
      (((j * 9 + 3) % 256) << 8) | ((j * 13 + 7) % 256))

  private def rgbOf(pal: Array[Int], indices: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](indices.length * 3)
    indices.indices.foreach { i =>
      val c = pal(indices(i) & 0xff)
      out(i * 3) = (c >> 16).toByte
      out(i * 3 + 1) = (c >> 8).toByte
      out(i * 3 + 2) = c.toByte
    }
    out
  }

  test("single-frame roundtrip across palette sizes") {
    for (palBits <- Seq(1, 2, 4, 6, 8)) {
      val pal = palette(1 << palBits)
      val w = 23; val h = 11
      val idx = Array.tabulate(w * h)(i => ((i * 7 + 3) % pal.length).toByte)
      val bytes = GifCodec.encode(w, h, pal,
        Seq(IndexedFrame(0, 0, w, h, idx)))
      assert(GifCodec.isGif(bytes))
      val Gif(gw, gh, frames) = GifCodec.decode(bytes)
      assert((gw, gh) == (w, h))
      assert(frames.length == 1)
      assert(frames.head.rgb.toSeq == rgbOf(pal, idx).toSeq,
        s"palette bits $palBits")
    }
  }

  test("repetitive raster exercises the KwKwK code path") {
    val pal = palette(4)
    val w = 50; val h = 20
    // long runs of one index → the decoder must handle code == next
    val idx = Array.tabulate(w * h)(i => (if ((i / 97) % 2 == 0) 1 else 2).toByte)
    val bytes = GifCodec.encode(w, h, pal, Seq(IndexedFrame(0, 0, w, h, idx)))
    assert(GifCodec.decode(bytes).frames.head.rgb.toSeq ==
      rgbOf(pal, idx).toSeq)
  }

  test("large high-entropy raster crosses 12-bit codes and dictionary resets") {
    val pal = palette(256)
    val w = 101; val h = 83 // 8383 px of pseudo-random indices → > 4096 codes
    val idx = Array.tabulate(w * h)(i => ((i * 2654435761L >>> 13) % 256).toByte)
    val bytes = GifCodec.encode(w, h, pal, Seq(IndexedFrame(0, 0, w, h, idx)))
    assert(GifCodec.decode(bytes).frames.head.rgb.toSeq ==
      rgbOf(pal, idx).toSeq)
  }

  test("interlaced frames deinterlace to the identical raster") {
    val pal = palette(16)
    val w = 19; val h = 13 // odd dims hit every interlace pass unevenly
    val idx = Array.tabulate(w * h)(i => ((i * 11 + 5) % 16).toByte)
    val plain = GifCodec.encode(w, h, pal,
      Seq(IndexedFrame(0, 0, w, h, idx)))
    val laced = GifCodec.encode(w, h, pal,
      Seq(IndexedFrame(0, 0, w, h, idx, interlace = true)))
    assert(plain.length != laced.length ||
      !plain.sameElements(laced)) // the streams differ…
    assert(GifCodec.decode(laced).frames.head.rgb.toSeq ==
      GifCodec.decode(plain).frames.head.rgb.toSeq) // …the rasters do not
  }

  test("interlace row order covers every row exactly once") {
    for (h <- Seq(1, 2, 7, 8, 9, 64))
      assert(GifCodec.interlaceOrder(h).sorted == (0 until h),
        s"height $h")
  }

  test("multi-frame stream decodes every frame with its placement") {
    val pal = palette(32)
    val frames = (0 until 3).map { f =>
      val w = 10 + f; val h = 6 + f
      IndexedFrame(f * 2, f * 3, w, h,
        Array.tabulate(w * h)(i => ((i + f * 7) % 32).toByte),
        delayCs = 10 * (f + 1), interlace = f == 1)
    }
    val g = GifCodec.decode(GifCodec.encode(40, 40, pal, frames))
    assert(g.frames.length == 3)
    g.frames.zipWithIndex.foreach { case (df, f) =>
      assert((df.left, df.top, df.width, df.height) ==
        (f * 2, f * 3, 10 + f, 6 + f))
      assert(df.rgb.toSeq == rgbOf(pal, frames(f).indices).toSeq, s"frame $f")
      assert(df.transparentIdx == -1)
    }
  }

  test("bad signatures and malformed streams refuse loudly") {
    assert(!GifCodec.isGif("JFIF....".getBytes))
    intercept[IllegalArgumentException](GifCodec.decode("GIF88a!!".getBytes))
    val pal = palette(4)
    val ok = GifCodec.encode(5, 5, pal,
      Seq(IndexedFrame(0, 0, 5, 5, new Array[Byte](25))))
    // truncate inside the LZW data → decoded length mismatch, named
    val cut = ok.take(ok.length - 6)
    val ex = intercept[Exception](GifCodec.decode(cut))
    assert(ex.getMessage.contains("LZW") ||
      ex.getMessage.contains("out of") ||
      ex.isInstanceOf[ArrayIndexOutOfBoundsException])
  }

  test("encode refuses rasters that do not match their declaration") {
    val pal = palette(4)
    intercept[IllegalArgumentException](GifCodec.encode(5, 5, pal,
      Seq(IndexedFrame(0, 0, 5, 5, new Array[Byte](24)))))
    intercept[IllegalArgumentException](GifCodec.encode(5, 5, pal,
      Seq(IndexedFrame(0, 0, 5, 5, Array.fill[Byte](25)(9))))) // idx ≥ |pal|
    intercept[IllegalArgumentException](
      GifCodec.encode(5, 5, palette(5), // not a power of two
        Seq(IndexedFrame(0, 0, 5, 5, new Array[Byte](25)))))
  }
}

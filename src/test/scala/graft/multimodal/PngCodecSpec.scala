package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The REAL PNG pixel codec (PngCodec): encode/decode roundtrips, all
  * five row filters decoded against hand-filtered streams, raster ops,
  * perceptual-hash properties, and the banded near-dup join. */
class PngCodecSpec extends AnyFunSuite {
  import PngCodec._

  private def raster(w: Int, h: Int, ch: Int)(f: (Int, Int, Int) => Int) =
    Image(w, h, ch, Array.tabulate(w * h * ch) { i =>
      val pix = i / ch; (f(pix % w, pix / w, i % ch) & 0xff).toByte
    })

  test("encode/decode roundtrip for gray, RGB, and RGBA") {
    for (ch <- Seq(1, 3, 4)) {
      val img = raster(23, 17, ch)((x, y, c) => x * 3 + y * 5 + c * 11)
      val back = decode(encode(img))
      assert(back.width == 23 && back.height == 17 && back.channels == ch)
      assert(back.pixels.toSeq == img.pixels.toSeq, s"channels $ch")
    }
  }

  test("all five row filters decode (hand-filtered streams)") {
    // build the FILTERED byte stream ourselves, one filter per test
    // image, and expect the decoder to invert it exactly
    val w = 9; val h = 6; val ch = 3
    val img = raster(w, h, ch)((x, y, c) => 7 * x + 13 * y + 29 * c + x * y)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (filter <- 0 to 4) {
      val stride = w * ch
      val raw = new Array[Byte](h * (stride + 1))
      for (y <- 0 until h) {
        raw(y * (stride + 1)) = filter.toByte
        for (x <- 0 until stride) {
          val cur = img.pixels(y * stride + x) & 0xff
          val left = if (x >= ch) img.pixels(y * stride + x - ch) & 0xff else 0
          val up = if (y > 0) img.pixels((y - 1) * stride + x) & 0xff else 0
          val ul = if (y > 0 && x >= ch)
            img.pixels((y - 1) * stride + x - ch) & 0xff else 0
          val pred = filter match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        }
      }
      val deflater = new Deflater()
      deflater.setInput(raw); deflater.finish()
      val z = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      // wrap in minimal chunks
      val out = new ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte), 0, 8)
      def be32(v: Long): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
        ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      def chunk(t: String, d: Array[Byte]): Unit = {
        val tb = t.getBytes("US-ASCII")
        val crc = new CRC32(); crc.update(tb); crc.update(d)
        out.write(be32(d.length.toLong), 0, 4); out.write(tb, 0, 4)
        out.write(d, 0, d.length); out.write(be32(crc.getValue), 0, 4)
      }
      chunk("IHDR", be32(w.toLong) ++ be32(h.toLong) ++
        Array[Byte](8, 2, 0, 0, 0))
      chunk("IDAT", z.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      val back = decode(out.toByteArray)
      assert(back.pixels.toSeq == img.pixels.toSeq, s"filter $filter")
    }
  }

  test("out-of-subset PNGs refuse by name") {
    val img = raster(4, 4, 3)((x, y, c) => x + y + c)
    val ok = encode(img)
    // flip the interlace byte inside IHDR (fixed offset: 8 sig + 8
    // chunk head + 12)
    val interlaced = ok.clone(); interlaced(8 + 8 + 12) = 1
    val e1 = intercept[RuntimeException](decode(interlaced))
    assert(e1.getMessage.contains("interlaced"))
    val palette = ok.clone(); palette(8 + 8 + 9) = 3
    val e2 = intercept[RuntimeException](decode(palette))
    assert(e2.getMessage.contains("palette"))
  }

  test("resize + grayscale are deterministic pixel transforms") {
    val img = raster(16, 16, 3)((x, y, _) => x * 16 + y)
    val half = resizeNearest(img, 8, 8)
    assert(half.width == 8 && half.height == 8)
    // nearest: target (x,y) samples source (2x,2y)
    for (x <- 0 until 8; y <- 0 until 8; c <- 0 until 3)
      assert(half.pixels((y * 8 + x) * 3 + c) ==
        img.pixels(((y * 2) * 16 + x * 2) * 3 + c))
    val g = toGray(raster(2, 1, 3)((x, _, c) => if (c == 0) 255 else 0))
    assert(g(0) == 255 * 299 / 1000)
  }

  test("perceptual hashes: stable, scale-invariant-ish, discriminative") {
    def blobs(seed: Int) = raster(64, 48, 3)((x, y, c) =>
      // smooth low-frequency content — what pHash is built for
      128 + (40 * math.sin((x + seed * 7) / 9.0) +
        40 * math.cos((y - seed * 3) / 7.0)).toInt + c)
    val a = blobs(0)
    val aBig = resizeNearest(a, 128, 96) // same content, other scale
    val b = blobs(5)
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    assert(pHash(a) == pHash(decode(encode(a)))) // byte-exact stability
    assert(ham(pHash(a), pHash(aBig)) <= 6, "scaled variant must stay close")
    assert(ham(pHash(a), pHash(b)) >= 16, "distinct content must differ")
    assert(aHash(a) == aHash(decode(encode(a))))
    assert(dHash(a) == dHash(decode(encode(a))))
  }
}

/** Spark-side image pipeline over the real codec. */
class MultimodalPixelSpec extends SparkSuite {
  import spark.implicits._
  import PngCodec._

  private def png(id: Long, seed: Long): Array[Byte] =
    encode(Image(24, 16, 3, Array.tabulate(24 * 16 * 3) { i =>
      val pix = i / 3; val c = i % 3
      ((seed * 7 + (pix % 24) * 3 + (pix / 24) * 5 + c * 11) % 256).toByte
    }))

  test("decodeImages: real pixel sums + hashes; non-PNG rows go null") {
    val blobs = Seq(
      (1L, png(1L, 1L)), (2L, png(2L, 2L)),
      (3L, "not a png".getBytes("UTF-8"))).toDF("media_id", "content")
    val out = Multimodal.decodeImages(spark, blobs, "media_id", "content")
      .orderBy("media_id").collect()
    assert(out(0).getInt(1) == 24 && out(0).getInt(2) == 16 &&
      out(0).getInt(3) == 3 && out(0).getInt(4) == 1)
    // channel-0 sum rederived from the generator formula
    val expect = (for (x <- 0 until 24; y <- 0 until 16)
      yield (1L * 7 + x * 3 + y * 5) % 256).sum
    assert(out(0).getLong(5) == expect)
    assert(!out(0).isNullAt(10) && !out(1).isNullAt(10))
    assert(out(2).isNullAt(10) && out(2).getInt(1) == 0)
  }

  test("imageNearDups: banded join finds close hashes, never all-pairs") {
    // planted hashes: 10 ⊕-near pairs + unrelated values
    val rows = (0L until 10L).flatMap { i =>
      val base = i * 0x9E3779B97F4A7C15L
      Seq((i * 2, base), (i * 2 + 1, base ^ (1L << (i % 60))))
    } ++ Seq((100L, 0x0F0F0F0F0F0F0F0FL), (101L, 0x7070707070707070L))
    val decoded = rows.toDF("media_id", "phash")
    val dups = Multimodal.imageNearDups(decoded, "media_id")
      .orderBy("media_id_a").collect()
    assert(dups.length == 10)
    assert(dups.forall(r => r.getLong(1) == r.getLong(0) + 1 &&
      r.getInt(2) == 1))
    // end to end: identical PNGs are hamming-0 dups
    val blobs = Seq((1L, png(1L, 9L)), (2L, png(2L, 9L)),
      (3L, png(3L, 4L))).toDF("media_id", "content")
    val d2 = Multimodal.imageNearDups(
      Multimodal.decodeImages(spark, blobs, "media_id", "content"),
      "media_id").collect()
    assert(d2.length == 1 && d2.head.getLong(0) == 1L &&
      d2.head.getLong(1) == 2L && d2.head.getInt(2) == 0)
  }

  test("resizeImages re-encodes real pixels") {
    val blobs = Seq((1L, png(1L, 3L))).toDF("media_id", "content")
    val small = Multimodal.resizeImages(spark, blobs, "media_id", "content",
      12, 8).collect()
    val img = decode(small.head.getAs[Array[Byte]]("content"))
    assert(img.width == 12 && img.height == 8 && img.channels == 3)
    // corner pixel survives nearest-neighbor exactly
    val orig = decode(png(1L, 3L))
    assert(img.pixels(0) == orig.pixels(0))
  }
}

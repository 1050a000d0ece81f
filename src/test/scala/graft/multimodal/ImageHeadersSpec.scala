package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[ImageHeaders]] against CANONICAL real-file bytes (hand-written hex,
  * not [[ImageFixtures]] output — the parser must not be tested against
  * its own inverse), plus the fixture roundtrip and the Spark-side
  * expression path.
  */
class ImageHeadersSpec extends SparkSuite {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.split("\\s+").filter(_.nonEmpty).map(Integer.parseInt(_, 16).toByte)

  // The well-known smallest transparent 1x1 PNG (RGBA, zlib IDAT).
  private val canonicalPng = hex(
    """89 50 4E 47 0D 0A 1A 0A 00 00 00 0D 49 48 44 52
       00 00 00 01 00 00 00 01 08 06 00 00 00 1F 15 C4
       89 00 00 00 0A 49 44 41 54 78 9C 63 00 01 00 00
       05 00 01 0D 0A 2D B4 00 00 00 00 49 45 4E 44 AE
       42 60 82""")

  // The well-known smallest 1x1 GIF89a (2-entry global color table).
  private val canonicalGif = hex(
    """47 49 46 38 39 61 01 00 01 00 80 00 00 FF FF FF
       00 00 00 2C 00 00 00 00 01 00 01 00 00 02 02 44
       01 00 3B""")

  // Hand-assembled JFIF header: SOI, APP0, a COM segment, then a
  // PROGRESSIVE frame header (SOF2, marker C2) with height=2 width=3 —
  // exercises the marker walk and the SOFn class beyond baseline C0.
  private val jpegProgressive = hex(
    """FF D8
       FF E0 00 10 4A 46 49 46 00 01 01 00 00 01 00 01 00 00
       FF FE 00 07 68 65 6C 6C 6F
       FF C2 00 11 08 00 02 00 03 03 01 22 00 02 11 01 03 11 01""")

  test("canonical real-file bytes decode to their known dimensions") {
    assert(ImageHeaders.decode(canonicalPng) === Some(("png", 1, 1)))
    assert(ImageHeaders.decode(canonicalGif) === Some(("gif", 1, 1)))
    assert(ImageHeaders.decode(jpegProgressive) === Some(("jpeg", 3, 2)))
  }

  test("endianness: PNG dims are big-endian, GIF dims little-endian") {
    // PNG width bytes 00 00 01 02 = 258 — a little-endian misread gives
    // 0x02010000; CRC is not validated (header extraction contract)
    val png258 = hex(
      """89 50 4E 47 0D 0A 1A 0A 00 00 00 0D 49 48 44 52
         00 00 01 02 00 00 00 01 08 06 00 00 00 00 00 00 00""")
    assert(ImageHeaders.decode(png258) === Some(("png", 258, 1)))
    // GIF width bytes 02 01 = 0x0102 = 258 little-endian
    val gif258 = hex("47 49 46 38 37 61 02 01 01 00 00 00 00 3B")
    assert(ImageHeaders.decode(gif258) === Some(("gif", 258, 1)))
  }

  test("JPEG marker walk: fill bytes, standalone markers, missing SOF") {
    // fill FFs padding before APP0 and before SOF0; RST (standalone) in
    // between — all legal framing
    val padded = hex(
      """FF D8
         FF FF FF E0 00 04 00 00
         FF 01
         FF FF C0 00 0B 08 00 05 00 07 01 01 11 00""")
    assert(ImageHeaders.decode(padded) === Some(("jpeg", 7, 5)))
    // buffer ending EXACTLY after the SOF width bytes still decodes —
    // the last byte read is marker+7, so marker+8 == length suffices
    val exact = hex("FF D8 FF C0 00 0B 08 00 05 00 07")
    assert(ImageHeaders.decode(exact) === Some(("jpeg", 7, 5)))
    // SOS before any SOF → no dims; EOI immediately → no dims
    assert(ImageHeaders.decode(hex("FF D8 FF DA 00 04 00 00 FF D9")) === None)
    assert(ImageHeaders.decode(hex("FF D8 FF D9")) === None)
    // C4 (DHT) is in C0..CF but is NOT a frame header — must be skipped,
    // then the real SOF0 found
    val dht = hex(
      """FF D8
         FF C4 00 04 00 00
         FF C0 00 0B 08 00 01 00 01 01 01 11 00""")
    assert(ImageHeaders.decode(dht) === Some(("jpeg", 1, 1)))
  }

  test("garbage, truncation, and zero dims decode to null, never throw") {
    assert(ImageHeaders.decode(null) === None)
    assert(ImageHeaders.decode(Array.emptyByteArray) === None)
    assert(ImageHeaders.decode("just some text".getBytes("UTF-8")) === None)
    assert(ImageHeaders.decode(canonicalPng.take(20)) === None) // short IHDR
    assert(ImageHeaders.decode(canonicalGif.take(8)) === None)
    assert(ImageHeaders.decode(jpegProgressive.take(25)) === None) // mid-COM
    // a PNG claiming 0 width is invalid per spec
    val zeroW = hex(
      """89 50 4E 47 0D 0A 1A 0A 00 00 00 0D 49 48 44 52
         00 00 00 00 00 00 00 01 08 06 00 00 00 00 00 00 00""")
    assert(ImageHeaders.decode(zeroW) === None)
    // truncated marker length that points past the buffer
    assert(ImageHeaders.decode(hex("FF D8 FF E0 FF FF 00")) === None)
  }

  test("fixture roundtrip: construct → parse recovers planted dims for every format") {
    val payloads = Seq(Array.emptyByteArray,
      "short".getBytes("UTF-8"),
      Array.fill(70000)(0x41.toByte)) // > one JPEG COM segment
    for (id <- 0L until 300L; p <- payloads) {
      val expectFmt = (id % 4) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"; case _ => "webp"
      }
      val got = ImageHeaders.decode(ImageFixtures.syntheticImageBlob(id, p))
      assert(got === Some((expectFmt, (id % 640).toInt + 1, (id % 480).toInt + 1)),
        s"id=$id payload=${p.length}B")
    }
  }

  test("WebP: canonical hand-hexed bytes for all three first-chunk variants") {
    // VP8L 1x1 (the smallest legal lossless stream prefix): signature
    // 2F, then 14+14 zero bits (w-1 = h-1 = 0) — transcribed from the
    // public WebP lossless bitstream spec
    val vp8l1x1 = hex(
      """52 49 46 46 12 00 00 00 57 45 42 50
         56 50 38 4C 05 00 00 00 2F 00 00 00 00 00""")
    assert(ImageHeaders.decode(vp8l1x1) === Some(("webp", 1, 1)))
    // VP8 lossy keyframe, 2x2: frame tag 00 00 00, start code 9D 01 2A,
    // dims 14-bit LE
    val vp8lossy = hex(
      """52 49 46 46 16 00 00 00 57 45 42 50
         56 50 38 20 0A 00 00 00 00 00 00 9D 01 2A 02 00 02 00""")
    assert(ImageHeaders.decode(vp8lossy) === Some(("webp", 2, 2)))
    // VP8X extended, canvas 258x16: 24-bit LE minus-one fields (01 01 00
    // = 257 -> 258; a big-endian misread would give a huge width)
    val vp8x = hex(
      """52 49 46 46 16 00 00 00 57 45 42 50
         56 50 38 58 0A 00 00 00 00 00 00 00 01 01 00 0F 00 00""")
    assert(ImageHeaders.decode(vp8x) === Some(("webp", 258, 16)))
    // an interframe-first VP8 chunk is not a valid still image
    val inter = vp8lossy.clone(); inter(20) = 0x01
    assert(ImageHeaders.decode(inter) === None)
    // truncation inside the first chunk
    assert(ImageHeaders.decode(vp8lossy.take(24)) === None)
    // WAV is RIFF too but not WEBP — families stay disjoint
    assert(ImageHeaders.decode(
      AudioFixtures.wav(1, 8000, 8, 1, Array.emptyByteArray)) === None)
  }

  test("ImageDims expression: codegen path, null for unrecognized rows") {
    val rows = Seq(
      (1L, ImageFixtures.png(640, 480, "x".getBytes)),
      (2L, ImageFixtures.jpeg(33, 44, Array.emptyByteArray)),
      (3L, ImageFixtures.gif(7, 9, "pay".getBytes)),
      (4L, "not an image at all".getBytes("UTF-8")))
      .toDF("id", "content")
    val out = rows.select(col("id"), ImageDims.col(col("content")).as("d"))
      .select(col("id"), col("d.format"), col("d.width"), col("d.height"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getString(1), r.getInt(2), r.getInt(3))))).toMap
    assert(out(1L) === Some(("png", 640, 480)))
    assert(out(2L) === Some(("jpeg", 33, 44)))
    assert(out(3L) === Some(("gif", 7, 9)))
    assert(out(4L) === None)
  }
}

package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Deterministic REAL-container image fixtures: spec-conformant PNG /
  * JPEG / GIF byte streams with planted dimensions and an arbitrary
  * payload riding in a legal container slot (PNG IDAT chunk, JPEG COM
  * segment, GIF raw bytes before the trailer). This is the in-container
  * substitute for reading actual crawled media: the bytes exercise the
  * exact header layout a real crawl would (magic, chunk/marker framing,
  * CRCs, endianness), so [[ImageHeaders]] is tested against genuine
  * container structure, not against its own inverse.
  *
  * Construction is intentionally a SEPARATE code path from the parser
  * (ByteBuffer-free manual big/little-endian writes here, offset reads
  * there), and ImageHeadersSpec additionally pins the parser against
  * canonical real-file bytes (a known-good 1x1 PNG etc.) so a mirrored
  * endianness bug cannot hide in the roundtrip.
  */
object ImageFixtures {

  private def crc32(parts: Array[Byte]*): Long = {
    val c = new CRC32()
    parts.foreach(c.update)
    c.getValue
  }

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  /** Spec-conformant PNG: signature, IHDR (8-bit RGBA), one IDAT chunk
    * carrying `payload` verbatim (not zlib — headers don't care), IEND.
    * Chunk CRCs are real CRC32 over type+data per the PNG spec. */
  def png(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    require(width >= 1 && height >= 1, "PNG dims must be >= 1")
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val t = typ.getBytes("US-ASCII")
      out.write(be32(data.length.toLong), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      out.write(be32(crc32(t, data)), 0, 4)
    }
    chunk("IHDR", be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, 6, 0, 0, 0))
    chunk("IDAT", payload)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** JFIF JPEG: SOI, APP0 (JFIF 1.1), payload in COM segments (a legal
    * pre-frame slot; segment length is 16-bit, so long payloads split),
    * a baseline SOF0 frame header with the planted dims, SOS, EOI. */
  def jpeg(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    require(width >= 1 && width <= 0xffff && height >= 1 && height <= 0xffff,
      "JPEG dims are 16-bit")
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, data: Array[Byte]): Unit = {
      marker(m)
      out.write(be16(data.length + 2), 0, 2) // length includes itself
      out.write(data, 0, data.length)
    }
    marker(0xd8) // SOI
    segment(0xe0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    payload.grouped(0xfff0).foreach(p => segment(0xfe, p)) // COM
    // SOF0: precision 8, height, width, 3 components (id, sampling 0x11,
    // quant table 0)
    segment(0xc0, Array[Byte](8) ++ be16(height) ++ be16(width) ++
      Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    segment(0xda, Array[Byte](3, 1, 0, 2, 0x11, 3, 0x11, 0, 63, 0)) // SOS
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** GIF89a: signature, logical screen descriptor (LE dims, no global
    * color table), payload bytes, trailer. */
  def gif(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    require(width >= 1 && width <= 0xffff && height >= 1 && height <= 0xffff,
      "GIF dims are 16-bit")
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    out.write(le16(width), 0, 2)
    out.write(le16(height), 0, 2)
    out.write(Array[Byte](0, 0, 0), 0, 3) // flags, bg index, aspect
    out.write(payload, 0, payload.length)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def le24(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte, ((v >>> 16) & 0xff).toByte)

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
    ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  /** WebP (RIFF container): the variant cycles by `id % 3` across the
    * three first-chunk layouts the spec allows — `VP8 ` (lossy keyframe:
    * 3-byte frame tag, 9D 01 2A start code, 14-bit LE dims), `VP8L`
    * (lossless: 2F signature, 14+14 bits LSB-first), `VP8X` (extended:
    * 24-bit LE canvas dims minus one) — with `payload` riding after the
    * header fields inside the chunk. */
  def webp(width: Int, height: Int, variant: Int,
           payload: Array[Byte]): Array[Byte] = {
    require(width >= 1 && width <= 0x3fff && height >= 1 && height <= 0x3fff,
      "fixture WebP dims are 14-bit (the smallest variant limit)")
    val (tag, head) = variant match {
      case 0 => ("VP8 ", Array[Byte](0, 0, 0) ++ // keyframe tag
        Array(0x9d, 0x01, 0x2a).map(_.toByte) ++ le16(width) ++ le16(height))
      case 1 =>
        val bits = (width - 1).toLong | ((height - 1).toLong << 14)
        ("VP8L", Array(0x2f).map(_.toByte) ++ le32(bits))
      case _ => ("VP8X", Array[Byte](0, 0, 0, 0) ++ // flags + reserved
        le24(width - 1) ++ le24(height - 1))
    }
    val data = head ++ payload
    val padded = if (data.length % 2 == 0) data else data :+ 0.toByte
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    out.write(le32(4L + 8 + padded.length), 0, 4)
    out.write("WEBP".getBytes("US-ASCII"), 0, 4)
    out.write(tag.getBytes("US-ASCII"), 0, 4)
    out.write(le32(data.length.toLong), 0, 4)
    out.write(padded, 0, padded.length)
    out.toByteArray
  }

  /** The deterministic media corpus used by the `multimodal_dims`
    * oracle: format cycles png/jpeg/gif/webp by `id % 4` (the webp
    * sub-variant further cycles VP8/VP8L/VP8X by `id % 3`), dims are
    * planted as `(id % 640 + 1, id % 480 + 1)` — the DuckDB oracle
    * recomputes these arithmetically, so the compare proves
    * construct→parse roundtrips the planted values through real
    * container bytes on every row. */
  def syntheticImageBlob(id: Long, payload: Array[Byte]): Array[Byte] = {
    val w = (id % 640).toInt + 1
    val h = (id % 480).toInt + 1
    (id % 4) match {
      case 0 => png(w, h, payload)
      case 1 => jpeg(w, h, payload)
      case 2 => gif(w, h, payload)
      case _ => webp(w, h, (id % 3).toInt, payload)
    }
  }
}

package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic REAL-container video fixtures: spec-conformant
  * ISO-BMFF (MP4) box streams with planted presentation parameters.
  * The video companion of [[ImageFixtures]]/[[AudioFixtures]] — real
  * `ftyp`/`moov`/`mvhd`/`tkhd`/`mdat` box framing with big-endian
  * sizes and 16.16 fixed-point track dimensions, so [[VideoHeaders]]
  * parses genuine container structure, not its own inverse.
  * Construction is a SEPARATE code path from the parser (stream writes
  * here, offset reads there), and VideoHeadersSpec additionally pins
  * the parser against canonical hand-hexed bytes.
  */
object VideoFixtures {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** Identity transformation matrix (9 x 32-bit, 2.30/16.16 fixed). */
  private val identityMatrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
    be32(0) ++ be32(0x00010000L) ++ be32(0) ++
    be32(0) ++ be32(0) ++ be32(0x40000000L)

  private def mvhd(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd",
      Array[Byte](0, 0, 0, 0)           // version 0, flags
        ++ be32(0) ++ be32(0)           // creation, modification
        ++ be32(timescale) ++ be32(duration)
        ++ be32(0x00010000L)            // rate 1.0
        ++ be16(0x0100) ++ be16(0)      // volume 1.0, reserved
        ++ be32(0) ++ be32(0)           // reserved
        ++ identityMatrix
        ++ Array.fill(24)(0.toByte)     // pre_defined
        ++ be32(3))                     // next_track_ID

  private def tkhd(trackId: Long, duration: Long,
                   width: Int, height: Int): Array[Byte] =
    box("tkhd",
      Array[Byte](0, 0, 0, 7)           // version 0, flags: enabled+in-movie
        ++ be32(0) ++ be32(0)           // creation, modification
        ++ be32(trackId) ++ be32(0)     // track_ID, reserved
        ++ be32(duration)
        ++ be32(0) ++ be32(0)           // reserved
        ++ be16(0) ++ be16(0)           // layer, alternate_group
        ++ be16(if (width == 0) 0x0100 else 0) ++ be16(0) // volume, reserved
        ++ identityMatrix
        ++ be32(width.toLong << 16)     // 16.16 fixed
        ++ be32(height.toLong << 16))

  /** A conformant minimal MP4: `ftyp`, then `moov` (mvhd + a video trak
    * + optionally an audio trak with 0x0 dims) and an `mdat` carrying
    * `payload`. When `trailingMoov`, the mdat comes FIRST — the
    * non-faststart layout real muxers emit — so the parser must prove
    * it hops payload boxes rather than assuming a header prefix. */
  def mp4(timescale: Long, duration: Long, width: Int, height: Int,
          audioTrack: Boolean, trailingMoov: Boolean,
          payload: Array[Byte]): Array[Byte] = {
    require(timescale >= 1 && duration >= 0 && width >= 1 && height >= 1)
    val out = new ByteArrayOutputStream()
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0x200) ++
        "mp42".getBytes("US-ASCII"))
    val traks = box("trak", tkhd(1, duration, width, height)) ++
      (if (audioTrack) box("trak", tkhd(2, duration, 0, 0))
       else Array.emptyByteArray)
    val moov = box("moov", mvhd(timescale, duration) ++ traks)
    val mdat = box("mdat", payload)
    out.write(ftyp, 0, ftyp.length)
    if (trailingMoov) { out.write(mdat, 0, mdat.length); out.write(moov, 0, moov.length) }
    else { out.write(moov, 0, moov.length); out.write(mdat, 0, mdat.length) }
    out.toByteArray
  }

  /** The deterministic video corpus used by the `multimodal_video_meta`
    * oracle: planted parameters are `timescale` cycling a real ladder
    * by `id % 5`, `duration = (id % 1000 + 1) * 100`,
    * `width = id % 1920 + 16`, `height = id % 1080 + 16`, an audio
    * track (and hence `n_tracks = 2`) on even ids, and the
    * trailing-moov layout on ids `% 3 == 0`. The DuckDB oracle
    * recomputes these arithmetically, so the compare proves
    * construct→parse roundtrips real box structure on every row. */
  def syntheticVideoBlob(id: Long, payload: Array[Byte]): Array[Byte] =
    mp4(
      timescale = Array(600L, 1000L, 90000L, 24000L, 30000L)((id % 5).toInt),
      duration = (id % 1000 + 1) * 100,
      width = (id % 1920).toInt + 16,
      height = (id % 1080).toInt + 16,
      audioTrack = id % 2 == 0,
      trailingMoov = id % 3 == 0,
      payload = payload)
}

package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM AVI (RIFF) container codec for MJPEG video — the video leg's
  * pixel path made real by composing the container walk with
  * [[JpegCodec]]: an MJPEG AVI is a RIFF file whose `00dc` chunks each
  * hold one complete baseline/progressive JPEG, so every frame decodes
  * through the already-oracle-checked JPEG chain.
  *
  * Implemented from the public Microsoft AVI RIFF File Reference
  * (`RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  * 00dc…) idx1)`), all fields little-endian, chunks padded to even
  * length, idx1 offsets relative to the `movi` list data start.
  *
  * Subset discipline (the PngCodec/FlacCodec rule — everything outside
  * refuses loudly BY NAME, never decodes silently wrong):
  *  - video stream 0 with handler `MJPG` only; other codecs
  *    (`DIB `/`XVID`/…), audio streams (`auds`) and `rec ` interleave
  *    lists are out of subset;
  *  - `00dc` frame chunks only (no `00db` uncompressed frames);
  *  - OpenDML (`AVIX` extension RIFF lists, `indx` super-indexes) is out
  *    of subset — files beyond 1 GiB ship as OpenDML in the wild, while
  *    corpus clips are single-RIFF.
  *
  * Reference behavior: nexus-processor has no video path at all; this
  * is builder-brief multimodal surface (frame-sample / feature-extract
  * over opaque binary columns, the decode step real for MJPEG).
  */
object AviCodec {

  /** A decoded MJPEG AVI: container facts + the per-frame JPEG payloads
    * (undecoded — callers hand them to [[JpegCodec.decode]] so frame
    * decode cost is paid only for frames actually sampled). */
  final case class Avi(width: Int, height: Int, usPerFrame: Long,
                       frames: Vector[Array[Byte]])

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      fourCc(bytes, 0) == "RIFF" && fourCc(bytes, 8) == "AVI "

  // ---- little-endian wire helpers ----------------------------------------

  private def fourCc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def putLe32(out: ArrayBuffer[Byte], v: Long): Unit = {
    out += (v & 0xff).toByte
    out += ((v >> 8) & 0xff).toByte
    out += ((v >> 16) & 0xff).toByte
    out += ((v >> 24) & 0xff).toByte
  }

  private def putLe16(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += (v & 0xff).toByte
    out += ((v >> 8) & 0xff).toByte
  }

  private def putFourCc(out: ArrayBuffer[Byte], s: String): Unit = {
    require(s.length == 4, s"avi: fourcc '$s'")
    s.foreach(c => out += c.toByte)
  }

  // ---- encoder ------------------------------------------------------------

  /** Wrap already-encoded JPEG frames as a spec-conformant MJPEG AVI
    * (one `vids`/`MJPG` stream, `00dc` frame chunks, `idx1` keyframe
    * index — every MJPEG frame is a keyframe by construction). The
    * frames are NOT re-encoded; callers produce them with
    * [[JpegCodec.encode]]/[[JpegCodec.encodePlanes]]. */
  def encodeMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
                  usPerFrame: Long = 33333L): Array[Byte] = {
    require(frames.nonEmpty, "avi: no frames")
    require(width > 0 && height > 0, "avi: bad dims")
    require(usPerFrame > 0, "avi: bad frame duration")
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f != null && JpegCodec.isJpeg(f), s"avi: frame $i is not JPEG")
    }
    val maxFrame = frames.map(_.length).max

    // LIST/chunk builders (size backpatched by construction).
    def chunk(id: String, payload: ArrayBuffer[Byte]): ArrayBuffer[Byte] = {
      val out = new ArrayBuffer[Byte](payload.length + 8)
      putFourCc(out, id); putLe32(out, payload.length.toLong)
      out ++= payload
      if ((payload.length & 1) == 1) out += 0 // even padding per RIFF
      out
    }
    def list(typ: String, body: ArrayBuffer[Byte]): ArrayBuffer[Byte] = {
      val out = new ArrayBuffer[Byte](body.length + 12)
      putFourCc(out, "LIST"); putLe32(out, (body.length + 4).toLong)
      putFourCc(out, typ); out ++= body
      out
    }

    val avih = new ArrayBuffer[Byte](56)
    putLe32(avih, usPerFrame)                       // dwMicroSecPerFrame
    putLe32(avih, 0L)                               // dwMaxBytesPerSec
    putLe32(avih, 0L)                               // dwPaddingGranularity
    putLe32(avih, 0x10L)                            // dwFlags: AVIF_HASINDEX
    putLe32(avih, frames.length.toLong)             // dwTotalFrames
    putLe32(avih, 0L)                               // dwInitialFrames
    putLe32(avih, 1L)                               // dwStreams
    putLe32(avih, maxFrame.toLong)                  // dwSuggestedBufferSize
    putLe32(avih, width.toLong)                     // dwWidth
    putLe32(avih, height.toLong)                    // dwHeight
    (0 until 4).foreach(_ => putLe32(avih, 0L))     // dwReserved[4]

    val strh = new ArrayBuffer[Byte](56)
    putFourCc(strh, "vids")                         // fccType
    putFourCc(strh, "MJPG")                         // fccHandler
    putLe32(strh, 0L)                               // dwFlags
    putLe16(strh, 0); putLe16(strh, 0)              // wPriority, wLanguage
    putLe32(strh, 0L)                               // dwInitialFrames
    putLe32(strh, usPerFrame)                       // dwScale
    putLe32(strh, 1000000L)                         // dwRate (rate/scale = fps)
    putLe32(strh, 0L)                               // dwStart
    putLe32(strh, frames.length.toLong)             // dwLength
    putLe32(strh, maxFrame.toLong)                  // dwSuggestedBufferSize
    putLe32(strh, 0xffffffffL)                      // dwQuality (-1 default)
    putLe32(strh, 0L)                               // dwSampleSize
    putLe16(strh, 0); putLe16(strh, 0)              // rcFrame left, top
    putLe16(strh, width); putLe16(strh, height)     // rcFrame right, bottom

    val strf = new ArrayBuffer[Byte](40)            // BITMAPINFOHEADER
    putLe32(strf, 40L)                              // biSize
    putLe32(strf, width.toLong)                     // biWidth
    putLe32(strf, height.toLong)                    // biHeight
    putLe16(strf, 1); putLe16(strf, 24)             // biPlanes, biBitCount
    putFourCc(strf, "MJPG")                         // biCompression
    putLe32(strf, (width.toLong * height * 3))      // biSizeImage
    putLe32(strf, 0L); putLe32(strf, 0L)            // XPels, YPels
    putLe32(strf, 0L); putLe32(strf, 0L)            // ClrUsed, ClrImportant

    val strl = list("strl",
      chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)

    // movi body + idx1 entries (offsets relative to the movi list data
    // start, i.e. the position of the 'movi' fourcc per convention).
    val movi = new ArrayBuffer[Byte]()
    val idx = new ArrayBuffer[Byte](frames.length * 16)
    frames.foreach { f =>
      val off = movi.length + 4 // +4: relative to the 'movi' fourcc
      val p = new ArrayBuffer[Byte](f.length); p ++= f
      movi ++= chunk("00dc", p)
      putFourCc(idx, "00dc")
      putLe32(idx, 0x10L)                           // AVIIF_KEYFRAME
      putLe32(idx, off.toLong)
      putLe32(idx, f.length.toLong)
    }

    val body = hdrl ++ list("movi", movi) ++ chunk("idx1", idx)
    val out = new ArrayBuffer[Byte](body.length + 12)
    putFourCc(out, "RIFF"); putLe32(out, (body.length + 4).toLong)
    putFourCc(out, "AVI "); out ++= body
    out.toArray
  }

  // ---- decoder ------------------------------------------------------------

  /** Parse an MJPEG AVI: header facts + per-frame JPEG payloads. Every
    * structural surprise refuses by name; the frame count is checked
    * against the declared `dwTotalFrames` so truncated movi lists are
    * loud, not short. */
  def decode(bytes: Array[Byte]): Avi = {
    require(isAvi(bytes), "avi: bad RIFF/AVI signature")
    val riffEnd = {
      val sz = le32(bytes, 4)
      require(8 + sz <= bytes.length, "avi: RIFF size beyond buffer")
      (8 + sz).toInt
    }

    var width = -1; var height = -1
    var usPerFrame = -1L; var totalFrames = -1L
    var sawVids = false
    val frames = Vector.newBuilder[Array[Byte]]

    def walkList(from: Int, to: Int, inMovi: Boolean): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = fourCc(bytes, p)
        val szL = le32(bytes, p + 4)
        // guard BEFORE toInt: a crafted 0xFFFFFFF8 size would go
        // negative and stall or reverse the walk instead of refusing
        require(szL <= (to - p - 8).toLong,
          s"avi: chunk '$id' overruns its list")
        val sz = szL.toInt
        id match {
          case "LIST" =>
            val typ = fourCc(bytes, p + 8)
            typ match {
              case "hdrl" | "strl" => walkList(p + 12, p + 8 + sz, inMovi = false)
              case "movi" => walkList(p + 12, p + 8 + sz, inMovi = true)
              case "rec " =>
                throw new IllegalArgumentException(
                  "avi: 'rec ' interleave lists are out of subset")
              case "odml" | "INFO" => () // optional metadata lists hopped
              case other =>
                throw new IllegalArgumentException(
                  s"avi: LIST '$other' is out of subset")
            }
          case "avih" =>
            require(sz >= 56, "avi: avih too short")
            usPerFrame = le32(bytes, p + 8)
            totalFrames = le32(bytes, p + 8 + 16)
            width = le32(bytes, p + 8 + 32).toInt
            height = le32(bytes, p + 8 + 36).toInt
          case "strh" =>
            require(sz >= 48, "avi: strh too short")
            val fccType = fourCc(bytes, p + 8)
            val handler = fourCc(bytes, p + 12)
            if (fccType != "vids")
              throw new IllegalArgumentException(
                s"avi: stream type '$fccType' is out of subset (vids only)")
            if (handler != "MJPG")
              throw new IllegalArgumentException(
                s"avi: codec '$handler' is out of subset (MJPG only)")
            require(!sawVids, "avi: multiple video streams are out of subset")
            sawVids = true
          case "00dc" if inMovi =>
            val f = java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + sz)
            require(JpegCodec.isJpeg(f), "avi: 00dc payload is not JPEG")
            frames += f
          case "00db" if inMovi =>
            throw new IllegalArgumentException(
              "avi: uncompressed 00db frames are out of subset")
          case _ => () // strf/idx1/JUNK/vprp and unknown chunks hopped by size
        }
        p += 8 + sz + (sz & 1) // chunks pad to even length
      }
    }

    walkList(12, riffEnd, inMovi = false)
    require(sawVids, "avi: no MJPG video stream header")
    require(width > 0 && height > 0, "avi: missing avih dimensions")
    val fs = frames.result()
    require(totalFrames == fs.length,
      s"avi: avih declares $totalFrames frames, movi has ${fs.length}")
    Avi(width, height, usPerFrame, fs)
  }
}

package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM YUV4MPEG2 (.y4m) codec — the UNCOMPRESSED video interchange
  * container ML pipelines and codec toolchains pass raw frames around
  * in (mjpegtools' public format: one ASCII parameter line, then
  * `FRAME\n`-delimited raw planar YUV). Subset: `C420`/`C420jpeg`/
  * `C420mpeg2`/`C420paldv` (quarter-size chroma; the siting tags differ
  * only in sample POSITION, not layout) and `C444` (full-size chroma);
  * interlacing other than `Ip`, `Cmono`, and per-frame parameter
  * overrides refuse by name. Frame payloads are exact-size planar
  * Y then Cb then Cr.
  *
  * Reference behavior: nexus-processor has no video path; this is
  * builder-brief multimodal surface (the AviCodec pattern — wire
  * format from the public spec, decode onto the shared frame/
  * fingerprint substrate).
  */
object Y4mCodec {

  final case class Y4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                       c420: Boolean,
                       /** per frame: Y, Cb, Cr planes concatenated */
                       frames: Seq[Array[Byte]]) {
    def ySize: Int = width * height
    def cSize: Int = if (c420) (width / 2) * (height / 2) else width * height
    def frameSize: Int = ySize + 2 * cSize
  }

  private val Magic = "YUV4MPEG2 ".getBytes("US-ASCII")

  def isY4m(b: Array[Byte]): Boolean =
    b != null && b.length >= Magic.length &&
      Magic.indices.forall(i => b(i) == Magic(i))

  /** Encode planar frames as a spec-conformant .y4m stream. */
  def encode(v: Y4m): Array[Byte] = {
    require(v.width > 0 && v.height > 0, "y4m: empty geometry")
    require(!v.c420 || (v.width % 2 == 0 && v.height % 2 == 0),
      "y4m: C420 needs even dimensions")
    val out = new ArrayBuffer[Byte]()
    val cs = if (v.c420) "420jpeg" else "444"
    val header =
      s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} " +
        s"Ip A1:1 C$cs\n"
    out ++= header.getBytes("US-ASCII")
    v.frames.foreach { f =>
      require(f.length == v.frameSize,
        s"y4m: frame has ${f.length} bytes, geometry needs ${v.frameSize}")
      out ++= "FRAME\n".getBytes("US-ASCII")
      out ++= f
    }
    out.toArray
  }

  /** Parse a .y4m stream. Everything outside the subset refuses by
    * name; truncated frames are loud, never silently short. */
  def decode(bytes: Array[Byte]): Y4m = {
    require(isY4m(bytes), "y4m: bad YUV4MPEG2 signature")
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "y4m: unterminated stream header")
    val header = new String(bytes, 0, nl, "US-ASCII")
    var w = -1; var h = -1; var fn = 25; var fd = 1
    var c420 = true; var cSeen = false
    header.split(" ").drop(1).filter(_.nonEmpty).foreach { tag =>
      (tag.head, tag.tail) match {
        case ('W', v) => w = v.toInt
        case ('H', v) => h = v.toInt
        case ('F', v) =>
          val Array(a, b) = v.split(":", 2)
          fn = a.toInt; fd = b.toInt
          require(fn > 0 && fd > 0, "y4m: non-positive frame rate")
        case ('I', v) =>
          require(v == "p", s"y4m: interlacing 'I$v' is out of subset")
        case ('A', _) => () // pixel aspect: layout-irrelevant
        case ('C', v) =>
          cSeen = true
          v match {
            case "420" | "420jpeg" | "420mpeg2" | "420paldv" => c420 = true
            case "444" => c420 = false
            case other =>
              sys.error(s"y4m: colourspace 'C$other' is out of subset")
          }
        case ('X', _) => () // comment/extension tags pass
        case _ => sys.error(s"y4m: unknown stream tag '$tag'")
      }
    }
    require(w > 0 && h > 0, "y4m: missing W/H geometry")
    require(!c420 || (w % 2 == 0 && h % 2 == 0),
      "y4m: C420 needs even dimensions")
    if (!cSeen) c420 = true // the spec default is 4:2:0
    val ySize = w * h
    val cSize = if (c420) (w / 2) * (h / 2) else w * h
    val frameSize = ySize + 2 * cSize
    val frames = ArrayBuffer.empty[Array[Byte]]
    var p = nl + 1
    val frameMagic = "FRAME".getBytes("US-ASCII")
    while (p < bytes.length) {
      require(p + frameMagic.length <= bytes.length &&
        frameMagic.indices.forall(i => bytes(p + i) == frameMagic(i)),
        s"y4m: bad FRAME marker at $p")
      val fnl = bytes.indexOf('\n'.toByte, p)
      require(fnl > 0, "y4m: unterminated frame header")
      val fHeader = new String(bytes, p, fnl - p, "US-ASCII")
      require(fHeader == "FRAME" || fHeader.startsWith("FRAME X"),
        s"y4m: per-frame parameter overrides are out of subset " +
          s"('$fHeader')")
      require(fnl + 1 + frameSize <= bytes.length,
        s"y4m: truncated frame at $p (need $frameSize bytes)")
      frames += java.util.Arrays.copyOfRange(bytes, fnl + 1,
        fnl + 1 + frameSize)
      p = fnl + 1 + frameSize
    }
    Y4m(w, h, fn, fd, c420, frames.toSeq)
  }
}

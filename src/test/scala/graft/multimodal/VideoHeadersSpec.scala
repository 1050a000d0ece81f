package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite

class VideoHeadersSpec extends SparkSuite {
  import spark.implicits._

  /** Canonical minimal ISO-BMFF bytes transcribed field-by-field from
    * ISO/IEC 14496-12 (independent of VideoFixtures): `ftyp` then a
    * `moov` holding only a v0 `mvhd` with timescale 600 and duration
    * 1200 — no tracks, so dims and n_tracks are 0. */
  private val canonicalMp4: Array[Byte] = (
    Array(0x00, 0x00, 0x00, 0x14) ++ "ftypisom".getBytes("US-ASCII").map(_.toInt)
      ++ Array(0x00, 0x00, 0x02, 0x00) ++ "mp42".getBytes("US-ASCII").map(_.toInt)
      ++ Array(0x00, 0x00, 0x00, 0x74) ++ "moov".getBytes("US-ASCII").map(_.toInt)
      ++ Array(0x00, 0x00, 0x00, 0x6c) ++ "mvhd".getBytes("US-ASCII").map(_.toInt)
      ++ Array(0x00, 0x00, 0x00, 0x00)             // version 0, flags
      ++ Array.fill(8)(0x00)                       // creation, modification
      ++ Array(0x00, 0x00, 0x02, 0x58)             // timescale 600
      ++ Array(0x00, 0x00, 0x04, 0xb0)             // duration 1200
      ++ Array(0x00, 0x01, 0x00, 0x00)             // rate 1.0
      ++ Array(0x01, 0x00, 0x00, 0x00)             // volume 1.0, reserved
      ++ Array.fill(8)(0x00)                       // reserved
      ++ Array(0x00, 0x01, 0x00, 0x00) ++ Array.fill(4)(0x00) ++ Array.fill(4)(0x00)
      ++ Array.fill(4)(0x00) ++ Array(0x00, 0x01, 0x00, 0x00) ++ Array.fill(4)(0x00)
      ++ Array.fill(4)(0x00) ++ Array.fill(4)(0x00) ++ Array(0x40, 0x00, 0x00, 0x00)
      ++ Array.fill(24)(0x00)                      // pre_defined
      ++ Array(0x00, 0x00, 0x00, 0x02)             // next_track_ID
    ).map(_.toByte)

  test("decode parses canonical hand-transcribed mvhd bytes") {
    assert(VideoHeaders.decode(canonicalMp4) ===
      Some(("mp4", 600L, 1200L, 0, 0, 0)))
  }

  test("fixture roundtrip plants and recovers every parameter") {
    for (id <- 0L until 60L) {
      val blob = VideoFixtures.syntheticVideoBlob(id, s"frames$id".getBytes)
      val want = ("mp4",
        Array(600L, 1000L, 90000L, 24000L, 30000L)((id % 5).toInt),
        (id % 1000 + 1) * 100,
        (id % 1920).toInt + 16,
        (id % 1080).toInt + 16,
        if (id % 2 == 0) 2 else 1)
      assert(VideoHeaders.decode(blob) === Some(want), s"id=$id")
    }
  }

  test("trailing moov: the walk hops the mdat payload by declared size") {
    val blob = VideoFixtures.mp4(1000, 5000, 640, 480,
      audioTrack = true, trailingMoov = true,
      payload = Array.fill(4096)(0x55.toByte))
    assert(VideoHeaders.decode(blob) === Some(("mp4", 1000L, 5000L, 640, 480, 2)))
  }

  test("64-bit largesize boxes hop correctly") {
    // splice an mdat with size==1 + 64-bit largesize between ftyp and moov
    val base = VideoFixtures.mp4(600, 100, 32, 32,
      audioTrack = false, trailingMoov = false, payload = Array.emptyByteArray)
    val ftypLen = 20
    val payload = Array.fill(64)(0x77.toByte)
    val large = Array(0, 0, 0, 1).map(_.toByte) ++
      "mdat".getBytes("US-ASCII") ++
      Array(0, 0, 0, 0, 0, 0, 0, 80).map(_.toByte) ++ payload // 16 + 64
    val spliced = base.take(ftypLen) ++ large ++ base.drop(ftypLen)
    assert(VideoHeaders.decode(spliced) === Some(("mp4", 600L, 100L, 32, 32, 1)))
  }

  test("garbage, truncation, size lies, and nulls decode to null") {
    assert(VideoHeaders.decode(null) === None)
    assert(VideoHeaders.decode(Array.emptyByteArray) === None)
    assert(VideoHeaders.decode("definitely not a video file".getBytes) === None)
    assert(VideoHeaders.decode(canonicalMp4.take(30)) === None)
    // a moov whose declared size overruns the buffer must fail cleanly
    val lying = canonicalMp4.clone()
    lying(23) = 0x7f // moov size low byte -> overruns
    assert(VideoHeaders.decode(lying) === None)
    // other multimodal families don't cross-parse
    assert(VideoHeaders.decode(ImageFixtures.png(2, 2, Array.emptyByteArray)) === None)
    assert(VideoHeaders.decode(AudioFixtures.wav(1, 8000, 8, 1, Array.emptyByteArray)) === None)
    assert(AudioHeaders.decode(canonicalMp4) === None)
    assert(ImageHeaders.decode(canonicalMp4) === None)
  }

  test("graft_video_meta runs in codegen over a DataFrame") {
    val df = Seq(
      (1L, VideoFixtures.syntheticVideoBlob(7L, "x".getBytes)),
      (2L, "junk".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val out = df.select(col("id"), VideoMeta.col(col("content")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.n_tracks"))
      .orderBy("id").collect()
    assert(out(0).getString(1) === "mp4" &&
      out(0).getInt(2) === (7 % 1920) + 16 && out(0).getInt(3) === 1)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }
}

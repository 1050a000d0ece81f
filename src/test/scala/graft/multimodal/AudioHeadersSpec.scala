package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite

class AudioHeadersSpec extends SparkSuite {
  import spark.implicits._

  // ---- canonical hand-hexed bytes (independent of AudioFixtures, so a
  // mirrored construction/parsing bug cannot hide in the roundtrip) ----

  /** The classic 44-byte canonical WAV header + 4 data bytes: PCM,
    * 2 channels, 44100 Hz, 16-bit, one frame. Field bytes transcribed
    * from the RIFF/WAVE spec by hand. */
  private val canonicalWav: Array[Byte] = Array(
    'R', 'I', 'F', 'F', 0x28, 0x00, 0x00, 0x00, 'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ', 0x10, 0x00, 0x00, 0x00, // fmt, size 16
    0x01, 0x00,             // PCM
    0x02, 0x00,             // 2 channels
    0x44, 0xac, 0x00, 0x00, // 44100
    0x10, 0xb1, 0x02, 0x00, // byte rate 176400
    0x04, 0x00,             // block align 4
    0x10, 0x00,             // 16 bits
    'd', 'a', 't', 'a', 0x04, 0x00, 0x00, 0x00, // data, size 4 = 1 frame
    0x00, 0x00, 0x00, 0x00).map(_.toByte)

  /** fLaC + STREAMINFO bit-pack for 44100 Hz / 2ch / 16-bit /
    * 1234 samples, hand-packed: sr 20 bits = 0x0A 0xC4 0x4-, then
    * (channels-1)=1 in 3 bits, (bits-1)=15 split 1+4, total 36 bits. */
  private val canonicalFlac: Array[Byte] = (Array(
    'f', 'L', 'a', 'C',
    0x80, 0x00, 0x00, 0x22) // last block, STREAMINFO, length 34
    ++ Array(
      0x10, 0x00, 0x10, 0x00, // block sizes 4096
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00, // frame sizes unknown
      0x0a, 0xc4, 0x42,       // 44100<<... | (2-1)<<1 | (16-1)>>4
      0xf0,                   // ((16-1)&0xf)<<4 | total>>32
      0x00, 0x00, 0x04, 0xd2) // total 1234
    ++ Array.fill(16)(0x00)   // md5 unknown
    ).map(_.toByte)

  test("decode parses canonical hand-hexed WAV bytes") {
    assert(AudioHeaders.decode(canonicalWav) ===
      Some(("wav", 2, 44100, 16, 1L)))
  }

  test("decode parses canonical hand-hexed FLAC STREAMINFO bytes") {
    assert(AudioHeaders.decode(canonicalFlac) ===
      Some(("flac", 2, 44100, 16, 1234L)))
  }

  test("fixture roundtrip plants and recovers every parameter") {
    for (id <- 0L until 64L) {
      val blob = AudioFixtures.syntheticAudioBlob(id, s"payload$id".getBytes)
      val want = (
        if (id % 2 == 0) "wav" else "flac",
        (id % 3).toInt + 1,
        Array(8000, 16000, 22050, 44100, 48000)((id % 5).toInt),
        ((id % 4).toInt + 1) * 8,
        id % 50 + 1)
      assert(AudioHeaders.decode(blob) === Some(want), s"id=$id")
    }
  }

  test("WAV parse walks chunks (LIST before data) and honors padding") {
    // odd-length payload forces the even-padding hop between chunks
    val blob = AudioFixtures.wav(1, 8000, 8, 3, Array[Byte](1, 2, 3))
    assert(AudioHeaders.decode(blob) === Some(("wav", 1, 8000, 8, 3L)))
  }

  test("garbage, truncation, and nulls decode to null, never throw") {
    assert(AudioHeaders.decode(null) === None)
    assert(AudioHeaders.decode(Array.emptyByteArray) === None)
    assert(AudioHeaders.decode("not audio at all".getBytes) === None)
    // right magic, truncated before fmt completes
    assert(AudioHeaders.decode(canonicalWav.take(20)) === None)
    assert(AudioHeaders.decode(canonicalFlac.take(10)) === None)
    // a WAV whose declared chunk size lies beyond the buffer: the walk
    // must stop (no data chunk found), not read out of bounds
    val lying = canonicalWav.clone()
    lying(40) = 0x7f // data size (LE low byte) -> 127: past the buffer
    assert(AudioHeaders.decode(lying) === Some(("wav", 2, 44100, 16, 31L)),
      "declared size is the metadata of record")
    // a multi-GiB declared data chunk (full 32-bit size field) must not
    // abort the parse — the walk index is Long and fmt+data are in hand
    val huge = canonicalWav.clone()
    huge(40) = 0x00; huge(41) = 0x00; huge(42) = 0x00
    huge(43) = 0x80.toByte // data size 0x80000000 = 2 GiB
    assert(AudioHeaders.decode(huge) ===
      Some(("wav", 2, 44100, 16, 0x80000000L / 4)))
    // image bytes are not audio
    assert(AudioHeaders.decode(
      ImageFixtures.png(2, 2, Array.emptyByteArray)) === None)
    // and audio bytes are not an image (the two families don't cross)
    assert(ImageHeaders.decode(canonicalWav) === None)
  }

  test("graft_audio_meta runs in codegen over a DataFrame and prunes nulls") {
    val df = Seq(
      (1L, canonicalWav),
      (2L, canonicalFlac),
      (3L, "junk".getBytes),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val out = df.select(col("id"),
        AudioMeta.col(col("content")).as("m"))
      .select(col("id"), col("m.format"), col("m.sample_rate"),
        col("m.n_frames"))
      .orderBy("id")
      .collect()
    assert(out(0).getString(1) === "wav" && out(0).getInt(2) === 44100)
    assert(out(1).getString(1) === "flac" && out(1).getLong(3) === 1234L)
    assert(out(2).isNullAt(1) && out(3).isNullAt(1))
  }
}

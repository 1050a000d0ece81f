package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic REAL-container audio fixtures: spec-conformant WAV and
  * FLAC byte streams with planted stream parameters. The audio companion
  * of [[ImageFixtures]] — the bytes exercise the exact header layout a
  * crawl's audio column would (RIFF chunk framing + LE fields; FLAC
  * metadata-block framing + the STREAMINFO bit-pack), so
  * [[AudioHeaders]] parses genuine container structure, not its own
  * inverse. Construction is a SEPARATE code path from the parser
  * (stream writes here, offset reads there), and AudioHeadersSpec
  * additionally pins the parser against canonical hand-hexed file bytes.
  */
object AudioFixtures {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
    ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  private def be24(v: Int): Array[Byte] = Array(
    ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Canonical PCM WAV: RIFF/WAVE, a 16-byte `fmt ` chunk, a LIST chunk
    * carrying `payload` (a legal metadata slot — also makes the parser
    * prove it WALKS chunks rather than assuming the 44-byte layout),
    * then a `data` chunk of `nFrames` zero frames. */
  def wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
          nFrames: Long, payload: Array[Byte]): Array[Byte] = {
    require(channels >= 1 && sampleRate >= 1 && nFrames >= 0)
    require(bitsPerSample % 8 == 0 && bitsPerSample >= 8,
      "fixture writes whole-byte PCM")
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nFrames * blockAlign
    require(dataSize <= Int.MaxValue / 2, "fixture data chunk too large")
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit =
      out.write(s.getBytes("US-ASCII"), 0, s.length)
    val payloadPadded = if (payload.length % 2 == 0) payload
      else payload :+ 0.toByte
    val riffSize = 4 + (8 + 16) + (8 + 4 + payloadPadded.length) +
      (8 + dataSize)
    ascii("RIFF"); out.write(le32(riffSize), 0, 4); ascii("WAVE")
    ascii("fmt "); out.write(le32(16), 0, 4)
    out.write(le16(1), 0, 2) // PCM
    out.write(le16(channels), 0, 2)
    out.write(le32(sampleRate.toLong), 0, 4)
    out.write(le32(sampleRate.toLong * blockAlign), 0, 4) // byte rate
    out.write(le16(blockAlign), 0, 2)
    out.write(le16(bitsPerSample), 0, 2)
    ascii("LIST"); out.write(le32(4L + payloadPadded.length), 0, 4)
    ascii("INFO"); out.write(payloadPadded, 0, payloadPadded.length)
    ascii("data"); out.write(le32(dataSize), 0, 4)
    out.write(new Array[Byte](dataSize.toInt), 0, dataSize.toInt)
    out.toByteArray
  }

  /** FLAC metadata stream: `fLaC`, STREAMINFO (34 bytes with the
    * sample_rate/channels/bits/total_samples bit-pack), and `payload`
    * in an APPLICATION block (type 2) marked last. Audio frames are
    * omitted — STREAMINFO is the metadata of record this fixture
    * exercises, and encoding valid FLAC frames needs the env-blocked
    * codec. */
  def flac(channels: Int, sampleRate: Int, bitsPerSample: Int,
           totalSamples: Long, payload: Array[Byte]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, "FLAC channels are 3 bits + 1")
    require(sampleRate >= 1 && sampleRate < (1 << 20))
    require(bitsPerSample >= 4 && bitsPerSample <= 32)
    require(totalSamples >= 0 && totalSamples < (1L << 36))
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"), 0, 4)
    out.write(0x00) // block: not-last, type 0 = STREAMINFO
    out.write(be24(34), 0, 3)
    val si = new Array[Byte](34)
    // min/max block size (frames-per-block bounds; any legal constant)
    si(0) = 0x10; si(1) = 0x00; si(2) = 0x10; si(3) = 0x00
    // min/max frame size: 0 = unknown (bytes 4..9 stay zero)
    si(10) = ((sampleRate >> 12) & 0xff).toByte
    si(11) = ((sampleRate >> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    si(13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf).toInt).toByte
    si(14) = ((totalSamples >> 24) & 0xff).toByte
    si(15) = ((totalSamples >> 16) & 0xff).toByte
    si(16) = ((totalSamples >> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    // bytes 18..33: MD5 of the (absent) audio — zeros = unknown, legal
    out.write(si, 0, 34)
    out.write(0x80 | 0x02) // last block, type 2 = APPLICATION
    out.write(be24(payload.length + 4), 0, 3)
    out.write("grft".getBytes("US-ASCII"), 0, 4) // application id
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** The deterministic audio corpus used by the `multimodal_audio_meta`
    * oracle: format alternates wav/flac by `id % 2`; planted parameters
    * are `channels = id % 3 + 1`, `sample_rate` cycling a real-rate
    * ladder by `id % 5`, `bits_per_sample = 8/16/24/32` by `id % 4`
    * (wav) or `id % 4 * 8 + 8` capped sensibly (flac uses the same
    * ladder), `n_frames = id % 50 + 1`. The DuckDB oracle recomputes
    * these arithmetically, so the compare proves construct→parse
    * roundtrips the planted values through real container bytes. */
  def syntheticAudioBlob(id: Long, payload: Array[Byte]): Array[Byte] = {
    val ch = (id % 3).toInt + 1
    val sr = Array(8000, 16000, 22050, 44100, 48000)((id % 5).toInt)
    val bits = ((id % 4).toInt + 1) * 8
    val frames = id % 50 + 1
    if (id % 2 == 0) wav(ch, sr, bits, frames, payload)
    else flac(ch, sr, bits, frames, payload)
  }
}

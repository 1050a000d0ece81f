package graft.multimodal

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** Wire-format tests for the pure-JVM FLAC codec: encoder→decoder
  * roundtrips across signal shapes / block sizes / stereo modes, the
  * three integrity mechanisms (CRC-8, CRC-16, PCM MD5) tripping on
  * corruption, and HAND-BUILT frames for the decoder paths the
  * fixture encoder never emits (LPC prediction, wasted bits). */
class FlacCodecSpec extends AnyFunSuite {
  import FlacCodec._
  import WavCodec.Pcm

  private def mono(n: Int)(f: Int => Int): Pcm =
    Pcm(1, 8000, 16, Array.tabulate(n)(f))

  private def rt(p: Pcm, blockSize: Int = 4096,
                 stereo: StereoMode = Independent): Unit = {
    val enc = encode(p, blockSize, stereo)
    assert(isFlac(enc))
    val dec = decode(enc)
    assert(dec.channels == p.channels && dec.sampleRate == p.sampleRate &&
      dec.bitsPerSample == p.bitsPerSample)
    assert(dec.samples.toSeq == p.samples.toSeq)
  }

  test("mono roundtrip across signal shapes and block sizes") {
    val shapes = Seq[Int => Int](
      _ => 777, // constant
      i => i * 3 - 500, // linear ramp (fixed order 2 residuals = 0)
      i => (i * i) % 700 - 350, // quadratic-ish
      i => ((i * 2654435761L) % 30000 - 15000).toInt, // wide pseudo-noise
      i => if (i % 2 == 0) 30000 else -30000) // worst case alternation
    for (f <- shapes; bs <- Seq(16, 96, 4096)) rt(mono(500)(f), bs)
  }

  test("partial last block and single-sample tail roundtrip") {
    rt(mono(97)(i => i * 7 - 300), blockSize = 32) // 32+32+32+1
    rt(mono(16)(i => i - 8), blockSize = 16)
  }

  test("stereo roundtrips through all four channel assignments") {
    val st = Pcm(2, 44100, 16, Array.tabulate(600) { k =>
      val i = k / 2
      if (k % 2 == 0) (i * 5 - 700) % 20000
      else (i * 5 - 700) % 20000 + (i % 37) - 18 // near-equal channels
    })
    for (m <- Seq(Independent, LeftSide, RightSide, MidSide))
      rt(st, blockSize = 128, stereo = m)
  }

  test("multi-frame streams carry coded frame numbers past one byte") {
    // >128 frames forces the 2-byte UTF-8-style coded number
    rt(mono(16 * 130)(i => (i * 13) % 4000 - 2000), blockSize = 16)
  }

  test("features computed on FLAC equal features computed on the PCM") {
    val p = mono(1024)(i => ((i * 31 + i * i * 7) % 2000 - 1000))
    val dec = decode(encode(p, 256))
    assert(WavCodec.windowEnergies(dec, 1).head ==
      WavCodec.windowEnergies(p, 1).head)
    assert(WavCodec.zeroCrossings(dec) == WavCodec.zeroCrossings(p))
    assert(WavCodec.peak(dec) == WavCodec.peak(p))
    assert(WavCodec.fingerprint(dec) == WavCodec.fingerprint(p))
  }

  test("corruption anywhere fails loudly: CRC-8, CRC-16, MD5") {
    val p = mono(256)(i => (i * 11) % 3000 - 1500)
    val enc = encode(p, 64)
    // STREAMINFO is 4 + 4 + 34 bytes; frame 0 header starts at 42.
    def flip(at: Int): Array[Byte] = {
      val b = enc.clone(); b(at) = (b(at) ^ 0x10).toByte; b
    }
    val headerErr = intercept[Exception](decode(flip(44)))
    assert(headerErr.getMessage.toLowerCase.contains("crc")
      || headerErr.getMessage.toLowerCase.contains("flac"))
    // a residual byte mid-frame: CRC-16 must trip
    val bodyErr = intercept[Exception](decode(flip(60)))
    assert(bodyErr.getMessage.toLowerCase.contains("crc")
      || bodyErr.getMessage.toLowerCase.contains("flac"))
    assert(intercept[Exception](decode(enc.take(50))).getMessage
      .toLowerCase.contains("flac"))
    assert(!isFlac("not flac at all".getBytes("US-ASCII")))
  }

  // ---- hand-built frames for decoder-only paths --------------------------

  /** Test-local MSB-first bit writer (the decoder's counterpart). */
  private final class BW {
    private val out = new ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    def bits(v: Long, w: Int): Unit =
      (w - 1 to 0 by -1).foreach(i => bit(((v >>> i) & 1).toInt))
    def pad(): Unit = while (n != 0) bit(0)
    def bytes: Array[Byte] = { require(n == 0); out.toByteArray }
  }

  /** Assemble magic + STREAMINFO (zero MD5 → md5 check skipped) + one
    * frame whose subframe bits are produced by `body`. */
  private def handStream(bs: Int, body: BW => Unit): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BW
    si.bits(1, 1); si.bits(0, 7); si.bits(34, 24)
    si.bits(bs, 16); si.bits(bs, 16); si.bits(0, 24); si.bits(0, 24)
    si.bits(8000, 20); si.bits(0, 3); si.bits(15, 5) // mono, 16-bit
    si.bits(bs, 36)
    (0 until 16).foreach(_ => si.bits(0, 8)) // zero md5: unset
    out.write(si.bytes)
    val f = new BW
    f.bits(0x3ffe, 14); f.bits(0, 2)
    f.bits(0x7, 4); f.bits(0x0, 4) // 16-bit blocksize follows; SI rate
    f.bits(0x0, 4); f.bits(0x4, 3); f.bits(0, 1) // mono, 16-bit
    f.bits(0, 8) // frame number 0
    f.bits(bs - 1, 16)
    val head = f.bytes
    f.bits(FlacCodec.crc8(head, 0, head.length), 8)
    body(f)
    f.pad()
    val frame = f.bytes
    out.write(frame)
    val c16 = FlacCodec.crc16(frame, 0, frame.length)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    out.toByteArray
  }

  test("LPC subframe decodes through the prediction recurrence") {
    val bs = 8
    val warm = Array(100L, 103L)
    val coefs = Array(3L, -1L) // s[i] = r[i] + (3*s[i-1] - s[i-2]) >> 2
    val resid = Array(1L, -2L, 0L, 3L, -1L, 2L)
    val enc = handStream(bs, { f =>
      f.bits(0, 1); f.bits(32 + 2 - 1, 6); f.bits(0, 1) // LPC order 2
      warm.foreach(v => f.bits(v & 0xffff, 16))
      f.bits(3, 4) // precision-1 = 3 → 4-bit coefficients
      f.bits(2, 5) // shift 2
      coefs.foreach(c => f.bits(c & 0xf, 4))
      f.bits(0, 2); f.bits(0, 4) // rice method 0, partition order 0
      f.bits(2, 4) // rice parameter 2
      resid.foreach { r =>
        val u = if (r >= 0) r << 1 else ((-r) << 1) - 1
        (0L until (u >>> 2)).foreach(_ => f.bit(0)); f.bit(1)
        f.bits(u & 3, 2)
      }
    })
    val dec = decode(enc)
    val expect = new Array[Long](bs)
    expect(0) = warm(0); expect(1) = warm(1)
    for (i <- 2 until bs)
      expect(i) = resid(i - 2) +
        ((coefs(0) * expect(i - 1) + coefs(1) * expect(i - 2)) >> 2)
    assert(dec.samples.toSeq == expect.map(_.toInt).toSeq)
  }

  test("wasted-bits subframe shifts decoded samples back up") {
    val bs = 8
    val samples = Array.tabulate(bs)(i => (i * 2 - 8).toLong) // all even
    val enc = handStream(bs, { f =>
      f.bits(0, 1); f.bits(1, 6) // VERBATIM
      f.bit(1); f.bit(1) // wasted-bits flag, unary 0 → 1 wasted bit
      samples.foreach(v => f.bits((v >> 1) & 0x7fff, 15)) // 15-bit payload
    })
    assert(decode(enc).samples.toSeq == samples.map(_.toInt).toSeq)
  }

  test("escaped (raw-binary) residual partitions decode exactly") {
    val bs = 8
    val resid = Array(-4000L, 3999L, -1L, 0L, 123L, -2048L, 2047L, 1L)
    val enc = handStream(bs, { f =>
      f.bits(0, 1); f.bits(8, 6); f.bits(0, 1) // FIXED order 0
      f.bits(0, 2); f.bits(0, 4) // method 0, partition order 0
      f.bits(0xf, 4) // escape
      f.bits(13, 5) // 13-bit signed raw residuals
      resid.foreach(r => f.bits(r & 0x1fff, 13))
    })
    assert(decode(enc).samples.toSeq == resid.map(_.toInt).toSeq)
  }

  test("encoder refuses out-of-subset inputs by name") {
    assert(intercept[IllegalArgumentException](
      encode(Pcm(1, 8000, 24, Array(1, 2, 3)))).getMessage.contains("16-bit"))
    assert(intercept[IllegalArgumentException](
      encode(Pcm(1, 8000, 16, Array(1, 2, 3)), stereo = MidSide))
      .getMessage.contains("2 channels"))
    // variable blocking refusal on the decode side
    val p = mono(64)(i => i)
    val enc = encode(p, 64)
    val b = enc.clone()
    // set the blocking-strategy bit in frame 0's second header byte and
    // fix the CRC-8 so only the strategy refusal can fire
    b(43) = (b(43) | 0x01).toByte
    val headEnd = 42 + 8 // fixed header for this stream: 4+2+1+1+16-bit bs
    b(42 + 7) = FlacCodec.crc8(b, 42, 42 + 7).toByte
    val err = intercept[Exception](decode(b))
    assert(err.getMessage.contains("variable blocking")
      || err.getMessage.toLowerCase.contains("crc"))
  }
}

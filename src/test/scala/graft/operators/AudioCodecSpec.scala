package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import AudioCodec.Clip

/** Pure codec math — no Spark. Fixtures are hand-built byte arrays so
  * the decoder is checked against the RIFF/WAVE spec, not against the
  * sibling encoder alone. */
class AudioCodecSpec extends AnyFunSuite {

  // 4-frame mono ramp on the exact 16-bit grid
  private val ramp = Clip(8000, 1,
    Array(0.0, 0.25, -0.5, 16383.0 / 32768.0))

  test("WAV 16-bit encode/decode round-trips grid samples exactly") {
    val rt = AudioCodec.decodeWav(AudioCodec.encodeWav16(ramp))
    assert(rt.sampleRate == 8000 && rt.channels == 1)
    assert(rt.samples.toSeq == ramp.samples.toSeq)
    assert(AudioCodec.sniff(AudioCodec.encodeWav16(ramp)).contains("wav"))
  }

  test("chunk walk skips unknown chunks (LIST before data) and pads " +
      "odd-sized chunks") {
    val base = AudioCodec.encodeWav16(ramp)
    // splice an odd-sized junk chunk between fmt and data
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 1, 2, 3, 0) // size 3 + 1 pad byte
    val spliced = base.slice(0, 36) ++ junk ++ base.slice(36, base.length)
    // RIFF size field is not re-checked by the decoder; chunk walk must
    // still find fmt (before) and data (after the junk)
    val rt = AudioCodec.decodeWav(spliced)
    assert(rt.samples.toSeq == ramp.samples.toSeq)
  }

  test("8-bit unsigned PCM decodes to the signed [-1,1) grid") {
    // hand-built: fmt bits=8, data = {0, 128, 255}
    val data = Array[Byte](0, 128.toByte, 255.toByte)
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int) = (0 to 3).foreach(i => out.write((v >> (8 * i)) & 0xff))
    def w16(v: Int) = (0 to 1).foreach(i => out.write((v >> (8 * i)) & 0xff))
    out.write("RIFF".getBytes); w32(36 + 4); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(8000)
    w32(8000); w16(1); w16(8)
    out.write("data".getBytes); w32(3); out.write(data); out.write(0)
    val clip = AudioCodec.decodeWav(out.toByteArray)
    assert(clip.samples.toSeq ==
      Seq(-1.0, 0.0, (255 - 128) / 128.0))
  }

  test("corrupt inputs are loud: truncated chunk, float PCM, no data") {
    val good = AudioCodec.encodeWav16(ramp)
    intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(good.take(30))
    }
    val floatFmt = good.clone(); floatFmt(20) = 3 // IEEE float format
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(floatFmt) }
    val noData = good.take(36) // header + fmt only
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(noData) }
    assert(AudioCodec.sniff("not audio".getBytes).isEmpty)
    assert(AudioCodec.decode("RIFFxxxxAVI ".getBytes).isEmpty)
  }

  test("G.711 expansions match the ITU closed forms: zero codes, " +
      "extremes, sign symmetry over all 256 codes") {
    // mu-law: both zero codes expand to exactly 0; extremes ±32124
    assert(AudioCodec.g711ULaw(0xFF.toByte) == 0)
    assert(AudioCodec.g711ULaw(0x7F.toByte) == 0)
    assert(AudioCodec.g711ULaw(0x80.toByte) == 32124)
    assert(AudioCodec.g711ULaw(0x00.toByte) == -32124)
    // A-law: smallest magnitudes ±8, extremes ±32256
    assert(AudioCodec.g711ALaw(0x55.toByte) == -8)
    assert(AudioCodec.g711ALaw(0xD5.toByte) == 8)
    assert(AudioCodec.g711ALaw(0x2A.toByte) == -32256)
    assert(AudioCodec.g711ALaw(0xAA.toByte) == 32256)
    // the sign bit flips the sample exactly, law-wide
    for (c <- 0 until 256) {
      assert(AudioCodec.g711ULaw(c.toByte) ==
        -AudioCodec.g711ULaw((c ^ 0x80).toByte), s"ulaw sign at $c")
      assert(AudioCodec.g711ALaw(c.toByte) ==
        -AudioCodec.g711ALaw((c ^ 0x80).toByte), s"alaw sign at $c")
    }
    // magnitude is monotone in the magnitude bits within each segment
    val uMags = (0 until 128).map(c =>
      AudioCodec.g711ULaw((c ^ 0xFF).toByte)) // positive half ascending
    assert(uMags == uMags.sorted, "ulaw expansion not monotone")
  }

  test("G.711 WAV container decodes through the standard chunk walk; " +
      "16-bit G.711 fmt is loudly corrupt") {
    val codes = Array(0x00, 0x80, 0xFF, 0x13).map(_.toByte)
    val u = AudioCodec.decodeWav(AudioCodec.encodeWavG711(7, 8000, 1,
      codes))
    assert(u.sampleRate == 8000 && u.channels == 1 && u.frames == 4)
    assert(u.samples.toSeq ==
      codes.toSeq.map(c => AudioCodec.g711ULaw(c) / 32768.0))
    val a = AudioCodec.decodeWav(AudioCodec.encodeWavG711(6, 4000, 2,
      codes))
    assert(a.channels == 2 && a.frames == 2)
    assert(a.samples.toSeq ==
      codes.toSeq.map(c => AudioCodec.g711ALaw(c) / 32768.0))
    assert(AudioCodec.sniff(AudioCodec.encodeWavG711(7, 8000, 1, codes))
      .contains("wav"))
    val bad = AudioCodec.encodeWavG711(7, 8000, 1, codes)
    bad(34) = 16 // bits=16 contradicts G.711's 8-bit definition
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(bad) }
  }

  test("stats: square-wave RMS equals amplitude; DC has zero " +
      "crossings 0; interleaved channels compare within-channel") {
    val square = Clip(8000, 1,
      Array.tabulate(16)(i => if ((i / 2) % 2 == 0) 0.5 else -0.5))
    val (rms, peak, zc) = AudioCodec.stats(square)
    assert(rms == 0.5 && peak == 0.5)
    assert(zc == 7) // sign flips at i=2,4,6,8,10,12,14
    val dc = Clip(4000, 2, Array.fill(16)(0.25))
    val (r2, p2, z2) = AudioCodec.stats(dc)
    assert(r2 == 0.25 && p2 == 0.25 && z2 == 0)
    // alternating stereo where each CHANNEL is constant: no crossings
    val alt = Clip(4000, 2, Array.tabulate(8)(i =>
      if (i % 2 == 0) 0.5 else -0.5))
    assert(AudioCodec.stats(alt)._3 == 0)
  }

  test("durationMs is integer floor arithmetic; frame sampling is " +
      "evenly spaced and re-encodes per channel") {
    assert(Clip(8000, 1, new Array[Double](16)).durationMs == 2L)
    assert(Clip(3, 1, new Array[Double](2)).durationMs == 666L)
    val frames = AudioCodec.sampleFrames(ramp, 2) // frames 0 and 2
    assert(frames.length == 2)
    assert(frames(0).toSeq == Seq[Byte](0, 0))
    // frame 2 = -0.5 → -16384 → LE bytes (0x00, 0xC0)
    assert(frames(1).toSeq == Seq[Byte](0, 0xC0.toByte))
  }
}

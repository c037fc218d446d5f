package graft.operators

/** Pure-JVM audio codec for the multimodal decode path — the audio
  * analog of [[ImageCodec]]: real decoding of the classic UNCOMPRESSED
  * container whose spec is arithmetic, not entropy coding.
  *
  *   - WAV (RIFF/WAVE), PCM integer formats: 12-byte RIFF header,
  *     chunked layout (`fmt ` before `data`, other chunks — LIST,
  *     fact, cue — legal and skipped), 8-bit unsigned / 16-bit
  *     signed little-endian samples, interleaved channels.
  *
  * Decoded audio is normalized to per-channel Double samples in
  * [−1, 1] so the feature math downstream (RMS, peak, zero crossings,
  * frame sampling) is format-independent — the same normalization
  * role `Image.rgb` plays for pixels. Compressed audio (MP3, AAC,
  * Opus) stays out of scope: the sniffer returns None and
  * [[Multimodal.decodeFeatures]] falls back to byte-level features,
  * loudly typed as such.
  */
object AudioCodec {

  /** Decoded clip: interleaved samples normalized to [−1, 1].
    * `samples(frame * channels + ch)`. */
  final case class Clip(sampleRate: Int, channels: Int,
                        samples: Array[Double]) {
    require(sampleRate > 0 && channels > 0 &&
      samples.length % channels == 0,
      s"inconsistent clip: rate=$sampleRate ch=$channels n=${samples.length}")
    def frames: Int = samples.length / channels
    /** Duration in milliseconds, floor — integer arithmetic so the
      * readout is engine-replicable. */
    def durationMs: Long = frames.toLong * 1000L / sampleRate
  }

  /** Magic sniff: RIFF....WAVE. */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E') Some("wav")
    else None

  /** Decode a sniffable payload; None when the magic is unknown;
    * IllegalArgumentException on recognized-but-corrupt input
    * (truncated chunks, float/compressed PCM, missing data). */
  def decode(bytes: Array[Byte]): Option[Clip] =
    sniff(bytes).map { case "wav" => decodeWav(bytes) }

  def decodeWav(bytes: Array[Byte]): Clip = {
    require(sniff(bytes).contains("wav"), "not a RIFF/WAVE payload")
    var pos = 12
    var fmtSeen = false
    var audioFormat = 0; var channels = 0; var rate = 0; var bits = 0
    var clip: Clip = null
    // chunk walk: 8-byte header (id + little-endian size), payloads
    // padded to even length per the RIFF spec
    while (pos + 8 <= bytes.length && clip == null) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = i32(bytes, pos + 4)
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length,
        s"truncated WAV chunk '$id' (size=$size at $pos)")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small ($size)")
          audioFormat = i16(bytes, body)
          channels = i16(bytes, body + 2)
          rate = i32(bytes, body + 4)
          bits = i16(bytes, body + 14)
          require(audioFormat == 1 || audioFormat == 6 || audioFormat == 7,
            s"only PCM/A-law/mu-law WAV supported (format=$audioFormat)")
          if (audioFormat == 1)
            require(bits == 8 || bits == 16,
              s"only 8/16-bit PCM supported (bits=$bits)")
          else
            // G.711 companding is defined on 8-bit codes, full stop
            require(bits == 8, s"G.711 WAV must be 8-bit (bits=$bits)")
          require(channels > 0 && rate > 0,
            s"bad WAV fmt: channels=$channels rate=$rate")
          fmtSeen = true
        case "data" =>
          require(fmtSeen, "WAV data chunk before fmt")
          val bytesPer = bits / 8
          val n = size / (bytesPer * channels) * channels
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            out(i) = audioFormat match {
              case 7 => g711ULaw(bytes(body + i)) / 32768.0
              case 6 => g711ALaw(bytes(body + i)) / 32768.0
              case 1 if bits == 8 =>
                ((bytes(body + i) & 0xff) - 128) / 128.0
              case _ => // 16-bit signed little-endian
                val lo = bytes(body + i * 2) & 0xff
                val hi = bytes(body + i * 2 + 1).toInt
                ((hi << 8) | lo) / 32768.0
            }
            i += 1
          }
          clip = Clip(rate, channels, out)
        case _ => () // LIST/fact/cue/...: legal, skipped
      }
      pos = body + size + (size & 1)
    }
    require(clip != null, "WAV has no data chunk")
    clip
  }

  /** Encode 16-bit PCM — fixture builder and inverse witness for
    * [[decodeWav]] (round-trip: sample → short → sample is exact for
    * values on the 1/32768 grid). Clamps to [−1, 1). */
  def encodeWav16(clip: Clip): Array[Byte] = {
    val n = clip.samples.length
    val dataSize = n * 2
    val out = new Array[Byte](44 + dataSize)
    def ws(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, out, off, b.length)
    }
    ws(0, "RIFF"); w32(out, 4, 36 + dataSize); ws(8, "WAVE")
    ws(12, "fmt "); w32(out, 16, 16)
    w16(out, 20, 1); w16(out, 22, clip.channels)
    w32(out, 24, clip.sampleRate)
    w32(out, 28, clip.sampleRate * clip.channels * 2)
    w16(out, 32, clip.channels * 2); w16(out, 34, 16)
    ws(36, "data"); w32(out, 40, dataSize)
    var i = 0
    while (i < n) {
      val v = math.max(-32768, math.min(32767,
        math.round(clip.samples(i) * 32768.0))).toInt
      out(44 + i * 2) = v.toByte
      out(44 + i * 2 + 1) = (v >> 8).toByte
      i += 1
    }
    out
  }

  /** ITU-T G.711 mu-law code byte → linear 16-bit sample (the classic
    * expansion: invert, unpack 3-bit exponent + 4-bit mantissa around
    * the 0x84 bias). Range ±32124. Both zero codes (0xFF positive,
    * 0x7F negative) expand to exactly 0. */
  def g711ULaw(code: Byte): Int = {
    val u = ~code & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law code byte → linear 16-bit sample (toggle the
    * even bits with 0x55, unpack segment + mantissa; segment 0 is the
    * linear low band). Range ±32256. */
  def g711ALaw(code: Byte): Int = {
    val a = (code ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** Wrap raw G.711 code bytes in a RIFF/WAVE container (`format` 6 =
    * A-law, 7 = mu-law) — fixture builder for [[decodeWav]]'s
    * companded path; G.711 bytes are the ground truth, so "encode" is
    * containerization, not companding. */
  def encodeWavG711(format: Int, sampleRate: Int, channels: Int,
                    codes: Array[Byte]): Array[Byte] = {
    require(format == 6 || format == 7, s"not a G.711 format: $format")
    val dataSize = codes.length
    val out = new Array[Byte](44 + dataSize)
    def ws(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, out, off, b.length)
    }
    ws(0, "RIFF"); w32(out, 4, 36 + dataSize); ws(8, "WAVE")
    ws(12, "fmt "); w32(out, 16, 16)
    w16(out, 20, format); w16(out, 22, channels)
    w32(out, 24, sampleRate)
    w32(out, 28, sampleRate * channels)
    w16(out, 32, channels); w16(out, 34, 8)
    ws(36, "data"); w32(out, 40, dataSize)
    System.arraycopy(codes, 0, out, 44, dataSize)
    out
  }

  // ------------------------------------------------------------ kernels

  /** Per-clip amplitude statistics, channel-agnostic (over the
    * interleaved stream): RMS, peak absolute amplitude, zero-crossing
    * count — the basic audio features a curation pipeline filters on
    * (silence, clipping, noise). Deterministic double arithmetic. */
  def stats(clip: Clip): (Double, Double, Long) = {
    var sumSq = 0.0; var peak = 0.0; var zc = 0L
    var i = 0
    val s = clip.samples
    while (i < s.length) {
      val v = s(i)
      sumSq += v * v
      val a = math.abs(v); if (a > peak) peak = a
      if (i >= clip.channels &&
          (v > 0) != (s(i - clip.channels) > 0) &&
          v != 0 && s(i - clip.channels) != 0) zc += 1
      i += 1
    }
    val rms = if (s.length == 0) 0.0 else math.sqrt(sumSq / s.length)
    (rms, peak, zc)
  }

  /** Up to `n` evenly-spaced FRAMES (one sample per channel,
    * re-encoded 16-bit LE) — the audio analog of
    * [[ImageCodec.sampleRows]]. */
  def sampleFrames(clip: Clip, n: Int): Array[Array[Byte]] = {
    val take = math.min(n, clip.frames)
    Array.tabulate(take) { i =>
      val f = (i.toLong * clip.frames / take).toInt
      val out = new Array[Byte](clip.channels * 2)
      var c = 0
      while (c < clip.channels) {
        val v = math.max(-32768, math.min(32767,
          math.round(clip.samples(f * clip.channels + c) * 32768.0))).toInt
        out(c * 2) = v.toByte; out(c * 2 + 1) = (v >> 8).toByte
        c += 1
      }
      out
    }
  }

  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def i16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def w32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }

  private def w16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }
}

package graft.operators

/** Pure-JVM image codec for the multimodal decode path — real decoding
  * with zero container dependencies, covering the two classic
  * UNCOMPRESSED formats whose specs are arithmetic, not entropy coding:
  *
  *   - PPM "P6" (Netpbm binary RGB): ASCII header (`P6`, width, height,
  *     maxval ≤ 255, `#` comments legal between tokens), then
  *     width×height×3 raw RGB bytes.
  *   - BMP (Windows bitmap), 24-bit uncompressed BITMAPINFOHEADER:
  *     14-byte file header (offset to pixels at byte 10), ≥40-byte DIB
  *     header (width/height/bpp/compression), BGR pixel rows padded to
  *     4 bytes, bottom-up when height > 0.
  *
  * Everything returns row-major RGB (3 bytes/pixel, top-down) so the
  * feature math downstream is format-independent.
  *
  * Compressed formats: JPEG and PNG decode through `javax.imageio`
  * (ships in the JDK — still zero container dependencies). The decoded
  * `BufferedImage` is normalized through `getRGB` into the same
  * row-major RGB raster, so every downstream kernel (means, resize, row
  * sampling) is container-agnostic. PNG is lossless — a PNG round-trip
  * must reproduce the source raster bit-exactly, and the codec spec
  * pins that; JPEG is lossy — its decode is pinned for dimensions and
  * for distributed-vs-local agreement (the q108 gate row), never for
  * exact pixel values. Formats imageio cannot sniff (WebP, AVIF, raw
  * video) remain out of scope — the sniffer returns None and
  * [[Multimodal.decodeFeatures]] falls back to byte-level features,
  * loudly typed as such (`format` NULL).
  */
object ImageCodec {

  /** Decoded raster: row-major, top-down, 3 bytes (R,G,B) per pixel. */
  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"inconsistent raster: ${width}x$height with ${rgb.length} bytes")
  }

  /** Format sniff on magic bytes alone (cheap, no parsing): Some("ppm")
    * / Some("bmp") / None. A payload that sniffs but fails to PARSE is
    * a decode error, not a fallback — corrupt media should be loud. */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') Some("ppm")
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Some("bmp")
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
             (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff)
      Some("jpeg")
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
             bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G' &&
             bytes(4) == 0x0d && bytes(5) == 0x0a &&
             bytes(6) == 0x1a && bytes(7) == 0x0a)
      Some("png")
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
             bytes(2) == 'F' && bytes(3) == '8' &&
             (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      Some("gif")
    else None

  /** Decode a sniffable payload; None when the magic is unknown.
    * Throws IllegalArgumentException on a recognized-but-corrupt
    * payload (truncated pixels, bad maxval, compressed BMP…). */
  def decode(bytes: Array[Byte]): Option[Image] = sniff(bytes).map {
    case "ppm"                  => decodePpm(bytes)
    case "bmp"                  => decodeBmp(bytes)
    case "jpeg" | "png" | "gif" => decodeImageIO(bytes)
  }

  // ---------------------------------------------------------------- PPM

  def decodePpm(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM")
    var pos = 2
    // token scanner: whitespace separates tokens; '#' starts a comment
    // running to end-of-line (legal anywhere between header tokens)
    def nextInt(): Int = {
      while (pos < bytes.length &&
             (isWs(bytes(pos)) || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      require(pos < bytes.length, "truncated PPM header")
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      require(any, s"malformed PPM header at byte $pos")
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(w > 0 && h > 0, s"bad PPM dimensions ${w}x$h")
    require(maxval > 0 && maxval < 256,
      s"only 8-bit PPM supported (maxval=$maxval)")
    // exactly ONE whitespace byte separates the header from pixel data
    require(pos < bytes.length && isWs(bytes(pos)), "missing PPM separator")
    pos += 1
    val n = w * h * 3
    require(bytes.length - pos >= n,
      s"truncated PPM pixels: need $n, have ${bytes.length - pos}")
    val raw = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
    // per the Netpbm spec, samples are stored 0..maxval and mean
    // fractions of full intensity: rescale to 0..255 when maxval≠255
    // (round-half-up), so stored maxval IS full white downstream
    if (maxval != 255) {
      var i = 0
      while (i < raw.length) {
        // clamp: a malformed sample above maxval saturates rather
        // than wrapping through toByte
        raw(i) = math.min(255,
          ((raw(i) & 0xff) * 255 + maxval / 2) / maxval).toByte
        i += 1
      }
    }
    Image(w, h, raw)
  }

  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  // ---------------------------------------------------------------- BMP

  def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP")
    val pixelOffset = i32(bytes, 10)
    val dibSize = i32(bytes, 14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val w = i32(bytes, 18)
    val rawH = i32(bytes, 22)
    val bpp = i16(bytes, 28)
    val compression = i32(bytes, 30)
    require(bpp == 24, s"only 24-bit BMP supported (bpp=$bpp)")
    require(compression == 0, s"only uncompressed BMP supported")
    // height > 0 → rows stored bottom-up (the overwhelmingly common
    // case); < 0 → top-down
    val topDown = rawH < 0
    val h = math.abs(rawH)
    require(w > 0 && h > 0, s"bad BMP dimensions ${w}x$rawH")
    // dimension bound BEFORE any Int arithmetic on w/h: a huge header
    // width overflows w*3 (negative rowSize → the truncation check
    // passes trivially → NegativeArraySizeException) — every derived
    // quantity below must stay well inside Int range
    require(w.toLong * h * 3 <= Int.MaxValue,
      s"BMP dimensions ${w}x$h exceed the supported pixel budget")
    val rowSize = ((w * 3 + 3) / 4) * 4 // rows padded to 4 bytes
    // pixelOffset and dibSize are attacker-controlled header data: a
    // negative or inside-the-header offset passes the truncation check
    // below (the sum just shifts down) and then crashes the pixel loop
    // with ArrayIndexOutOfBounds instead of the contract's
    // IllegalArgumentException. Compared in Long — `14 + dibSize` in
    // Int wraps negative for dibSize near Int.MaxValue and would admit
    // any offset.
    require(pixelOffset.toLong >= 14L + dibSize &&
        pixelOffset <= bytes.length,
      s"bad BMP pixel offset $pixelOffset")
    require(bytes.length.toLong >= pixelOffset.toLong + rowSize.toLong * h,
      "truncated BMP pixels")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var src = pixelOffset + srcRow * rowSize
      var dst = y * w * 3
      var x = 0
      while (x < w) { // stored BGR → emit RGB
        rgb(dst) = bytes(src + 2)
        rgb(dst + 1) = bytes(src + 1)
        rgb(dst + 2) = bytes(src)
        src += 3; dst += 3; x += 1
      }
      y += 1
    }
    Image(w, h, rgb)
  }

  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def i16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode a 24-bit bottom-up BMP — fixture builder for specs and the
    * inverse witness for [[decodeBmp]] (round-trip tested). */
  def encodeBmp(img: Image): Array[Byte] = {
    val rowSize = ((img.width * 3 + 3) / 4) * 4
    val pixelBytes = rowSize * img.height
    val out = new Array[Byte](54 + pixelBytes)
    out(0) = 'B'; out(1) = 'M'
    w32(out, 2, 54 + pixelBytes); w32(out, 10, 54)
    w32(out, 14, 40); w32(out, 18, img.width); w32(out, 22, img.height)
    out(26) = 1; out(28) = 24
    w32(out, 34, pixelBytes)
    var y = 0
    while (y < img.height) {
      var src = (img.height - 1 - y) * img.width * 3 // bottom-up
      var dst = 54 + y * rowSize
      var x = 0
      while (x < img.width) { // RGB → stored BGR
        out(dst) = img.rgb(src + 2)
        out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src)
        src += 3; dst += 3; x += 1
      }
      y += 1
    }
    out
  }

  private def w32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }

  // ----------------------------------------------- JPEG / PNG (imageio)

  /** Decode a JPEG or PNG payload via `javax.imageio` and normalize to
    * the codec's row-major RGB raster. Alpha (PNG RGBA, palette
    * transparency) is DROPPED, not composited — `getRGB` returns
    * non-premultiplied ARGB and the feature kernels want raw channel
    * bytes; a corpus that needs background compositing does it upstream.
    * Throws IllegalArgumentException when imageio recognizes no reader
    * or the stream is truncated — corrupt media stays loud, matching
    * the PPM/BMP contract. */
  def decodeImageIO(bytes: Array[Byte]): Image = {
    import java.io.ByteArrayInputStream
    val bi = try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext,
          "imageio found no reader for a sniffed payload")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          // dimension budget BEFORE reader.read allocates the raster:
          // headers are cheap to parse, and a small decompression-bomb
          // payload declaring huge dimensions must fail here, not as
          // an executor OOM after a multi-GB allocation
          val w0 = reader.getWidth(0); val h0 = reader.getHeight(0)
          require(w0 > 0 && h0 > 0, s"bad imageio dimensions ${w0}x$h0")
          require(w0.toLong * h0 * 3 <= Int.MaxValue,
            s"image dimensions ${w0}x$h0 exceed the supported pixel budget")
          reader.read(0)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch {
      case e: IllegalArgumentException => throw e
      // NonFatal, not just IOException: plugin decoders throw runtime
      // exceptions on malformed payloads (e.g. ArrayIndexOutOfBounds in
      // the JPEG huffman tables) — every corrupt-input failure must
      // surface as the documented IllegalArgumentException so the
      // decode() contract holds for standalone callers too, not only
      // under Multimodal.attempt's NonFatal net
      case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"imageio decode failed: ${e.getMessage}", e)
    }
    require(bi != null, "imageio decode returned no image")
    val w = bi.getWidth; val h = bi.getHeight
    require(w > 0 && h > 0, s"bad imageio dimensions ${w}x$h")
    require(w.toLong * h * 3 <= Int.MaxValue,
      s"image dimensions ${w}x$h exceed the supported pixel budget")
    // one bulk getRGB: imageio's raster may be BGR, gray, palette, or
    // banded — the ARGB int view is the normalization layer
    val argb = bi.getRGB(0, 0, w, h, null, 0, w)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      rgb(i * 3) = ((p >> 16) & 0xff).toByte
      rgb(i * 3 + 1) = ((p >> 8) & 0xff).toByte
      rgb(i * 3 + 2) = (p & 0xff).toByte
      i += 1
    }
    Image(w, h, rgb)
  }

  private def toBuffered(img: Image): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    val n = img.width * img.height
    val argb = new Array[Int](n)
    while (i < n) {
      argb(i) = ((img.rgb(i * 3) & 0xff) << 16) |
        ((img.rgb(i * 3 + 1) & 0xff) << 8) | (img.rgb(i * 3 + 2) & 0xff)
      i += 1
    }
    bi.setRGB(0, 0, img.width, img.height, argb, 0, img.width)
    bi
  }

  /** Encode to PNG (lossless) — fixture builder; [[decodeImageIO]] of
    * the result must equal the input raster exactly. */
  def encodePng(img: Image): Array[Byte] = encodeVia(img, "png")

  /** Encode to JPEG (lossy, writer-default quality) — fixture builder;
    * deterministic within one JVM, which is the scope the q108 gate
    * needs (oracle literals come from the same process). */
  def encodeJpeg(img: Image): Array[Byte] = encodeVia(img, "jpg")

  /** Encode to GIF. The JDK writer's palette quantizer is NOT exact
    * even for tiny rasters (measured: a 4-color 2×2 collapses to 2
    * palette entries), so GIF carries the JPEG contract — dimensions
    * plus deterministic decode — and the q125 oracle pins via local
    * decode of the same bytes, never via the source raster. */
  def encodeGif(img: Image): Array[Byte] = encodeVia(img, "gif")

  private def encodeVia(img: Image, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(toBuffered(img), fmt, out)
    require(ok, s"no imageio writer for $fmt")
    out.toByteArray
  }

  // ------------------------------------------------------------ kernels

  /** Nearest-neighbor resize — deterministic integer arithmetic
    * (`src = dst * srcDim / dstDim`, floor), the standard downscale for
    * thumbnail features. */
  def resizeNearest(img: Image, outW: Int, outH: Int): Image = {
    require(outW > 0 && outH > 0, "resize target must be positive")
    val rgb = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * img.height / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * img.width / outW).toInt
        val src = (sy * img.width + sx) * 3
        val dst = (y * outW + x) * 3
        rgb(dst) = img.rgb(src)
        rgb(dst + 1) = img.rgb(src + 1)
        rgb(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Image(outW, outH, rgb)
  }

  /** Per-channel byte means (R, G, B) — the basic image statistic. */
  def meanChannels(img: Image): (Double, Double, Double) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < img.rgb.length) {
      r += img.rgb(i) & 0xff
      g += img.rgb(i + 1) & 0xff
      b += img.rgb(i + 2) & 0xff
      i += 3
    }
    val n = (img.width * img.height).toDouble
    (r / n, g / n, b / n)
  }

  /** Up to `n` evenly-spaced ROWS of the raster as raw RGB byte arrays
    * (width×3 bytes each) — the still-image analog of video frame
    * sampling, and a deterministic fixed-stride sample like it. */
  def sampleRows(img: Image, n: Int): Array[Array[Byte]] = {
    val take = math.min(n, img.height)
    Array.tabulate(take) { i =>
      val y = (i.toLong * img.height / take).toInt
      java.util.Arrays.copyOfRange(img.rgb, y * img.width * 3,
        (y + 1) * img.width * 3)
    }
  }
}

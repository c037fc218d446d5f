package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import ImageCodec.Image

/** Pure codec math — no Spark. Fixtures are hand-built byte arrays so
  * the decoders are checked against the FORMAT SPEC, not against the
  * sibling encoder alone. */
class ImageCodecSpec extends AnyFunSuite {

  // 2x2 test raster, distinct channel values per pixel:
  // (10,20,30) (40,50,60) / (70,80,90) (100,110,120)
  private val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
  private val img2 = Image(2, 2, px)

  test("PPM P6 decode: hand-built header with comments and CRLF noise") {
    val header = "P6\n# a comment\n2 2\n# another\n255\n".getBytes("US-ASCII")
    val bytes = header ++ px
    val img = ImageCodec.decodePpm(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == px.toSeq)
    assert(ImageCodec.sniff(bytes).contains("ppm"))
  }

  test("PPM encode/decode round-trips byte-exactly") {
    val rt = ImageCodec.decodePpm(ImageCodec.encodePpm(img2))
    assert(rt == Image(2, 2, px) || rt.rgb.toSeq == px.toSeq)
    assert(rt.width == 2 && rt.height == 2 && rt.rgb.toSeq == px.toSeq)
  }

  test("PPM maxval<255 samples rescale to full 8-bit intensity per " +
      "the Netpbm spec") {
    // maxval=15: stored 15 IS full white → 255; 7 → (7·255+7)/15 = 119
    val bytes = "P6\n1 1\n15\n".getBytes("US-ASCII") ++
      Array[Byte](15, 0, 7)
    val img = ImageCodec.decodePpm(bytes)
    assert((img.rgb(0) & 0xff) == 255 && img.rgb(1) == 0 &&
      (img.rgb(2) & 0xff) == 119, s"got ${img.rgb.toSeq}")
  }

  test("PPM corrupt inputs are loud: truncation, 16-bit maxval") {
    val good = ImageCodec.encodePpm(img2)
    intercept[IllegalArgumentException] {
      ImageCodec.decodePpm(good.dropRight(1))
    }
    intercept[IllegalArgumentException] {
      ImageCodec.decodePpm("P6\n2 2\n65535\n".getBytes("US-ASCII") ++
        Array.fill[Byte](24)(0))
    }
  }

  test("BMP decode: hand-built bottom-up rows with 4-byte padding, BGR") {
    // 2x2, 24bpp: rowSize = ((2*3+3)/4)*4 = 8 → 2 pad bytes per row.
    // Bottom-up: file row 0 is IMAGE row 1. Stored BGR.
    val header = new Array[Byte](54)
    header(0) = 'B'; header(1) = 'M'
    def w32(off: Int, v: Int): Unit = {
      header(off) = v.toByte; header(off + 1) = (v >> 8).toByte
      header(off + 2) = (v >> 16).toByte; header(off + 3) = (v >> 24).toByte
    }
    w32(2, 54 + 16); w32(10, 54); w32(14, 40); w32(18, 2); w32(22, 2)
    header(26) = 1; header(28) = 24
    val rows = Array[Byte](
      90, 80, 70, 120, 110, 100, 0, 0, // image row 1 in BGR + pad
      30, 20, 10, 60, 50, 40, 0, 0) // image row 0 in BGR + pad
    val img = ImageCodec.decodeBmp(header ++ rows)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == px.toSeq, "BGR swap + bottom-up flip expected")
    assert(ImageCodec.sniff(header).contains("bmp"))
  }

  test("BMP encode/decode round-trips byte-exactly (odd width → padding)") {
    val odd = Image(3, 2, Array.tabulate[Byte](18)(i => (i * 7).toByte))
    val rt = ImageCodec.decodeBmp(ImageCodec.encodeBmp(odd))
    assert(rt.width == 3 && rt.height == 2)
    assert(rt.rgb.toSeq == odd.rgb.toSeq)
  }

  test("BMP corrupt inputs are loud: truncation, 32bpp, compressed") {
    val good = ImageCodec.encodeBmp(img2)
    intercept[IllegalArgumentException] {
      ImageCodec.decodeBmp(good.dropRight(1))
    }
    val bpp32 = good.clone(); bpp32(28) = 32
    intercept[IllegalArgumentException] { ImageCodec.decodeBmp(bpp32) }
    val rle = good.clone(); rle(30) = 1
    intercept[IllegalArgumentException] { ImageCodec.decodeBmp(rle) }
    // corrupt pixel offset: negative and inside-the-header values used
    // to pass the truncation check (the sum just shifts down) and crash
    // the pixel loop with ArrayIndexOutOfBounds instead of the
    // contract's IllegalArgumentException
    val negOff = good.clone(); negOff(10) = -1; negOff(11) = -1
    negOff(12) = -1; negOff(13) = -1
    intercept[IllegalArgumentException] { ImageCodec.decodeBmp(negOff) }
    val lowOff = good.clone(); lowOff(10) = 20; lowOff(11) = 0
    lowOff(12) = 0; lowOff(13) = 0
    intercept[IllegalArgumentException] { ImageCodec.decodeBmp(lowOff) }
  }

  test("sniff: unknown magic is None, not an error") {
    assert(ImageCodec.sniff("plain text".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.sniff(Array.emptyByteArray).isEmpty)
    assert(ImageCodec.decode("hello world".getBytes("UTF-8")).isEmpty)
  }

  test("nearest-neighbor resize: floor sampling, deterministic") {
    // 4x1 → 2x1 picks source columns 0 and 2
    val row = Image(4, 1, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    val down = ImageCodec.resizeNearest(row, 2, 1)
    assert(down.rgb.toSeq == Seq[Byte](1, 2, 3, 7, 8, 9))
    // upscale replicates pixels
    val up = ImageCodec.resizeNearest(Image(1, 1, Array[Byte](9, 8, 7)), 2, 2)
    assert(up.rgb.toSeq == Seq[Byte](9, 8, 7, 9, 8, 7, 9, 8, 7, 9, 8, 7))
  }

  test("PNG encode/decode round-trips the raster byte-exactly (lossless)") {
    val bytes = ImageCodec.encodePng(img2)
    assert(ImageCodec.sniff(bytes).contains("png"))
    val rt = ImageCodec.decodeImageIO(bytes)
    assert(rt.width == 2 && rt.height == 2 && rt.rgb.toSeq == px.toSeq)
    // the generic decode entry point routes png to imageio
    assert(ImageCodec.decode(bytes).get.rgb.toSeq == px.toSeq)
  }

  test("JPEG decode: dimensions survive; pixels decode deterministically " +
       "within the JVM (lossy — never asserted equal to the source)") {
    val bytes = ImageCodec.encodeJpeg(img2)
    assert(ImageCodec.sniff(bytes).contains("jpeg"))
    val d1 = ImageCodec.decodeImageIO(bytes)
    val d2 = ImageCodec.decode(bytes).get
    assert(d1.width == 2 && d1.height == 2)
    assert(d1.rgb.toSeq == d2.rgb.toSeq) // decode is deterministic
  }

  test("GIF decode: dimensions survive and decode is deterministic " +
       "(the JDK writer's palette quantizer is NOT exact even for " +
       "tiny rasters — same contract as JPEG); sniff covers 87a/89a; " +
       "truncation is loud") {
    val bytes = ImageCodec.encodeGif(img2)
    assert(ImageCodec.sniff(bytes).contains("gif"))
    val d1 = ImageCodec.decodeImageIO(bytes)
    val d2 = ImageCodec.decode(bytes).get
    assert(d1.width == 2 && d1.height == 2)
    assert(d1.rgb.toSeq == d2.rgb.toSeq) // decode is deterministic
    val gif87 = bytes.clone(); gif87(4) = '7'
    assert(ImageCodec.sniff(gif87).contains("gif"))
    intercept[IllegalArgumentException] {
      ImageCodec.decodeImageIO(bytes.take(10))
    }
  }

  test("imageio corrupt inputs are loud: truncated PNG and JPEG throw") {
    val png = ImageCodec.encodePng(img2)
    intercept[IllegalArgumentException] {
      ImageCodec.decodeImageIO(png.take(20))
    }
    val jpg = ImageCodec.encodeJpeg(img2)
    intercept[IllegalArgumentException] {
      ImageCodec.decodeImageIO(jpg.take(4))
    }
  }

  test("channel means and row sampling") {
    val (r, g, b) = ImageCodec.meanChannels(img2)
    assert(r == (10 + 40 + 70 + 100) / 4.0)
    assert(g == (20 + 50 + 80 + 110) / 4.0)
    assert(b == (30 + 60 + 90 + 120) / 4.0)
    val rows = ImageCodec.sampleRows(img2, 4) // clamped to height=2
    assert(rows.length == 2)
    assert(rows(0).toSeq == px.slice(0, 6).toSeq)
    assert(rows(1).toSeq == px.slice(6, 12).toSeq)
  }
}

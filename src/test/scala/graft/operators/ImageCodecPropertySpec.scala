package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import ImageCodec.Image

/** Randomized codec invariants: the fixture specs pin the format spec
  * on hand-built bytes; these sweep raster space for the structural
  * guarantees — byte-exact encode/decode round-trips in both formats
  * (including odd widths exercising BMP row padding), resize
  * determinism, and statistics bounds. Raw ScalaCheck Gen sampling
  * with fixed seeds (offline cache has no scalatest bridge). */
class ImageCodecPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(30),
      org.scalacheck.rng.Seed(seed)).get

  private val genImage: Gen[Image] = for {
    w <- Gen.choose(1, 13)
    h <- Gen.choose(1, 11)
    bytes <- Gen.listOfN(w * h * 3, Gen.choose(-128, 127).map(_.toByte))
  } yield Image(w, h, bytes.toArray)

  test("PPM and BMP round-trips are byte-exact for random rasters " +
      "(odd widths exercise BMP padding)") {
    (0 until 25).foreach { rep =>
      val img = sample(genImage, seed = 4200L + rep)
      val viaPpm = ImageCodec.decodePpm(ImageCodec.encodePpm(img))
      assert(viaPpm.width == img.width && viaPpm.height == img.height &&
        viaPpm.rgb.toSeq == img.rgb.toSeq,
        s"rep $rep: PPM round-trip diverged at ${img.width}x${img.height}")
      val viaBmp = ImageCodec.decodeBmp(ImageCodec.encodeBmp(img))
      assert(viaBmp.width == img.width && viaBmp.height == img.height &&
        viaBmp.rgb.toSeq == img.rgb.toSeq,
        s"rep $rep: BMP round-trip diverged at ${img.width}x${img.height}")
    }
  }

  test("cross-format agreement: the same raster through either " +
      "container decodes to identical pixels and statistics") {
    (0 until 10).foreach { rep =>
      val img = sample(genImage, seed = 7700L + rep)
      val a = ImageCodec.decode(ImageCodec.encodePpm(img)).get
      val b = ImageCodec.decode(ImageCodec.encodeBmp(img)).get
      assert(a.rgb.toSeq == b.rgb.toSeq, s"rep $rep: formats disagree")
      assert(ImageCodec.meanChannels(a) == ImageCodec.meanChannels(b))
    }
  }

  test("resize invariants: identity at same size, single pixel from " +
      "1x1 target, output dims always honored, means within byte range") {
    (0 until 10).foreach { rep =>
      val img = sample(genImage, seed = 9900L + rep)
      val same = ImageCodec.resizeNearest(img, img.width, img.height)
      assert(same.rgb.toSeq == img.rgb.toSeq,
        s"rep $rep: same-size resize must be identity")
      val one = ImageCodec.resizeNearest(img, 1, 1)
      assert(one.rgb.toSeq == img.rgb.slice(0, 3).toSeq,
        s"rep $rep: 1x1 nearest picks the (0,0) source pixel")
      val (r, g, b) = ImageCodec.meanChannels(img)
      Seq(r, g, b).foreach(m => assert(m >= 0 && m <= 255))
      val rows = ImageCodec.sampleRows(img, 4)
      assert(rows.length == math.min(4, img.height))
      assert(rows.forall(_.length == img.width * 3))
    }
  }
}

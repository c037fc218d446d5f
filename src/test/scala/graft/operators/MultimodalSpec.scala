package graft.operators

import graft.SparkSpec
import graft.engine.Tables

/** Multimodal plumbing: binary payloads through the mapPartitions
  * decode path — schema, batching, partition preservation, and REAL
  * image decode (ImageCodec PPM/BMP) for recognized payloads with the
  * byte-level fallback for everything else. */
class MultimodalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("asset view + byte-fallback decode round-trips bytes with metadata intact") {
    val docs = Tables(spark, sf, "documents")
    val assets = Multimodal.assets(docs, "doc_id", "text", "text/plain")
    assert(assets.columns.toSeq == Seq("asset_id", "payload", "meta"))

    val feats = Multimodal.decodeFeatures(spark, assets)
    assert(feats.schema == Multimodal.featureSchema)

    val joined = feats.join(docs,
        feats("asset_id") === docs("doc_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val nBytes = r.getAs[Int]("n_bytes")
      val nChars = r.getAs[Long]("n_chars")
      assert(nBytes == nChars, "ASCII corpus: byte length == char length")
      val frames = r.getAs[scala.collection.Seq[Array[Byte]]]("frames")
      assert(frames.length <= 4 && frames.nonEmpty)
      val text = r.getAs[String]("text")
      assert(new String(frames.head, "UTF-8") == text.take(16),
        "first frame must be the first 16 payload bytes")
      val mean = r.getAs[Double]("byte_mean")
      assert(mean > 0 && mean < 256)
      // byte fallback "resize": stride-4 subsample — quarter length,
      // first byte kept
      val resized = r.getAs[Array[Byte]]("resized")
      assert(resized.length == (nBytes + 3) / 4)
      assert(resized.head == text.head.toByte)
      // text payloads are NOT images: the image columns must be NULL,
      // never faked
      assert(r.getAs[String]("format") == null)
      assert(r.isNullAt(r.fieldIndex("width")) &&
        r.isNullAt(r.fieldIndex("mean_r")))
    }
  }

  test("real image payloads decode for real: planted PPM and BMP files " +
      "through binaryFile ingest, pixel statistics byte-exact") {
    import org.apache.spark.sql.functions._
    import ImageCodec.Image
    val dir = scratch("imgassets").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // 4x2 gradient: pixel (x,y) = (10x, 10y, 100+x+y) — means are exact
    val img = Image(4, 2, Array.tabulate[Byte](24) { i =>
      val p = i / 3; val x = p % 4; val y = p / 4
      (i % 3 match {
        case 0 => 10 * x; case 1 => 10 * y; case 2 => 100 + x + y
      }).toByte
    })
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.ppm"),
      ImageCodec.encodePpm(img))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.bmp"),
      ImageCodec.encodeBmp(img))
    val assets = Multimodal.readBinaryDir(spark, dir, glob = "*.{ppm,bmp}")
      .withColumn("asset_id",
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy("file_name")).cast("long"))
      .select(col("asset_id"), col("payload"),
        struct(lit("image").as("kind"), col("n_bytes")).as("meta"))
    val feats = Multimodal.decodeFeatures(spark, assets)
      .collect().map(r => r.getAs[String]("format") -> r).toMap
    assert(feats.keySet == Set("ppm", "bmp"))
    feats.values.foreach { r =>
      assert(r.getAs[Int]("width") == 4 && r.getAs[Int]("height") == 2)
      // channel means: R over x∈0..3 twice → (0+10+20+30)*2/8 = 15;
      // G over y∈{0,1} ×4 → 5; B = 100 + mean(x+y) = 102
      assert(r.getAs[Double]("mean_r") == 15.0)
      assert(r.getAs[Double]("mean_g") == 5.0)
      assert(r.getAs[Double]("mean_b") == 102.0)
      // frames = the 2 raster rows, raw RGB, byte-exact — identical
      // pixels from BOTH formats (the BMP path undoes BGR + bottom-up)
      val frames = r.getAs[scala.collection.Seq[Array[Byte]]]("frames")
      assert(frames.length == 2)
      assert(frames(0).toSeq == img.rgb.slice(0, 12).toSeq)
      assert(frames(1).toSeq == img.rgb.slice(12, 24).toSeq)
      // thumbnail: image is already ≤ 8px per edge → identity resize,
      // PPM-encoded
      val thumb = ImageCodec.decodePpm(r.getAs[Array[Byte]]("resized"))
      assert(thumb.width == 4 && thumb.height == 2)
      assert(thumb.rgb.toSeq == img.rgb.toSeq)
    }
  }

  test("recognized-but-corrupt media is loud PER ROW (decode_error " +
      "set, stats NULL) and never job-fatal; unrecognized magic and " +
      "NULL payloads are distinguished") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val truncated = ImageCodec.encodePpm(ImageCodec.Image(2, 2,
      Array.fill[Byte](12)(1))).dropRight(3)
    val good = ImageCodec.encodePpm(ImageCodec.Image(2, 2,
      Array.fill[Byte](12)(1)))
    val assets = Seq(
      (1L, truncated),                   // sniffs ppm, fails to parse
      (2L, good),                        // decodes
      (3L, "plain text".getBytes.toSeq.toArray), // unknown magic
      (4L, null.asInstanceOf[Array[Byte]]))      // null payload
      .toDF("asset_id", "payload")
      .select(col("asset_id"), col("payload"),
        struct(lit("image").as("kind"),
          coalesce(length(col("payload")), lit(0)).as("n_bytes"))
          .as("meta"))
    val rows = Multimodal.decodeFeatures(spark, assets)
      .orderBy(col("asset_id")).collect()
    assert(rows(0).getAs[String]("decode_error") != null &&
      rows(0).getAs[String]("format") == null,
      "corrupt row must carry decode_error with NULL stats")
    assert(rows(1).getAs[String]("decode_error") == null &&
      rows(1).getAs[String]("format") == "ppm")
    assert(rows(2).getAs[String]("decode_error") == null &&
      rows(2).getAs[String]("format") == null,
      "unknown magic is the honest fallback, NOT an error")
    assert(rows(3).getAs[String]("decode_error") == "null payload" &&
      rows(3).getAs[Int]("n_bytes") == 0)
    // audio twin: a float-PCM WAV (valid in the wild, unsupported
    // here) must land as an error ROW, not a job failure
    val floatWav = {
      val b = AudioCodec.encodeWav16(AudioCodec.Clip(8000, 1,
        Array(0.0, 0.25)))
      b(20) = 3; b // audioFormat = IEEE float
    }
    val aAssets = Seq((1L, floatWav)).toDF("asset_id", "payload")
      .select(col("asset_id"), col("payload"),
        struct(lit("audio").as("kind"),
          length(col("payload")).as("n_bytes")).as("meta"))
    val aRow = Multimodal.decodeAudioFeatures(spark, aAssets).collect()(0)
    assert(aRow.getAs[String]("decode_error") != null &&
      aRow.getAs[String]("format") == null)
  }

  test("binaryFile ingest reads real files as binary payloads, glob " +
      "filters at the source, and feeds the decode path") {
    import org.apache.spark.sql.functions._
    val dir = scratch("binassets").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val payloads = Map(
      "a.img" -> Array[Byte](1, 2, 3, 4, 5),
      "b.img" -> Array.tabulate[Byte](64)(i => (i * 3).toByte),
      "skip.txt" -> "not media".getBytes("UTF-8"))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), bytes)
    }
    val read = Multimodal.readBinaryDir(spark, dir, glob = "*.img")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Array[Byte]](2)))).toMap
    assert(read.keySet == Set("a.img", "b.img"), "glob must drop skip.txt")
    payloads.filter(_._1.endsWith(".img")).foreach { case (name, bytes) =>
      assert(read(name)._1 == bytes.length)
      assert(read(name)._2.toSeq == bytes.toSeq, s"$name bytes differ")
    }
    // the ingest feeds the standard decode path unchanged
    val assets = Multimodal.readBinaryDir(spark, dir, glob = "*.img")
      .withColumn("asset_id",
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy("file_name")).cast("long"))
      .select(col("asset_id"), col("payload"),
        struct(lit("image").as("kind"), col("n_bytes")).as("meta"))
    val feats = Multimodal.decodeFeatures(spark, assets)
    assert(feats.count() == 2 && feats.schema == Multimodal.featureSchema)
  }

  test("decode preserves partitioning (no shuffle)") {
    val docs = Tables(spark, sf, "documents").repartition(3)
    val feats = Multimodal.decodeFeatures(spark,
      Multimodal.assets(docs, "doc_id", "text", "text/plain"))
    assert(feats.rdd.getNumPartitions == 3)
  }
}

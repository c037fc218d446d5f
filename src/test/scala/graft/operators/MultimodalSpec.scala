package graft.operators

import graft.SparkSpec
import graft.engine.Tables

/** Multimodal plumbing: binary payloads + stub decode through
  * mapPartitions — schema, batching, and partition preservation are the
  * real things under test; the codec is the documented fake. */
class MultimodalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("asset view + stub decode round-trips bytes with metadata intact") {
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
      // "resize" stub: stride-4 subsample — quarter length, first byte kept
      val resized = r.getAs[Array[Byte]]("resized")
      assert(resized.length == (nBytes + 3) / 4)
      assert(resized.head == text.head.toByte)
    }
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

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

  test("decode preserves partitioning (no shuffle)") {
    val docs = Tables(spark, sf, "documents").repartition(3)
    val feats = Multimodal.decodeFeatures(spark,
      Multimodal.assets(docs, "doc_id", "text", "text/plain"))
    assert(feats.rdd.getNumPartitions == 3)
  }
}

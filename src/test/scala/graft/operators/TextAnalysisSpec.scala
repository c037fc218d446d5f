package graft.operators

import org.apache.spark.ml.linalg.Vector

import graft.SparkSpec

/** X3 — ml-native TF-IDF vector semantics (the long-form relation is
  * oracle-checked by q42; this pins the HashingTF→IDF path). */
class TextAnalysisSpec extends SparkSpec {

  test("tfidf vectors: ubiquitous term is idf-zeroed, unique terms " +
      "share the ln((m+1)/(df+1)) weight") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "the bird flew")
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .tfidfVectors(docs, "doc_id", "text", numFeatures = 1 << 14)
      .collect().map(r => r.getLong(0) -> r.getAs[Vector]("tfidf")).toMap
    assert(out.size == 3)
    // Spark ml IDF = ln((m+1)/(df+1)): "the" has df = m = 3 → weight 0;
    // every other term is unique (df 1) → ln(4/2) = ln 2, tf = 1
    val ln2 = math.log(2.0)
    out.values.foreach { v =>
      assert(v.size == (1 << 14))
      val nz = v.toArray.filter(_ != 0.0)
      assert(nz.length == 2,
        s"'the' must be idf-zeroed, got ${nz.length} nonzero components")
      nz.foreach(x => assert(math.abs(x - ln2) < 1e-12))
    }
  }
}

package graft.operators

import graft.SparkSpec
import graft.engine.Tables

/** A5 — RandomForest quality classifier invariants (no oracle: tree
  * ensembles are engine-specific). */
class QualityModelSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("forest recovers the deterministic quality gate on training data") {
    val docs = Tables(spark, sf, "documents")
    val acc = QualityModel.trainAccuracy(docs)
    assert(acc >= 0.9, s"training accuracy $acc — the label is a function " +
      "of the features, a sane forest should recover it")
  }

  test("seeded training is deterministic") {
    val docs = Tables(spark, sf, "documents")
    val m1 = QualityModel.train(docs, seed = 42L)
    val m2 = QualityModel.train(docs, seed = 42L)
    val data = QualityModel.featurize(docs)
    val p1 = m1.transform(data).select("doc_id", "prediction")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val p2 = m2.transform(data).select("doc_id", "prediction")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p1 == p2, "same seed, same data → identical predictions")
  }
}

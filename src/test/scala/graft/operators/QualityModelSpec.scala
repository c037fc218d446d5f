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

  test("classificationReport: hand-checked counts, sklearn zero-" +
      "division conventions, F1 from raw counts") {
    import spark.implicits._
    // confusion: label→pred — (0,0)×3 (0,1)×1 (1,1)×2 (1,0)×1 (1,2)×1
    val scored = Seq((0, 0), (0, 0), (0, 0), (0, 1),
      (1, 1), (1, 1), (1, 0), (1, 2)).toDF("label", "prediction")
    val rep = QualityModel.classificationReport(scored, "label", "prediction")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // class 0: tp=3 support=4 pred=4 → P=R=F1=0.75
    assert(rep(0L) == ((3L, 4L, 4L, 0.75, 0.75, 0.75)), s"got ${rep(0L)}")
    // class 1: tp=2 support=4 pred=3 → P=2/3 R=1/2 F1=4/7, all
    // floor-rounded to 4 decimals
    assert(rep(1L) == ((2L, 4L, 3L, 0.6667, 0.5, 0.5714)), s"got ${rep(1L)}")
    // class 2 never labeled: recall 0 by convention (zero_division=0),
    // precision 0 (no tp), support 0
    assert(rep(2L) == ((0L, 0L, 1L, 0.0, 0.0, 0.0)), s"got ${rep(2L)}")
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

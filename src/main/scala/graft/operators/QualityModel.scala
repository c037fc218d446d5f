package graft.operators

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A5 — the reference imports `RandomForestClassifier` but never
  * executes it (`data_science.ipynb` cell 2 imports); here it is a real
  * trained model: a document-quality classifier over the X3 text
  * features (char length, token count, type-token ratio), labeled by
  * the deterministic quality gate (q23) — the standard bootstrap for a
  * learned quality filter in a training-data pipeline (heuristic gate →
  * model that generalizes it).
  *
  * Scale: `fit` is a Spark ML job (distributed tree building); scoring
  * is a per-row `transform` — both shapes survive 100×.
  */
object QualityModel {

  def featurize(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val feat = docs.select(col("doc_id"), col("n_chars").cast("double").as("f_chars"),
      size(toks).cast("double").as("f_tokens"),
      TextAnalysis.typeTokenRatio(toks).as("f_ttr"),
      (col("n_chars") >= 150 && col("n_chars") <= 400 &&
        size(toks) >= 30).cast("double").as("label"))
    new VectorAssembler()
      .setInputCols(Array("f_chars", "f_tokens", "f_ttr"))
      .setOutputCol("features")
      .transform(feat)
  }

  def train(docs: DataFrame, seed: Long = 42L): RandomForestClassificationModel =
    trainOn(featurize(docs), seed)

  /** Fit on an ALREADY-FEATURIZED frame — callers that also score the
    * same frame should featurize once (and cache) rather than let
    * [[train]] re-derive it. */
  def trainOn(data: DataFrame, seed: Long = 42L): RandomForestClassificationModel =
    new RandomForestClassifier()
      .setNumTrees(20).setSeed(seed)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(data)

  /** Training-set accuracy — the label is a deterministic function of
    * the features, so a sane forest should recover it almost exactly. */
  def trainAccuracy(docs: DataFrame, seed: Long = 42L): Double = {
    val data = featurize(docs)
    val scored = train(docs, seed).transform(data)
    val agg = scored.agg(
      avg((col("prediction") === col("label")).cast("double"))).collect()(0)
    agg.getDouble(0)
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables
import graft.functions.VectorFns

/** int8 quantization: storage type, reconstruction error bound,
  * quantized-cosine fidelity, and degenerate-input safety. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("codes are genuinely int8 (tinyint array) with scale-bounded " +
      "reconstruction error") {
    val df = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 0.75)),
      (2L, Seq(100.0, -50.0, 25.0, 0.0))).toDF("id", "v")
    val q = Quantize.quantized(df, "v", "codes")
    val codesType = q.schema("codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(codesType == org.apache.spark.sql.types.ByteType,
      s"codes must be tinyint, got $codesType")
    // |x − dequant(quant(x))| ≤ scale/2 component-wise
    val bad = q.select(
      aggregate(
        zip_with(VectorFns.toDouble(col("v")),
          Quantize.dequantize(col("codes"), col("codes_scale")),
          (a, b) => abs(a - b)),
        lit(0.0), (acc, e) => greatest(acc, e)).as("maxerr"),
      col("codes_scale"))
      .filter(col("maxerr") > col("codes_scale") / 2 + lit(1e-12))
      .count()
    assert(bad == 0, "reconstruction error must be ≤ scale/2 per component")
  }

  test("quantized cosine tracks exact cosine within 0.02 on the real " +
      "embedding corpus, and self-similarity stays 1") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Quantize.quantized(e, "embedding", "codes")
    val qv = q.filter(col("vec_id") === 0)
      .select(col("codes").as("qc"),
        VectorFns.toDouble(col("embedding")).as("qx"))
    val worst = q.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(abs(
        Quantize.cosineCodes(col("codes"), col("qc")) -
          VectorFns.cosine(VectorFns.toDouble(col("embedding")), col("qx")))
        .as("err"))
      .agg(max(col("err"))).collect()(0).getDouble(0)
    assert(worst < 0.02, s"quantized cosine drifted $worst from exact")
    val self = q.limit(5)
      .select(round(Quantize.cosineCodes(col("codes"), col("codes")), 6))
      .collect().map(_.getDouble(0))
    assert(self.forall(_ == 1.0))
  }

  test("all-zero vectors quantize to zero codes instead of dividing " +
      "by zero") {
    val df = Seq((1L, Seq(0.0, 0.0, 0.0))).toDF("id", "v")
    val r = Quantize.quantized(df, "v", "codes").collect()(0)
    assert(r.getAs[Double]("codes_scale") == 0.0)
    assert(r.getAs[scala.collection.Seq[Byte]]("codes").forall(_ == 0))
  }

  test("extreme components land exactly on ±127 — never overflow the " +
      "byte range") {
    val df = Seq((1L, Seq(3.0, -3.0, 1.5))).toDF("id", "v")
    val codes = Quantize.quantized(df, "v", "codes")
      .collect()(0).getAs[scala.collection.Seq[Byte]]("codes")
    assert(codes(0) == 127 && codes(1) == -127,
      s"max-magnitude components must hit ±127, got $codes")
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** P3 — Brazilian currency parse: round-trip + coerce-to-NULL contract
  * (`/root/reference/docs/notebooks/data_science.ipynb` cell 2:
  * `pd.to_numeric(errors='coerce')`). The garbage→NULL case is exactly
  * the one Spark 4 ANSI mode breaks with a plain cast — this spec pins
  * the try_cast behavior.
  */
class ParseBRLSpec extends SparkSpec {

  test("parse(format(x)) == x for money values (property)") {
    import spark.implicits._
    val cents = (0 until 400).flatMap(i =>
      Gen.chooseNum(-999999999L, 999999999L)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L + i)))
    val vals = cents.map(c => BigDecimal(c) / 100).distinct
    val df = vals.map(_.toString).toDF("raw")
      .select(col("raw").cast("decimal(18,2)").as("x"))
    val bad = df.select(col("x"),
        TextFns.parseBRL(TextFns.formatBRL(col("x"))).as("rt"))
      .filter(col("x") =!= col("rt") || col("rt").isNull)
      .collect()
    assert(bad.isEmpty, s"round-trip failed for: ${bad.take(5).mkString(", ")}")
  }

  test("well-formed reference formats parse exactly") {
    import spark.implicits._
    val cases = Seq(
      "R$ 1.234,56" -> "1234.56",
      "R$1.234.567,89" -> "1234567.89",
      "  R$ 0,01  " -> "0.01",
      "1234,5" -> "1234.5",
      "-R$ 10,00" -> "-10.00")
    val df = cases.map(_._1).toDF("raw")
      .select(col("raw"), TextFns.parseBRL(col("raw")).as("v"))
    val got = df.collect().map(r => r.getString(0) -> Option(r.getDecimal(1)))
    cases.zip(got).foreach { case ((raw, want), (_, v)) =>
      // scala BigDecimal == is scale-insensitive (compareTo-based)
      assert(v.map(BigDecimal(_)) == Some(BigDecimal(want)),
        s"'$raw' parsed to $v, want $want")
    }
  }

  test("garbage coerces to NULL, never throws (ANSI-mode regression)") {
    import spark.implicits._
    val garbage = Seq("abc", "R$ ", "", "12,34,56", "1.2.3,4,5", "NaN-ish R$x")
    val out = garbage.toDF("raw")
      .select(TextFns.parseBRL(col("raw")).as("v"))
      .collect()   // would throw CAST_INVALID_INPUT with a plain ANSI cast
    assert(out.forall(_.isNullAt(0)),
      s"expected all NULL, got: ${out.mkString(", ")}")
  }

  test("codegen'd expression agrees with the regexp chain on money and garbage") {
    import spark.implicits._
    val gen = org.scalacheck.Gen.oneOf(
      org.scalacheck.Gen.chooseNum(-99999999L, 99999999L)
        .map(c => f"R$$ ${c / 100.0}%,.2f".replace(',', '_')
          .replace('.', ',').replace('_', '.')),
      org.scalacheck.Gen.alphaNumStr.map(_.take(12)),
      org.scalacheck.Gen.oneOf("", " ", "R$", "1.2.3", "1,2,3", "R$ -",
        "  R$ 12,34  ", "1e3", "+5,5", "12R$34", "R"))
    val samples = (0 until 400).flatMap(i =>
      gen(org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(9L + i)))
    val df = samples.toDF("raw").select(col("raw"),
      TextFns.parseBRL(col("raw")).as("expr_path"),
      TextFns.parseBRLBuiltin(col("raw")).as("chain_path"))
    val diff = df.filter(
      !(col("expr_path") <=> col("chain_path"))).collect()
    assert(diff.isEmpty,
      s"paths diverged on: ${diff.take(5).mkString(", ")}")
  }

  test("empty string is NULL, not zero (pandas coerce parity)") {
    import spark.implicits._
    val out = Seq("").toDF("raw").select(TextFns.parseBRL(col("raw"))).collect()
    assert(out.head.isNullAt(0))
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** P1 `normalizar` parity + properties (SURVEY.md §5).
  * Reference semantics: NFKD decompose → drop non-ASCII → strip
  * `[^a-zA-Z0-9\s]` → lowercase
  * (`/root/reference/src/scrapers/aracaju_barra_pirambu_scraper.py:37-43`).
  * Properties use raw ScalaCheck Gen sampling (the scalatest-scalacheck
  * bridge artifact isn't in the offline cache).
  */
class NormalizeTextSpec extends SparkSpec {

  private val ptBr = Gen.listOf(Gen.oneOf(
    ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      "áàâãäéèêëíìîïóòôõöúùûüçñÁÀÂÃÄÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑ" ++
      " .,;:!?()-_/\\$%#@'\"\t"
  )).map(_.mkString)

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => ptBr.apply(
      org.scalacheck.Gen.Parameters.default.withSize(40),
      org.scalacheck.rng.Seed(42L + i)))

  test("normalize is idempotent") {
    samples(300).foreach { s =>
      val once = NormalizeText.normalize(s)
      assert(NormalizeText.normalize(once) == once, s"input: '$s'")
    }
  }

  test("normalize output alphabet is [a-z0-9\\s]") {
    samples(300).foreach { s =>
      assert(NormalizeText.normalize(s).forall(c =>
        c.isDigit || (c >= 'a' && c <= 'z') || c.isWhitespace), s"input: '$s'")
    }
  }

  test("pt-BR reference cases") {
    assert(NormalizeText.normalize("Pétróleo") == "petroleo")
    assert(NormalizeText.normalize("ROYALTIES - Fundo Especial do Petróleo!") ==
      "royalties  fundo especial do petroleo")
    assert(NormalizeText.normalize("Ação Orçamentária (nº 15300000)") ==
      "acao orcamentaria no 15300000")
    assert(NormalizeText.normalize("") == "")
  }

  test("codegen'd expression matches the scala impl and the builtin chain") {
    import spark.implicits._
    val samples = Seq("Pétróleo Açúcar", "FONTE: Royalties/ANP", "já não",
      "1.530.00,00 R$", "ação", "Úmido  çedilha").toDF("s")
    val out = samples.select(
      col("s"),
      TextFns.normalizeText(col("s")).as("expr_path"),
      TextFns.normalizeBuiltin(col("s")).as("builtin_path")).collect()
    out.foreach { r =>
      assert(r.getString(1) == NormalizeText.normalize(r.getString(0)),
        s"expr path diverged for '${r.getString(0)}'")
      assert(r.getString(1) == r.getString(2),
        s"builtin chain diverged for '${r.getString(0)}'")
    }
  }

  test("NULL stays NULL through the expression") {
    import spark.implicits._
    val df = Seq[Option[String]](Some("a"), None).toDF("s")
    val got = df.select(TextFns.normalizeText(col("s"))).collect().map(_.isNullAt(0))
    assert(got.toSeq == Seq(false, true))
  }

  test("P2 detail-key canonicalization builds reference-style column names") {
    // scraped <th> labels → column names (aracaju…scraper.py:183-187):
    // strip, drop ':', collapse NBSP, normalize, spaces → '_'
    assert(TextFns.canonKey("Fonte de Recurso:") == "fonte_de_recurso")
    assert(TextFns.canonKey("  Histórico do Empenho ") == "historico_do_empenho")
    assert(TextFns.canonKey("Nº Processo") == "no_processo")
  }

  test("keyword predicate matches the reference royalty semantics") {
    import spark.implicits._
    val df = Seq(
      "ROYALTIES do Pétróleo", "Fonte 15300000 especial", "Recursos Ordinários"
    ).toDF("fonte")
    val n = df.filter(TextFns.keywordAny(
      TextFns.normalizeText(col("fonte")), TextFns.royaltyTerms)).count()
    assert(n == 2)
  }
}

package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.sources.CsvIngest

/** U1/O1/S5 golden fixture (SURVEY.md §5): monthly CSVs exactly as the
  * reference writes them — `;`-separated, utf-8-sig (BOM), with DRIFTING
  * column sets across months (dynamic detail columns,
  * `aracaju_barra_pirambu_scraper.py:181-205`) — consolidated with
  * pandas-concat semantics (`file_utils.py:31-51`): align by name,
  * missing → NULL, first-seen column order, month-sorted.
  */
class ConsolidateSpec extends SparkSpec {

  /** utf-8-sig: BOM then UTF-8 bytes, as pandas `encoding='utf-8-sig'`
    * writes (`aracaju_barra_pirambu_scraper.py:294`). */
  private def writeSig(p: Path, lines: Seq[String]): Unit =
    Files.write(p, ("﻿" + lines.mkString("\n")).getBytes(StandardCharsets.UTF_8))

  test("drift-tolerant consolidation matches pandas concat semantics") {
    val dir = scratch("consolidate")
    Files.createDirectories(dir)
    // month 01: core columns only
    val m01 = dir.resolve("aracaju_royalties_2024_01.csv")
    writeSig(m01, Seq(
      "orgao;credor;pago",
      "SEMED;Fornecedor Á;R$ 1.000,50",
      "SEMED;Fornecedor B;R$ 2,00"))
    // month 02: drifted — extra dynamic detail column, different order
    val m02 = dir.resolve("aracaju_royalties_2024_02.csv")
    writeSig(m02, Seq(
      "orgao;credor;fonte_de_recurso;pago",
      "SAUDE;Fornecedor C;ROYALTIES Petróleo;R$ 3,33"))

    val df = CsvIngest.consolidate(spark, Seq(m01.toString, m02.toString))

    // first-seen column order: m01's columns, then m02's new one
    assert(df.columns.toSeq == Seq("orgao", "credor", "pago", "fonte_de_recurso"))
    // binary string sort: 'Fornecedor Á' (U+00C1) sorts after B and C
    val rows = df.orderBy("credor").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("Fornecedor B", "Fornecedor C", "Fornecedor Á"))
    // missing column filled with NULL for month-01 rows (pandas NaN)
    assert(rows(0).getString(0) == "SEMED" && rows(0).isNullAt(3))
    assert(rows(1).getString(3) == "ROYALTIES Petróleo")
    assert(rows(2).isNullAt(3))
    // BOM stripped: first header name is clean
    assert(df.columns.head == "orgao")
  }

  test("sniffed read detects each file's separator: a mixed ,/; " +
      "directory parses correctly instead of one-column rows (S5 " +
      "sep=None parity)") {
    val dir = scratch("sniffmix")
    Files.createDirectories(dir)
    // the reference's standardized dialect, BOM'd
    writeSig(dir.resolve("a_2024_01.csv"), Seq(
      "orgao;credor;pago",
      "SEMED;Forn A;R$ 1,00",
      "SEMED;Forn B;R$ 2,00"))
    // a stray comma-dialect month (the pandas sep=None case); quoted
    // values contain BOTH candidates — the sniffer must ignore quoted
    // spans (decimal commas, a ';' in a company name) when counting
    Files.write(dir.resolve("b_2024_02.csv"), Seq(
      "orgao,credor,pago",
      "SAUDE,\"Forn C;Ltd\",\"R$ 3,00\"").mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    // Spark-style metadata noise must be skipped like Spark's listing
    Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray)

    val df = CsvIngest.readSniffed(spark, dir.toString)
    assert(df.columns.take(3).toSeq == Seq("orgao", "credor", "pago"))
    val rows = df.orderBy("credor").collect()
    assert(rows.length == 3, s"got ${rows.length} rows")
    // every row fully parsed — the comma file did NOT collapse into
    // one-column rows under the ';' default
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("SEMED", "Forn A"), ("SEMED", "Forn B"), ("SAUDE", "Forn C;Ltd")),
      s"got ${rows.map(r => (r.getString(0), r.getString(1))).toSeq}")
    assert(rows.forall(!_.isNullAt(2)), "pago parsed for every dialect")
  }

  test("sniffer consistency heuristic: per-line-consistent candidate " +
      "wins over a more frequent but inconsistent one; fallback is ';'") {
    // ',' appears 3×/2× (inconsistent), ';' exactly once per line
    assert(CsvIngest.sniffSep(
      "h1;h2,x,y,z\na;b,c\n", truncated = false) == ";")
    // tie on count → candidate preference order (';' first)
    assert(CsvIngest.sniffSep("a;b\nc;d\n") == ";")
    assert(CsvIngest.sniffSep("a,b\nc,d\n") == ",")
    assert(CsvIngest.sniffSep("a\tb\nc\td\n") == "\t")
    // single-column file: nothing consistent → the standardized ';'
    assert(CsvIngest.sniffSep("header\nv1\nv2\n") == ";")
    // truncated sample: the cut final fragment must not be scored
    assert(CsvIngest.sniffSep("a,b\nc,d\ne,f,g,h,i", truncated = true) == ",")
    // a quoted field containing NEWLINES collapses to one logical
    // line before counting (multi-line CSV records sniff correctly)
    assert(CsvIngest.sniffSep("a,\"multi\nline note\",b\nc,d,e\n") == ",")
  }

  test("consolidate sniffs each monthly file's dialect (the reference " +
      "consolidator's sep=None read): a stray comma month lands " +
      "correctly") {
    val dir = scratch("conssniff")
    Files.createDirectories(dir)
    writeSig(dir.resolve("m01.csv"), Seq(
      "orgao;credor;pago",
      "SEMED;Forn A;R$ 1,00"))
    // a stray comma-dialect month, quoted money (the pandas sep=None
    // case the reference consolidator handles per file)
    Files.write(dir.resolve("m02.csv"), Seq(
      "orgao,credor,pago",
      "SAUDE,Forn B,\"R$ 2,00\"").mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    val df = CsvIngest.consolidate(spark,
      Seq(dir.resolve("m01.csv").toString, dir.resolve("m02.csv").toString))
    assert(df.columns.toSeq == Seq("orgao", "credor", "pago"))
    val rows = df.orderBy("credor").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("SEMED", "Forn A", "R$ 1,00"), ("SAUDE", "Forn B", "R$ 2,00")),
      s"got ${rows.toSeq}")
  }

  test("sniffed read groups same-separator files by HEADER too: " +
      "reordered columns land by name, never by position") {
    val dir = scratch("sniffhdr")
    Files.createDirectories(dir)
    writeSig(dir.resolve("a.csv"), Seq(
      "orgao;credor;pago",
      "SEMED;Forn A;R$ 1,00"))
    // same ';' dialect, REORDERED header — a single multi-path scan
    // would map these columns positionally against a.csv's schema
    writeSig(dir.resolve("b.csv"), Seq(
      "credor;orgao;pago",
      "Forn B;SAUDE;R$ 2,00"))
    val rows = CsvIngest.readSniffed(spark, dir.toString)
      .orderBy("credor").collect()
    assert(rows.length == 2)
    val byCredor = rows.map(r => r.getAs[String]("credor") ->
      r.getAs[String]("orgao")).toMap
    assert(byCredor == Map("Forn A" -> "SEMED", "Forn B" -> "SAUDE"),
      s"columns mis-aligned across reordered headers: $byCredor")
  }

  test("permissive read keeps bad lines in the corrupt column instead of failing") {
    val dir = scratch("permissive")
    Files.createDirectories(dir)
    val f = dir.resolve("bad.csv")
    // second data line has an unclosed quote — pandas would warn+skip;
    // PERMISSIVE keeps the parsed prefix and the raw text in _corrupt.
    writeSig(f, Seq(
      "a;b",
      "1;x",
      "2;\"unclosed",
      "3;y"))
    val df = graft.sources.CsvIngest.read(spark, f.toString)
    assert(df.columns.contains(CsvIngest.CorruptCol))
    val n = df.count()
    assert(n >= 3, s"rows should survive a bad line, got $n")
  }

  test("BOM-emitting write roundtrips losslessly (utf-8-sig write parity)") {
    import spark.implicits._
    val dir = scratch("bomwrite").resolve("out").toString
    val df = Seq(("SEMED", "R$ 1,00"), ("SAUDE", "R$ 2,50"))
      .toDF("orgao", "pago")
    CsvIngest.write(df.coalesce(1), dir, bom = true)
    // byte-level: every part file starts with EF BB BF (what pandas'
    // encoding='utf-8-sig' writes — scraper parity)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    assert(parts.nonEmpty)
    parts.foreach { f =>
      val head = Files.readAllBytes(f.toPath).take(3)
      assert(head.sameElements(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)),
        s"${f.getName} must start with the UTF-8 BOM")
    }
    // roundtrip: the tolerant reader strips the BOM → identical schema
    // and rows
    val back = CsvIngest.read(spark, dir).drop(CsvIngest.CorruptCol)
    assert(back.columns.toSeq == Seq("orgao", "pago"))
    assert(back.orderBy("orgao").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("SAUDE", "R$ 2,50"), ("SEMED", "R$ 1,00")))
  }

  test("plain comma CSV reads through the same tolerant reader (S6)") {
    val dir = scratch("comma")
    Files.createDirectories(dir)
    val f = dir.resolve("analysis_input.csv")
    // the analysis notebook's default-separator read (data_science.ipynb
    // cell 2): comma, no BOM
    Files.write(f, "descricao,valor\nroyalty x,\"1,5\"\n".getBytes("UTF-8"))
    val df = CsvIngest.read(spark, f.toString, sep = ",")
    assert(df.columns.take(2).toSeq == Seq("descricao", "valor"))
    val r = df.collect()(0)
    assert(r.getString(0) == "royalty x" && r.getString(1) == "1,5")
  }

  test("glob read selects a year's months by filename wildcard (F6)") {
    val dir = scratch("glob")
    Files.createDirectories(dir)
    writeSig(dir.resolve("city_royalties_2024_01.csv"), Seq("a;b", "1;x"))
    writeSig(dir.resolve("city_royalties_2024_02.csv"), Seq("a;b", "2;y"))
    writeSig(dir.resolve("city_royalties_2023_12.csv"), Seq("a;b", "9;z"))
    // the reference's month-wildcard year pin (file_utils.py:22-23)
    val df = CsvIngest.read(spark, s"$dir/city_royalties_2024_??.csv")
    assert(df.count() == 2)
    assert(df.select("a").collect().map(_.getString(0)).toSet == Set("1", "2"))
  }

  test("positional union would mis-align drifted schemas (why unionByName)") {
    import spark.implicits._
    val a = Seq(("x", 1)).toDF("name", "value")
    val b = Seq((2, "y")).toDF("value", "name")
    val good = Consolidate(Seq(a, b)).orderBy("value").collect()
    assert(good.map(_.getAs[String]("name")).toSeq == Seq("x", "y"))
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-5 pipeline operators: decontamination, deterministic sampling,
  * domain mixing, repetition stats, chunking, PII redaction. The gate
  * oracle-checks each against DuckDB on the synthetic corpus (q57–q63);
  * these specs pin the SEMANTIC edge cases small SF data can't reach. */
class PipelineOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decontaminate: flags exactly the docs sharing an n-gram span " +
      "with the benchmark, and clean() drops them") {
    val bench = docs(100L -> "a b c d e f g h unique bench tail")
    val corpus = docs(
      1L -> "x a b c d e f g h y",       // shares the 8-gram a..h
      2L -> "completely different words here no overlap at all",
      3L -> "a b c d e f g QQ h")        // breaks the run: no shared 8-gram
    val hits = Decontaminate.overlapHits(corpus, bench, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L))
    val kept = Decontaminate.clean(corpus, bench, "doc_id", "text", 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("decontaminate degrades broadcast → shuffled join with identical " +
      "results (the giant-benchmark regime)") {
    // the operator's scale claim: when the benchmark shingle set exceeds
    // the broadcast threshold, the SAME plan falls back to a shuffled
    // join on the shingle key — prove result identity, not just hope
    val bench = docs(100L -> "a b c d e f g h unique bench tail")
    val corpus = docs(
      1L -> "x a b c d e f g h y",
      2L -> "completely different words here no overlap at all")
    def run() = Decontaminate.overlapHits(corpus, bench, "doc_id", "text", 8)
    val broadcastHits = run().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      val df = run()
      val shuffled = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(shuffled == broadcastHits,
        "shuffled-join fallback must be result-identical to broadcast")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"broadcast disabled but plan still broadcasts:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("decontaminate: short documents (< n tokens) never match") {
    val bench = docs(100L -> "a b c")
    val corpus = docs(1L -> "a b c")
    assert(Decontaminate.overlapHits(corpus, bench, "doc_id", "text", 8)
      .count() == 0)
  }

  test("md5 sampling is a pure function of the id: stable across " +
      "repartitionings and row order") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val a = Sampling.stratifiedCounts(
      ids.withColumn("s", lit("x")), "id", "s", "1a")
      .collect()(0)
    val b = Sampling.stratifiedCounts(
      ids.repartition(13).orderBy(col("id").desc).withColumn("s", lit("x")),
      "id", "s", "1a")
      .collect()(0)
    assert(a.getLong(1) == 2000 && a.getLong(2) == b.getLong(2))
    // 26/256 of the hash space ≈ 10.16%; 2000 draws concentrate hard
    assert(a.getLong(2) > 120 && a.getLong(2) < 290,
      s"sample rate wildly off: ${a.getLong(2)}/2000")
  }

  test("reservoirPerStratum: exactly k per stratum, stable under " +
      "repartitioning, and existing picks survive corpus growth") {
    import spark.implicits._
    val base = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "st")
    def pick(df: org.apache.spark.sql.DataFrame) =
      Sampling.reservoirPerStratum(df, "id", "st", 4)
        .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val a = pick(base)
    assert(a.size == 12 && a.groupBy(_._1).forall(_._2.size == 4))
    assert(pick(base.repartition(13).orderBy(col("id").desc)) == a)
    // growing the corpus can displace picks ONLY via new ids winning
    // the md5 order — picks are still drawn deterministically, and
    // every surviving old id keeps its membership decision
    val grown = pick(base.union(
      (300L until 400L).map(i => (i, s"s${i % 3}")).toDF("id", "st")))
    assert(grown.size == 12)
    assert((grown -- a).forall(_._2 >= 300L),
      "only new ids may enter the reservoir")
  }

  test("domainMix: weighted fractions sum to 1 and scale with weight") {
    import spark.implicits._
    val d = Seq(("d1", 100L), ("d2", 100L), ("d3", 200L))
      .toDF("domain", "n_toks")
    val mix = Sampling.domainMix(d, "domain", col("n_toks"),
        when(col("domain") === "d1", lit(3.0)).otherwise(lit(1.0)))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // effective: d1=300, d2=100, d3=200 → total 600
    assert(mix("d1") == 0.5 && mix("d2") == math.rint(1e6 / 6) / 1e6 &&
      mix("d3") == math.rint(2e6 / 6) / 1e6)
    assert(math.abs(mix.values.sum - 1.0) < 1e-4)
  }

  test("repetitionStats: looping text scores high, diverse text zero; " +
      "single-token doc has no 2-grams") {
    val out = TextAnalysis.repetitionStats(docs(
        1L -> "spam spam spam spam",   // 3 identical 2-grams, top tok 4/4
        2L -> "all words differ here", // no repeats
        3L -> "one"),                  // 0 2-grams → dup frac 0.0
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4, math.rint((1.0 - 1.0 / 3) * 1e4) / 1e4, 1.0)))
    assert(out(2L) == ((4, 0.0, 0.25)))
    assert(out(3L) == ((1, 0.0, 1.0)))
  }

  test("chunkSpans: exact boundary, one-over, and short-doc cases") {
    def spans(nTokens: Int) = {
      val text = (1 to nTokens).map(i => s"t$i").mkString(" ")
      TextAnalysis.chunkSpans(docs(1L -> text), "doc_id", "text",
          chunkSize = 50, stride = 40)
        .orderBy("chunk_id")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    assert(spans(10).toSeq == Seq((0L, 0L, 10L)))
    assert(spans(50).toSeq == Seq((0L, 0L, 50L)))
    assert(spans(51).toSeq == Seq((0L, 0L, 50L), (1L, 40L, 11L)))
    assert(spans(130).toSeq ==
      Seq((0L, 0L, 50L), (1L, 40L, 50L), (2L, 80L, 50L)))
    // every token index < n is covered by some chunk
    val cover = spans(97).flatMap { case (_, s, l) => s until (s + l) }.toSet
    assert(cover == (0L until 97L).toSet)
  }

  test("chunkSpans covers every token exactly once per non-overlap " +
      "region for ALL doc lengths 1..300 (property sweep)") {
    import spark.implicits._
    val (size, stride) = (50, 40)
    val corpus = (1 to 300).map(n =>
      (n.toLong, (1 to n).map(i => "t").mkString(" "))).toDF("doc_id", "text")
    val spans = TextAnalysis.chunkSpans(corpus, "doc_id", "text",
        size, stride)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (n, rows) =>
        n -> rows.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1) }
    (1 to 300).foreach { n =>
      val s = spans(n.toLong)
      // full coverage, no gaps, no out-of-range, stride respected
      assert(s.head._1 == 0L)
      assert(s.flatMap { case (st, len) => st until (st + len) }.toSet ==
        (0L until n.toLong).toSet, s"coverage hole at n=$n")
      s.foreach { case (st, len) =>
        assert(len >= 1 && len <= size && st % stride == 0,
          s"bad span ($st,$len) at n=$n") }
      assert(s.map(_._1).distinct.length == s.length)
    }
  }

  test("redactPII scrubs emails before digit runs (email digits never " +
      "leak as <NUM>) and leaves clean text untouched") {
    import spark.implicits._
    val out = Seq(
        "reach me9@host99.com or 555-0100 x42",
        "no pii here at all")
      .toDF("t")
      .select(TextAnalysis.redactPII(col("t")))
      .collect().map(_.getString(0))
    assert(out(0) == "reach <EMAIL> or <NUM>-<NUM> x<NUM>")
    assert(out(1) == "no pii here at all")
  }

  test("selectToTokenBudget: whole high-score groups kept, boundary " +
      "group part-filled, budget respected within one doc") {
    import spark.implicits._
    // score 3: 10 tokens; score 2: 3 docs x 10; score 1: 10
    val df = Seq(
      (1L, 3L, 10L),
      (2L, 2L, 10L), (3L, 2L, 10L), (4L, 2L, 10L),
      (5L, 1L, 10L)
    ).toDF("doc_id", "score", "n_tokens")
    val sel = Sampling.selectToTokenBudget(df, "doc_id", "score",
        "n_tokens", budget = 25L)
      .collect().map(_.getLong(0)).toSet
    // score-3 group (10) fits; boundary score-2 group fills to the
    // 25-token line: 2 of its 3 docs (the second starts at 20 < 25,
    // a third would start at 30). Score-1 group starts at 40 — out.
    assert(sel.contains(1L) && !sel.contains(5L), s"got $sel")
    assert(sel.size == 3, s"got $sel")
    val total = Sampling.selectToTokenBudget(df, "doc_id", "score",
        "n_tokens", budget = 25L)
      .agg(org.apache.spark.sql.functions.sum("n_tokens"))
      .collect()(0).getLong(0)
    assert(total == 30L, s"overshoot must be at most one doc, got $total")
    // budget larger than the corpus keeps everything
    val all = Sampling.selectToTokenBudget(df, "doc_id", "score",
        "n_tokens", budget = 1000L).count()
    assert(all == 5L)
  }

  test("temperatureMixSqrt: sqrt-flattened allocation favors the tail " +
      "relative to raw counts, caps at source size, deterministic") {
    import spark.implicits._
    // head-heavy: src a has 64 docs, src b has 10 — raw share 6.4:1,
    // sqrt share 8:3.16 ≈ 2.5:1 (the flattening)
    val docs = ((1L to 64L).map(i => (i, "a")) ++
      (65L to 74L).map(i => (i, "b"))).toDF("doc_id", "source")
    val sel = Sampling.temperatureMixSqrt(docs, "doc_id", "source",
        targetTotal = 30L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("source")))
    val bySrc = sel.groupBy(_._2).view.mapValues(_.length).toMap
    // w_fp(a)=8e7, w_fp(b)=31622777, sum 111622777;
    // a: floor(30*8e7/sum)=21, b: floor(30*w_b/sum)=8 — vs the
    // raw-proportional 25/4 split
    assert(bySrc == Map("a" -> 21, "b" -> 8), s"got $bySrc")
    // rerun is identical (pure function of ids)
    val again = Sampling.temperatureMixSqrt(docs, "doc_id", "source",
        targetTotal = 30L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("source")))
    assert(sel.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a tiny source is never over-allocated past its own size
    val capped = Sampling.temperatureMixSqrt(docs, "doc_id", "source",
        targetTotal = 200L)
      .collect().count(_.getAs[String]("source") == "b")
    assert(capped == 10, s"got $capped")
  }

  test("epochMix: cap forfeits the remainder, below-cap sources fill " +
      "greedily with at-most-one-doc overshoot") {
    import spark.implicits._
    // source a: 3 docs x 10 tokens (c=30); source b: 2 docs x 100
    // (c=200). target 200 over 2 sources -> t_share 100 each.
    val d = (Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L),
      (10L, "b", 100L), (11L, "b", 100L)))
      .toDF("doc_id", "source", "n_tokens")
    val out = Sampling.epochMix(d, "doc_id", "source", "n_tokens",
        targetTokens = 200L, maxEpochs = 3)
      .orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      // a: 100 div 30 = 3 = cap -> epochs 3, remainder (10) FORFEIT:
      // no fill even though a 10-token doc would fit
      ("a", 3L, 30L, 3L, 0L, 0L, 90L),
      // b: 100 div 200 = 0 epochs, leftover 100 -> exactly one
      // 100-token doc fills (the second would start at 100, not < 100)
      ("b", 2L, 200L, 0L, 1L, 100L, 100L)), s"got ${out.toSeq}")
    // fill is md5-rank greedy with the selectToTokenBudget overshoot
    // rule: for b, t_share 150 gives 0 epochs (< cap 1) and leftover
    // 150 — the second 100-token doc starts at 100 < 150, so it is
    // admitted and the fill overshoots by at most that one doc
    val over = Sampling.epochMix(d, "doc_id", "source", "n_tokens",
        targetTokens = 300L, maxEpochs = 1)
      .filter(col("source") === "b")
      .collect().map(r => (r.getLong(4), r.getLong(6))).head
    assert(over == ((2L, 200L)), s"got $over")
  }
}

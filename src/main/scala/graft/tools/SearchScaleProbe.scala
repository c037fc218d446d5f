package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.TextAnalysis

/** Empirical ×m scaling probe for the round-13 search family —
  * synonym / dismax / boosted boolean / completion over the segmented
  * index, BM25F over the scan path, and percolation over a stored
  * query table. Claims pinned:
  *
  *   - synonym / dismax / boosted boolean ride [[TextAnalysis
  *     .liveScoring]]'s pushed `term IN` posting scan → walls should
  *     stay ~FLAT under `tagged` inflation (corpus ×m, probed posting
  *     lists copy-0-sized) and grow with LIST length under `plain`;
  *   - completion expands against the vocabulary-sized term
  *     dictionary → prefix-band-bounded, the spellSuggest economics;
  *   - BM25F is scan-path by design: one tokenize pass per field —
  *     the wall is expected ~LINEAR in corpus either mode (reported
  *     to pin the honest cost class, not flatness);
  *   - percolation pays ONE distinct-token pass over the doc batch;
  *     the stored-query axis rides a broadcast fan-out → the wall
  *     should be ~FLAT in |queries| at fixed corpus (second loop).
  *
  * Layouts mirror PositionalScaleProbe: 2 segments, ~2% tombstones.
  * Usage: runMain graft.tools.SearchScaleProbe [sfDir] [mults]
  */
object SearchScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,10,20")
      .split(',').map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def run(body: => org.apache.spark.sql.DataFrame): Double = {
      def go() = graft.engine.Caching.scoped {
        body.write.format("noop").mode("overwrite").save()
      }
      go() // warm the reader paths once per layout
      timed(go())
    }

    for (m <- mults; mode <- Seq("tagged", "plain")) {
      val corpus = graft.engine.Caching.cached(
        (if (mode == "tagged")
          CompositionScaleProbe.inflateWithSource(docs, m)
        else
          docs.crossJoin(spark.range(m.toLong).toDF("copy"))
            .select((col("doc_id") * m + col("copy")).as("doc_id"),
              col("text")))
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text")))
      corpus.count()
      val dir = java.nio.file.Files
        .createTempDirectory(s"srchprobe_${mode}_$m").toString
      TextAnalysis.bm25AppendSegment(
        corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text", dir, 0)
      val dead = corpus.filter(col("doc_id") % 2 === 0 &&
          col("doc_id") % 50 === 2)
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"))
      TextAnalysis.bm25Tombstone(dead, "doc_id", "dl", dir, 1)
      TextAnalysis.bm25AppendSegment(
        corpus.filter(col("doc_id") % 2 === 1), "doc_id", "text", dir, 1)
      val tag = if (mode == "tagged") "_0" else ""
      val tSyn = run(TextAnalysis.synonymSearch(spark, dir,
        Seq(Seq(s"scan$tag", s"seek$tag"), Seq(s"merge$tag")), 15,
        "doc_id"))
      val tDis = run(TextAnalysis.disMaxSearch(spark, dir,
        Seq(Seq(s"sort$tag", s"merge$tag"), Seq(s"scan$tag", s"sort$tag")),
        0.3, 15, "doc_id"))
      val tBoost = run(TextAnalysis.booleanSearch(spark, dir, Nil,
        Seq(s"query$tag", s"filter$tag"), Nil, 15, "doc_id",
        boosts = Map(s"query$tag" -> 3.0)))
      val tCompl = run(TextAnalysis.completionSuggest(spark, dir,
        "st", 8, "doc_id", maxExpansion = 1000000))
      // BM25F scan path: deterministic title/body split, 2-query panel
      val toks = split(col("text"), " ")
      val fielded = corpus.select(col("doc_id"),
        array_join(slice(toks, 1, 4), " ").as("title"),
        array_join(slice(toks, 5, 1000000), " ").as("body"))
      val panel = Seq((0L, s"table$tag scan$tag"),
        (1L, s"merge$tag sort$tag")).toDF("qid", "qtext")
      val tBm25f = run(TextAnalysis.bm25fTopK(fielded, "doc_id",
        Seq(("title", 2.0, 0.4), ("body", 1.0, 0.75)), panel, 12))
      println(f"SRCH m=$m%-3d mode=$mode%-6s syn=$tSyn%5.2f s " +
        f"dismax=$tDis%5.2f s boost=$tBoost%5.2f s " +
        f"compl=$tCompl%5.2f s bm25f=$tBm25f%5.2f s")
      spark.catalog.clearCache()
    }

    // percolation: the |queries| axis at fixed corpus (broadcast
    // fan-out claim), then the corpus axis at fixed queries
    val vocab = Seq("sort", "merge", "scan", "query", "filter", "slow",
      "fast", "window", "stream", "batch", "table", "join", "hash",
      "row", "value", "key", "agg", "part", "small", "big")
    def storedQueries(n: Int) = (0 until n).map { i =>
      (i.toLong, Seq(vocab(i % vocab.size), vocab((i / 2 + 3) % vocab.size)),
        Seq(vocab((i / 3 + 7) % vocab.size)).filterNot(t =>
          t == vocab(i % vocab.size) || t == vocab((i / 2 + 3) % vocab.size)))
    }.toDF("query_id", "must", "must_not")
    val base = graft.engine.Caching.cached(
      docs.select(col("doc_id"), col("text")))
    base.count()
    for (nq <- Seq(4, 40, 400)) {
      val t = run(TextAnalysis.percolate(base, "doc_id", "text",
        storedQueries(nq)))
      println(f"PERC corpus=x1  queries=$nq%-4d t=$t%5.2f s")
    }
    for (m <- mults) {
      val big = graft.engine.Caching.cached(
        docs.crossJoin(spark.range(m.toLong).toDF("copy"))
          .select((col("doc_id") * m + col("copy")).as("doc_id"),
            col("text")))
      big.count()
      val t = run(TextAnalysis.percolate(big, "doc_id", "text",
        storedQueries(40)))
      println(f"PERC corpus=x$m%-2d queries=40   t=$t%5.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

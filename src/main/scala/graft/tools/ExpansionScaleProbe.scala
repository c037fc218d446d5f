package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.TextAnalysis

/** Empirical ×m scaling probe for the DICTIONARY-EXPANSION query
  * family (fuzzy / wildcard / facets — round 13): corpus inflated ×m
  * with tagged tokens ([[CompositionScaleProbe.inflateWithSource]]),
  * which grows the VOCABULARY ×m — the expansion step's own worst
  * case, since fuzzy and wildcard pay a distinct over the term
  * dictionary before any posting is read. Tagged tokens also make the
  * expansion RESULT grow with m (`sort_0`~1 matches every `sort_i`
  * with i < 10; `sort*` matches all m tags), so the posting-probe leg
  * scales too — the probe separates the two legs:
  *
  *   - dictionary wall: the vocabulary-sized distinct alone
  *     (count of distinct terms, timed) — expected linear in m;
  *   - fuzzy wall: expansion + posting probe for a 1-edit term;
  *   - wildcard walls: a prefix-banded pattern (parquet stats prune
  *     the term-sorted layout to the prefix range) vs a leading-`*`
  *     pattern (full dictionary pass) — the Lucene economics the
  *     operator scaladoc claims, with numbers;
  *   - facet wall: posting-bounded membership + one attribute join.
  *
  * Pass criteria: dictionary and leading-`*` walls ~linear in m;
  * prefix-banded wildcard and fuzzy walls dominated by their
  * expansion counts (posting-bounded probe leg), facet wall ~flat in
  * m at fixed match cardinality.
  * Usage: runMain graft.tools.ExpansionScaleProbe [sfDir] [mults]
  */
object ExpansionScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,5,10,20")
      .split(',').map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (m <- mults) {
      val corpus = graft.engine.Caching.cached(
        CompositionScaleProbe.inflateWithSource(docs, m)
          .select(col("doc_id"), col("source"),
            coalesce(col("text"), lit("")).as("text")))
      corpus.count()
      val dir = java.nio.file.Files
        .createTempDirectory(s"expprobe_$m").toString
      val (_, tBuild) = timed {
        TextAnalysis.bm25AppendSegment(corpus, "doc_id", "text", dir, 0)
      }
      // dictionary leg alone: the vocabulary-sized distinct
      val (vocab, tDict) = timed {
        spark.read.parquet(s"$dir/postings")
          .select(col("term")).distinct().count()
      }
      def run(label: String)(body: => org.apache.spark.sql.DataFrame)
          : (Long, Double) = {
        def go() = graft.engine.Caching.scoped {
          body.write.format("noop").mode("overwrite").save()
        }
        go() // warm reader paths once per layout
        val cnt = graft.engine.Caching.scoped { body.count() }
        val (_, t) = timed(go())
        (cnt, t)
      }
      val cap = 1000000 // unbounded for the probe: measure, don't trip
      val (nFuzzy, tFuzzy) = run("fuzzy") {
        TextAnalysis.fuzzyTermSearch(spark, dir, "sort_0", 1,
          "doc_id", cap)
      }
      val (nPre, tPre) = run("wild-prefix") {
        TextAnalysis.wildcardTermSearch(spark, dir, "sort*",
          "doc_id", cap)
      }
      val (nStar, tStar) = run("wild-leading") {
        TextAnalysis.wildcardTermSearch(spark, dir, "*t_7",
          "doc_id", cap)
      }
      val (nFacet, tFacet) = run("facets") {
        TextAnalysis.searchFacets(spark, dir,
          Seq("query_0", "scan_0"), corpus, "doc_id", Seq("source"))
      }
      println(f"EXP m=$m%-3d vocab=$vocab%7d build=$tBuild%6.1f s " +
        f"dict=$tDict%5.2f s | fuzzy=$tFuzzy%5.2f s ($nFuzzy%d rows) " +
        f"wildPre=$tPre%5.2f s ($nPre%d) wildStar=$tStar%5.2f s " +
        f"($nStar%d) facets=$tFacet%5.2f s ($nFacet%d)")
      corpus.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

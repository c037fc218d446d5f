package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.TextAnalysis

/** Empirical ×m scaling probe for the POSITIONAL query family (r12
  * verdict stretch): pins the "posting-bounded, never corpus-bounded"
  * claim for phrase/proximity/prefix over the segmented layout with
  * numbers, by growing the corpus two ways:
  *
  *   - `tagged`: [[CompositionScaleProbe.inflateWithSource]] suffixes
  *     every token per copy, so the corpus (and vocabulary) grows ×m
  *     while the PROBED terms' posting lists stay copy-0-sized —
  *     phrase and proximity walls should stay ~FLAT in m (the claim);
  *   - `plain`: copies keep the original tokens, so the probed
  *     posting lists themselves grow ×m — walls should grow with
  *     LIST length, the honest cost driver.
  *
  * Each layout is 2 segments with ~2% tombstones on segment 0 (the
  * live kill-rule join in the path, as deployed). Prefix is reported
  * for completeness: its IO is the matched TERM RANGE, which grows
  * ×m under tagging (st* matches every copy's tokens) — range-
  * bounded, not corpus-bounded, and the numbers show exactly that.
  * Usage: runMain graft.tools.PositionalScaleProbe [sfDir] [mults]
  */
object PositionalScaleProbe {
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
        .createTempDirectory(s"posprobe_${mode}_$m").toString
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
      def run(body: => org.apache.spark.sql.DataFrame): Double = {
        def go() = graft.engine.Caching.scoped {
          body.write.format("noop").mode("overwrite").save()
        }
        go() // warm the reader paths once per layout
        timed(go())
      }
      val tPhrase = run(TextAnalysis.phraseSearch(spark, dir,
        Seq(s"sort$tag", s"merge$tag"), "doc_id"))
      val tProx = run(TextAnalysis.proximitySearch(spark, dir,
        Seq(s"query$tag", s"table$tag", s"join$tag"), 6L, "doc_id"))
      // ordered-near shares proximity's event-fold shape plus the
      // per-event chain-start transform — same posting-bounded claim
      val tONear = run(TextAnalysis.orderedNearSearch(spark, dir,
        Seq(s"slow$tag", s"query$tag"), 6L, "doc_id"))
      val tPrefix = run(TextAnalysis.termPrefixSearch(spark, dir,
        "st", "doc_id"))
      println(f"POS m=$m%-3d mode=$mode%-6s phrase=$tPhrase%5.2f s " +
        f"prox=$tProx%5.2f s onear=$tONear%5.2f s " +
        f"prefix=$tPrefix%5.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

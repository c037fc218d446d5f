package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Dedup
import graft.operators.TextAnalysis

/** Empirical scaling probe for the dedup family (round-8 verdict item:
  * the 100 TB claims are design arguments — buy one measured point).
  * The sf0.1 documents table is synthetically inflated ×m by stacking
  * m copies whose every TOKEN carries a per-copy tag — cross-copy
  * shingles/chunk digests are disjoint, so near-dup DENSITY per row is
  * preserved (stacking untagged copies would instead plant m-cliques
  * of exact dups everywhere and measure a different corpus, not a
  * bigger one). Pipelines measured end-to-end through the noop sink:
  *
  *   - q26 shape: df-capped shingle-join jaccard pairs
  *   - q39 shape: jaccard pairs → pointer-jumping connected components
  *   - q80 shape: chunk-level exact dedup with per-doc accounting
  *   - q98/q99 shape: positional-shingle shared-span runs + coverage
  *
  * Near-linear wall-clock in m is the pass criterion (the df-cap and
  * the banded/blocked joins exist to keep per-row work flat).
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [multipliers]
  */
object ScaleProbe {

  /** Stack m copies of (doc_id, text) with per-copy token tags:
    * cross-copy shingles/chunk digests are disjoint, so near-dup
    * density per row matches the original corpus. */
  def inflate(docs: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        concat_ws(" ",
          transform(split(coalesce(col("text"), lit("")), " "),
            t => concat(t, lit(s"_$i")))).as("text"))
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,2,5,10")
      .split(',').map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def inflated(m: Int): DataFrame = ScaleProbe.inflate(docs, m)

    def time(label: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.engine.Caching.scoped {
        df.write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label: $dt%.2f s")
      dt
    }

    mults.foreach { m =>
      val d = inflated(m)
      val rows = d.count()
      println(s"-- x$m ($rows docs)")
      time(f"x$m q26_jaccard ", TextAnalysis.jaccardPairs(
        d, "doc_id", "text", n = 3, minJaccard = 0.5))
      time(f"x$m q39_components", Dedup.connectedComponents(
        TextAnalysis.jaccardPairs(d, "doc_id", "text", n = 3,
          minJaccard = 0.5)))
      time(f"x$m q80_chunks  ", Dedup.chunkDedupStats(
        d, "doc_id", "text", chunkSize = 20))
      time(f"x$m q98_spans   ", Dedup.sharedSpans(
        d, "doc_id", "text", n = 4, minSpan = 10))
      time(f"x$m q99_coverage", Dedup.spanCoverage(
        d, "doc_id", "text", n = 4, minSpan = 10))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.TextAnalysis

/** Write-amplification probe for [[TextAnalysis.bm25MergeSegmentsTiered]]
  * (r11 verdict item 5): 16 equal appends under three maintenance
  * policies —
  *
  *   - `tiered`: bm25MergeSegmentsTiered(maxSegments = 4) after every
  *     append (the Lucene-ish steady state);
  *   - `full`: bm25MergeSegments after every append (correct but
  *     O(index) per merge — the shape the tiered variant exists to
  *     avoid);
  *   - `none`: never merge (1× writes, but the probe pays the
  *     |segments| tombstone-join + stats-partials tax forever).
  *
  * Rows written are tracked by per-segment snapshot diff: after every
  * append/merge, any segment that is new or changed its row count
  * contributes its full count. Pass criteria: tiered
  * amplification well under full's (which approaches Σi/16 ≈ 8.5×)
  * and roughly flat merge walls (pair-sized, not index-sized), with
  * the final probe at/near the merged fast path.
  *
  * Usage: runMain graft.tools.TieredMergeProbe [sfDir] [appends] [maxSegs]
  */
object TieredMergeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nAppends = if (args.length > 1) args(1).toInt else 16
    val maxSegs = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val corpus = graft.engine.Caching.cached(
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text")))
    val corpusRows = corpus.count()
    val panel = Seq((0L, "sort merge join"), (1L, "query filter scan"))
      .toDF("qid", "qtext")

    def segCounts(dir: String): Map[Int, Long] =
      spark.read.parquet(s"$dir/postings")
        .groupBy(col("seg")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    for (policy <- Seq("tiered", "full", "none")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"tierprobe_$policy").toString
      var written = 0L
      var prev = Map.empty[Int, Long]
      var mergeWall = 0.0
      var maxMergeWall = 0.0
      for (i <- 0 until nAppends) {
        TextAnalysis.bm25AppendSegment(
          corpus.filter(col("doc_id") % nAppends === i),
          "doc_id", "text", dir, i)
        val afterAppend = segCounts(dir)
        written += afterAppend.collect {
          case (s, n) if !prev.get(s).contains(n) => n }.sum
        prev = afterAppend
        val t0 = System.nanoTime()
        policy match {
          case "tiered" =>
            TextAnalysis.bm25MergeSegmentsTiered(spark, dir, "doc_id",
              maxSegs)
          case "full" =>
            TextAnalysis.bm25MergeSegments(spark, dir, "doc_id")
          case _ => ()
        }
        val dt = (System.nanoTime() - t0) / 1e9
        mergeWall += dt; maxMergeWall = math.max(maxMergeWall, dt)
        val afterMerge = segCounts(dir)
        written += afterMerge.collect {
          case (s, n) if !prev.get(s).contains(n) => n }.sum
        prev = afterMerge
      }
      val t0 = System.nanoTime()
      graft.engine.Caching.scoped {
        TextAnalysis.bm25ProbeSegmented(spark, dir, panel, k = 15,
            "doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      val probeWall = (System.nanoTime() - t0) / 1e9
      val postingRows = prev.values.sum
      println(f"TIER policy=$policy%-6s appends=$nAppends " +
        f"segs=${prev.size}%2d rowsWritten=$written%9d " +
        f"amp=${written.toDouble / postingRows}%5.2fx " +
        f"mergeWall=$mergeWall%6.1f s (max $maxMergeWall%5.2f) " +
        f"finalProbe=$probeWall%5.2f s corpusDocs=$corpusRows")
    }
    spark.stop()
  }
}

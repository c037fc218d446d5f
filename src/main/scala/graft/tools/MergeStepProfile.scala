package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{SegmentManifest, TextAnalysis}

/** Step profiler for q122 (full-segment merge): replays the gate row
  * with a wall clock around every phase — the two appends, the
  * tombstone wave, the merge itself, and the final probe — so a bench
  * regression can be pinned to the phase that moved instead of
  * adjudicated whole. Usage: runMain graft.tools.MergeStepProfile
  * [sfDir] [reps]
  */
object MergeStepProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    graft.engine.HeapWarmup.touchFrontier()

    def step[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $label%-14s ${(System.nanoTime - t0) / 1e9}%6.2f s")
      r
    }

    (1 to reps).foreach { rep =>
      spark.catalog.clearCache()
      println(s"rep $rep:")
      val t0 = System.nanoTime()
      graft.engine.Caching.scoped {
        val d = Tables(spark, sfDir, "documents")
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        val seg0 = d.filter(col("doc_id") % 5 =!= 4)
        val added = d.filter(col("doc_id") % 5 === 4)
        val modified = seg0.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" upd")).as("text"))
        val removed = seg0.filter(col("doc_id") % 7 =!= 0 &&
          col("doc_id") % 11 === 3)
        val path = java.nio.file.Files
          .createTempDirectory("mergeprofile").toString
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        step("append seg0") {
          TextAnalysis.bm25AppendSegment(seg0, "doc_id", "text", path, 0)
        }
        val tombKeys = seg0
          .join(modified.select(col("doc_id"))
            .union(removed.select(col("doc_id"))), Seq("doc_id"))
          .select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"))
        step("tombstone") {
          TextAnalysis.bm25Tombstone(tombKeys, "doc_id", "dl", path, 1)
        }
        step("append seg1") {
          TextAnalysis.bm25AppendSegment(modified.unionByName(added),
            "doc_id", "text", path, 1)
        }
        step("merge") {
          TextAnalysis.bm25MergeSegments(spark, path, "doc_id")
        }
        val m = SegmentManifest.latest(spark, path).get
        require(m.segs("postings") == Seq(0))
        val panel = Seq(
          (0L, "sort merge join upd"), (1L, "query filter scan"))
          .toDF("qid", "qtext")
        step("probe") {
          TextAnalysis.bm25ProbeSegmented(spark, path, panel, k = 12,
              "doc_id")
            .orderBy(col("qid"), col("score").desc, col("doc_id"))
            .write.format("noop").mode("overwrite").save()
        }
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
      }
      println(f"  TOTAL          ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Per-round diagnosis of connectedComponents under corpus inflation —
  * separates algorithmic growth (edges, rounds) from environmental
  * noise (per-job scheduling cost under host load).
  *
  * Times the SHIPPED loop via the instrumentation seam
  * [[Dedup.connectedComponentsInstrumented]] — this probe originally
  * hand-copied the loop body and silently kept measuring the replaced
  * self-union edge build after the operator moved on (the round-8
  * drift); a shared hook makes that class of desynchronization
  * impossible. Round 0's timing includes the edge build + init
  * aggregate (the operator's first consumer materializes the edge
  * cache — there is no separate eager count to time anymore).
  * Usage: runMain graft.tools.CCScaleProbe [sfDir] [multipliers]
  */
object CCScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,5,10")
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
    mults.foreach { m =>
      val d = ScaleProbe.inflate(docs, m)
      val pairs = TextAnalysis.jaccardPairs(d, "doc_id", "text",
        n = 3, minJaccard = 0.5)
      graft.engine.Caching.scoped {
        val t0 = System.nanoTime()
        var rounds = 0
        val labels = Dedup.connectedComponentsInstrumented(pairs, 20,
          (r, secs) => { rounds = r; println(f"x$m round ${r - 1}: $secs%.2f s") })
        val nNodes = labels.count()
        val total = (System.nanoTime() - t0) / 1e9
        println(f"x$m SUMMARY: nodes=$nNodes rounds=$rounds total=$total%.2f s")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

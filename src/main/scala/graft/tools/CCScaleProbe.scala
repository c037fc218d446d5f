package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Per-round diagnosis of connectedComponents under corpus inflation —
  * separates algorithmic growth (edges, rounds) from environmental
  * noise (per-job scheduling cost under host load).
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
        // the SHIPPED edge build (one-pass explode — the round-8 fix);
        // the self-union form this probe originally measured at 85 s
        // was replaced in Dedup.connectedComponents, and this probe
        // must keep measuring what production runs
        val edges = pairs.select(explode(array(
            struct(col("id1").as("a"), col("id2").as("b")),
            struct(col("id2").as("a"), col("id1").as("b")))).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .cache()
        val ne = edges.count()
        val tEdges = (System.nanoTime() - t0) / 1e9
        var labels = edges.groupBy(col("a"))
          .agg(least(min(col("b")), col("a")).as("label"))
          .withColumnRenamed("a", "node").localCheckpoint(true)
        var converged = false
        var i = 0
        while (!converged && i < 20) {
          val r0 = System.nanoTime()
          val neighborMin = edges.join(labels, edges("b") === labels("node"))
            .groupBy(col("a")).agg(min(col("label")).as("nmin"))
          val prop = labels
            .join(neighborMin, labels("node") === neighborMin("a"), "left")
            .select(col("node"), col("label").as("prev"),
              least(col("label"), coalesce(col("nmin"), col("label")))
                .as("label")).cache()
          val lab2 = prop.select(col("node").as("_ln"), col("label").as("_ll"))
          val next = prop
            .join(lab2, prop("label") === lab2("_ln"), "left")
            .select(col("node"), col("prev"),
              least(col("label"), coalesce(col("_ll"), col("label")))
                .as("label"))
            .localCheckpoint(true)
          val changed = next.filter(col("label") =!= col("prev"))
            .limit(1).count()
          prop.unpersist()
          labels = next.select(col("node"), col("label"))
          converged = changed == 0
          i += 1
          println(f"x$m round ${i - 1}: ${(System.nanoTime() - r0) / 1e9}%.2f s")
        }
        edges.unpersist()
        println(f"x$m SUMMARY: edges=$ne rounds=$i edgeBuild=$tEdges%.2f s")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

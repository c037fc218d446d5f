package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val pairs = graft.operators.TextAnalysis.jaccardPairs(
      graft.engine.Tables(spark, sfDir, "documents"), "doc_id", "text", 3, 0.5)
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b"))).cache()
    val n = t("edges materialize (jaccard)")(edges.count())
    println(s"[cc] n_edges = $n")
    var labels = t("init")(
      { val l = edges.groupBy(col("a"))
          .agg(least(min(col("b")), col("a")).as("label"))
          .withColumnRenamed("a", "node").cache()
        l.count(); l })
    var converged = false; var i = 0
    while (!converged && i < 20) {
      val round = t(s"round $i total") {
        val neighborMin = edges.join(labels, edges("b") === labels("node"))
          .groupBy(col("a")).agg(min(col("label")).as("nmin"))
        val prop = labels
          .join(neighborMin, labels("node") === neighborMin("a"), "left")
          .select(col("node"), col("label").as("prev"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
          .cache()
        val lab2 = prop.select(col("node").as("_ln"), col("label").as("_ll"))
        val next = t(s"round $i checkpoint")(prop
          .join(lab2, prop("label") === lab2("_ln"), "left")
          .select(col("node"), col("prev"),
            least(col("label"), coalesce(col("_ll"), col("label"))).as("label"))
          .localCheckpoint(true))
        val changed = t(s"round $i convergence count")(
          next.filter(col("label") =!= col("prev")).limit(1).count())
        prop.unpersist(); labels.unpersist()
        labels = next.select(col("node"), col("label"))
        converged = changed == 0
        changed
      }
      i += 1
    }
    println(s"[cc] rounds = $i")
    spark.stop()
  }
}

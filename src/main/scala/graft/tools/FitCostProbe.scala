package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Similarity

/** Where the vector-maintenance fixed costs live: times the Spark ML
  * k-means fit (learnedCentroids) vs the rest of a recenter at gate
  * scale. Usage: runMain graft.tools.FitCostProbe [sfDir] */
object FitCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"STEP $name%-32s ${(System.nanoTime - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val e = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    t("embeddings noop") {
      e.write.format("noop").mode("overwrite").save() }
    t("learnedCentroids k=16 (cold)") {
      Similarity.learnedCentroids(e, "embedding", 16, 42L).collect() }
    t("learnedCentroids k=16 (rep2)") {
      Similarity.learnedCentroids(e, "embedding", 16, 42L).collect() }
    t("learnedCentroids k=8 (fresh)") {
      Similarity.learnedCentroids(e, "embedding", 8, 42L).collect() }
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    t("learnedCentroids k=16 (counted)") {
      Similarity.learnedCentroids(e, "embedding", 16, 42L).collect() }
    Thread.sleep(500)
    println("JOBS in counted fit: " + jobs.get)
    spark.stop()
  }
}

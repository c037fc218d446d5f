package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.ProductQuantize

/** Plan + microbenchmark probe for the PQ encode kernel (r20 verdict
  * item 4): prints `pqEncode`'s formatted physical plan (the judge's
  * plan-claim evidence — the encode is a write-side derivation, so no
  * declared query RETURNS it in its plan) and times the encode through
  * the noop sink at the full embeddings table and at a ×REP unioned
  * blow-up (the "larger delta" the r19 ledger deferred the change
  * behind). Usage: runMain graft.tools.PqEncodeProbe [sfDir] [rep]
  */
object PqEncodeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rep = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cb = ProductQuantize.pqTrain(e, "embedding", m = 8, k = 16)
      .localCheckpoint()
    val enc = ProductQuantize.pqEncode(e, "vec_id", "embedding", cb, 8)
    println("== pqEncode plan ==")
    println(enc.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"ENCODE $name%-18s ${(System.nanoTime - t0) / 1e9}%8.2f s")
    }
    for (r <- 1 to 2)
      time(s"1x rep$r") {
        enc.write.format("noop").mode("overwrite").save()
      }
    val big = (1 to rep).map(i =>
        e.select((col("vec_id") * rep + i).as("vec_id"),
          col("embedding")))
      .reduce(_ unionByName _)
    val encBig = ProductQuantize.pqEncode(big, "vec_id", "embedding",
      cb, 8)
    for (r <- 1 to 2)
      time(s"${rep}x rep$r") {
        encBig.write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}

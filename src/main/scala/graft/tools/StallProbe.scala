package graft.tools
import org.apache.spark.sql.SparkSession
object StallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to 8) {
      val t0 = System.nanoTime()
      // pure parallel compute, no shuffle
      val s = spark.range(2000000000L).selectExpr("sum(id)").collect()(0).getLong(0)
      val t1 = System.nanoTime()
      // shuffle-heavy small job: 32-partition exchange + agg
      spark.range(5000000L).selectExpr("id % 1000 as k", "id as v")
        .groupBy("k").sum("v").collect()
      val t2 = System.nanoTime()
      println(f"[probe] rep $r compute ${(t1-t0)/1e9}%.2f s shuffle ${(t2-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}

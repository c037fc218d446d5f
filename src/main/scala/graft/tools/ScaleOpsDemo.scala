package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver: exercise the scale-path join operators end-to-end and
  * print plan evidence (salted skew join parity; bucketed join without
  * exchanges). Usage: runMain graft.tools.ScaleOpsDemo <sfDir> */
object ScaleOpsDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    System.setProperty("derby.system.home", "target/demo-derby")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", "target/demo-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.Tables
    import graft.operators.{Bucketing, SkewJoin}

    val o = Tables(spark, sfDir, "orders")
    val c = Tables(spark, sfDir, "customer")
    val plain = o.join(c, o("o_custkey") === c("c_custkey")).count()
    val salted = SkewJoin.saltedEquiJoin(o, c, "o_custkey", "c_custkey",
      "o_orderkey", 7).count()
    println(s"salted-join parity: plain=$plain salted=$salted equal=${plain == salted}")

    Bucketing.writeBucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
      "demo_orders_b", "o_custkey", 4)
    Bucketing.writeBucketed(c.select(col("c_custkey").as("o_custkey"), col("c_acctbal")),
      "demo_customer_b", "o_custkey", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = Bucketing.bucketedJoin(spark, "demo_orders_b", "demo_customer_b", "o_custkey")
    println(s"bucketed-join rows: ${j.count()}")
    val plan = j.queryExecution.executedPlan.toString
    println(s"bucketed plan has Exchange: ${plan.contains("Exchange")}")
    spark.sql("DROP TABLE IF EXISTS demo_orders_b")
    spark.sql("DROP TABLE IF EXISTS demo_customer_b")

    // multimodal: binary assets → stub decode (mean / frames / resize)
    val docs = Tables(spark, sfDir, "documents")
    val feats = graft.operators.Multimodal.decodeFeatures(spark,
      graft.operators.Multimodal.assets(docs, "doc_id", "text", "text/plain"))
    val sample = feats.orderBy("asset_id").limit(1).collect()(0)
    println(s"decode: asset=${sample.getLong(0)} n_bytes=${sample.getInt(2)} " +
      f"byte_mean=${sample.getDouble(3)}%.2f frames=${sample.getSeq[Array[Byte]](4).length} " +
      s"resized_len=${sample.getAs[Array[Byte]]("resized").length}")
    spark.stop()
  }
}

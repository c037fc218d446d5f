package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** Scale-path join strategies: salted skew joins and bucketed
  * co-located joins, with plan-level evidence. */
class JoinStrategiesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("salted join returns exactly the rows of the plain join") {
    val o = Tables(spark, sf, "orders")
    val c = Tables(spark, sf, "customer")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val salted = SkewJoin.saltedEquiJoin(o, c, "o_custkey", "c_custkey",
        saltBy = "o_orderkey", buckets = 7)
      .select(col("o_orderkey"), col("c_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salt spreads a hot key across buckets") {
    import spark.implicits._
    // one pathological key: everything joins to customer 1
    val hot = (1L to 1000L).map(i => (i, 1L)).toDF("row_id", "k")
    val dim = Seq((1L, "only")).toDF("k2", "v")
    val joined = SkewJoin.saltedEquiJoin(hot, dim, "k", "k2",
      saltBy = "row_id", buckets = 8)
    assert(joined.count() == 1000)
    // the salt column (pre-drop) partitions the hot key ~uniformly
    val saltCounts = hot.withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .groupBy("_salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length == 8, "all 8 salt buckets populated")
    assert(saltCounts.max < 1000, "hot key no longer lands in one bucket")
  }

  test("bucketed signature store makes the incremental-dedup anti-join " +
      "exchange-free (q65's 100 TB shape)") {
    val docs = Tables(spark, sf, "documents")
    val srcn = regexp_extract(col("source"), "([0-9]+)", 1).cast("int")
    val sig = md5(Dedup.tokenSetSignature(col("text"))).as("sig")
    val corpusSigs = docs.filter(srcn < 10).select(sig).distinct()
    val batchSigs = docs.filter(srcn >= 10)
      .select(col("doc_id"), sig)
    Bucketing.writeBucketed(corpusSigs, "corpus_sigs_b", "sig", 4)
    Bucketing.writeBucketed(batchSigs, "batch_sigs_b", "sig", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val survivors = spark.table("batch_sigs_b")
        .join(spark.table("corpus_sigs_b"), Seq("sig"), "left_anti")
      val expected = batchSigs
        .join(corpusSigs, Seq("sig"), "left_anti").count()
      assert(survivors.count() == expected && expected > 0)
      val plan = survivors.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed anti-join must not shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS corpus_sigs_b")
      spark.sql("DROP TABLE IF EXISTS batch_sigs_b")
    }
  }

  test("bucketed join plans without an exchange on either side") {
    val o = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables(spark, sf, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_acctbal"))
    Bucketing.writeBucketed(o, "orders_b", "o_custkey", 4)
    Bucketing.writeBucketed(c, "customer_b", "o_custkey", 4)
    // force a sort-merge join so the shuffle (if any) would be visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.bucketedJoin(spark, "orders_b", "customer_b", "o_custkey")
      val n = j.count()
      assert(n > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // same join on plain (non-bucketed) frames DOES shuffle — the
      // bucketing is what removed it, not some other rewrite
      val plainPlan = o.join(c, "o_custkey")
        .queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"),
        s"control join should shuffle:\n$plainPlan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}

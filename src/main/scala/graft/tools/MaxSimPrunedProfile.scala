package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Similarity, TextAnalysis}

/** Step profiler for the q199 scenario — which pruned-MaxSim stage
  * owns the wall. Usage: runMain graft.tools.MaxSimPrunedProfile [sfDir] */
object MaxSimPrunedProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"STEP $name%-28s ${(System.nanoTime - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val d = Tables(spark, dir, "documents")
    val docVecs = d.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(
          coalesce(col("text"), lit(""))))).as("tok"))
      .select(col("doc_id"),
        Similarity.tokenPseudoVec(col("tok")).as("tokvec"))
    val queryVecs = Seq((0L, "scan"), (1L, "filter"), (2L, "dup"),
        (3L, "zetadrive"))
      .toDF("qtok_id", "tok")
      .select(col("qtok_id"),
        Similarity.tokenPseudoVec(col("tok")).as("qvec"))
    t("docVecs noop") {
      docVecs.write.format("noop").mode("overwrite").save()
    }
    println("docVecs rows: " + docVecs.count() +
      " distinct toks: " +
      d.select(explode(array_distinct(TextAnalysis.tokens(
          coalesce(col("text"), lit(""))))).as("tok"))
        .select(col("tok")).distinct().count())
    t("fit (learnedCentroids k=8)") {
      Similarity.learnedCentroids(docVecs, "tokvec", 8, 42L).collect()
    }
    t("brute maxSimTopK") {
      Similarity.maxSimTopK(docVecs, queryVecs, "doc_id", 20)
        .write.format("noop").mode("overwrite").save()
    }
    t("pruned full-probe (whole op)") {
      Similarity.maxSimTopKPruned(docVecs, queryVecs, "doc_id",
          k = 20, kCells = 8, nProbe = 8)
        .write.format("noop").mode("overwrite").save()
    }
    t("pruned full-probe rep2") {
      Similarity.maxSimTopKPruned(docVecs, queryVecs, "doc_id",
          k = 20, kCells = 8, nProbe = 8)
        .write.format("noop").mode("overwrite").save()
    }
    // decomposed internals (mirrors maxSimTopKPruned)
    import graft.functions.VectorFns
    val cents = t("fit2") {
      Similarity.learnedCentroids(docVecs, "tokvec", 8, 42L) }
    val centRows = t("collect cents") { cents.collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]](1).toVector: Seq[Double]))
      .sortBy(_._1).toSeq }
    val centsLit = typedlit(centRows)
    def cellOf(vec: org.apache.spark.sql.Column) =
      array_min(transform(centsLit, c =>
        struct((lit(1.0) - VectorFns.cosine(vec, c("_2"))).as("d"),
          c("_1").as("cid"))))("cid")
    val probed: Array[Long] = t("probed collect") {
      queryVecs
        .select(explode(slice(transform(
            array_sort(transform(centsLit, c =>
              struct((lit(1.0) - VectorFns.cosine(col("qvec"), c("_2")))
                .as("d"), c("_1").as("cid")))),
            s => s("cid")), 1, 8)).as("cid"))
        .distinct().collect().map(_.getLong(0)) }
    val cands = docVecs
      .filter(cellOf(col("tokvec")).isin(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(probed): _*))
      .select(col("doc_id")).distinct()
    t("cands noop") {
      cands.write.format("noop").mode("overwrite").save() }
    t("semi+exact noop") {
      Similarity.maxSimTopK(docVecs.join(cands, Seq("doc_id"),
          "left_semi"), queryVecs, "doc_id", 20)
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}

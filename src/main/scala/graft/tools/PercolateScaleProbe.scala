package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.TextAnalysis

/** Empirical scaling probe for PERCOLATION over a REALISTIC stored
  * query corpus (r13 verdict stretch: the PLANS.md:1312 table used a
  * worst-case 20-term vocabulary where every doc term fans out to
  * every query — real alerting rule sets draw from 10⁴+ distinct
  * terms, so a doc's terms intersect a tiny fraction of queries).
  *
  * The ALERTING scenario: a small incoming doc batch (200 docs — a
  * stream micro-batch) percolated against `nq` stored rules, each
  * must = 2 terms and must_not = 1 term drawn from a vocabulary of
  * `V` synthetic terms (`kw<i>`); the first 1000 rules reference
  * REAL corpus words so matches exist at a CONSTANT volume across
  * the nq axis (isolating the stored-query-corpus cost from the
  * match-output cost). Claims pinned:
  *
  *   - broadcast [[TextAnalysis.percolate]]: every batch pays an
  *     explode + broadcast of the WHOLE query table — the wall
  *     grows with |queries| and the broadcast itself is the 8 GB
  *     structural ceiling;
  *   - indexed [[TextAnalysis.percolateIndexed]]: the batch's
  *     vocabulary becomes a pushed `term IN` over the term-sorted
  *     artifact, so the query-corpus axis is PRUNED to the batch's
  *     covering slice — the wall should stay ~flat in |queries|,
  *     with no broadcast at any size.
  *
  * Usage: runMain graft.tools.PercolateScaleProbe [sfDir] [nqs] [V]
  */
object PercolateScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nqs = (if (args.length > 1) args(1) else "1000,10000,100000")
      .split(',').map(_.toInt).toSeq
    val vocab = if (args.length > 2) args(2).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val docs = graft.engine.Caching.cached(
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 25 === 0).limit(200))
    docs.write.format("noop").mode("overwrite").save()

    // real corpus words for the matching rules (a FIXED 1000 of
    // them, so match volume is constant across the nq axis)
    val realWords = Seq("sort", "merge", "scan", "query", "filter",
      "table", "row", "window", "stream", "batch")

    def queries(nq: Int) = spark.range(nq).select(
      col("id").as("query_id"),
      when(col("id") < 1000,
        array(element_at(typedLit(realWords),
            (col("id") % 10 + 1).cast("int")),
          element_at(typedLit(realWords),
            ((col("id") / 10) % 10 + 1).cast("int"))))
        .otherwise(array(
          concat(lit("kw"), (col("id") * 7919 % vocab)),
          concat(lit("kw"), (col("id") * 104729 % vocab))))
        .as("must"),
      // disjoint namespace: a synthetic must_not can never collide
      // with a must term (the write-time guard is loud about overlap)
      array(concat(lit("nw"), (col("id") * 31 % vocab)))
        .as("must_not"))

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    println(f"${"nq"}%9s ${"broadcast_s"}%12s ${"indexed_s"}%10s " +
      f"${"matches"}%9s")
    for (nq <- nqs) {
      val q = graft.engine.Caching.cached(queries(nq))
      q.write.format("noop").mode("overwrite").save()
      val idxPath = java.nio.file.Files
        .createTempDirectory(s"perc_probe_$nq").toString
      TextAnalysis.percolateWriteQueryIndex(q, idxPath)
      def goB() = graft.engine.Caching.scoped {
        TextAnalysis.percolate(docs, "doc_id", "text", q)
          .write.format("noop").mode("overwrite").save()
      }
      def goI() = graft.engine.Caching.scoped {
        TextAnalysis.percolateIndexed(spark, idxPath, docs,
          "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      goB(); goI() // warm
      val tB = timed(goB())
      val tI = timed(goI())
      val n = TextAnalysis.percolateIndexed(spark, idxPath, docs,
        "doc_id", "text").count()
      println(f"$nq%9d $tB%12.2f $tI%10.2f $n%9d")
      q.unpersist()
    }
    spark.stop()
  }
}

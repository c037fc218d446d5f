package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Similarity, TextAnalysis}

/** Empirical ×m scaling probe for the round-9 COMPOSITIONS — the two
  * heavy plans with no probe entry (r9 verdict item 4) and the
  * retrieval family (item 8):
  *
  *   - q102 shape: the five-stage curation pipeline (quality gate →
  *     exact dedup → span near-dup drop → token-budget selection →
  *     per-source report) as ONE plan, budget scaled ×m so the
  *     selection stays proportional;
  *   - q106 shape: shared-span pair graph (minSpan=20) →
  *     pointer-jumping connected components → cluster-size histogram;
  *   - q97 shape: BM25 top-k — corpus inflated with TAGGED tokens
  *     (vocabulary grows ×m, the worst case for the df aggregate);
  *     the query panel carries copy-0 tags so the match set stays
  *     bounded while the corpus-side cost (tf explode, df join)
  *     scales — the honest decomposition of "df join is
  *     vocab-bounded";
  *   - q103 shape: RRF fusion of that BM25 with the dense cosine
  *     panel over ×m-stacked embeddings (linear scan side).
  *
  * Tagged inflation as in [[ScaleProbe.inflate]]: per-copy token tags
  * keep near-dup density per row constant instead of planting
  * m-cliques. Near-linear wall-clock in m is the pass criterion.
  * Usage: runMain graft.tools.CompositionScaleProbe [sfDir] [mults]
  */
object CompositionScaleProbe {

  /** [[ScaleProbe.inflate]] carrying `source` through (q102's report
    * key): copies keep their original source, so the per-source
    * aggregate keys don't multiply with m. */
  def inflateWithSource(docs: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        col("source"),
        concat_ws(" ",
          transform(split(coalesce(col("text"), lit("")), " "),
            t => concat(t, lit(s"_$i")))).as("text"))
    }.reduce(_.unionByName(_))

  def inflateEmbeddings(e: DataFrame, m: Int): DataFrame =
    (0 until m).map { i =>
      e.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_.unionByName(_))

  // the pipeline/histogram under measurement are the REGISTERED
  // definitions (PipelineQueries.curationPipeline/clusterHistogram) —
  // one source of truth, so the probe cannot desynchronize from the
  // gate rows it claims to measure

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,5,10,20")
      .split(',').map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val emb = Tables(spark, sfDir, "embeddings")

    def time(label: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.engine.Caching.scoped {
        df.write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label: $dt%.2f s")
      dt
    }

    mults.foreach { m =>
      val d = inflateWithSource(docs, m)
      val e = inflateEmbeddings(emb, m)
      println(s"-- x$m (${d.count()} docs, ${e.count()} vectors)")
      time(f"x$m q102_pipeline ",
        graft.queries.PipelineQueries.curationPipeline(
          d, budget = 15000L * m))
      time(f"x$m q106_histogram",
        graft.queries.PipelineQueries.clusterHistogram(d))
      val panel = Seq(
        (0L, "merge_0 sort_0 window_0"), (1L, "stream_0 batch_0 join_0"),
        (2L, "hash_0 table_0 scan_0"), (3L, "slow_0 query_0 filter_0"))
        .toDF("qid", "qtext")
      time(f"x$m q97_bm25     ",
        TextAnalysis.bm25TopK(d, "doc_id", "text", panel, k = 10))
      val vecPanel = e.filter(col("vec_id").isin(0L, 1L, 2L, 3L))
        .select(col("vec_id").as("qid"),
          graft.functions.VectorFns.toDouble(col("embedding")).as("qvec"))
      time(f"x$m q103_rrf     ", {
        val sparse = Similarity.rankByScore(
          TextAnalysis.bm25TopK(d, "doc_id", "text", panel, k = 20),
          "doc_id", "score")
        val dense = Similarity.rankByScore(
          Similarity.topKMulti(e, vecPanel, "vec_id", "embedding", 20)
            .withColumnRenamed("vec_id", "doc_id"),
          "doc_id", "sim")
        Similarity.rrfFuse(Seq(sparse, dense), "doc_id", k = 10)
      })
    }
    spark.stop()
  }
}

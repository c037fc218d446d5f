package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.TextAnalysis

/** Empirical ×m probe for the BM25F-INDEXED composition (r13 verdict
  * stretch 9): q180 pays two per-field index builds in-row, which is
  * the gate's self-contained design, not the production shape — in
  * production each FIELD is a maintained segmented index and a
  * recrawl delta flows into both as upsert waves. Claims pinned:
  *
  *   - per-field MAINTENANCE: one fixed-size upsert wave
  *     ([[TextAnalysis.bm25ApplyUpserts]]) against each field index
  *     stays ~FLAT as the corpus grows ×m (delta-sized: old-dl scan
  *     is column-pruned, the fresh segment is wave-sized, folds move
  *     the smallest pair);
  *   - the BM25F PROBE over the maintained field indexes
  *     ([[TextAnalysis.bm25fProbeIndexed]]) stays ~FLAT under
  *     `tagged` inflation (pushed `term IN` per field — the probed
  *     posting lists are copy-0-sized while corpus and vocabulary
  *     grow ×m).
  *
  * Fields are synthesized from the documents table: title = the
  * first 6 tokens, body = the full text (every doc reaches both
  * indexes — the same-corpus contract bm25fProbeIndexed checks
  * loudly). Usage: runMain graft.tools.Bm25fStreamProbe [sfDir] [mults]
  */
object Bm25fStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,10,20")
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

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    println(f"${"m"}%3s ${"wave_title_s"}%13s ${"wave_body_s"}%12s " +
      f"${"probe_s"}%8s")
    for (m <- mults) {
      val corpus = graft.engine.Caching.cached(
        CompositionScaleProbe.inflateWithSource(docs, m)
          .select(col("doc_id"),
            coalesce(col("text"), lit("")).as("text")))
      corpus.count()
      val fields = corpus.select(col("doc_id"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 6))
          .as("title"),
        col("text").as("body"))
      val root = java.nio.file.Files
        .createTempDirectory(s"bm25f_probe_$m").toString
      TextAnalysis.bm25AppendSegment(
        fields.select(col("doc_id"), col("title").as("text")),
        "doc_id", "text", s"$root/title", 0)
      TextAnalysis.bm25AppendSegment(
        fields.select(col("doc_id"), col("body").as("text")),
        "doc_id", "text", s"$root/body", 0)
      // the FIXED-SIZE recrawl delta: 200 copy-0 docs re-texted —
      // applied to BOTH field indexes, wave walls must not grow in m
      val delta = graft.engine.Caching.cached(
        corpus.filter(col("doc_id") < 10000000L &&
            col("doc_id") % 50 === 0).limit(200)
          .select(col("doc_id"),
            concat(lit("upd "), col("text")).as("text")))
      delta.count()
      val tWaveT = timed {
        TextAnalysis.bm25ApplyUpserts(spark, s"$root/title",
          delta.select(col("doc_id"),
            concat_ws(" ", slice(TextAnalysis.tokens(col("text")),
              1, 6)).as("text")),
          delta.limit(0), "doc_id", "text", segment = 1,
          maxSegments = 4)
      }
      val tWaveB = timed {
        TextAnalysis.bm25ApplyUpserts(spark, s"$root/body", delta,
          delta.limit(0), "doc_id", "text", segment = 1,
          maxSegments = 4)
      }
      // probe over the MAINTAINED indexes — tagged terms: copy-0
      // posting lists, so the wall should be flat in m
      val panel = Seq((0L, "merge_0 sort_0 window_0"),
        (1L, "slow_0 query_0 filter_0")).toDF("qid", "qtext")
      def go() = graft.engine.Caching.scoped {
        TextAnalysis.bm25fProbeIndexed(spark,
            Seq((s"$root/title", 2.0, 0.5), (s"$root/body", 1.0, 0.75)),
            panel, k = 10, "doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      go() // warm
      val tProbe = timed(go())
      println(f"$m%3d $tWaveT%13.2f $tWaveB%12.2f $tProbe%8.2f")
      corpus.unpersist(); delta.unpersist()
    }
    spark.stop()
  }
}

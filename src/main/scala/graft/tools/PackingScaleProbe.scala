package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{BpeTokenizer, Packing}

/** Empirical scaling probe for the round-11 packing/tokenizer family:
  *
  *   - q126 shape: token-level sequence packing — the two-pass global
  *     prefix sum (range partition + broadcast offsets + partition-
  *     local window) followed by the interval explode/aggregate. The
  *     100 TB claim is "no single-task stage"; near-linear wall in the
  *     corpus multiplier is the pass criterion.
  *   - q127 shape: overlapping-chunk apply — stateless explode, should
  *     be flat-per-row.
  *   - q128 shape: BPE merge rounds — the claim is rounds iterate the
  *     VOCAB-sized frame only, so per-round wall should track the
  *     vocabulary, not the corpus. The ScaleProbe inflator tags every
  *     token per copy, so ×m inflates BOTH corpus and vocabulary ×m —
  *     per-round wall growing ~×m under a ×m vocabulary is the
  *     expected (and acceptable) shape; what would flag a defect is
  *     superlinear growth.
  *
  * Usage: runMain graft.tools.PackingScaleProbe [sfDir] [multipliers]
  */
object PackingScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,10,20")
      .split(',').map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    // 3 reps per cell, all printed: the sf0.1 corpus is small enough
    // that host band + JIT dominate any single run — min-of-3 within
    // one session is the comparable number
    def time(label: String)(body: => Unit): Double = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.engine.Caching.scoped { body }
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${reps.map(r => f"$r%.2f").mkString(" / ")} s " +
        f"(min ${reps.min}%.2f)")
      reps.min
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    mults.foreach { m =>
      val d = ScaleProbe.inflate(docs, m)
      val rows = d.count()
      println(s"-- x$m ($rows docs)")
      val toks = d.select(col("doc_id"),
        size(graft.operators.TextAnalysis.tokens(
          coalesce(col("text"), lit("")))).cast("long").as("n_toks"))
      time(f"x$m q126_pack    ") {
        noop(Packing.packSequences(toks, "n_toks", 64, col("doc_id")))
      }
      time(f"x$m q127_chunks  ") {
        noop(Packing.chunkOverlap(d, "doc_id", "text", 12, 8))
      }
      // 6 merge rounds is enough to expose the per-round cost curve
      time(f"x$m q128_bpe6    ") {
        val (merges, vocab) = BpeTokenizer.train(d, "text", numMerges = 6)
        noop(vocab)
        println(s"   merges=${merges.size} " +
          s"vocab=${vocab.select(col("word")).count()}")
      }
    }
    spark.stop()
  }
}

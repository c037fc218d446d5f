package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.streaming.StreamingVectorIndex

/** Per-JOB anatomy of one streaming vector maintenance wave: a
  * SparkListener logs every job's call site and wall time while a
  * single [[StreamingVectorIndex.applyWaveQuantized]] /
  * [[StreamingVectorIndex.applyWaveIvfPq]] wave runs — the
  * instrument behind the per-wave job-floor work (r15 verdict item
  * 4): the wave wall is scheduling-bound at toy deltas, so the fix
  * is fewer jobs, and this probe names which ones remain.
  * Usage: runMain graft.tools.WaveJobProbe [sfDir] */
object WaveJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // search EVERY stage of the job for a graft call-site line:
        // actions submitted through the SQL execution pool carry the
        // user frame on an earlier stage, not the last one
        val graftLine = js.stageInfos.iterator
          .flatMap(_.details.linesIterator)
          .find(l => l.contains("graft.") && !l.contains("WaveJobProbe"))
          .getOrElse("").trim.take(90)
        val site = js.stageInfos.lastOption.map(si =>
          si.name.take(50) + " | " + graftLine).getOrElse("?")
        jobs.put(js.jobId, (site, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (site, t0) =>
          done.add((je.jobId, site, je.time - t0))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") =!= 0 && col("vec_id") % 3 === 1)
    val root = java.nio.file.Files.createTempDirectory("wavejob").toString
    def drain(label: String): Unit = {
      Thread.sleep(300) // let the listener bus settle
      println(s"== $label: ${done.size} jobs")
      done.forEach { case (id, site, ms) =>
        println(f"  job $id%-4d $ms%6d ms  $site")
      }
      done.clear()
    }

    graft.engine.Caching.scoped {
      StreamingVectorIndex.bootstrapQuantized(e, root, "vec_id",
        "embedding", k = 8)
    }
    drain("bootstrap")
    val delta = e.filter(col("vec_id") % 17 === 1)
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x + lit(0.01f)).as("embedding"),
        lit("upsert").as("op"))
      .unionByName(e.filter(col("vec_id") % 19 === 2)
        .select(col("vec_id"), col("embedding"), lit("delete").as("op")))
    for (b <- 0 to 2) {
      val t0 = System.nanoTime()
      graft.engine.Caching.scoped {
        StreamingVectorIndex.applyWaveQuantized(spark, root, delta,
          b.toLong, "vec_id", "embedding", k = 8, historyRetention = 4)
      }
      val wall = (System.nanoTime - t0) / 1e9
      drain(f"wave $b (wall $wall%.2f s)")
    }

    // ---- the LEXICAL CRUD wave (bm25ApplyUpserts) -------------------
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"))
      .filter(col("doc_id") % 3 === 1)
    val lex = java.nio.file.Files.createTempDirectory("wavejob_lex")
      .toString
    graft.engine.Caching.scoped {
      graft.operators.TextAnalysis.bm25AppendSegment(docs, "doc_id",
        "text", lex, 0)
    }
    drain("lex bootstrap")
    for (b <- 1 to 3) {
      val ups = docs.filter(col("doc_id") % 17 === b)
        .select(col("doc_id"),
          concat(col("text"), lit(s" w$b")).as("text"))
      val dels = docs.filter(col("doc_id") % 19 === b)
        .select(col("doc_id"))
      val t0 = System.nanoTime()
      graft.engine.Caching.scoped {
        graft.operators.TextAnalysis.bm25ApplyUpserts(spark, lex, ups,
          dels, "doc_id", "text", segment = b, maxSegments = 2)
      }
      val wall = (System.nanoTime - t0) / 1e9
      drain(f"lex wave $b (wall $wall%.2f s)")
    }
    spark.stop()
  }
}

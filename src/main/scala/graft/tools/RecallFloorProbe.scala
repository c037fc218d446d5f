package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.operators.{ProductQuantize, Similarity}
import graft.streaming.StreamingVectorIndex

/** MARGIN instrument for the round-17 post-recenter recall floors
  * (q143's ≥8% panel floor, q190's ≥6/10 int8 and ≥1/10 IVF-PQ
  * all-cells floors): the gate rows only reveal their measured recall
  * when a floor TRIPS, so this probe replays the exact post-recenter
  * states — q143's drift-loop rebuild and q190's raced recenters —
  * and prints the values the floors sit under, per scale factor. The
  * floors are collapse alarms by design; this table is the evidence
  * that they sit well under the healthy band instead of hugging it
  * (the q75 floor-setting discipline: "regression alarms, not
  * targets" needs the measured band on record).
  *
  * Usage: runMain graft.tools.RecallFloorProbe [sfDir...]
  */
object RecallFloorProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      // ---- q143's scenario: drift-loop recenter on the IVF-PQ
      // layout, then the panel measurement the floor gates ----------
      graft.engine.Caching.scoped {
        val e = Tables(spark, dir, "embeddings")
        graft.SparkEntry.queries("q143_ivfpq_drift_loop")(spark, dir)
          .write.format("noop").mode("overwrite").save()
        // the builder left the recentered layout + centroids in
        // scratch; replay its own panel measurement off them
        val scratch = sys.env.getOrElse("GRAFT_SCRATCH_DIR",
          "/root/repo/target/scratch")
        val h = Integer.toHexString(dir.hashCode)
        val path = s"$scratch/ivfpqd_index_$h"
        val cents = spark.read.parquet(s"$scratch/ivfpqd_cents_$h")
        val base = e.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding"))
        val snap2 = base
          .select(col("vec_id"),
            when(col("vec_id") % 97 === 1,
              transform(col("embedding"), x => (x + lit(0.001f))))
              .otherwise(col("embedding")).as("embedding"))
          .select(col("vec_id"),
            when(col("vec_id") % 3 === 0,
              transform(col("embedding"),
                (x, j) => (x + lit(1.0) * cos(j.cast("double")))
                  .cast("float")))
              .otherwise(col("embedding")).as("embedding"))
        val panel = graft.engine.Caching.cached(
          e.filter(col("vec_id") % 29 === 1)
            .select(col("vec_id").as("qid"),
              VectorFns.toDouble(col("embedding")).as("qvec")))
        val nPanel = panel.count()
        val hits = ProductQuantize.ivfPqProbeMulti(spark, path, cents,
            panel, "vec_id", k = 10, nProbe = 8)
          .select(col("qid"), col("vec_id"))
          .join(Similarity.topKMulti(snap2, panel, "vec_id",
              "embedding", 10)
            .select(col("qid"), col("vec_id")), Seq("qid", "vec_id"))
          .count()
        panel.unpersist()
        if (nPanel == 0)
          println(s"[$dir] q143 post-recenter panel recall@10: " +
            "panel EMPTY (%29 filter selects no rows at this SF) — " +
            "no margin to report")
        else
          println(f"[$dir] q143 post-recenter panel recall@10: " +
            f"$hits/${nPanel * 10} = " +
            f"${hits * 100.0 / (nPanel * 10)}%.1f%% (floor 8%%)")
      }
      // ---- q190's scenario: raced recenters, then the all-cells
      // floors ------------------------------------------------------
      graft.engine.Caching.scoped {
        val e = Tables(spark, dir, "embeddings")
        graft.SparkEntry.queries("q190_vector_mvcc_torture")(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val scratch = sys.env.getOrElse("GRAFT_SCRATCH_DIR",
          "/root/repo/target/scratch")
        val h = Integer.toHexString(dir.hashCode)
        val all = e.filter(col("vec_id") =!= 0 &&
            col("vec_id") % 3 === 1)
          .select(col("vec_id"), col("embedding"))
        val live = all.filter(
          (col("vec_id") % 5 =!= 4 && col("vec_id") % 7 =!= 1) ||
            (col("vec_id") % 5 === 4 && col("vec_id") % 2 === 0))
        val drifted = live.select(col("vec_id"),
          transform(col("embedding"),
            x => x + (col("vec_id") % 5).cast("float") * lit(3.0f))
            .as("embedding"))
        val qv = e.filter(col("vec_id") === 0)
          .select(VectorFns.toDouble(col("embedding")).as("qvec"))
        val exact = Similarity.topK(drifted, qv, "vec_id",
            "embedding", 10)
          .select(col("vec_id")).localCheckpoint()
        val recQ = StreamingVectorIndex.probeLiveQuantized(spark,
            s"$scratch/vmvcc_q_$h", qv, "vec_id", k = 10, nProbe = 8)
          .select(col("vec_id")).join(exact, Seq("vec_id")).count()
        val recP = StreamingVectorIndex.probeLiveIvfPq(spark,
            s"$scratch/vmvcc_p_$h", qv, "vec_id", k = 10, nProbe = 8)
          .select(col("vec_id")).join(exact, Seq("vec_id")).count()
        println(f"[$dir] q190 post-recenter all-cells recall@10: " +
          f"int8 $recQ/10 (floor 6), ivfpq single-query $recP/10")
        // the gate's actual IVF-PQ floor (r17 verdict item 2): the
        // %29 panel through the streaming loop's pinned resolution
        val panel = graft.engine.Caching.cached(
          e.filter(col("vec_id") % 29 === 1)
            .select(col("vec_id").as("qid"),
              VectorFns.toDouble(col("embedding")).as("qvec")))
        val nPanel = panel.count()
        val pHits = StreamingVectorIndex.probeLiveIvfPqMulti(spark,
            s"$scratch/vmvcc_p_$h", panel, "vec_id", k = 10,
            nProbe = 8)
          .select(col("qid"), col("vec_id"))
          .join(Similarity.topKMulti(drifted, panel, "vec_id",
              "embedding", 10)
            .select(col("qid"), col("vec_id")), Seq("qid", "vec_id"))
          .count()
        // int8 sibling through the same pinned resolution (not a gate
        // floor — the single-query int8 alarm at 6/10 reads 10/10
        // everywhere — but the instrument is symmetric on record)
        val qHits = StreamingVectorIndex.probeLiveQuantizedMulti(spark,
            s"$scratch/vmvcc_q_$h", panel, "vec_id", k = 10,
            nProbe = 8)
          .select(col("qid"), col("vec_id"))
          .join(Similarity.topKMulti(drifted, panel, "vec_id",
              "embedding", 10)
            .select(col("qid"), col("vec_id")), Seq("qid", "vec_id"))
          .count()
        panel.unpersist()
        if (nPanel == 0)
          println(s"[$dir] q190 panels: EMPTY at this SF")
        else {
          println(f"[$dir] q190 post-recenter ivfpq panel recall@10: " +
            f"$pHits/${nPanel * 10} = " +
            f"${pHits * 100.0 / (nPanel * 10)}%.1f%% (floor 8%%)")
          println(f"[$dir] q190 post-recenter int8 panel recall@10: " +
            f"$qHits/${nPanel * 10} = " +
            f"${qHits * 100.0 / (nPanel * 10)}%.1f%% (no gate floor)")
        }
      }
    }
    spark.stop()
  }
}

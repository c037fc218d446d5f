package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.streaming.StreamingVectorIndex

/** Step profiler for the q187 scenario — which PQ-loop stage owns the
  * wall. Usage: runMain graft.tools.PqTtProfile [sfDir] */
object PqTtProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"STEP $name%-28s ${(System.nanoTime - t0) / 1e9}%8.2f s")
      r
    }
    val e = Tables(spark, dir, "embeddings")
    val root = java.nio.file.Files.createTempDirectory("pqtt_prof")
      .toString
    val all = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val base = all.filter(col("vec_id") % 5 =!= 4)
    t("bootstrap") {
      StreamingVectorIndex.bootstrapIvfPq(base, root, "vec_id",
        "embedding", kCells = 16, m = 8, k = 16)
    }
    def wave(df: DataFrame, op: String) =
      df.select(col("vec_id"), col("embedding"), lit(op).as("op"))
    def apply(name: String, delta: DataFrame, id: Long): Unit =
      t(name) {
        StreamingVectorIndex.applyWaveIvfPq(spark, root, delta, id,
          "vec_id", "embedding", kCells = 16, m = 8, k = 16,
          historyRetention = 8)
      }
    apply("wave1", wave(all.filter(col("vec_id") % 5 === 4 &&
        col("vec_id") % 2 === 0), "upsert")
      .unionByName(
        wave(base.filter(col("vec_id") % 7 === 1), "delete")), 0L)
    apply("wave2", wave(all.filter(col("vec_id") % 11 === 3)
      .select(col("vec_id"),
        transform(col("embedding"), x => x + lit(0.25f))
          .as("embedding")), "upsert"), 1L)
    val live2 = all.filter(col("vec_id") % 11 === 3 ||
      (col("vec_id") % 5 =!= 4 && col("vec_id") % 7 =!= 1) ||
      (col("vec_id") % 5 === 4 && col("vec_id") % 2 === 0))
    apply("wave3 (recenter)", wave(live2.select(col("vec_id"),
      transform(col("embedding"),
        x => x + (col("vec_id") % 5).cast("float") * lit(3.0f))
        .as("embedding")), "upsert"), 2L)
    val qv = e.filter(col("vec_id") === 0)
      .select(VectorFns.toDouble(col("embedding")).as("qvec"))
    val snap2 = t("readSnapshot(2) collect") {
      val s2 = StreamingVectorIndex.readSnapshot(spark, root, 2,
        "vec_id", "embedding")
      s2.count(); s2
    }
    val snap2c = snap2.localCheckpoint()
    val cents0 = spark.read.parquet(s"$root/cents/gen=0")
    val books0 = spark.read.parquet(s"$root/books/gen=0")
    t("probeSnapshot on checkpointed") {
      graft.operators.ProductQuantize.ivfPqProbeSnapshot(snap2c,
        cents0, books0, qv, "vec_id", "embedding", k = 10,
        nProbe = 3).collect()
    }
    t("assign only (checkpointed)") {
      graft.operators.Similarity.ivfAssignCosine(snap2c, cents0,
        "vec_id", "embedding").count()
    }
    t("pqEncode only (checkpointed)") {
      graft.operators.ProductQuantize.pqEncode(snap2c, "vec_id",
        "embedding", books0, 8).count()
    }
    t("asOf(2) probe (uncheckpointed)") {
      StreamingVectorIndex.probeAsOfIvfPq(spark, root, 2, qv,
        "vec_id", "embedding", k = 10, nProbe = 3).collect()
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Each query is materialized through the `noop`
  * datasource write — a full end-to-end execution of the registered plan
  * (a bare `.count()` lets Catalyst's EliminateSorts drop the global sorts
  * and under-measures). Failures are recorded per query instead of being
  * swallowed as fake-fast timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.KeywordFilterFusion.install(spark)
    // warm-up: JVM/codegen/noop-datasource initialization otherwise
    // lands entirely on whichever query runs first
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        // scoped: operator-internal caches (simhash sigs, shingle sets,
        // …) are unpersisted at scope exit — without release, by
        // mid-alphabet the BlockManager carries every prior query's
        // blocks and timings measure cache pressure, not the plan
        try { graft.engine.Caching.scoped {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save() }; None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // final sweep for caches the scope does not own (Spark-ML-internal)
      spark.catalog.clearCache()
      (name, dt, err)
    }
    def jstr(s: String) =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names — dev-only fast
    // path for gating a single new query; the driver passes two args,
    // so the full dump is unchanged
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val selected = only match {
      case Some(names) =>
        val missing = names -- SparkEntry.queries.keySet
        require(missing.isEmpty, s"unknown queries: $missing")
        SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // engine optimizer rule active during the gate: if the fusion ever
    // breaks semantics, q02 goes red here rather than only in prod
    graft.plans.KeywordFilterFusion.install(spark)
    new java.io.File(outDir).mkdirs()
    // recursive, loud delete: a half-deleted result dir is worse than a
    // failed run — check.py would either crash on the gutted parquet or
    // resurrect a deregistered query from the leftovers
    def deleteTree(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
      if (f.exists() && !f.delete())
        throw new java.io.IOException(s"could not delete $f")
    }
    // prune result dirs of queries no longer registered: on a reused
    // outDir a stale dir would resurrect a DEREGISTERED query in the
    // compare (bit round 7: the demoted q29 kept appearing in the gate)
    if (only.isEmpty)
      Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && !SparkEntry.queries.contains(d.getName))
        .foreach(deleteTree)
    selected.foreach { case (name, fn) =>
      // scoped: operator-internal caches built by this query are
      // unpersisted at scope exit (graft.engine.Caching)
      try graft.engine.Caching.scoped {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any output from a previous run: a stale dir would make
        // the compare silently diagnose the OLD result for this query
        deleteTree(new java.io.File(s"$outDir/$name"))
      }
      // final sweep for caches the scope does not own (Spark-ML-internal)
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // placeholder substitution for oracles that read query-materialized
    // artifacts (q31's learned centroids): {SCRATCH} → the scratch root,
    // {SFHASH} → the sf-dir key — SHARED definitions from
    // PipelineQueries, so the oracle reads exactly the parquet the
    // query wrote this run, by construction
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        val sub = v
          .replace("{SCRATCH}", graft.queries.PipelineQueries.scratchRoot)
          .replace("{SFHASH}", graft.queries.PipelineQueries.sfHash(sfDir))
        s"${q(k)}: ${q(sub)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

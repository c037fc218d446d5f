ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etltransparenciasergipespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout/stderr straight through instead of
// re-logging them: sbt's default strategy prefixes every stdout line
// with "[info] ", which is what kept the driver from parsing Bench's
// one-line JSON record (BENCH_r06..r08 all read "parsed": null — the
// line was present in the captured tail but prefixed). With
// StdoutOutput the JSON line reaches stdout byte-identical, starting
// with '{'.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
)
// Heap flags are RUN-scoped: SPARK_DRIVER_MEM sizes the bench/verify
// JVM, and -Xms = -Xmx commits the whole heap up front — applying that
// unscoped would make a `sbt test` run under SPARK_DRIVER_MEM=90g
// commit 90 GB for the test JVM too (startup failure under a cgroup
// limit or strict overcommit). Tests keep a fixed modest heap below.
run / javaOptions ++= Seq(
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Big-heap robustness (PLANS.md r9 has the measured table). On this
  // host fresh-page zeroing is slow (~0.3 GB/s), so a large -Xmx heap
  // whose committed/young frontier keeps moving stalls queries for tens
  // of seconds on first-touch faults, which is exactly the q39 45.8 s
  // driver reading of round 8. Two standard levers keep the frontier
  // fixed and small:
  //   -Xms = -Xmx: what spark-submit passes for executors — G1 never
  //     uncommits below Xms, so regions are zeroed once and reused
  //     (lazy Xms1g showed recurring 29-31 s spikes from
  //     shrink/recommit cycles);
  //   -XX:MaxNewSize=4g: bounds the lazily-zeroed young frontier; at
  //     the default 8g heap this matches G1's own 60% cap, so small-
  //     heap behavior is unchanged.
  // (-XX:+AlwaysPreTouch also cures it — flat 5 s reps at 90g — but
  // costs 5+ min of startup zeroing at 90g here, so it is left to real
  // clusters with normal memory bandwidth.)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:MaxNewSize=4g",
  // Heap-independent Tungsten page size (the ~8 GB-heap default). Left
  // to its heap-scaled default, a 90 GB heap gets 64 MB pages, which on
  // G1 are humongous allocations needing contiguous free regions — the
  // first hash-heavy query then faults fresh address space for tens of
  // seconds at this host's zeroing rate (q01 10.2 s -> 3.6 s cold,
  // 0.6 s warm with the pin; PLANS.md r9). 8 MB stays under the G1
  // humongous threshold at every heap size used here.
  "-Dspark.buffer.pageSize=8m",
) ++ sys.env.get("GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
// Fixed modest test heap, independent of SPARK_DRIVER_MEM (specs run
// tiny local[4] data; pre-r9 behavior). Page-size pin kept for
// config parity with the run surface.
Test / javaOptions ++= Seq("-Xmx8g", "-Dspark.buffer.pageSize=8m")

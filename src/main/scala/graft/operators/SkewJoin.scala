package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual salting pattern for
  * when AQE's skew-join splitting isn't available or a single hot key
  * dominates a stage (the 100 TB failure mode: one reducer processing a
  * hot creditor/user while 999 executors idle).
  *
  * Shape: the skewed (probe) side gets a uniform random-free salt
  * derived deterministically from a row identity column (keeps runs
  * reproducible — `rand()` would break retry determinism, which is why
  * Spark task retries forbid it in shuffles); the build side is
  * exploded ×`buckets` so every (key, salt) partition finds its match.
  * Build-side blowup is `buckets`×|build|, so use it for dimension-ish
  * build sides or pre-filter to the known-hot keys.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, default on) handles
  * symmetric skew automatically at runtime; this operator is the
  * explicit form for planner-visible hot keys and for tests.
  */
object SkewJoin {

  /** Equi-join `probe ⋈ build` on `probe(probeKey) === build(buildKey)`,
    * salted into `buckets` sub-keys. `saltBy` is any probe column with
    * good distribution (e.g. the row id) used to derive the salt
    * deterministically. */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame,
                     probeKey: String, buildKey: String,
                     saltBy: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = probe.withColumn("_salt",
      pmod(hash(col(saltBy)), lit(buckets)))
    val exploded = build.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(exploded,
        salted(probeKey) === exploded(buildKey) &&
          salted("_salt") === exploded("_salt"))
      .drop(salted("_salt")).drop(exploded("_salt"))
  }
}

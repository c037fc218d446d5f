package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** X2 — similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[topK]] brute force: one linear scan computing cosine against a
  *     broadcast query vector, then `orderBy(desc).limit(k)` which Spark
  *     plans as TakeOrderedAndProject (per-partition top-k + driver
  *     merge of k·partitions rows — no global sort). This is the
  *     baseline AND the honest default: linear, embarrassingly
  *     parallel, no recall loss.
  *   - [[ivfTopK]] IVF-style ANN: vectors are pre-assigned to their
  *     nearest of C centroids (the "inverted file"); a query probes only
  *     the nProbe nearest centroid lists, cutting the scanned fraction
  *     to ~nProbe/C at the cost of recall. At 100 TB the assignment is a
  *     one-off batch job and the probe is a partition-pruned read when
  *     the table is written partitioned by centroid id.
  */
object Similarity {

  /** Cosine of every row against a single query vector (1-row DataFrame
    * with column `qvec`, broadcast — the scalar-broadcast idiom, not a
    * driver collect). */
  def scoreAgainst(vectors: DataFrame, queryVec: DataFrame,
                   vecCol: String): DataFrame =
    vectors.crossJoin(broadcast(queryVec))
      .withColumn("sim",
        round(VectorFns.cosine(VectorFns.toDouble(col(vecCol)),
          col("qvec")), 4))

  def topK(vectors: DataFrame, queryVec: DataFrame, idCol: String,
           vecCol: String, k: Int): DataFrame =
    scoreAgainst(vectors, queryVec, vecCol)
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Deterministic centroid set: every `step`-th vector by id. A real
    * system would k-means these; a fixed subset keeps the operator
    * deterministic and dependency-free. */
  def centroids(vectors: DataFrame, idCol: String, vecCol: String,
                step: Int): DataFrame =
    vectors.filter(col(idCol) % step === 0)
      .select(col(idCol).as("centroid_id"),
        VectorFns.toDouble(col(vecCol)).as("cvec"))

  /** Inverted-file assignment: each vector → nearest centroid by L2.
    * Broadcast the (small) centroid table; `min_by` picks the argmin
    * without a window. */
  def ivfAssign(vectors: DataFrame, cents: DataFrame, idCol: String,
                vecCol: String): DataFrame =
    vectors.crossJoin(broadcast(cents))
      .withColumn("d2",
        VectorFns.sqDist(VectorFns.toDouble(col(vecCol)), col("cvec")))
      .groupBy(col(idCol))
      .agg(min_by(col("centroid_id"), col("d2")).as("centroid_id"))

  /** LSH-bucketed ANN — the ml-native alternative to [[ivfTopK]]:
    * random-hyperplane bucketing via `BucketedRandomProjectionLSH`
    * (seeded → deterministic), probe = `approxNearestNeighbors` which
    * scans only colliding buckets. Distance is Euclidean (the ml LSH
    * family's metric); for cosine semantics feed unit-normalized
    * vectors (L2 rank order == cosine rank order on the unit sphere). */
  def brpLshTopK(vectors: DataFrame, idCol: String, vecCol: String,
                 query: org.apache.spark.ml.linalg.Vector, k: Int,
                 numHashTables: Int = 4,
                 bucketLength: Double = 2.0): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val df = vectors.withColumn("fv",
      array_to_vector(graft.functions.VectorFns.toDouble(col(vecCol))))
    val model = new org.apache.spark.ml.feature.BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L).setInputCol("fv").setOutputCol("hashes")
      .fit(df)
    model.approxNearestNeighbors(df, query, k)
      .select(col(idCol), round(col("distCol"), 4).as("dist"))
  }

  /** Materialize the inverted file: vectors written PARTITIONED BY
    * centroid list. This is the 100 TB layout the ivfTopK Scaladoc
    * promises: once the index is on disk, a probe opens only the
    * nProbe/C partition directories — IO scales with the probe
    * fraction, not the corpus. */
  def ivfWriteIndex(vectors: DataFrame, cents: DataFrame, idCol: String,
                    vecCol: String, path: String): Unit =
    vectors.join(ivfAssign(vectors, cents, idCol, vecCol), Seq(idCol))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(path)

  /** Probe a materialized index. The probe list is nProbe centroid ids
    * — a driver-side scalar fetch of the (tiny, broadcast-sized)
    * centroid ranking, NOT a data-path collect — turned into a literal
    * `isin` so the scan prunes PARTITION DIRECTORIES (shows as
    * `PartitionFilters` in the plan), never reading the other lists'
    * files. Exact top-k on the surviving candidates. */
  def ivfProbePruned(spark: org.apache.spark.sql.SparkSession,
                     indexPath: String, cents: DataFrame,
                     queryVec: DataFrame, idCol: String, vecCol: String,
                     k: Int, nProbe: Int): DataFrame = {
    val probed = cents.crossJoin(broadcast(queryVec))
      .withColumn("d2", VectorFns.sqDist(col("cvec"), col("qvec")))
      .orderBy(col("d2"), col("centroid_id"))
      .limit(nProbe)
      .select(col("centroid_id")).collect().map(_.getLong(0))
    val idx = spark.read.parquet(indexPath)
      .filter(col("centroid_id")
        .isin(scala.collection.immutable.ArraySeq.unsafeWrapArray(probed): _*))
    topK(idx, queryVec, idCol, vecCol, k)
  }

  /** IVF probe: query's nProbe nearest centroids → candidate vectors
    * from those lists only → exact cosine top-k on the candidates. */
  def ivfTopK(vectors: DataFrame, cents: DataFrame, queryVec: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nProbe: Int): DataFrame = {
    val probed = cents.crossJoin(broadcast(queryVec))
      .withColumn("d2", VectorFns.sqDist(col("cvec"), col("qvec")))
      .orderBy(col("d2"), col("centroid_id"))
      .limit(nProbe)
      .select(col("centroid_id"))
    val assignment = ivfAssign(vectors, cents, idCol, vecCol)
    val candidates = vectors
      .join(assignment, Seq(idCol))
      .join(broadcast(probed), Seq("centroid_id"))
    topK(candidates, queryVec, idCol, vecCol, k)
  }
}

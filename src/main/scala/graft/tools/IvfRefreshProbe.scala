package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.VectorFns
import graft.operators.{Similarity, Upsert}

/** Empirical check of the incremental-IVF-refresh claim: refresh cost
  * scales with the RECRAWL DELTA, not the corpus. The sf embeddings
  * are inflated ×m with AnnScaleProbe's isometric sign-flip stacking
  * (m independent populations); k=64 cells; the delta is a FIXED
  * absolute set of keys chosen from the membership of THREE cells
  * (recrawl deltas are clustered — a re-crawled domain's embeddings
  * are geometrically close; a uniformly-random delta would touch
  * every cell and correctly degrade to a full rewrite):
  *
  *   - modified: cell A's members re-scaled ×0.5 (same direction ⇒
  *     same cosine cell, honest "content changed" rows);
  *   - removed: cell B's members;
  *   - added: copies of cell C's members (land in/near C).
  *
  * Content digests are PRECOMPUTED columns of each snapshot (the
  * production contract: a corpus store carries digests; the diff
  * never re-reads payloads/vectors). At each m, times the full
  * quantized rebuild vs diff + cell-incremental refresh, asserting
  * refreshed ≡ rebuild at every point (a fast-but-wrong refresh
  * measures nothing).
  * Usage: runMain graft.tools.IvfRefreshProbe [sfDir] [multipliers]
  */
object IvfRefreshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,5,10,20")
      .split(',').map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dim = e.select(size(col("embedding"))).first().getInt(0)

    def inflated(m: Int): DataFrame =
      (0 until m).map { i =>
        val signs = array(Seq.tabulate(dim) { j =>
          lit(if (Integer.bitCount(j & i) % 2 == 0) 1.0d else -1.0d)
        }: _*)
        e.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          zip_with(VectorFns.toDouble(col("embedding")), signs,
            (x, s) => x * s).as("embedding"))
      }.reduce(_.unionByName(_))

    def withSig(s: DataFrame): DataFrame =
      s.withColumn("sig", xxhash64(col("embedding")))

    mults.foreach { m =>
      val oldSnap = withSig(inflated(m)).cache()
      val n = oldSnap.count()
      val cents = Similarity.learnedCentroids(
        oldSnap.limit(2000), "embedding", k = 64).cache()
      cents.count()
      val base = java.nio.file.Files
        .createTempDirectory(s"ivfp_x$m").toString
      Similarity.ivfWriteIndexQuantized(oldSnap, cents, "vec_id",
        "embedding", s"$base/inc")
      // clustered delta from the INITIAL assignment: three cells' keys
      val idx0 = spark.read.parquet(s"$base/inc")
        .select(col("vec_id"), col("centroid_id").cast("long"))
      val cellIds = idx0.groupBy(col("centroid_id")).count()
        .orderBy(col("count").desc).limit(3)
        .collect().map(_.getLong(0))
      val Array(cA, cB, cC) = cellIds
      val modK = idx0.filter(col("centroid_id") === cA)
        .select(col("vec_id")).limit(150).cache()
      val remK = idx0.filter(col("centroid_id") === cB)
        .select(col("vec_id")).limit(100).cache()
      val addSrc = idx0.filter(col("centroid_id") === cC)
        .select(col("vec_id")).limit(100).cache()
      val deltaN = modK.count() + remK.count() + addSrc.count()
      val newSnap = withSig(oldSnap.drop("sig")
        .join(remK, Seq("vec_id"), "left_anti")
        .join(modK.withColumn("_mod", lit(1)), Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("_mod").isNotNull,
            transform(col("embedding"), x => x * 0.5))
            .otherwise(col("embedding")).as("embedding"))
        .unionByName(oldSnap.join(addSrc, Seq("vec_id"))
          // offset far outside any copy's id range (copy i occupies
          // i·10⁷ + …): a colliding id would read as "modified" in
          // arbitrary cells and fake extra dirty cells at large m
          .select((col("vec_id") + lit(1000000000000L)).as("vec_id"),
            col("embedding"))))
        .cache()
      newSnap.count()
      println(s"-- x$m ($n vectors, delta $deltaN over 3 of 64 cells)")
      // scoped like every other probe/bench loop: operator-internal
      // caches (changed keys, fresh assignment) must not stay pinned
      // across multipliers and skew the later timings
      var t0 = System.nanoTime()
      graft.engine.Caching.scoped {
        Similarity.ivfWriteIndexQuantized(newSnap, cents, "vec_id",
          "embedding", s"$base/full")
      }
      println(f"x$m full_rebuild: ${(System.nanoTime - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      val dirty = graft.engine.Caching.scoped {
        val changes = Upsert.diffByKey(
          oldSnap.select(col("vec_id"), col("sig")),
          newSnap.select(col("vec_id"), col("sig")), "vec_id", "sig")
        Similarity.ivfRefreshQuantizedIncremental(spark,
          s"$base/inc", cents, newSnap, changes, "vec_id", "embedding")
      }
      println(f"x$m incr_refresh: ${(System.nanoTime - t0) / 1e9}%.2f s" +
        s" (dirty cells: ${dirty.size}/64)")
      // parity at every m (manifest-aware read: the refresh commits
      // by MVCC, so the live composition resolves through the seal)
      def key(dir: String) = Similarity.readQuantizedIndex(spark, dir)
        .select(col("vec_id"), col("centroid_id").cast("long"),
          xxhash64(col("codes")).as("h"))
      val diff = key(s"$base/inc").exceptAll(key(s"$base/full"))
        .union(key(s"$base/full").exceptAll(key(s"$base/inc")))
        .count()
      require(diff == 0, s"x$m refresh diverged from rebuild: $diff rows")
      Seq(oldSnap, newSnap, cents, modK, remK, addSrc)
        .foreach(_.unpersist())
    }
    spark.stop()
  }
}

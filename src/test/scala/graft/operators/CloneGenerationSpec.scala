package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables
import graft.functions.VectorFns

/** [[SegmentManifest.cloneGeneration]] — the snapshot publish/export
  * step of the MVCC story: a clone must resolve EXACTLY the pinned
  * composition, stay bit-independent of every later source mutation
  * (waves, rebuilds, vacuum), carry marker layouts, survive a crashed
  * prior attempt's debris, and fail loudly on the contract edges. */
class CloneGenerationSpec extends SparkSpec {

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  // ---------------------------------------------------------------
  // quantized vector index: clone latest AND an older retained
  // generation (time-travel export), then mutate + vacuum the source
  // ---------------------------------------------------------------
  test("quantized-IVF clone: pinned parity, independence from source " +
      "waves/rebuild/vacuum, model marker carried, older-generation " +
      "export, vacuumed-generation clone fails loudly") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val qv = e.filter(col("vec_id") === 0)
      .select(VectorFns.toDouble(col("embedding")).as("qvec"))
    val base = e.filter(col("vec_id") =!= 0)
    val snap0 = base.filter(col("vec_id") % 7 =!= 3)
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.learnedCentroids(snap0, "embedding", k = 8)
      .localCheckpoint()
    val src = tmp("clone_src")
    Similarity.ivfWriteIndexQuantized(snap0, cents, "vec_id",
      "embedding", src)
    def sig(s: org.apache.spark.sql.DataFrame) =
      s.select(col("vec_id"), xxhash64(col("embedding")).as("sig"))
    def probeAt(path: String) =
      Similarity.ivfProbePrunedQuantized(spark, path, cents, qv,
          "vec_id", k = 10, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // wave 1: remove %13==5, negate %11==0 — seals generation 1
    val snap1 = snap0.filter(col("vec_id") % 13 =!= 5)
      .select(col("vec_id"),
        when(col("vec_id") % 11 === 0,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
    Similarity.ivfRefreshQuantizedIncremental(spark, src, cents,
      snap1, Upsert.diffByKey(sig(snap0), sig(snap1), "vec_id", "sig"),
      "vec_id", "embedding")
    val gen1 = SegmentManifest.latestGen(spark, src).get
    val expect1 = probeAt(src)

    // wave 2 (negate %9==2 of the survivors), then an MVCC REBUILD
    // sealing a model marker — the latest generation carries it
    val snap2 = snap1
      .select(col("vec_id"),
        when(col("vec_id") % 9 === 2,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
    Similarity.ivfRefreshQuantizedIncremental(spark, src, cents,
      snap2, Upsert.diffByKey(sig(snap1), sig(snap2), "vec_id", "sig"),
      "vec_id", "embedding")
    Similarity.ivfRebuildQuantizedMvcc(spark, src, snap2, cents,
      "vec_id", "embedding", modelGen = 7)
    val expect3 = probeAt(src)

    // clone BOTH the older retained generation (time-travel export)
    // and the latest — before the source vacuums its history away
    val dstOld = tmp("clone_old")
    val dstNew = tmp("clone_new")
    val mOld = SegmentManifest.cloneGeneration(spark, src, dstOld,
      gen = Some(gen1))
    val mNew = SegmentManifest.cloneGeneration(spark, src, dstNew)
    assert(mOld.gen == gen1)
    assert(SegmentManifest.generations(spark, dstOld) == Seq(gen1),
      "the clone must hold exactly the cloned generation")
    assert(mNew.entries(SegmentManifest.ModelMarker).map(_.seg)
        == Seq(7), "model marker not carried through the clone")

    // mutate + vacuum the SOURCE: the clones must not notice
    Similarity.ivfVacuumQuantized(spark, src, keepGenerations = 1)
    assert(probeAt(dstOld) == expect1,
      "older-generation clone diverged after source vacuum")
    assert(probeAt(dstNew) == expect3,
      "latest-generation clone diverged after source vacuum")
    assert(probeAt(src) == expect3, "source itself moved")

    // the vacuumed generation is now un-clonable — loudly
    val eGone = intercept[IllegalArgumentException] {
      SegmentManifest.cloneGeneration(spark, src, tmp("clone_gone"),
        gen = Some(gen1))
    }
    assert(eGone.getMessage.contains("vacuum"),
      s"wrong floor message: $eGone")

    // cloning INTO a live index is refused
    val eLive = intercept[IllegalArgumentException] {
      SegmentManifest.cloneGeneration(spark, src, dstNew)
    }
    assert(eLive.getMessage.contains("already holds"),
      s"wrong live-dst message: $eLive")
  }

  // ---------------------------------------------------------------
  // lexical index: clone, then wave + vacuum the source
  // ---------------------------------------------------------------
  test("lexical clone: probe parity pinned at the cloned generation " +
      "while the source takes an upsert wave and vacuums; a crashed " +
      "prior attempt's dst debris is overwritten on retry") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .filter(col("doc_id") % 5 =!= 4)
    val panel = Seq((0L, "scan table row"), (1L, "query filter"))
      .toDF("qid", "qtext")
    val src = tmp("clone_lex_src")
    TextAnalysis.bm25AppendSegment(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", src, 0)
    TextAnalysis.bm25AppendSegment(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", src, 1)
    def probe(path: String) = TextAnalysis
      .bm25ProbeSegmented(spark, path, panel, k = 12, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val expect = probe(src)

    // debris at dst from a "crashed" prior attempt: a referenced loc
    // exists as a directory holding junk — the retry must replace it,
    // not nest under it or read it
    val dst = tmp("clone_lex_dst")
    val m = SegmentManifest.latest(spark, src).get
    val debrisLoc = m.entries("postings").head.loc
    val debris = java.nio.file.Paths.get(dst, debrisLoc)
    java.nio.file.Files.createDirectories(debris)
    java.nio.file.Files.write(debris.resolve("junk.txt"),
      "not parquet".getBytes("UTF-8"))
    SegmentManifest.cloneGeneration(spark, src, dst)
    assert(!java.nio.file.Files.exists(debris.resolve("junk.txt")),
      "debris survived the delete-then-copy")

    // source takes a wave + vacuum; the clone stays pinned
    val intruder = Seq((999999L,
      "scan table row scan table row query filter"))
      .toDF("doc_id", "text")
    TextAnalysis.bm25ApplyUpserts(spark, src, intruder,
      intruder.limit(0), "doc_id", "text", segment = 2,
      maxSegments = 2)
    TextAnalysis.bm25Vacuum(spark, src, 1)
    assert(probe(dst) == expect,
      "clone diverged after source wave + vacuum")
    val fresh = probe(src)
    assert(fresh != expect && fresh.exists(_._2 == 999999L),
      "source wave did not land (test setup broken)")
  }

  // ---------------------------------------------------------------
  // streaming roots: the composite serving clone (index generation +
  // the pinned model artifacts) for both live families
  // ---------------------------------------------------------------
  test("cloneServing (int8 loop): live-probe parity at the clone, " +
      "pinned across a source RECENTER + its model change; a clone " +
      "of the recentered source resolves the marker's model") {
    import graft.streaming.StreamingVectorIndex
    import spark.implicits._
    def vec(i: Long, shift: Double = 0.0): Seq[Float] =
      Seq.tabulate(8)(j =>
        (((i * 31 + j * 17) % 97) / 97.0 + shift + 0.01).toFloat)
    val root = tmp("clsrv_src")
    val initial = (0L until 40L).map(i => i -> vec(i))
      .toDF("vec_id", "embedding")
    StreamingVectorIndex.bootstrapQuantized(initial, root,
      "vec_id", "embedding", k = 4)
    // one benign wave seals the manifest the clone pins
    StreamingVectorIndex.applyWaveQuantized(spark, root,
      Seq((40L, vec(40L), "upsert"), (3L, vec(3L), "delete"))
        .toDF("vec_id", "embedding", "op"),
      0L, "vec_id", "embedding", k = 4)
    val qv = Seq(Tuple1(vec(7L).map(_.toDouble))).toDF("qvec")
    def probe(r: String) = StreamingVectorIndex
      .probeLiveQuantized(spark, r, qv, "vec_id", k = 5, nProbe = 2)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    val expect = probe(root)
    val dst = tmp("clsrv_dst")
    StreamingVectorIndex.cloneServing(spark, root, dst)
    assert(probe(dst) == expect, "serving clone diverged at birth")
    // source mutation: every vector wanders far from its fitted cell
    // (the StreamingVectorIndexSpec hard-drift recipe) — recenter
    // fires, the model advances to gen 1, the index rebuilds wholesale
    val drifted = (0L until 40L)
      .map(i => (i, vec(i, shift = 3.0 * (i % 5)), "upsert"))
      .toDF("vec_id", "embedding", "op")
    StreamingVectorIndex.applyWaveQuantized(spark, root,
      drifted, 1L, "vec_id", "embedding", k = 4)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // model generations key on batchId + 1 — the drift wave ran as
    // batch 1, so its recenter writes cents/gen=2
    assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/cents/gen=2")),
      "test setup: the drift wave did not recenter")
    assert(probe(dst) == expect,
      "serving clone diverged after source recenter")
    assert(probe(root) != expect, "source probe should have moved")
    // a clone of the RECENTERED source resolves the marker's model
    val dst2 = tmp("clsrv_dst2")
    StreamingVectorIndex.cloneServing(spark, root, dst2)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$dst2/cents/gen=2")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$dst2/cents/gen=0")),
      "the recentered clone must carry exactly the marker's model gen")
    assert(probe(dst2) == probe(root),
      "recentered serving clone diverged from the live source")

    // syncServing: the STALE clone (published before the recenter)
    // advances incrementally — index delta + the marker's NEW model
    StreamingVectorIndex.syncServing(spark, root, dst)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$dst/cents/gen=2")),
      "sync did not ship the recenter's model generation")
    assert(probe(dst) == probe(root),
      "synced serving clone diverged from the live source")
  }

  test("cloneServing (IVF-PQ loop): refresh-only history — books " +
      "resolve through the cloned live-codebooks cache; parity " +
      "pinned across a source wave") {
    import graft.streaming.StreamingVectorIndex
    import spark.implicits._
    def vec(i: Long, shift: Double = 0.0): Seq[Float] =
      Seq.tabulate(8)(j =>
        (((i * 29 + j * 13) % 89) / 89.0 + shift + 0.01).toFloat)
    val root = tmp("clsrv_pq_src")
    val initial = (0L until 40L).map(i => i -> vec(i))
      .toDF("vec_id", "embedding")
    StreamingVectorIndex.bootstrapIvfPq(initial, root,
      "vec_id", "embedding", kCells = 4, m = 4, k = 4)
    StreamingVectorIndex.applyWaveIvfPq(spark, root,
      Seq((40L, vec(40L), "upsert"), (5L, vec(5L), "delete"))
        .toDF("vec_id", "embedding", "op"),
      0L, "vec_id", "embedding", kCells = 4, m = 4, k = 4)
    val qv = Seq(Tuple1(vec(11L).map(_.toDouble))).toDF("qvec")
    def probe(r: String) = StreamingVectorIndex
      .probeLiveIvfPq(spark, r, qv, "vec_id", k = 5, nProbe = 2)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    val expect = probe(root)
    val dst = tmp("clsrv_pq_dst")
    StreamingVectorIndex.cloneServing(spark, root, dst)
    assert(probe(dst) == expect, "PQ serving clone diverged at birth")
    // mutate the source: negate a batch of vectors (index content
    // moves, books/centroids stay — the refresh-only history)
    StreamingVectorIndex.applyWaveIvfPq(spark, root,
      initial.limit(20).select(col("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
        .withColumn("op", lit("upsert")),
      1L, "vec_id", "embedding", kCells = 4, m = 4, k = 4)
    assert(probe(dst) == expect,
      "PQ serving clone diverged after a source wave")
    // incremental re-publish: the clone catches up to the wave
    val delta = StreamingVectorIndex.syncServing(spark, root, dst)
    assert(delta.nonEmpty, "PQ sync copied nothing for a real wave")
    assert(probe(dst) == probe(root),
      "PQ synced serving clone diverged from the live source")
  }

  test("a clone is a FORK point: maintenance continues at the clone " +
      "(waves seal clone-local generations) without touching the " +
      "source, and vice versa") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val qv = e.filter(col("vec_id") === 0)
      .select(VectorFns.toDouble(col("embedding")).as("qvec"))
    val base = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.learnedCentroids(base, "embedding", k = 8)
      .localCheckpoint()
    val src = tmp("fork_src")
    Similarity.ivfWriteIndexQuantized(base, cents, "vec_id",
      "embedding", src)
    def sig(s: org.apache.spark.sql.DataFrame) =
      s.select(col("vec_id"), xxhash64(col("embedding")).as("sig"))
    def probeAt(path: String) =
      Similarity.ivfProbePrunedQuantized(spark, path, cents, qv,
          "vec_id", k = 10, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // seal generation 1, then fork
    val snap1 = base.filter(col("vec_id") % 17 =!= 4)
    Similarity.ivfRefreshQuantizedIncremental(spark, src, cents,
      snap1, Upsert.diffByKey(sig(base), sig(snap1), "vec_id", "sig"),
      "vec_id", "embedding")
    val atFork = probeAt(src)
    val dst = tmp("fork_dst")
    SegmentManifest.cloneGeneration(spark, src, dst)
    // maintenance CONTINUES at the clone: its refresh builds against
    // the cloned manifest and seals the clone's own next generation
    val snap2 = snap1.select(col("vec_id"),
      when(col("vec_id") % 6 === 1,
        transform(col("embedding"), x => -x))
        .otherwise(col("embedding")).as("embedding"))
    Similarity.ivfRefreshQuantizedIncremental(spark, dst, cents,
      snap2, Upsert.diffByKey(sig(snap1), sig(snap2), "vec_id", "sig"),
      "vec_id", "embedding")
    assert(SegmentManifest.latestGen(spark, dst).get
        > SegmentManifest.latestGen(spark, src).get,
      "the clone's wave must seal a clone-local generation")
    assert(probeAt(src) == atFork,
      "a wave at the clone leaked into the source")
    assert(probeAt(dst) != atFork,
      "the clone's wave did not land (test setup broken)")
    // and the clone's fork can vacuum its own history freely
    Similarity.ivfVacuumQuantized(spark, dst, keepGenerations = 1)
    assert(probeAt(src) == atFork,
      "the clone's vacuum reclaimed source directories")
  }

  test("syncClone: advancing an existing clone copies ONLY the delta " +
      "members, probes track the source, the clone keeps its own " +
      "history, and a source that vacuumed the shared generation " +
      "still syncs") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val qv = e.filter(col("vec_id") === 0)
      .select(VectorFns.toDouble(col("embedding")).as("qvec"))
    val base = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.learnedCentroids(base, "embedding", k = 8)
      .localCheckpoint()
    val src = tmp("sync_src")
    Similarity.ivfWriteIndexQuantized(base, cents, "vec_id",
      "embedding", src)
    def sig(s: org.apache.spark.sql.DataFrame) =
      s.select(col("vec_id"), xxhash64(col("embedding")).as("sig"))
    def probeAt(path: String) =
      Similarity.ivfProbePrunedQuantized(spark, path, cents, qv,
          "vec_id", k = 10, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def wave(prev: org.apache.spark.sql.DataFrame,
             next: org.apache.spark.sql.DataFrame): Unit = {
      Similarity.ivfRefreshQuantizedIncremental(spark, src, cents,
        next, Upsert.diffByKey(sig(prev), sig(next), "vec_id", "sig"),
        "vec_id", "embedding")
      ()
    }
    // gen 1 → first publish
    val snap1 = base.filter(col("vec_id") % 19 =!= 2)
    wave(base, snap1)
    val dst = tmp("sync_dst")
    SegmentManifest.cloneGeneration(spark, src, dst)
    val gen1 = SegmentManifest.latestGen(spark, dst).get

    // nothing newer yet — loud
    val eFlat = intercept[IllegalArgumentException] {
      SegmentManifest.syncClone(spark, src, dst)
    }
    assert(eFlat.getMessage.contains("nothing"), s"got: $eFlat")

    // gen 2: a SMALL delta (one key's cell dirties) — the sync must
    // copy only the wave's staged members, not re-clone the index
    val snap2 = snap1.filter(col("vec_id") =!= 7L)
    wave(snap1, snap2)
    val m2 = SegmentManifest.latest(spark, src).get
    val delta = SegmentManifest.syncClone(spark, src, dst)
    assert(delta.nonEmpty &&
        delta.size < m2.entries("cells").size,
      s"sync copied ${delta.size} of ${m2.entries("cells").size} " +
        "members — not incremental")
    assert(delta.forall(_.startsWith("_rev/")),
      s"sync copied non-staged locations: $delta")
    assert(probeAt(dst) == probeAt(src),
      "synced clone diverged from the source")
    // the clone is a real MVCC index: it KEEPS its earlier generation
    assert(SegmentManifest.generations(spark, dst)
        == Seq(gen1, m2.gen),
      "sync dropped the clone's own history")

    // gen 3 at the source, then the source vacuums AWAY the shared
    // generations — the lineage check is impossible, the write-once
    // contract carries it, and the sync still lands
    val snap3 = snap2.filter(col("vec_id") =!= 11L)
    wave(snap2, snap3)
    Similarity.ivfVacuumQuantized(spark, src, keepGenerations = 1)
    SegmentManifest.syncClone(spark, src, dst)
    assert(probeAt(dst) == probeAt(src),
      "sync after source vacuum diverged")
    // and the clone reclaims its own history on its own dial
    SegmentManifest.vacuum(spark, dst, 1,
      Seq(SegmentManifest.CellLayout))
    assert(probeAt(dst) == probeAt(src),
      "the clone's vacuum broke its live generation")
  }

  test("syncClone refuses a dst that is not a clone of this source " +
      "while the shared generation is still retained") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val base = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.learnedCentroids(base, "embedding", k = 8)
      .localCheckpoint()
    def sig(s: org.apache.spark.sql.DataFrame) =
      s.select(col("vec_id"), xxhash64(col("embedding")).as("sig"))
    def build(): String = {
      val p = tmp("sync_lineage")
      Similarity.ivfWriteIndexQuantized(base, cents, "vec_id",
        "embedding", p)
      val snap1 = base.filter(col("vec_id") % 23 =!= 1)
      Similarity.ivfRefreshQuantizedIncremental(spark, p, cents,
        snap1, Upsert.diffByKey(sig(base), sig(snap1), "vec_id", "sig"),
        "vec_id", "embedding")
      p
    }
    val a = build()
    val b = build() // same generation NUMBERS, independent lineage
    val dstA = tmp("sync_lineage_dst")
    SegmentManifest.cloneGeneration(spark, a, dstA)
    // advance B past dstA's generation so a sync would fire
    val snap2 = base.filter(col("vec_id") % 23 =!= 1 &&
      col("vec_id") =!= 5L)
    Similarity.ivfRefreshQuantizedIncremental(spark, b, cents,
      snap2,
      Upsert.diffByKey(sig(base.filter(col("vec_id") % 23 =!= 1)),
        sig(snap2), "vec_id", "sig"),
      "vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      SegmentManifest.syncClone(spark, b, dstA)
    }
    assert(err.getMessage.contains("not a clone of this source"),
      s"wrong lineage message: $err")
  }

  test("cloneGeneration fails LOUDLY on a damaged source — a " +
      "referenced non-marker member physically missing — instead of " +
      "sealing a corrupt clone that serves it as zero rows") {
    val src = tmp("clone_damaged_src")
    val f = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def touch(s: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$src/$s")
      f.mkdirs(p.getParent)
      val out = f.create(p, true)
      try out.write("x".getBytes("UTF-8")) finally out.close()
    }
    touch("centroid_id=0/part-0")
    // centroid_id=2 is REFERENCED but never created — external damage
    SegmentManifest.seal(spark, src, SegmentManifest.Manifest(1, Map(
      "cells" -> Seq(SegmentManifest.Entry(0, "centroid_id=0"),
        SegmentManifest.Entry(2, "centroid_id=2")),
      // the marker is skipped by LAYOUT identity, not existence —
      // it must not trip the loud missing-member check
      SegmentManifest.ModelMarker ->
        Seq(SegmentManifest.Entry(3, "model=g3")))))
    val dst = tmp("clone_damaged_dst")
    val err = intercept[org.apache.spark.SparkException] {
      SegmentManifest.cloneGeneration(spark, src, dst)
    }
    assert(err.getMessage.contains("MISSING") ||
        Option(err.getCause).exists(_.getMessage.contains("MISSING")),
      s"wrong damage message: $err")
    // the failed clone sealed nothing: no reader can resolve the dst
    assert(SegmentManifest.generations(spark, dst).isEmpty,
      "a failed clone must not leave a sealed (corrupt) manifest")
  }

  test("syncClone refuses a clone that FORKED locally (sealed a " +
      "generation the source never had) while the source still " +
      "retains a shared generation") {
    def touch(root: String, s: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$root/$s")
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.mkdirs(p.getParent)
      val out = f.create(p, true)
      try out.write("x".getBytes("UTF-8")) finally out.close()
    }
    val src = tmp("sync_fork_src")
    touch(src, "centroid_id=0/part-0")
    val m1 = SegmentManifest.Manifest(1, Map(
      "cells" -> Seq(SegmentManifest.Entry(0, "centroid_id=0"))))
    SegmentManifest.seal(spark, src, m1)
    val dst = tmp("sync_fork_dst")
    SegmentManifest.cloneGeneration(spark, src, dst)
    // the clone FORKS: seals generation 2 locally, which the source
    // never seals — the source moves straight to 3
    SegmentManifest.seal(spark, dst, m1.copy(gen = 2))
    touch(src, "centroid_id=1/part-0")
    SegmentManifest.seal(spark, src, SegmentManifest.Manifest(3, Map(
      "cells" -> Seq(SegmentManifest.Entry(0, "centroid_id=0"),
        SegmentManifest.Entry(1, "centroid_id=1")))))
    val err = intercept[IllegalArgumentException] {
      SegmentManifest.syncClone(spark, src, dst)
    }
    assert(err.getMessage.contains("FORKED"),
      s"wrong fork message: $err")
  }

  test("cloning a legacy (pre-manifest) layout fails loudly") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val base = e.filter(col("vec_id") =!= 0)
    val cents = Similarity.centroids(e, "vec_id", "embedding", step = 10)
    val src = tmp("clone_legacy")
    Similarity.ivfWriteIndexQuantized(base, cents, "vec_id",
      "embedding", src)
    val err = intercept[IllegalArgumentException] {
      SegmentManifest.cloneGeneration(spark, src, tmp("clone_legacy_dst"))
    }
    assert(err.getMessage.contains("no sealed generations"),
      s"wrong legacy message: $err")
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** X1 invariants for the hash-based dedup operators (no DuckDB oracle —
  * xxhash64 is engine-specific, so these pin behavior instead). */
class DedupSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH recall: every high-Jaccard pair is a candidate") {
    val docs = Tables(spark, sf, "documents")
    // ground truth: exact Jaccard ≥ 0.9 via the shared-shingle join
    val truth = TextAnalysis.jaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test data should contain planted near-dups")
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // j=0.9, r=3, b=8 ⇒ P(candidate) = 1−(1−0.729)^8 ≈ 0.99997; on a
    // fixed dataset+seed this is deterministic — assert full recall.
    val missed = truth -- cands
    assert(missed.isEmpty, s"LSH missed high-sim pairs: $missed")
  }

  test("minhash verified near-dups carry exact Jaccard values") {
    val docs = Tables(spark, sf, "documents")
    val exact = TextAnalysis.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val fuzzy = Dedup.minhashNearDups(docs, "doc_id", "text", 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(fuzzy.nonEmpty)
    fuzzy.foreach { case (pair, j) =>
      assert(exact.get(pair).contains(j),
        s"pair $pair: LSH-verified jaccard $j != exact ${exact.get(pair)}")
    }
  }

  test("simhash: identical token sets collide at distance 0") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // identical
      (3L, "delta gamma beta alpha"),   // same token SET (order-free)
      (4L, "zeta eta theta iota kappa lambda mu nu")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", maxDist = 0)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"got $pairs — simhash over distinct tokens must be order-insensitive")
  }

  test("simhash: NULL-text docs fingerprint as 0L and pair with each " +
      "other at distance 0 (the pre-refactor semantics)") {
    import spark.implicits._
    val df = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String]),
      (3L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", maxDist = 0)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"got $pairs — null-text docs must dedup against each other, " +
        "never silently vanish from the pair set")
    val wide = Dedup.simhashNearDupsWide(df, "doc_id", "text",
        maxDist = 0)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == Set((1L, 2L)), s"wide: got $wide")
  }

  test("connected components collapse chained near-dup pairs") {
    import spark.implicits._
    // chain 1-2-3 plus isolated pair 7-9: labels must propagate
    // transitively (1,2,3 → 1) even though (1,3) is not an edge
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    val drops = Dedup.nearDupDropList(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drops == Map(2L -> 1L, 3L -> 1L, 9L -> 7L))
  }

  test("connected components converge on a >2^10-step-free deep chain " +
      "(pointer jumping, not bounded propagation)") {
    import spark.implicits._
    // path graph of diameter 30: plain min-label propagation needs 30
    // rounds (the old maxIter=10 exit returned silently-wrong labels);
    // pointer jumping converges in O(log 30) ≈ 5-6 rounds
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("id1", "id2")
    val comps = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size == 31)
    assert(comps.values.forall(_ == 0L),
      s"all chain nodes must reach label 0, got ${comps.filter(_._2 != 0L)}")
  }

  test("connected components honor a configured reliable checkpoint dir " +
      "(cluster knob) with identical labels") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L), (3L, 4L)).toDF("id1", "id2")
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = scratch("cc-checkpoints/run").toAbsolutePath
    // the scratch dir persists across sbt runs and each run's
    // SparkContext writes under a fresh uuid — start clean or the
    // bounded-leftovers assertion below counts previous runs' snapshots
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "suite precondition: no checkpoint dir configured")
    try {
      sc.setCheckpointDir(dir.toString)
      val viaReliable = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaReliable == local,
        "reliable-checkpoint path must produce identical labels")
      // the knob must actually engage: rounds write RDD data under the
      // dir (Files.walk holds directory handles — close the stream)
      def walkCount(pred: java.nio.file.Path => Boolean): Long = {
        val walk = java.nio.file.Files.walk(dir)
        try walk.filter(p => pred(p)).count() finally walk.close()
      }
      assert(walkCount(_.getFileName.toString.startsWith("part-")) > 0,
        s"no checkpoint part files under $dir — " +
          "reliable checkpointing did not engage")
      // rounds must CLEAN UP behind themselves: a multi-round run may
      // leave only the final round's rdd-* snapshot (Spark itself never
      // deletes these without cleanCheckpoints=true, and then only at
      // GC time — unbounded checkpoint-FS growth for a corpus service)
      val chain = (0L until 30L).map(i => (i, i + 1)).toDF("id1", "id2")
      val labels = Dedup.connectedComponents(chain)
        .collect().map(r => r.getLong(1)).toSet
      assert(labels == Set(0L), "chain must fully collapse under the dir")
      val rddDirs = walkCount(p =>
        p.getFileName.toString.startsWith("rdd-") &&
          java.nio.file.Files.isDirectory(p))
      // pairs-run final + chain-run final (earlier rounds deleted)
      assert(rddDirs <= 2,
        s"$rddDirs rdd-* checkpoint dirs left under $dir — " +
          "per-round cleanup is not working")
    } finally {
      // null resets SparkContext.checkpointDir to None (Option(null)),
      // restoring localCheckpoint behavior for the shared session
      sc.setCheckpointDir(null)
    }
    assert(sc.getCheckpointDir.isEmpty)
  }

  test("wide (128-bit) simhash: order-insensitive collisions, matches " +
      "narrow on identical sets, rejects unguaranteed maxDist") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "delta gamma beta alpha"),
      (4L, "zeta eta theta iota kappa lambda mu nu")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupsWide(df, "doc_id", "text", maxDist = 0)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"got $pairs — 128-bit simhash must be order-insensitive")
    // 4 bands can only pigeonhole-guarantee hamming ≤ 3
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupsWide(df, "doc_id", "text", maxDist = 4)
    }
  }

  test("embedding LSH blocking finds planted near-parallel vectors " +
      "and rejects dissimilar ones") {
    import spark.implicits._
    // 1 and 2 identical (collide in EVERY table — deterministic hit);
    // 3 near-parallel to them; 4/5 pointing elsewhere
    val vecs = Seq(
      (1L, Array(1.0f, 0.2f, 0.1f, 0.0f)),
      (2L, Array(1.0f, 0.2f, 0.1f, 0.0f)),
      (3L, Array(0.98f, 0.22f, 0.12f, 0.01f)),
      (4L, Array(-1.0f, 0.5f, -0.3f, 0.8f)),
      (5L, Array(0.0f, -1.0f, 0.9f, -0.2f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embedNearDupsLSH(vecs, "vec_id", "embedding",
        dim = 4, minSim = 0.99, nPlanes = 4, nTables = 6)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("edit-distance blocking drops oversized stop-token blocks (df cap)") {
    import spark.implicits._
    // a "stop block": 30 docs sharing first token "the" — over the cap
    // of 20, so the block must be DROPPED before the pair join (the
    // skew-bomb defense: on real text this block is the corpus). A
    // 3-doc near-identical block stays under the cap and must survive.
    val stop = (0 until 30).map(i => (100L + i, s"the quick doc number $i pad"))
    val near = Seq(
      (1L, "alpha beta gamma delta one"),
      (2L, "alpha beta gamma delta two"),
      (3L, "alpha beta gamma delta onne"))
    val pairs = Dedup.editNearDups((stop ++ near).toDF("doc_id", "text"),
        "doc_id", "text", headLen = 30, maxDist = 5,
        minBlock = 2, maxBlock = 20)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => a < 100L && b < 100L },
      s"oversized stop-token block must be dropped, not joined — got $pairs")
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("exact dedup keeps one representative per token set") {
    import spark.implicits._
    val df = Seq(
      (10L, "b a"), (20L, "a b"), (30L, "a b b a"), (40L, "c d")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups"))).toMap
    assert(out == Map(10L -> 3L, 40L -> 1L))
  }

  test("clustered (SemDeDup-style) embedding dedup finds planted " +
      "near-parallel vectors and is deterministic across runs") {
    import spark.implicits._
    // two planted near-dup groups on opposite sides of the sphere:
    // 1/2 identical + 3 near-parallel (identical vectors MUST
    // co-cluster: same point → same nearest centroid), and 4/6
    // near-parallel (cos ≈ 0.998) — found even though they live in
    // the OTHER cluster; 5/7 at cos ≈ 0.982 sit under the threshold
    val vecs = Seq(
      (1L, Array(1.0f, 0.2f, 0.1f, 0.0f)),
      (2L, Array(1.0f, 0.2f, 0.1f, 0.0f)),
      (3L, Array(0.98f, 0.22f, 0.12f, 0.01f)),
      (4L, Array(-1.0f, 0.5f, -0.3f, 0.8f)),
      (5L, Array(0.0f, -1.0f, 0.9f, -0.2f)),
      (6L, Array(-0.9f, 0.4f, -0.2f, 0.7f)),
      (7L, Array(0.1f, -0.8f, 1.0f, -0.1f))
    ).toDF("vec_id", "embedding")
    def run() = Dedup.embedNearDupsClustered(vecs, "vec_id", "embedding",
        k = 2, minSim = 0.99)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = run()
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 6L)),
      s"got $pairs")
    assert(run() == pairs, "seeded fit must be deterministic")
  }

  test("SemDeDup keep-best composition: clustered near-dup pairs + " +
      "quality scores keep the argmax member per semantic cluster") {
    import spark.implicits._
    // same planted sphere as the clustered-dedup spec: semantic
    // components {1,2,3} and {4,6}. Scores rank 3 > 2 > 1 and 4 > 6 —
    // the production decision must keep 3 (NOT min-id 1) and 4.
    val vecs = Seq(
      (1L, Array(1.0f, 0.2f, 0.1f, 0.0f)),
      (2L, Array(1.0f, 0.2f, 0.1f, 0.0f)),
      (3L, Array(0.98f, 0.22f, 0.12f, 0.01f)),
      (4L, Array(-1.0f, 0.5f, -0.3f, 0.8f)),
      (5L, Array(0.0f, -1.0f, 0.9f, -0.2f)),
      (6L, Array(-0.9f, 0.4f, -0.2f, 0.7f)),
      (7L, Array(0.1f, -0.8f, 1.0f, -0.1f))
    ).toDF("vec_id", "embedding")
    val scored = Seq((1L, 100L), (2L, 200L), (3L, 300L), (4L, 90L),
      (5L, 10L), (6L, 50L), (7L, 20L)).toDF("doc_id", "n_chars")
    val pairs = Dedup.embedNearDupsClustered(vecs, "vec_id", "embedding",
        k = 2, minSim = 0.99)
      .select(col("id1"), col("id2"))
    val out = Dedup.keepBest(pairs, scored, "doc_id", "n_chars")
      .collect().map(r => (r.getAs[Long]("label"),
        (r.getAs[Long]("kept_id"), r.getAs[Long]("n_members"),
          r.getAs[Long]("best_score")))).toMap
    assert(out == Map(1L -> ((3L, 3L, 300L)), 4L -> ((4L, 2L, 90L))),
      s"got $out")
  }

  test("keepBest keeps the argmax-score member, min-id on ties") {
    import spark.implicits._
    // component {1,2,3} via the chain 1-2, 2-3: doc 2 has the top score
    // (NOT the min id — the policy must beat keep-min-id here);
    // component {7,9}: equal scores, so the tiebreak keeps 7
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val scored = Seq((1L, 10L), (2L, 50L), (3L, 20L), (7L, 30L), (9L, 30L))
      .toDF("doc_id", "score")
    val out = Dedup.keepBest(pairs, scored, "doc_id", "score")
      .collect().map(r => (r.getAs[Long]("label"),
        (r.getAs[Long]("kept_id"), r.getAs[Long]("n_members"),
          r.getAs[Long]("best_score")))).toMap
    assert(out == Map(1L -> ((2L, 3L, 50L)), 7L -> ((7L, 2L, 30L))),
      s"got $out")
  }

  test("keepBest makes score-coverage gaps observable instead of " +
      "silently shrinking components") {
    import spark.implicits._
    // component {1,2,3}: doc 3 is UNSCORED — it must still count in
    // n_members (left join) while max skips its NULL score;
    // component {7,9}: NO member scored — the component survives with
    // best_score NULL and the min-id member kept, not vanishing
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val scored = Seq((1L, 10L), (2L, 50L)).toDF("doc_id", "score")
    val out = Dedup.keepBest(pairs, scored, "doc_id", "score")
      .collect().map(r => (r.getAs[Long]("label"),
        (r.getAs[Long]("kept_id"), r.getAs[Long]("n_members"),
          Option(r.getAs[java.lang.Long]("best_score")).map(_.toLong))))
      .toMap
    assert(out == Map(
      1L -> ((2L, 3L, Some(50L))),
      7L -> ((7L, 2L, None))), s"got $out")
  }

  test("chunk dedup keeps first (doc, position) occurrence corpus-wide") {
    import spark.implicits._
    // chunkSize=3: doc1 = [a b c][d e f]; doc2 = [a b c][x y z];
    // doc3 = [x y z]; doc4 = [p q r][s] (partial tail chunk);
    // doc5 = null text, doc6 = "" — both tokenize to [''] (the
    // engine-wide split convention), so they dedup TOGETHER and both
    // still get their per-doc row ("one row per document, always").
    // "a b c" first occurs at (1,0) → doc2's copy drops;
    // "x y z" first occurs at (2,1) → doc3's copy drops.
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "x y z"),
      (4L, "p q r s"),
      (5L, null.asInstanceOf[String]),
      (6L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedupStats(df, "doc_id", "text", chunkSize = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("toks_kept")))).toMap
    assert(out == Map(
      1L -> ((2L, 2L, 6L)),   // both chunks first occurrences
      2L -> ((2L, 1L, 3L)),   // "a b c" dropped, "x y z" kept
      3L -> ((1L, 0L, 0L)),   // its only chunk seen earlier at (2,1)
      4L -> ((2L, 2L, 4L)),   // partial tail: clen 3 + 1
      5L -> ((1L, 1L, 1L)),   // null → [''] chunk, first occurrence
      6L -> ((1L, 0L, 0L))),  // "" → same [''] chunk, deduped vs doc5
      s"got $out")
  }

  test("chunkDedupApply rewrites documents from surviving chunks in " +
      "order; fully-boilerplate docs come back EMPTY, never deleted") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),  // "a b c" drops → rebuilt as "x y z"
      (3L, "x y z"),        // only chunk seen earlier → empty
      (4L, "d e f a b c")   // BOTH chunks seen at doc1/(2,?) → empty?
    ).toDF("doc_id", "text")
    // keeper rule: "d e f" first occurs at (1,1) — doc4's copy at
    // (4,0) drops; "a b c" first at (1,0) — doc4's (4,1) drops.
    val out = Dedup.chunkDedupApply(df, "doc_id", "text", chunkSize = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("new_text"), r.getAs[Long]("n_chunks_kept"),
          r.getAs[Long]("n_tokens_kept")))).toMap
    assert(out == Map(
      1L -> (("a b c d e f", 2L, 6L)),
      2L -> (("x y z", 1L, 3L)),     // surviving chunk, order kept
      3L -> (("", 0L, 0L)),          // present with empty text
      4L -> (("", 0L, 0L))),
      s"got $out")
  }

  test("sharedSpans: longest diagonal run per pair, minSpan filter, " +
      "sub-n docs inert") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t u v w x y"),        // 8-token run with doc 2
      (2L, "z z p q r s t u v w k"),      // offset by 2 — diag -2
      (3L, "p q r s a b c d"),            // only a 4-token run with 1/2
      (4L, "p q r s t k k v w x y"),      // TWO runs vs doc 1: 5 and 4
      (5L, "p q")                         // shorter than n: no shingles
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(docs, "doc_id", "text", n = 4,
        minSpan = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      (1L, 2L) -> 8L,   // 5 consecutive 4-gram matches → span 8
      (1L, 3L) -> 4L,
      (1L, 4L) -> 5L,   // max of the 5-run and the separate 4-run
      (2L, 3L) -> 4L,
      (2L, 4L) -> 5L,
      (3L, 4L) -> 4L), s"got $out")
    // the registered threshold keeps only the true near-dup pair
    val strict = Dedup.sharedSpans(docs, "doc_id", "text", n = 4,
        minSpan = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(strict == Map((1L, 2L) -> 8L), s"got $strict")
  }

  test("spanCoverage: interval union across pairs, zero-coverage docs " +
      "present, hand-checked fractions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t u v w x y"),
      (2L, "z z p q r s t u v w k"),
      (3L, "p q r s a b c d"),
      (4L, "p q r s t k k v w x y"),
      (5L, "p q")
    ).toDF("doc_id", "text")
    val out = Dedup.spanCoverage(docs, "doc_id", "text", n = 4,
        minSpan = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: [0,7]∪[0,3]∪[0,4]∪[6,9] = [0,9]; doc 4: [0,4]∪[7,10]
    assert(out == Map(
      1L -> ((10L, 10L, 1.0)),
      2L -> ((11L, 8L, 0.7273)),
      3L -> ((8L, 4L, 0.5)),
      4L -> ((11L, 9L, 0.8182)),
      5L -> ((2L, 0L, 0.0))), s"got $out")
  }
}

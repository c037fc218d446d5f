package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X1 — deduplication family for a training-data pipeline.
  *
  * Three tiers, in increasing fuzziness:
  *   1. exact — group by a content signature (sorted distinct tokens),
  *      keep the lowest id. Oracle-checkable.
  *   2. MinHash + LSH — banded signature join: candidates are pairs that
  *      collide in ≥1 band; verified with exact Jaccard. NEVER all-pairs:
  *      the only join key is (band index, band hash), so cost scales with
  *      bucket occupancy, not n². Engine-specific hashes (xxhash64) →
  *      no DuckDB oracle; invariant-tested against planted near-dups.
  *   3. SimHash — 64-bit weighted bit-vote fingerprint; near-dup iff
  *      Hamming distance ≤ k. Candidates via 16-bit band pigeonhole
  *      (d ≤ 3 ⇒ at least one of 4 bands identical).
  *
  * All signature math is higher-order-function expressions (codegen'd,
  * no UDF); the shuffles are groupBy/join on banded keys — the shapes
  * that survive 100 TB.
  */
object Dedup {

  /** Exact dedup signature: order/multiplicity-insensitive token set. */
  def tokenSetSignature(text: Column): Column =
    concat_ws(" ", array_sort(array_distinct(split(text, " "))))

  /** Exact dedup: one representative (min id) + duplicate count per
    * signature. A single hash-aggregate — map-side partial combine makes
    * the shuffle |groups|-sized. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("sig", tokenSetSignature(col(textCol)))
      .groupBy("sig")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature: k hash functions h_i(s) = xxhash64(i, s); the
    * signature component i is min over shingles. One expression per
    * component — no shuffle at all until the band join. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(shingleCol, s => xxhash64(lit(i), s)))): _*)

  /** LSH bands: split the k-component signature into b bands of r = k/b
    * and hash each slice; a pair of docs is a candidate iff some band
    * hash collides. P(candidate) = 1 − (1 − j^r)^b for Jaccard j. */
  def lshBandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(i =>
      struct(lit(i).as("band"),
        hash(slice(sig, i * rowsPerBand + 1, rowsPerBand)).as("bh"))): _*)

  /** Per-doc shingle sets, CACHED: every consumer below references this
    * frame multiple times (signature hashing, both sides of the band
    * self-join, both sides of the verification join). Left lazy, Spark
    * re-evaluates the shingle-construction HOF once per reference —
    * measured 24× per row inside the 24-component signature and 2× more
    * in verification, turning a 3 s computation into 60+ s at sf0.1.
    * At 100 TB the same principle holds at a different tier: the
    * shingle/signature frame is materialized once (table or shuffle
    * reuse), never recomputed per consumer. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int): DataFrame =
    docs.select(col(idCol),
        // pre-hash shingles to longs: the 24 signature hash functions
        // and the intersect/union verification then work on 8-byte
        // keys instead of strings (identical results modulo ~2⁻⁶⁴
        // collisions)
        transform(
          TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), shingleN),
          s => xxhash64(s))
          .as("shs"))
      .cache()

  /** Candidate pairs from banded MinHash LSH.
    *
    * `minBands`: require collision in at least this many bands. With
    * b=8/r=3, a j=0.9 pair collides per band with p=0.73, so P(≥2
    * bands) ≈ 1 — recall for true near-dups is unchanged — while a
    * j=0.3 pair drops from P 0.20 to 0.02: on low-entropy corpora
    * (shared vocabulary) this keeps |candidates| proportional to real
    * near-dups instead of n². */
  def minhashCandidatesFrom(sh: DataFrame, idCol: String,
                            k: Int = 24, bands: Int = 8,
                            minBands: Int = 2): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val sigs = sh.select(col(idCol), minhashSignature(col("shs"), k).as("sig"))
    val banded = sigs.select(col(idCol),
      explode(lshBandHashes(col("sig"), bands, k / bands)).as("bandh"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.bandh") === col("b.bandh") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= minBands)
      .select(col("id1"), col("id2"))
  }

  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, k: Int = 24,
                        bands: Int = 8, minBands: Int = 2): DataFrame =
    minhashCandidatesFrom(shingleSets(docs, idCol, textCol, shingleN),
      idCol, k, bands, minBands)

  /** Full fuzzy dedup: LSH candidates verified with exact n-gram Jaccard
    * (recomputed only for candidate pairs — the expensive exact measure
    * runs on |candidates|, not n²). */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      minJaccard: Double, shingleN: Int = 3,
                      k: Int = 24, bands: Int = 8): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, shingleN)
    val cands = minhashCandidatesFrom(sh, idCol, k, bands)
    val s1 = sh.select(col(idCol).as("did1"), col("shs").as("shs1"))
    val s2 = sh.select(col(idCol).as("did2"), col("shs").as("shs2"))
    cands
      .join(s1, col("id1") === col("did1"))
      .join(s2, col("id2") === col("did2"))
      .select(col("id1"), col("id2"),
        round(size(array_intersect(col("shs1"), col("shs2"))).cast("double") /
          size(array_union(col("shs1"), col("shs2"))).cast("double"), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Connected components over an undirected near-dup pair graph
    * (id1, id2) — the step that turns pairwise similarity into a dedup
    * DECISION: every doc gets the minimum doc-id of its component;
    * keep one representative per component, drop the rest.
    *
    * Iterative min-label propagation: each round, every node adopts the
    * smallest label among itself and its neighbors; converges in
    * O(component diameter) rounds (near-dup clusters are shallow — a
    * handful of rounds in practice, `maxIter` bounds pathology). Each
    * round is one distributed join+aggregate — the standard
    * Pregel-style shape; the driver only checks a one-row convergence
    * count per round.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .cache()
    // materialize the (possibly expensive) pair lineage ONCE before the
    // loop: every iteration and the convergence check re-read this
    edges.count()
    // fold round 1 into initialization: each node starts at
    // min(self, neighbors) instead of self — one fewer join round
    var labels = edges.groupBy(col("a"))
      .agg(least(min(col("b")), col("a")).as("label"))
      .withColumnRenamed("a", "node")
      .cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, edges("b") === labels("node"))
        .groupBy(col("a")).agg(min(col("label")).as("nmin"))
      // carry the previous label through the propagation join so the
      // convergence check needs no extra join — one filter on the
      // already-cached frame instead of a second shuffle per round
      val next = labels
        .join(neighborMin, labels("node") === neighborMin("a"), "left")
        .select(col("node"), col("label").as("prev"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      val changed = next.filter(col("label") =!= col("prev")).limit(1).count()
      labels.unpersist()
      labels = next.select(col("node"), col("label"))
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** Drop-list from verified near-dup pairs: every doc that is NOT the
    * minimum id of its component. `docs.join(dropList, …, "left_anti")`
    * is the final dedup. */
  def nearDupDropList(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .filter(col("node") =!= col("label"))
      .select(col("node").as("drop_id"), col("label").as("kept_id"))

  /** 64-bit SimHash: per bit, tokens vote +1 (bit set in their hash) or
    * −1; the fingerprint bit is the majority. Distinct tokens, weight 1.
    * 64 unrolled codegen'd expressions (i is a Scala literal, so
    * shiftright gets a constant). */
  def simhash(toks: Column): Column =
    simhashFromHashes(transform(array_distinct(toks), t => xxhash64(t)))

  /** Bit votes over an ALREADY-MATERIALIZED hash array column: the 64
    * per-bit expressions each reference `hs`, so callers must alias the
    * token-hash transform into its own projection first (otherwise the
    * transform is inlined and re-evaluated 64× per row — same pathology
    * as the MinHash signature, see [[shingleSets]]). */
  def simhashFromHashes(hs: Column): Column = {
    val n = size(hs)
    (0 until 64).map { i =>
      when(size(filter(hs, h =>
        shiftright(h, i).bitwiseAND(lit(1L)) === lit(1L))) * 2 > n,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist (≤ 3 with 4
    * bands): candidates share at least one identical 16-bit quarter
    * (pigeonhole), then verified with bit_count(xor). */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3): DataFrame = {
    val withHs = docs.select(col(idCol),
      transform(array_distinct(TextAnalysis.tokens(col(textCol))),
        t => xxhash64(t)).as("hs"))
    // cached: `banded` is self-joined as a/b, so without materialization
    // the 64-expression fingerprint pipeline runs TWICE (once per join
    // side) — the same HOF-duplication trap shingleSets documents
    val withSig = withHs.select(col(idCol),
      simhashFromHashes(col("hs")).as("sh64"))
      .cache()
    val banded = withSig.select(col(idCol), col("sh64"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("sh64"), i * 16).bitwiseAND(lit(0xFFFFL)).as("bh"))
      ): _*)).as("bandh"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.bandh") === col("b.bandh") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"),
        bit_count(col("a.sh64").bitwiseXOR(col("b.sh64"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}

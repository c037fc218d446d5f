package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A5 completion — the reference's LAST latent ML import, executed:
  * `data_science.ipynb` cell 2 imports `IsolationForest` without ever
  * calling it; this is the real thing (Liu/Ting/Zhou 2008), designed
  * Spark-first:
  *
  *   - **Fit is driver-side BY THE PAPER'S OWN DESIGN**: an isolation
  *     forest trains on a tiny uniform subsample (canonical ψ = 256
  *     rows, T ≈ 100 trees) — the model is kilobytes, so the fit
  *     belongs with the other deliberately driver-sized artifacts
  *     (learned centroids, broadcast stats), not in a distributed job.
  *     The subsample is drawn deterministically (seeded xxhash64 order)
  *     and each tree's feature/split choices come from a seeded PRNG —
  *     same data + same seed ⇒ bit-identical forest.
  *   - **Scoring is a pure codegen'd expression, not a UDF**: each
  *     trained tree compiles to a nested `when(feature < split, …)`
  *     Column whose leaves are literal depth values; the ensemble mean
  *     and the 2^(−E[h]/c(ψ)) normalization are built-in functions.
  *     Scoring therefore rides whole-stage codegen across the corpus —
  *     the 100 TB path is one narrow projection, no shuffle, no
  *     black-box closure.
  *
  * Score semantics per the paper: s ∈ (0, 1], → 1 for anomalies
  * (isolated in few splits), ≈ 0.5 for average points, → 0 for dense
  * clusters. Path length of an unexpanded leaf of n subsample rows is
  * adjusted by c(n), the expected BST unsuccessful-search depth. */
object IsolationForest {

  sealed trait Node
  final case class Split(feature: Int, threshold: Double,
                         left: Node, right: Node) extends Node
  final case class Leaf(size: Int, depth: Int) extends Node

  final case class Forest(trees: Seq[Node], sampleSize: Int,
                          numFeatures: Int)

  /** Expected unsuccessful-search path length in a BST of n nodes —
    * the paper's c(n) leaf adjustment and score normalizer. */
  def c(n: Int): Double =
    if (n <= 1) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) -
      2.0 * (n - 1.0) / n

  /** Grow one isolation tree over `rows` (each an Array of feature
    * values): random feature, uniform random split between the
    * sample's min and max on that feature, until isolation or the
    * depth limit. Constant-feature subsamples leaf out immediately. */
  private def grow(rows: Array[Array[Double]], depth: Int, limit: Int,
                   rng: scala.util.Random): Node = {
    if (rows.length <= 1 || depth >= limit)
      return Leaf(rows.length, depth)
    val nf = rows(0).length
    // try features in a seeded random order until one has spread
    val order = rng.shuffle((0 until nf).toList)
    order.iterator.map { f =>
      var lo = Double.MaxValue
      var hi = Double.MinValue
      rows.foreach { r =>
        if (r(f) < lo) lo = r(f)
        if (r(f) > hi) hi = r(f)
      }
      (f, lo, hi)
    }.find { case (_, lo, hi) => hi > lo } match {
      case None => Leaf(rows.length, depth) // all features constant
      case Some((f, lo, hi)) =>
        val t = lo + rng.nextDouble() * (hi - lo)
        val (l, r) = rows.partition(_(f) < t)
        // a degenerate split (nextDouble() == 0 → everything ≥ lo on
        // one side) cannot recurse forever: re-leaf instead
        if (l.isEmpty || r.isEmpty) Leaf(rows.length, depth)
        else Split(f, t,
          grow(l, depth + 1, limit, rng),
          grow(r, depth + 1, limit, rng))
    }
  }

  /** Deterministic fit: subsample `data`'s feature columns by seeded
    * xxhash64 of `idCol` (stable across partitionings), then grow
    * `numTrees` seeded trees. NULL/NaN feature rows are excluded from
    * the SAMPLE (a split on NaN is meaningless); scoring still scores
    * them — comparisons with NaN are false, so such rows fall to the
    * right spine and score like sparse points.
    *
    * Defaults (T=25, ψ=128) are sized for EXPRESSION scoring: each
    * tree compiles to ≤2ψ−1 `when` nodes, and 25×255 nodes codegens in
    * well under a second while already giving stable ranks on the
    * paper's own evidence that score variance flattens past ~25 trees.
    * A caller wanting the paper's T=100/ψ=256 at corpus scale should
    * score per-tree columns in batches or go through mapPartitions —
    * at that size expression compilation, not scoring, is the cost. */
  def fit(data: DataFrame, idCol: String, featureCols: Seq[String],
          numTrees: Int = 25, sampleSize: Int = 128,
          seed: Long = 42L): Forest = {
    require(featureCols.nonEmpty, "isolation forest needs features")
    val clean = featureCols.foldLeft(data)((d, f) =>
      d.filter(col(f).isNotNull && !isnan(col(f))))
    val sample = clean
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(sampleSize)
      .select(featureCols.map(f => col(f).cast("double")): _*)
      .collect()
      .map(r => Array.tabulate(featureCols.length)(r.getDouble))
    require(sample.nonEmpty, "isolation forest: empty input")
    val limit = math.ceil(
      math.log(sample.length.toDouble) / math.log(2.0)).toInt.max(1)
    val trees = (0 until numTrees).map { t =>
      grow(sample, 0, limit, new scala.util.Random(seed * 7919 + t))
    }
    Forest(trees, sample.length, featureCols.length)
  }

  /** Compile one tree to a Column: leaves are literal
    * depth + c(leafSize) path lengths, splits are `when` branches over
    * the feature columns — fully codegen'd. */
  private def treeExpr(n: Node, features: Seq[Column]): Column = n match {
    case Leaf(size, depth) => lit(depth + c(size))
    case Split(f, t, l, r) =>
      when(features(f) < lit(t), treeExpr(l, features))
        .otherwise(treeExpr(r, features))
  }

  /** Anomaly score s(x) = 2^(−E[h(x)]/c(ψ)) as a native Column over
    * `featureCols` — attach with `withColumn`. */
  def scoreColumn(forest: Forest, featureCols: Seq[Column]): Column = {
    require(featureCols.length == forest.numFeatures,
      s"forest was fit on ${forest.numFeatures} features")
    val depths = forest.trees.map(treeExpr(_, featureCols))
    val mean = depths.reduce(_ + _) / lit(forest.trees.length.toDouble)
    pow(lit(2.0), -mean / lit(c(forest.sampleSize)))
  }
}

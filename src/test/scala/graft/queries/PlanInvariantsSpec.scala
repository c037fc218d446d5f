package graft.queries

import graft.SparkSpec

/** Structural plan guarantees across the ENTIRE registered query set —
  * the automated form of PLANS.md's audit. Catches scale regressions
  * (an accidental cartesian, a lost pushdown, a globally-sorted top-k)
  * the correctness gate can't see. */
class PlanInvariantsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("no registered query plans a CartesianProduct") {
    // scalar 1-row broadcasts legitimately plan BroadcastNestedLoop;
    // an unconstrained CartesianProduct is never acceptable
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${plan.take(2000)}")
    }
  }

  test("no registered query evaluates a UDF outside the Spark-ML " +
      "model transforms — every engine expression is a built-in or a " +
      "native codegen'd Expression") {
    // the engine-wide codegen contract: custom semantics ship as
    // Catalyst expressions (NormalizeText, ParseBRL, VectorFold,
    // IsolationForest when-trees), never as closures the optimizer
    // can't see through. Spark ML's OWN transforms (KMeans/forest
    // prediction, LSH hashing, vector conversion) are scala-UDF-based
    // inside the ml library — those queries are allowlisted here and
    // asserted EXACTLY, so a UDF creeping into any other plan (or an
    // allowlisted query going clean) is loud either way.
    // (q85 composes q82's ml pairs but returns a CC-derived plan whose
    // lineage is localCheckpoint-truncated — no UDF in the final plan)
    val mlUdfQueries = Set("q32_kmeans", "q40_quality_model",
      "q41_ann_lsh", "q49_tfidf_vectors", "q75_ann_recall",
      "q82_semantic_dedup")
    val withUdf = graft.SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      val plan = planOf(n)
      assert(!plan.contains("BatchEvalPython"),
        s"$n evaluates a Python UDF:\n${plan.take(2000)}")
      plan.contains("UDF(")
    }.toSet
    assert(withUdf == mlUdfQueries,
      s"UDF surface drifted: unexpected=${withUdf -- mlUdfQueries} " +
        s"newly-clean=${mlUdfQueries -- withUdf}")
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort") {
    Seq("q08_topk_customers", "q13_cosine_topk", "q78_vocab_topk",
        "q88_isolation_forest")
      .foreach { name =>
      assert(planOf(name).contains("TakeOrderedAndProject"),
        s"$name should plan per-partition top-k")
    }
  }

  test("date filters reach the parquet scan") {
    Seq("q01_pruned_scan", "q34_date_range").foreach { name =>
      val plan = planOf(name)
      assert(plan.contains("PushedFilters: [IsNotNull") &&
        (plan.contains("GreaterThanOrEqual(") || plan.contains("GreaterThan(")),
        s"$name lost its scan pushdown")
    }
  }

  test("dimension joins broadcast in the region-revenue query") {
    assert(planOf("q07_region_revenue").contains("BroadcastHashJoin"))
  }

  test("pure map-shaped pipeline queries shuffle only for their output " +
      "sort (chunking, redaction, quality gate)") {
    // these must stay scan-speed at 100 TB: one Exchange (the orderBy
    // the gate needs for stable output), nothing else
    Seq("q59_quality_gate", "q62_pii_redact", "q63_chunking").foreach {
      name =>
        val plan = planOf(name)
        val exchanges = "Exchange".r.findAllIn(plan).length -
          "ReusedExchange".r.findAllIn(plan).length
        assert(exchanges <= 1,
          s"$name should be map-only plus its output sort, " +
            s"found $exchanges exchanges:\n${plan.take(2000)}")
    }
  }

  test("deterministic sampling and sketch aggregates are single " +
      "hash-aggregates (map-side combined)") {
    Seq("q60_hash_sample", "q64_approx_stats").foreach { name =>
      val plan = planOf(name)
      assert(plan.contains("HashAggregate") ||
        plan.contains("ObjectHashAggregate"),
        s"$name lost its aggregate form")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("SortMergeJoin"),
        s"$name should not join at all:\n${plan.take(2000)}")
    }
  }

  test("edit-distance near-dup pairs only inside capped blocks: hash " +
      "equi-join plus the block-sizing aggregate, never nested-loop") {
    val plan = planOf("q55_edit_neardup")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q55 fell back to nested-loop join:\n${plan.take(2000)}")
    assert(plan.contains("HashAggregate"),
      "q55 lost its block-sizing aggregate (the df cap would be gone)")
  }

  test("transposed correlation self-joins the cached aggregate, not " +
      "the fact scan") {
    // aggregate-first is the scale contract: the entity×entity join
    // must read the materialized |flags|×|months| frame
    val plan = planOf("q73_transposed_corr")
    assert(plan.contains("InMemoryTableScan"),
      s"q73 should join two reads of the cached aggregate:\n${plan.take(2000)}")
  }

  test("range and interval joins plan bucket equi-joins, never " +
      "nested-loop") {
    // the whole point of the bucketed forms: a bare range/overlap
    // predicate would fall back to BroadcastNestedLoopJoin
    Seq("q37_range_join", "q53_interval_overlap").foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name fell back to nested-loop join:\n${plan.take(2000)}")
    }
  }

  test("chunk dedup joins the cached chunk relation on its digest — " +
      "hash join over InMemoryTableScan, never nested-loop") {
    // the scale contract: chunk text never rides a shuffle; the only
    // join key is the 32-byte md5 digest of the chunk
    val plan = planOf("q80_chunk_dedup")
    assert(plan.contains("InMemoryTableScan"),
      s"q80 lost the shared chunk-relation cache:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"q80 must equi-join on the digest:\n${plan.take(2000)}")
  }

  test("split-leakage audit self-joins the cached distinct signature " +
      "frame, not two corpus scans") {
    val plan = planOf("q81_split_leakage")
    assert(plan.contains("InMemoryTableScan"),
      s"q81 should join two reads of the cached distinct:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"q81 must equi-join on the digest:\n${plan.take(2000)}")
  }

  test("corpus upsert merges via an anti-join on the update-key set, " +
      "never nested-loop") {
    // the q65 steady-state shape: batch ≪ corpus ⇒ the distinct key
    // set broadcasts and the corpus is one scan
    val plan = planOf("q84_corpus_upsert")
    assert(plan.contains("LeftAnti"),
      s"q84 lost its anti-join merge:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"q84 must hash-join on the key:\n${plan.take(2000)}")
  }
}

package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

class CachingSpec extends SparkSpec {
  import spark.implicits._

  private def cachedPlanCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  private def cachedRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def docs = Seq(
    (1L, "a b c a b c a b c"),
    (2L, "a b c a b c a b d"),
    (3L, "x y z w v u t s r")
  ).toDF("doc_id", "text")

  test("cached outside any scope behaves exactly like .cache()") {
    spark.catalog.clearCache()
    val df = Caching.cached(docs.select(col("doc_id") * 2 as "k"))
    df.count()
    assert(df.storageLevel.useMemory, "frame must be cached")
    assert(cachedPlanCount > 0)
    df.unpersist(true)
  }

  test("scoped releases every frame cached inside, and only those") {
    spark.catalog.clearCache()
    // an application-owned cache that must SURVIVE the scope
    val mine = docs.select(col("doc_id")).cache()
    mine.count()
    val before = cachedRddIds
    val result = Caching.scoped {
      // jaccardPairs caches its shingle relation internally
      TextAnalysis.jaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5).count()
    }
    assert(result == 1, "planted near-dup pair (1,2) expected")
    // non-blocking unpersist: poll briefly for the async eviction.
    // Compare ID SETS, not counts: getPersistentRDDs spans the shared
    // session, and the ContextCleaner may concurrently collect STALE
    // RDDs from earlier suites (localCheckpoint blocks are
    // cleaner-owned, not clearCache-owned) during the poll window — a
    // count comparison would let such an eviction mask a genuine
    // one-entry leak. What must hold is that no NEW id survives.
    def leaked = cachedRddIds -- before
    val deadline = System.nanoTime() + 10e9.toLong
    while (leaked.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(leaked.isEmpty,
      "operator-internal caches must be gone after the scope")
    assert(mine.storageLevel.useMemory,
      "application-owned cache must survive the scope")
    mine.unpersist(true)
  }

  test("plans built in a scope stay correct when executed after exit") {
    spark.catalog.clearCache()
    val plan = Caching.scoped {
      TextAnalysis.jaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5)
    }
    // cache is gone; Spark recomputes the uncached subtree — result
    // unchanged (the lifecycle trades reuse, never correctness)
    val rows = plan.orderBy("id1", "id2").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L
      && rows(0).getLong(1) == 2L)
  }

  test("scopes nest: inner releases its own, outer keeps its own") {
    spark.catalog.clearCache()
    Caching.scoped {
      val outer = Caching.cached(docs.select(col("doc_id") + 1 as "v"))
      outer.count()
      Caching.scoped {
        val inner = Caching.cached(docs.select(col("doc_id") + 2 as "w"))
        inner.count()
        assert(inner.storageLevel.useMemory)
      }
      assert(outer.storageLevel.useMemory,
        "outer-scope cache must survive the inner scope's exit")
    }
  }
}

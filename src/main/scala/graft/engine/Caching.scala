package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.Dataset

/** Cache lifecycle for operator-internal multi-consumer frames.
  *
  * Several operators materialize an intermediate frame that feeds two or
  * more downstream consumers (the jaccard shingle relation, LSH band
  * signatures, the bigram relation, the TF doc-term relation, …). Those
  * frames must be cached — without materialization Catalyst differentiates
  * the consumer subtrees and the corpus-sized build runs once per consumer
  * — but a plain `.cache()` has no owner: in a long-lived library session
  * every operator invocation pins blocks until someone calls
  * `spark.catalog.clearCache()`, which also nukes caches the APPLICATION
  * created on purpose.
  *
  * [[cached]] + [[scoped]] give those frames an owner without changing the
  * operator API:
  *
  *   - Operators call `Caching.cached(df)` wherever they would have called
  *     `df.cache()`. Outside any scope the behavior is IDENTICAL to
  *     `.cache()` (the historical caller-must-clear contract).
  *   - A caller that wants bounded cache lifetime wraps build+action in
  *     `Caching.scoped { ... }`: every frame `cached` during the block is
  *     unpersisted (non-blocking) on exit. Scope exit targets only the
  *     frames registered in the block — but Spark's CacheManager keys
  *     entries by analyzed logical plan, so an application cache whose
  *     plan is identical to an operator-internal frame shares the entry
  *     and is released with it. Actions must run inside the scope: a plan
  *     executed after scope exit stays correct (Spark just recomputes the
  *     uncached subtree) but loses the reuse.
  *
  * Scopes nest: an inner scope releases only its own frames. The scope
  * stack is thread-local — plan construction is driver-side and
  * single-threaded per query in this engine (Verify/Bench/gate), and two
  * threads building plans concurrently get independent stacks rather than
  * racing on one.
  *
  * Not covered (by design): `localCheckpoint` blocks (freed by the
  * ContextCleaner when the RDD is collected) and Spark-ML-internal caches
  * (owned by the ML algorithms; `clearCache` in Bench/Verify remains the
  * final sweep for those).
  */
object Caching {

  private final class Scope {
    val tracked = mutable.ArrayBuffer.empty[Dataset[_]]
  }

  private val stack = new ThreadLocal[List[Scope]] {
    override def initialValue(): List[Scope] = Nil
  }

  /** `.cache()` with scope registration. Semantics outside a scope are
    * exactly `Dataset.cache()`. */
  def cached[T](ds: Dataset[T]): Dataset[T] = {
    ds.cache()
    register(ds)
  }

  /** [[cached]] at MEMORY_AND_DISK_SER. For corpus-sized intermediates
    * (exploded shingle relations, self-join build sides). Dataset.persist
    * caches serialized columnar CachedBatches at every storage level, so
    * the _SER flag changes only how the batch wrapper objects are held —
    * what was MEASURED (PLANS.md round-10 warm-rep table: the q39-family
    * 90 GB-heap tax disappearing rep-for-rep) is the win, attributed to
    * disk-spill behavior and first-touch paging of the large cache
    * blocks on a big heap, not to RDD-style object inflation. Small
    * multi-consumer frames (band signatures, tf stats) stay on
    * [[cached]] — for them the re-serialization overhead has no
    * compensating spill win. */
  def cachedSer[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    register(ds)
  }

  private def register[T](ds: Dataset[T]): Dataset[T] = {
    stack.get() match {
      case scope :: _ => scope.tracked += ds
      case Nil        => ()
    }
    ds
  }

  /** Run `body`; on exit unpersist every frame [[cached]] during it
    * (non-blocking — block eviction proceeds asynchronously while the
    * caller moves on). Exceptions propagate after release; a failing
    * unpersist is swallowed per-frame so one bad frame neither leaks the
    * rest nor shadows the body's own exception. */
  def scoped[T](body: => T): T = {
    val scope = new Scope
    stack.set(scope :: stack.get())
    try body
    finally {
      stack.set(stack.get().tail)
      scope.tracked.foreach { ds =>
        try ds.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }
}

package graft.engine

/** One-time allocation-frontier warm-up for big-heap JVMs.
  *
  * On hosts where fresh-page zeroing is slow (~0.3 GB/s measured here),
  * the first query that drives G1 across untouched heap regions pays
  * tens of seconds of first-touch page faults — the round-8 bench
  * record's q39 45.8 s reading at -Xmx90g. build.sbt bounds the
  * frontier (-Xms=-Xmx so G1 never uncommits and re-zeroes,
  * -XX:MaxNewSize=4g so the young frontier stays small); this walks the
  * bounded frontier ONCE, before any measured work, so the zeroing
  * lands in untimed warm-up instead of whichever query runs first.
  * (-XX:+AlwaysPreTouch does the same at JVM startup but costs 5+ min
  * for a 90 GB heap at this host's zeroing rate — far more than the
  * frontier that is ever actually used.)
  *
  * Two touch patterns, matching how Spark actually allocates:
  *   - humongous: 16 MB arrays HELD LIVE while touching, so G1 must
  *     place each in fresh regions (nothing returns to the free list
  *     mid-walk) — covers old-gen/execution-memory style allocation;
  *   - eden churn: small arrays allocated and dropped, cycling the
  *     young generation through its capped size.
  * No-op on heaps ≤ 12 GB: the default 8 GB harness heap gets touched
  * fast enough that queries never notice, and holding gigabytes live
  * there could evict real cache blocks.
  */
object HeapWarmup {
  def touchFrontier(): Unit = {
    val heap = Runtime.getRuntime.maxMemory
    if (heap <= (12L << 30)) return
    val liveTarget = math.min(heap / 4, 10L << 30)
    // 64 MB chunks: Tungsten's page size caps at 64 MB on big heaps, and
    // those humongous allocations need CONTIGUOUS free G1 regions — a
    // walk in smaller chunks leaves gaps that force later 64 MB pages
    // into untouched address space (measured: 16 MB chunks only cut the
    // first-query tax from ~31 s to ~18 s; the remainder was exactly the
    // first hash-aggregate stages faulting their 64 MB pages in)
    val chunk = 64 << 20
    val nThreads = 16
    val perThread = (liveTarget / chunk / nThreads).toInt
    val threads = (0 until nThreads).map { _ =>
      val t = new Thread(() => {
        // held-live humongous walk
        val held = new Array[Array[Byte]](perThread)
        var i = 0
        while (i < perThread) {
          val a = new Array[Byte](chunk)
          var p = 0
          while (p < a.length) { a(p) = 1; p += 4096 }
          held(i) = a
          i += 1
        }
        // eden churn: ~512 MB/thread of dropped small arrays
        var j = 0
        while (j < 2048) {
          val a = new Array[Byte](256 << 10)
          var p = 0
          while (p < a.length) { a(p) = 1; p += 4096 }
          j += 1
        }
        // keep `held` reachable to this point
        if (held.length > 0 && held(0)(0) == 2) println("")
      })
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
  }
}

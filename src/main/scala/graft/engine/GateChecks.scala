package graft.engine

import org.apache.spark.sql.DataFrame

/** Self-enforcing invariants for the rows-only gate rows.
  *
  * Eleven registered queries have no SQL oracle (seeded ML fits, LSH
  * hash families, sketch internals) — the driver's only signal on them
  * is whether the builder THREW. Until round 11 their invariants lived
  * exclusively in ScalaTest, so a silent regression in a seeded path
  * (changed seed, broken recall, collapsed clustering) would still read
  * "green gate" in the record that counts. The helpers here embed each
  * row's invariant in the query builder itself: a breach throws at
  * build time, which turns the driver's row `err`-red — the rows-only
  * check becomes driver-enforced instead of spec-trusted.
  *
  * Two mechanisms:
  *
  *   - [[requirePinned]]: a seeded-DETERMINISM digest. The flagged
  *     queries are deterministic by construction (fixed seeds, fixed
  *     data, fixed session layout — their specs assert it), so their
  *     exact output at a known scale factor is pinnable. Digests are
  *     keyed by (query, sf-dir basename); an unknown basename skips the
  *     digest (structural checks still apply) so the library stays
  *     usable on arbitrary data. `GRAFT_PRINT_DIGESTS=1` switches to
  *     print mode — the re-pin path when testdata legitimately changes
  *     (tools/GateDigests).
  *   - plain `require(...)` structural checks written inline in the
  *     builders (cluster counts, recall floors, rank-tolerance bounds
  *     for sketches) — scale-free invariants that hold on any input.
  *
  * The digest collects the OUTPUT frame — every rows-only gate row is
  * ≤ corpus-doc-count rows of scalars (the largest, q49, is one row per
  * document) — and the builders cache the frame first, so the driver's
  * subsequent write reuses the materialization instead of re-running
  * the plan.
  */
object GateChecks {

  /** Deterministic digest of a SMALL result frame: md5 over the sorted
    * `\u0001`-joined row renderings. Sorting makes the digest
    * partition-order-independent; the gate rows' values are already
    * deterministic (rounded doubles, longs, strings). */
  def digestOf(df: DataFrame): String = {
    val rows = df.collect().map(_.mkString("\u0001")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(rows.mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  def sfKey(dir: String): String =
    new java.io.File(dir).getName

  /** Pinned seeded-determinism digests, (query, sf-dir basename) →
    * digest — the values live in [[PinnedDigests]] (one paste-target
    * file). Regenerate with `GRAFT_PRINT_DIGESTS=1 runMain
    * graft.tools.GateDigests` when the testdata legitimately changes,
    * and paste the block THERE, not here. */
  private val pinned: Map[(String, String), String] = PinnedDigests.all

  /** Enforce the pinned digest when one exists for (name, basename of
    * dir). In print mode ([[printMode]]), emit the observed digest
    * instead — the re-pin path. Returns `df` unchanged. */
  def requirePinned(name: String, dir: String, df: DataFrame): DataFrame = {
    if (printMode) {
      println(s"DIGEST\t$name\t${sfKey(dir)}\t${digestOf(df)}")
      df
    } else pinned.get((name, sfKey(dir))) match {
      case Some(exp) =>
        val got = digestOf(df)
        require(got == exp,
          s"$name: seeded-determinism digest mismatch at ${sfKey(dir)}: " +
            s"got $got, pinned $exp — a seeded path changed behavior " +
            "(re-pin via graft.tools.GateDigests only if intentional)")
        df
      case None => df
    }
  }

  private def printMode: Boolean =
    sys.env.contains("GRAFT_PRINT_DIGESTS")
}

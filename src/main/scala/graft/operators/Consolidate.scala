package graft.operators

import org.apache.spark.sql.DataFrame

/** U1/U2/O1 — schema-drift-tolerant consolidation (SURVEY.md §2.5).
  *
  * The reference consolidates per-month CSVs whose column sets drift
  * (dynamic detail columns) with `pd.concat(ignore_index=True)`, which
  * aligns BY NAME and fills missing columns with NaN
  * (`/root/reference/src/common/file_utils.py:31-51`). The Spark
  * equivalent is `unionByName(allowMissingColumns = true)` — positional
  * `union` would silently mis-align drifted schemas.
  *
  * Scale note: a fold of unionByName builds a linear plan of Union nodes;
  * Catalyst collapses adjacent Unions into one n-ary Union, so 12 monthly
  * inputs stay a single-stage scan-union (no shuffle) at any data size.
  */
object Consolidate {
  def apply(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "consolidate of zero frames")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Pandas-concat column-order parity: pandas keeps first-frame column
    * order then appends new columns in encounter order; unionByName keeps
    * left-frame order and appends missing right columns — same rule, but
    * pin it with an explicit select so oracle comparison is stable.
    */
  def orderedColumns(dfs: Seq[DataFrame]): Seq[String] =
    dfs.foldLeft(Vector.empty[String]) { (acc, df) =>
      acc ++ df.columns.filterNot(acc.contains)
    }
}

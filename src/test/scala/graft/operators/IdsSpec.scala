package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dense-id invariants: the distributed two-pass must equal the global
  * row_number it replaces, stay dense/0-based, and keep the
  * corpus-sized windows partition-local. */
class IdsSpec extends SparkSpec {

  test("contiguousIds equals global row_number - 1, dense and stable " +
      "across partition counts") {
    import spark.implicits._
    val df = (1 to 997).map(i => (i.toLong, s"s${i % 7}"))
      .toDF("k", "grp").repartition(13)
    val out = Ids.contiguousIds(df, "row_id", col("grp"), col("k"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("k"),
        r.getAs[Long]("row_id")))
    val expected = out.map { case (g, k, _) => (g, k) }
      .sortBy(identity).zipWithIndex
      .map { case ((g, k), i) => (g, k, i.toLong) }.toSet
    assert(out.toSet == expected)
    val ids = out.map(_._3).sorted
    assert(ids.head == 0L && ids.last == 996L &&
      ids.distinct.length == 997)
  }

  test("the corpus path carries NO window at all — numbering is " +
      "arithmetic on mid; the only window is the tiny offsets " +
      "prefix-sum, and the corpus shuffles exactly once (range)") {
    import spark.implicits._
    val df = (1 to 100).map(_.toLong).toDF("k")
    val plan = Ids.contiguousIds(df, "row_id", col("k"))
      .queryExecution.executedPlan.toString
    // row_number anywhere would mean a numbering window returned —
    // the single-task-regression this spec pins against. (Shuffle
    // COUNTS can't be asserted from the plan string: the cached
    // frame's subtree prints once per consumer, duplicating its one
    // range exchange in the text.)
    assert(!plan.contains("row_number"),
      s"numbering regressed to a window:\n${plan.take(2000)}")
    assert(plan.contains("Exchange rangepartitioning"),
      "the range-partitioning pass disappeared")
  }
}

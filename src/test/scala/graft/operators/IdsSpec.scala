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

  test("the corpus-sized numbering window is per-partition (no global " +
      "single-partition exchange feeding a corpus window)") {
    import spark.implicits._
    val df = (1 to 100).map(_.toLong).toDF("k")
    val plan = Ids.contiguousIds(df, "row_id", col("k"))
      .queryExecution.executedPlan.toString
    // the numbering window must be partitioned by _pid; only the
    // |partitions|-row offsets frame may use an unpartitioned window
    assert(plan.contains("windowspecdefinition(_pid"),
      s"numbering window is not per-partition:\n${plan.take(2000)}")
  }
}

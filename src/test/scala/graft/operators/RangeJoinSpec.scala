package graft.operators

import graft.SparkSpec

/** Bucketed range-join semantics: exact band membership, exclusive hi,
  * and the degenerate-range guard (hi <= lo must contribute NOTHING —
  * a bare sequence() would descend and explode spurious buckets). */
class RangeJoinSpec extends SparkSpec {

  test("values land in their band; hi bound is exclusive") {
    import spark.implicits._
    val fact = Seq((1L, 0.0), (2L, 49.99), (3L, 50.0), (4L, 99.9))
      .toDF("id", "value")
    val ranges = Seq((0.0, 50.0, "lo"), (50.0, 100.0, "hi"))
      .toDF("lo", "hi", "band")
    val out = RangeJoin.bucketedRangeJoin(fact, ranges, "value", "lo", "hi",
        width = 50.0)
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "lo"), (2L, "lo"), (3L, "hi"), (4L, "hi")),
      s"got $out — 50.0 must fall in [50,100), not [0,50)")
  }

  test("inverted and empty ranges (hi <= lo) produce zero rows") {
    import spark.implicits._
    val fact = Seq((1L, 10.0), (2L, 75.0)).toDF("id", "value")
    val ranges = Seq(
      (0.0, 50.0, "ok"),       // normal
      (90.0, 20.0, "inverted"), // hi < lo: would explode descending buckets
      (75.0, 75.0, "empty")     // hi == lo: empty interval
    ).toDF("lo", "hi", "band")
    val out = RangeJoin.bucketedRangeJoin(fact, ranges, "value", "lo", "hi",
        width = 50.0)
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "ok")),
      s"got $out — degenerate ranges must match nothing")
  }
}

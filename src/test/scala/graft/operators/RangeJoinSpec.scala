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

  test("interval overlap join: exact pairs, no duplicates across " +
      "shared buckets, touching and empty intervals excluded") {
    import spark.implicits._
    val a = Seq(
      (1L, 0.0, 100.0),   // spans many buckets
      (2L, 95.0, 105.0),  // crosses a bucket boundary
      (3L, 200.0, 200.0), // empty
      (4L, 300.0, 310.0)  // overlaps nothing
    ).toDF("aid", "alo", "ahi")
    val b = Seq(
      (10L, 50.0, 60.0),   // inside a1 (shares buckets 5)
      (11L, 90.0, 120.0),  // overlaps a1 AND a2, spans several buckets
      (12L, 100.0, 110.0), // touches a1 at 100 (half-open: NO overlap), overlaps a2
      (13L, 195.0, 205.0)  // would overlap a3 if [200,200) were non-empty
    ).toDF("bid", "blo", "bhi")
    val out = RangeJoin.intervalOverlapJoin(a, b, "alo", "ahi", "blo", "bhi",
        width = 10.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, "duplicate pair emitted")
    assert(out.toSet == Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L)),
      s"got ${out.toSet}")
  }

  test("negative values and ranges bucket correctly (floor, not " +
      "truncate-toward-zero)") {
    import spark.implicits._
    // floor(-25/50) = -1, trunc would give 0 and miss the bucket match
    val fact = Seq((1L, -25.0), (2L, -75.0), (3L, 25.0)).toDF("id", "value")
    val ranges = Seq((-50.0, 0.0, "neg"), (0.0, 50.0, "pos"))
      .toDF("lo", "hi", "band")
    val out = RangeJoin.bucketedRangeJoin(fact, ranges, "value", "lo", "hi",
        width = 50.0)
      .select("id", "band").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "neg"), (3L, "pos")), s"got $out")
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

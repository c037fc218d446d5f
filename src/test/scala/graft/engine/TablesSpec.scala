package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tables reader contracts: the nanos→micros conversion must FLOOR for
  * pre-1970 timestamps (plain `div 1000` truncates toward zero, i.e.
  * rounds negative nanos UP), and the conversion must only fire on the
  * events table's long-typed ts. */
class TablesSpec extends SparkSpec {

  test("nanos to micros conversion floors negative (pre-1970) values") {
    import spark.implicits._
    val dir = scratch("tables_nanos").toString
    // write an events.parquet whose ts is a raw long nanos column —
    // the shape Tables detects and converts
    Seq(
      (1L, -1500L),        // -1.5 µs → floor −2 µs, NOT trunc −1
      (2L, 1500L),         // +1.5 µs → 1 µs
      (3L, -1000000000L),  // exactly −1 s
      (4L, 0L)
    ).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = Tables(spark, dir, "events")
      .select(col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == -2L, s"pre-1970 nanos must floor: got ${out(1L)}")
    assert(out(2L) == 1L)
    assert(out(3L) == -1000000L)
    assert(out(4L) == 0L)
  }
}

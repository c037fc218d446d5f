package graft.operators

import graft.SparkSpec

/** As-of join edge semantics: inclusive equality, carry-forward across
  * multiple left rows, NULL when no prior right row. */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of: inclusive match, carry-forward, left-join nulls") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:05")),  // before any right → NULL
      (2L, 100L, ts("2024-01-01 10:00:10")),  // == right ts → inclusive match
      (3L, 100L, ts("2024-01-01 10:00:30")),  // after both → latest (10:00:20)
      (4L, 200L, ts("2024-01-01 10:00:30"))   // other key, no right rows → NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:10"), 1.0),
      (100L, ts("2024-01-01 10:00:20"), 2.0)
    ).toDF("user_id", "ts", "value")

    val out = AsOfJoin.backward(left, right, "user_id", "ts", "ts",
        Map("value" -> "v"))
      .orderBy("event_id").collect()

    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(0).isNullAt(3), "no prior right row → NULL")
    assert(out(1).getDouble(3) == 1.0, "equal ts matches (inclusive)")
    assert(out(2).getDouble(3) == 2.0, "latest prior row wins")
    assert(out(3).isNullAt(3), "key with no right rows → NULL")
  }

  test("payload is row-atomic: NULLs in the latest match are NOT " +
      "backfilled from older right rows") {
    import spark.implicits._
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:30")))
      .toDF("event_id", "user_id", "ts")
    // latest right row (10:00:20) has value=NULL: a per-column carry
    // would mix value=1.0 (from 10:00:10) with note="b" (from 10:00:20)
    // — columns from two DIFFERENT right rows
    val right = Seq(
      (100L, ts("2024-01-01 10:00:10"), Option(1.0), "a"),
      (100L, ts("2024-01-01 10:00:20"), None: Option[Double], "b")
    ).toDF("user_id", "ts", "value", "note")

    val out = AsOfJoin.backward(left, right, "user_id", "ts", "ts",
        Map("value" -> "v", "note" -> "n")).collect()(0)
    assert(out.getAs[String]("n") == "b")
    assert(out.isNullAt(out.fieldIndex("v")),
      "value must be the latest row's NULL, not an older row's 1.0")
  }

  test("forward as-of matches the earliest right row at-or-after, " +
      "inclusive, NULL when none follows") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:15")), // between rights → 10:00:20
      (2L, 100L, ts("2024-01-01 10:00:20")), // equal ts → inclusive match
      (3L, 100L, ts("2024-01-01 10:00:30")), // after all rights → NULL
      (4L, 200L, ts("2024-01-01 10:00:00"))  // key with no rights → NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:10"), 1.0),
      (100L, ts("2024-01-01 10:00:20"), 2.0)
    ).toDF("user_id", "ts", "value")
    val out = AsOfJoin.forward(left, right, "user_id", "ts", "ts",
        Map("value" -> "v"))
      .orderBy("event_id").collect()
    assert(out(0).getDouble(3) == 2.0, "earliest following row wins")
    assert(out(1).getDouble(3) == 2.0, "equal ts matches (inclusive)")
    assert(out(2).isNullAt(3), "no following right row → NULL")
    assert(out(3).isNullAt(3), "key with no right rows → NULL")
  }

  test("equal-ts right duplicates resolve deterministically " +
      "(greatest payload tuple)") {
    import spark.implicits._
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:10")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:10"), 2.0),
      (100L, ts("2024-01-01 10:00:10"), 1.0),
      (100L, ts("2024-01-01 10:00:10"), 3.0)
    ).toDF("user_id", "ts", "value")
    // repeat with shuffled input partitioning: result must not depend
    // on physical row order
    (1 to 3).foreach { _ =>
      val out = AsOfJoin.backward(left.repartition(3), right.repartition(4),
        "user_id", "ts", "ts", Map("value" -> "v")).collect()(0)
      assert(out.getAs[Double]("v") == 3.0)
    }
  }
}

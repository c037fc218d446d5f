package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-refresh semantics: replace same-key, append new-key,
  * last-wins version collapse with a deterministic tiebreak. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("byKey replaces same-key rows and appends new keys") {
    val corpus = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("id", "text")
    val updates = Seq((2L, "TWO"), (9L, "nine")).toDF("id", "text")
    val out = Upsert.byKey(corpus, updates, "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("text"))
      .toMap
    assert(out == Map(1L -> "one", 2L -> "TWO", 3L -> "three",
      9L -> "nine"), s"got $out")
  }

  test("latestByKey keeps the highest version per key, ties broken by " +
      "the min tiebreak column") {
    val updates = Seq(
      (1L, "v1", 1L), (1L, "v2", 2L),            // clean last-wins
      (2L, "b", 5L), (2L, "a", 5L),              // equal ord → min text
      (3L, "only", 1L)
    ).toDF("id", "text", "v")
    val out = Upsert.latestByKey(updates, "id", "v", rowTieBreak = "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("v"))))
      .toMap
    assert(out == Map(1L -> (("v2", 2L)), 2L -> (("a", 5L)),
      3L -> (("only", 1L))), s"got $out")
  }

  test("re-delivered (fully duplicate) rows collapse to one winner, " +
      "and all-NULL-version keys survive instead of vanishing") {
    // retry case: (1, "x", 1) delivered twice — must NOT fan out;
    // missing-version case: key 2 only has NULL versions — must NOT
    // be dropped (max skips NULLs; the winner match is null-safe)
    val updates = Seq(
      (1L, "x", Some(1L)), (1L, "x", Some(1L)),
      (2L, "novers", None), (2L, "novers2", None)
    ).toDF("id", "text", "v")
    val out = Upsert.latestByKey(updates, "id", "v", rowTieBreak = "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("text"))
      .toMap
    assert(out == Map(1L -> "x", 2L -> "novers"), s"got $out")
    assert(Upsert.latestByKey(updates, "id", "v", rowTieBreak = "text")
      .groupBy(col("id")).count().filter(col("count") > 1).count() == 0,
      "one row per key, always")
  }

  test("NULL keys are one logical key: they collapse in latestByKey " +
      "and replace (not duplicate) a NULL-key corpus row in byKey") {
    // the round-7 advice case: with null-unsafe key joins the NULL-key
    // update rows vanished in latestByKey, and in byKey the NULL-key
    // corpus row never matched the anti-join while the NULL-key update
    // still appended — duplicating the logical key
    val updates = Seq(
      (Some(1L), "one", 1L),
      (None, "nk-v1", 1L), (None, "nk-v2", 2L)
    ).toDF("id", "text", "v")
    val latest = Upsert.latestByKey(updates, "id", "v", rowTieBreak = "text")
      .collect().map(r => Option(r.getAs[java.lang.Long]("id")).map(_.toLong) ->
        r.getAs[String]("text")).toMap
    assert(latest == Map(Some(1L) -> "one", None -> "nk-v2"),
      s"NULL key must rank like any other key; got $latest")

    val corpus = Seq((Some(2L), "two", 0L), (None, "nk-old", 0L))
      .toDF("id", "text", "v")
    val merged = Upsert.byKey(corpus,
      Upsert.latestByKey(updates, "id", "v", rowTieBreak = "text"), "id")
      .collect().map(r => Option(r.getAs[java.lang.Long]("id")).map(_.toLong) ->
        r.getAs[String]("text")).toMap
    assert(merged == Map(Some(1L) -> "one", Some(2L) -> "two",
      None -> "nk-v2"),
      s"NULL-key update must replace the NULL-key corpus row; got $merged")
  }

  test("diffByKey classifies added/removed/modified/unchanged, " +
      "null-safe on both key and signature") {
    import spark.implicits._
    val older = Seq(
      (Option(1L), Option("s1")),      // unchanged
      (Option(2L), Option("s2")),      // modified
      (Option(3L), Option("s3")),      // removed
      (Option.empty[Long], Option("sN")), // null key, sig changes
      (Option(5L), Option.empty[String])  // null sig both sides
    ).toDF("id", "sig")
    val newer = Seq(
      (Option(1L), Option("s1")),
      (Option(2L), Option("s2x")),
      (Option(4L), Option("s4")),      // added
      (Option.empty[Long], Option("sM")),
      (Option(5L), Option.empty[String])
    ).toDF("id", "sig")
    val d = Upsert.diffByKey(older, newer, "id", "sig")
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull ->
        r.getString(1)).toMap
    assert(d == Map("1" -> "unchanged", "2" -> "modified",
      "3" -> "removed", "4" -> "added", (null: String) -> "modified",
      "5" -> "unchanged"), s"got $d")
  }

  test("composed refresh: multi-wave batch collapses before merging, " +
      "so the corpus sees exactly one row per key") {
    val corpus = Seq((1L, "old", 0L), (2L, "keep", 0L))
      .toDF("id", "text", "v")
    val waves = Seq((1L, "mid", 1L), (1L, "new", 2L), (5L, "ins", 1L))
      .toDF("id", "text", "v")
    val merged = Upsert.byKey(corpus,
      Upsert.latestByKey(waves, "id", "v", rowTieBreak = "text"), "id")
    assert(merged.groupBy(col("id")).count()
      .filter(col("count") > 1).count() == 0,
      "merge must never produce duplicate keys")
    val out = merged.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("text")).toMap
    assert(out == Map(1L -> "new", 2L -> "keep", 5L -> "ins"),
      s"got $out")
  }
}

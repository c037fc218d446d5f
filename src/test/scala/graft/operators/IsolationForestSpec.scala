package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Isolation forest: planted-outlier detection, score-range and
  * determinism invariants, and the c(n) normalizer math. */
class IsolationForestSpec extends SparkSpec {
  import spark.implicits._

  private def cluster(n: Int): Seq[(Long, Double, Double)] =
    (1 to n).map { i =>
      // tight deterministic cluster around (0, 0)
      (i.toLong, 0.05 * ((i * 7) % 11 - 5), 0.05 * ((i * 13) % 11 - 5))
    }

  test("planted outliers score far above a tight cluster, and every " +
      "score is in (0, 1]") {
    val df = (cluster(200) ++ Seq((900L, 8.0, -7.5), (901L, -9.0, 9.0)))
      .toDF("id", "x", "y")
    val forest = IsolationForest.fit(df, "id", Seq("x", "y"))
    val scored = df.withColumn("s",
        IsolationForest.scoreColumn(forest, Seq(col("x"), col("y"))))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("s"))
      .toMap
    assert(scored.values.forall(s => s > 0 && s <= 1),
      "scores must lie in (0, 1]")
    val top2 = scored.toSeq.sortBy(-_._2).take(2).map(_._1).toSet
    assert(top2 == Set(900L, 901L),
      s"planted outliers must rank first; top2=$top2")
    val clusterMax = scored.filter(_._1 < 900).values.max
    assert(scored(900L) > clusterMax + 0.1 && scored(901L) > clusterMax + 0.1,
      "outlier scores must separate clearly, not by a rank hair")
  }

  test("seeded fit is deterministic and partitioning-insensitive") {
    val df = (cluster(100) ++ Seq((900L, 5.0, 5.0))).toDF("id", "x", "y")
    def scores(d: org.apache.spark.sql.DataFrame): Map[Long, Double] = {
      val f = IsolationForest.fit(d, "id", Seq("x", "y"))
      d.withColumn("s",
          IsolationForest.scoreColumn(f, Seq(col("x"), col("y"))))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("s"))
        .toMap
    }
    val a = scores(df)
    assert(scores(df.repartition(7)) == a,
      "same seed + same data must give identical scores regardless of " +
        "partitioning (the subsample is hash-ordered, not partition-ordered)")
  }

  test("c(n) matches the paper's BST expectation") {
    assert(IsolationForest.c(1) == 0.0)
    // c(2) = 2·H(1) − 2·(1/2) = 2γ − 1 (H(1) = ln 1 + γ = γ)
    assert(math.abs(IsolationForest.c(2) -
      (2.0 * 0.5772156649015329 - 1.0)) < 1e-12)
    // c is increasing and ~2 ln(n) for large n
    assert(IsolationForest.c(256) > IsolationForest.c(64))
    assert(math.abs(IsolationForest.c(1000) -
      (2 * (math.log(999) + 0.5772156649015329) - 2 * 999.0 / 1000)) < 1e-12)
  }

  test("scoring stays a native expression (no UDF in the plan) and " +
      "NULL-feature rows score without poisoning the batch") {
    val df = (cluster(50) :+ ((900L, 4.0, 4.0))).toDF("id", "x", "y")
      .unionByName(Seq((999L, Option.empty[Double], Option(1.0)))
        .toDF("id", "x", "y"))
    val forest = IsolationForest.fit(df, "id", Seq("x", "y"))
    val scored = df.withColumn("s",
      IsolationForest.scoreColumn(forest, Seq(col("x"), col("y"))))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"),
      "scoring must compile to built-in expressions")
    val rows = scored.collect()
    assert(rows.length == 52)
    // the NULL-x row still gets a finite score (falls down the right
    // spine of every split on x)
    val nullRow = rows.find(_.getAs[Long]("id") == 999L).get
    val s = nullRow.getAs[Double]("s")
    assert(!s.isNaN && s > 0 && s <= 1, s"NULL-feature score was $s")
  }
}

package graft.operators

import graft.SparkSpec

/** TopK Aggregator: bounded buffer across partitions (merge path),
  * deterministic tie-break. */
class TopKSpec extends SparkSpec {

  test("top-k survives partial aggregation across many partitions") {
    import spark.implicits._
    // scores equal to id mod 7 → many ties; spread over 8 partitions so
    // merge() actually combines partial buffers
    val ds = (1L to 1000L).map(i => (i % 5, i, (i % 7).toDouble))
      .toDS().repartition(8)
    val out = ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TopK.topK(3).toColumn)
      .collect().toMap

    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L))
    out.foreach { case (g, tops) =>
      assert(tops.length == 3)
      // best-first ordering: score desc, id asc on ties
      assert(tops.map(_._2).toSeq == tops.map(_._2).sorted.reverse)
      val expected = (1L to 1000L).filter(_ % 5 == g)
        .map(i => (i, (i % 7).toDouble))
        .sortBy { case (id, s) => (-s, id) }.take(3)
      assert(tops.toSeq == expected, s"group $g")
    }
  }
}

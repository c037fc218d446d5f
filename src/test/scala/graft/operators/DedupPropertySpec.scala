package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Randomized invariants for the chunker and the upsert collapse —
  * the planted-fixture specs pin exact expected outputs; these sweep
  * the input space for the structural guarantees the operators
  * promise for ANY corpus. Raw ScalaCheck Gen sampling (the
  * scalatest-scalacheck bridge artifact isn't in the offline cache),
  * fixed seeds so failures reproduce.
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(30),
      org.scalacheck.rng.Seed(seed)).get

  private val tinyVocab = Gen.nonEmptyListOf(
    Gen.oneOf("a", "b", "c", "dd", "eee")).map(_.mkString(" "))

  test("chunk accounting conserves every token exactly once " +
      "(random corpora × chunk sizes)") {
    (0 until 8).foreach { rep =>
      val texts = (0 until 20).map(i =>
        sample(tinyVocab, seed = 1000L * rep + i))
      val cs = 1 + rep % 5
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.chunkDedupStats(docs, "doc_id", "text", cs)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
            r.getAs[Long]("toks_kept")))).toMap
      // one output row per input doc, n_chunks = ceil(tokens/cs),
      // kept never exceeds total, token accounting bounded by doc size
      assert(out.size == texts.size, s"rep $rep: lost documents")
      texts.zipWithIndex.foreach { case (t, i) =>
        val n = t.split(" ").length.toLong
        val (nc, nk, tk) = out(i.toLong)
        assert(nc == (n + cs - 1) / cs, s"rep $rep doc $i: chunks")
        assert(nk >= 0 && nk <= nc, s"rep $rep doc $i: kept range")
        assert(tk >= 0 && tk <= n, s"rep $rep doc $i: token range")
      }
      // conservation: every distinct chunk is kept exactly once
      // corpus-wide, so Σ toks_kept = tokens of the distinct chunk set
      val distinctChunkTokens = texts.zipWithIndex
        .flatMap { case (t, _) => t.split(" ").grouped(cs).map(_.mkString(" ")) }
        .distinct.map(_.split(" ").length.toLong).sum
      val keptTotal = out.values.map(_._3).sum
      assert(keptTotal == distinctChunkTokens,
        s"rep $rep: kept $keptTotal tokens, distinct chunks hold " +
          s"$distinctChunkTokens")
    }
  }

  test("latestByKey yields exactly one row per key for arbitrary " +
      "batches (duplicates, null versions, ties)") {
    val row = for {
      k <- Gen.choose(0L, 6L)
      t <- Gen.oneOf("p", "q", "r", "s")
      v <- Gen.option(Gen.choose(0L, 3L))
    } yield (k, t, v)
    (0 until 8).foreach { rep =>
      val rows = (0 until 40).map(i =>
        sample(row, seed = 7000L * rep + i))
      val df = rows.toDF("id", "text", "v")
      val out = Upsert.latestByKey(df, "id", "v", rowTieBreak = "text")
        .collect().map(r => (r.getAs[Long]("id"),
          r.getAs[String]("text"), Option(r.get(2)).map(_.toString)))
      val keys = rows.map(_._1).distinct.sorted
      assert(out.map(_._1).sorted.toSeq == keys,
        s"rep $rep: every input key exactly once — got " +
          s"${out.map(_._1).sorted.toSeq} vs $keys")
      // the winner per key carries the maximal non-null version (or
      // null when the key has only null versions)
      val byKey = rows.groupBy(_._1)
      out.foreach { case (k, _, v) =>
        val best = byKey(k).flatMap(_._3).sorted.lastOption
        assert(v.map(_.toLong) == best,
          s"rep $rep key $k: version $v != max $best")
      }
    }
  }

  test("sharedSpans equals brute-force longest common token substring " +
      "on random corpora (n=2, all spans >= n reported)") {
    // brute force: longest common contiguous token run between 2 docs
    def lcts(a: Array[String], b: Array[String]): Int = {
      var best = 0
      for (i <- a.indices; j <- b.indices) {
        var k = 0
        while (i + k < a.length && j + k < b.length &&
          a(i + k) == b(j + k)) k += 1
        best = math.max(best, k)
      }
      best
    }
    (0 until 4).foreach { rep =>
      val texts = (0 until 12).map(i =>
        sample(tinyVocab, seed = 7000L * rep + i))
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // cap lifted: the tiny vocabulary makes every shingle a
      // stop-shingle; the property pins the span math, not the cap
      val out = Dedup.sharedSpans(docs, "doc_id", "text", n = 2,
          minSpan = 2, maxShingleOcc = 1000000)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val toks = texts.map(_.split(" "))
      for (i <- toks.indices; j <- toks.indices if i < j) {
        val expect = lcts(toks(i), toks(j))
        val got = out.getOrElse((i.toLong, j.toLong), 0L)
        assert(got == (if (expect >= 2) expect.toLong else 0L),
          s"rep $rep pair ($i,$j): sharedSpans=$got brute=$expect " +
            s"texts='${texts(i)}' / '${texts(j)}'")
      }
    }
  }

  test("spanCoverage equals brute-force covered-position marking on " +
      "random corpora (n=2, minSpan=3)") {
    // brute force: mark every position of every cross-doc common run
    // of >= minSpan tokens, in both documents of the pair
    def bruteCovered(toks: IndexedSeq[Array[String]],
                     minSpan: Int): Map[Int, Set[Int]] = {
      val cov = toks.indices.map(i => i ->
        scala.collection.mutable.Set.empty[Int]).toMap
      for (x <- toks.indices; y <- toks.indices if x < y) {
        val (a, b) = (toks(x), toks(y))
        for (i <- a.indices; j <- b.indices) {
          var k = 0
          while (i + k < a.length && j + k < b.length &&
            a(i + k) == b(j + k)) k += 1
          if (k >= minSpan) {
            (i until i + k).foreach(cov(x).add)
            (j until j + k).foreach(cov(y).add)
          }
        }
      }
      cov.map { case (k, v) => k -> v.toSet }
    }
    (0 until 3).foreach { rep =>
      val texts = (0 until 10).map(i =>
        sample(tinyVocab, seed = 9000L * rep + i))
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.spanCoverage(docs, "doc_id", "text", n = 2,
          minSpan = 3, maxShingleOcc = 1000000)
        .collect().map(r => r.getLong(0).toInt ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val toks = texts.map(_.split(" ")).toIndexedSeq
      val expect = bruteCovered(toks, minSpan = 3)
      toks.indices.foreach { i =>
        val (nTok, covered) = out(i)
        assert(nTok == toks(i).length.toLong,
          s"rep $rep doc $i: n_tokens $nTok != ${toks(i).length}")
        assert(covered == expect(i).size.toLong,
          s"rep $rep doc $i: coverage $covered != brute " +
            s"${expect(i).size} (text='${texts(i)}')")
      }
    }
  }
}

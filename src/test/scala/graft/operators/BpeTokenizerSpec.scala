package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the distributed BPE fit to a step-by-step local reference
  * implementation of Sennrich et al. 2016's algorithm 1 (plain Scala
  * maps and folds, no Spark), plus the greedy-leftmost single-merge
  * semantics and the encode join. */
class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  // ---- local reference implementation -------------------------------

  private def refApply1(syms: Vector[String], a: String, b: String)
      : Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  private def refTrain(words: Map[String, Long], numMerges: Int,
                       minFreq: Long = 2L)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var seg: Map[String, Vector[String]] = words.keysIterator
      .map(w => w -> w.split("").toVector.filter(_.nonEmpty)).toMap
    val merges = Vector.newBuilder[(String, String, Long)]
    var done = false
    var r = 0
    while (r < numMerges && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((w, f) <- words; Seq(a, b) <- seg(w).sliding(2)
           if seg(w).length >= 2)
        counts((a, b)) += f
      if (counts.isEmpty || counts.values.max < minFreq) done = true
      else {
        // max frequency, ties to the lexicographically smallest pair
        val ((a, b), f) = counts.toSeq
          .sortBy { case ((x, y), c) => (-c, x, y) }.head
        merges += ((a, b, f))
        seg = seg.map { case (w, s) => w -> refApply1(s, a, b) }
        r += 1
      }
    }
    (merges.result(), seg)
  }

  // ---- specs --------------------------------------------------------

  test("distributed fit matches the local reference step for step") {
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest",
      "widest widest newest low lowest lowest",
      "the newest widest low the the").map(Tuple1(_)).toDF("text")
    val wordFreq = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val (refMerges, refSeg) = refTrain(wordFreq, numMerges = 12)
    val (gotMerges, vocab) = BpeTokenizer.train(docs, "text", 12)
    assert(gotMerges.map(m => (m.left, m.right, m.freq)) == refMerges)
    assert(gotMerges.map(_.rank) == gotMerges.indices)
    val gotSeg = vocab.select(col("word"), col("syms"))
      .as[(String, Seq[String])].collect()
      .map { case (w, s) => w -> s.toVector }.toMap
    assert(gotSeg == refSeg)
  }

  test("single-merge apply is greedy leftmost non-overlapping") {
    // "aaa" under merge (a,a): leftmost pair fuses, trailing 'a' does
    // NOT re-pair with the new "aa" within the same round
    val docs = Seq("aaa aaa aaa").map(Tuple1(_)).toDF("text")
    val (merges, vocab) = BpeTokenizer.train(docs, "text", 1)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "a")))
    val syms = vocab.select(col("syms")).as[Seq[String]].head()
    assert(syms == Seq("aa", "a"))
  }

  test("fit on real docs round-trips every vocab word") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (merges, vocab) = BpeTokenizer.train(d, "text", 10)
    assert(merges.nonEmpty)
    val bad = vocab
      .filter(concat_ws("", col("syms")) =!= col("word")).count()
    assert(bad == 0L)
    // merges actually compressed something: some word has < |chars|
    // pieces
    val compressed = vocab.filter(
      size(col("syms")) < length(col("word"))).count()
    assert(compressed > 0L)
  }

  test("encode joins every corpus word to its segmentation in order") {
    val docs = Seq((1L, "ab ab ba"), (2L, "ba ab"), (3L, ""))
      .toDF("doc_id", "text")
    val (_, vocab) = BpeTokenizer.train(docs, "text", 2)
    val enc = BpeTokenizer.encode(docs, "doc_id", "text", vocab)
      .orderBy(col("doc_id"), col("word_pos"))
      .select(col("doc_id"), col("word_pos"), col("word"))
      .as[(Long, Int, String)].collect().toSeq
    assert(enc == Seq((1L, 0, "ab"), (1L, 1, "ab"), (1L, 2, "ba"),
      (2L, 0, "ba"), (2L, 1, "ab")))
    // reassembling pieces reproduces each word
    val mismatch = BpeTokenizer.encode(docs, "doc_id", "text", vocab)
      .filter(concat_ws("", col("syms")) =!= col("word")).count()
    assert(mismatch == 0L)
  }

  test("encode falls back to merge-folded character pieces for OOV " +
      "words — nothing is dropped") {
    // fit on corpus A, encode corpus B with planted unseen words: the
    // production situation the word-cache join alone would silently
    // lose. "lowestest" is OOV but shares subwords with the fit
    // corpus, so the rank-ordered merge fold must compress it; "zq"
    // shares nothing and must come out as raw characters.
    val fitDocs = Seq(
      "low low low lower lower newest newest newest newest widest",
      "widest widest newest low lowest lowest")
      .map(Tuple1(_)).toDF("text")
    val (merges, vocab) = BpeTokenizer.train(fitDocs, "text", 12)
    val fresh = Seq((1L, "low lowestest zq newest"))
      .toDF("doc_id", "text")
    val enc = BpeTokenizer
      .encode(fresh, "doc_id", "text", vocab, merges)
      .orderBy(col("word_pos"))
      .select(col("word"), col("syms"))
      .as[(String, Seq[String])].collect().toSeq
    // every word of the fresh doc present, in order
    assert(enc.map(_._1) == Seq("low", "lowestest", "zq", "newest"))
    // round-trip holds for ALL words, OOV included
    assert(enc.forall { case (w, s) => s.mkString == w })
    // OOV segmentation == local reference: char split + merges in
    // rank order (the same greedy-leftmost single-merge semantics)
    val refOov = merges.sortBy(_.rank).foldLeft(
      "lowestest".split("").toVector.filter(_.nonEmpty))(
      (s, m) => refApply1(s, m.left, m.right))
    assert(enc.find(_._1 == "lowestest").get._2 == refOov)
    // the fold genuinely compressed the shared subwords
    assert(refOov.length < "lowestest".length)
    assert(enc.find(_._1 == "zq").get._2 == Seq("z", "q"))
    // in-vocab words still come from the segmentation table
    val lowSyms = vocab.filter(col("word") === "low")
      .select(col("syms")).as[Seq[String]].head()
    assert(enc.find(_._1 == "low").get._2 == lowSyms)
  }

  test("early exhaustion: stops when no pair reaches minPairFreq") {
    val docs = Seq("ab cd").map(Tuple1(_)).toDF("text")
    // every adjacent pair occurs once — below the default minPairFreq
    val (merges, vocab) = BpeTokenizer.train(docs, "text", 5)
    assert(merges.isEmpty)
    val segs = vocab.select(col("syms")).as[Seq[String]].collect()
    assert(segs.forall(_.forall(_.length == 1)))
  }

  test("vocab pre-extension: pre-extended encode equals the per-row " +
      "fallback encode on planted OOV words, and the fold expression " +
      "leaves the plan") {
    val fitDocs = Seq(
      "low low low lower lower newest newest newest newest widest",
      "widest widest newest low lowest lowest")
      .map(Tuple1(_)).toDF("text")
    val (merges, vocab) = BpeTokenizer.train(fitDocs, "text", 12)
    // corpus B: planted OOV words among in-vocab ones
    val fresh = Seq((1L, "low lowestest zq newest"),
      (2L, "widest newlow zq")).toDF("doc_id", "text")
    def collect(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("doc_id"), col("word_pos"))
      .select(col("doc_id"), col("word_pos"), col("word"), col("syms"))
      .as[(Long, Long, String, Seq[String])].collect().toSeq
    // path 1: the per-row fallback fold (|merges| plan nodes)
    val viaFallback = collect(
      BpeTokenizer.encode(fresh, "doc_id", "text", vocab, merges))
    // path 2: production — segment B's words offline, extend the
    // vocab, encode with NO per-row fold at all
    val freshWords = fresh.select(
      explode(TextAnalysis.tokens(col("text"))).as("word"))
    // materialized, as a stored tokenizer table would be — the
    // offline segmentation fold must not ride into every encode plan
    val vocabExt = BpeTokenizer.extendVocab(vocab, freshWords, "word",
      merges).localCheckpoint(true)
    val viaExtension = collect(
      BpeTokenizer.encode(fresh, "doc_id", "text", vocabExt))
    assert(viaExtension == viaFallback,
      "pre-extended encode diverged from the fallback encode")
    // extended entries carry freq 0 and only the genuinely-missing
    // words were added
    assert(vocabExt.filter(col("freq") === 0L)
      .select(col("word")).as[String].collect().toSet ==
      Set("lowestest", "zq", "newlow"))
    // the merge-fold `aggregate` HOF is ABSENT from the pre-extended
    // plan (and present in the fallback one) — the |merges|-plan-size
    // problem is gone for covered words
    val planExt = BpeTokenizer
      .encode(fresh, "doc_id", "text", vocabExt)
      .queryExecution.executedPlan.toString
    val planFb = BpeTokenizer
      .encode(fresh, "doc_id", "text", vocab, merges)
      .queryExecution.executedPlan.toString
    assert(!planExt.contains("aggregate("),
      s"fold expression still in the pre-extended plan:\n${planExt.take(800)}")
    assert(planFb.contains("aggregate("))
  }
}

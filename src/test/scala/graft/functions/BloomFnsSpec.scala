package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Bloom pre-filter: no false negatives ever, bounded false positives,
  * and the pre-filtered incremental dedup is row-identical to the
  * plain anti-join. */
class BloomFnsSpec extends SparkSpec {

  test("mightContainHash has zero false negatives and a sane fp rate") {
    import spark.implicits._
    val corpus = (0L until 2000L).map(i => s"sig$i").toDF("sig")
    val bytes = BloomFns.serialize(
      BloomFns.buildOverHashes(corpus, col("sig"), 2000L, 0.03))
    val probes = (0L until 4000L).map(i => s"sig$i").toDF("sig")
      .withColumn("hit", BloomFns.mightContainHash(bytes, col("sig")))
    val inCorpusMisses = probes
      .filter(col("sig").isin((0L until 2000L).map(i => s"sig$i"): _*) &&
        !col("hit")).count()
    assert(inCorpusMisses == 0, "bloom false negative — impossible by contract")
    val fpCount = probes.filter(!col("sig")
        .isin((0L until 2000L).map(i => s"sig$i"): _*) && col("hit")).count()
    assert(fpCount < 2000 * 0.15,
      s"fp rate wildly above target: $fpCount/2000")
  }

  test("incrementalExactBloom returns exactly the plain anti-join rows") {
    import spark.implicits._
    // corpus: docs 0-49; batch: 30 dup-of-corpus token sets, 20 new,
    // plus in-batch duplicates of one new doc
    val corpusDocs = (0L until 50L).map(i => (i, s"alpha beta w$i")).toDF("doc_id", "text")
    val batch = ((100L until 130L).map(i => (i, s"beta alpha w${i - 100}")) ++ // corpus dups
      (200L until 220L).map(i => (i, s"fresh content w$i")) ++
      Seq((300L, "fresh content w200"), (301L, "w200 fresh content")))        // in-batch dups of 200
      .toDF("doc_id", "text")
    val corpusSigs = corpusDocs
      .select(md5(Dedup.tokenSetSignature(col("text"))).as("sig")).distinct()
    val viaBloom = Dedup.incrementalExactBloom(batch, corpusSigs,
        "doc_id", "text", corpusSigCount = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = batch
      .withColumn("sig", md5(Dedup.tokenSetSignature(col("text"))))
      .groupBy("sig")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .join(corpusSigs, Seq("sig"), "left_anti")
      .select(col("keep_id"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBloom == plain)
    // sanity on content: every corpus-dup batch doc dropped, doc 200's
    // group keeps min id with 3 members
    assert(!viaBloom.exists(_._1 < 200L))
    assert(viaBloom.contains((200L, 3L)))
  }
}

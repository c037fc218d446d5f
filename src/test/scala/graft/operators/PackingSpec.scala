package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("withTokenOffsets reproduces the global cumsum exactly") {
    val df = Seq(
      ("b", 3L, 7L), ("a", 1L, 4L), ("a", 2L, 5L), ("c", 4L, 1L),
      ("b", 5L, 2L), ("a", 6L, 3L))
      .toDF("grp", "id", "n_toks")
    val got = Packing
      .withTokenOffsets(df, "n_toks", "off", col("grp"), col("id"))
      .orderBy(col("grp"), col("id"))
      .select(col("grp"), col("id"), col("off"))
      .as[(String, Long, Long)].collect().toSeq
    // expected: cumsum of n_toks over (grp, id) order, exclusive
    val expected = Seq(
      ("a", 1L, 0L), ("a", 2L, 4L), ("a", 6L, 9L),
      ("b", 3L, 12L), ("b", 5L, 19L), ("c", 4L, 21L))
    assert(got == expected)
  }

  test("withTokenOffsets matches a single-task window on real docs") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(coalesce(col("text"), lit(""))))
          .cast("long").as("n_toks"))
    val twoPass = Packing
      .withTokenOffsets(d, "n_toks", "off", col("source"), col("doc_id"))
      .select(col("doc_id"), col("off"))
    val global = d.withColumn("off",
      coalesce(sum(col("n_toks")).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("source"), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("off").as("goff"))
    val diff = twoPass.join(global, Seq("doc_id"))
      .filter(col("off") =!= col("goff")).count()
    assert(diff == 0L)
    assert(twoPass.count() == d.count())
  }

  test("packSequences on a handcrafted corpus") {
    // docs (order col = id): 5, 3, 4, 6 tokens; L = 4
    // offsets: 0, 5, 8, 12; spans [0,5) [5,8) [8,12) [12,18)
    // seq 0: doc1[0,4)                    -> 4 toks, 1 doc, 1 start, 0 full
    // seq 1: doc1[4,5) doc2[5,8)          -> 4 toks, 2 docs, 1 start, 1 full
    // seq 2: doc3[8,12)                   -> 4 toks, 1 doc, 1 start, 1 full
    // seq 3: doc4[12,16)                  -> 4 toks, 1 doc, 1 start, 0 full
    // seq 4: doc4[16,18)                  -> 2 toks, 1 doc, 0 starts, 0 full
    val df = Seq((1L, 5L), (2L, 3L), (3L, 4L), (4L, 6L))
      .toDF("id", "n_toks")
    val got = Packing.packSequences(df, "n_toks", 4, col("id"))
      .orderBy(col("seq_id"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val expected = Seq(
      (0L, 4L, 1L, 1L, 0L), (1L, 4L, 2L, 1L, 1L), (2L, 4L, 1L, 1L, 1L),
      (3L, 4L, 1L, 1L, 0L), (4L, 2L, 1L, 0L, 0L))
    assert(got == expected)
  }

  test("packSequences invariants on real docs") {
    val L = 64
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(coalesce(col("text"), lit(""))))
          .cast("long").as("n_toks"))
    val packed = Packing
      .packSequences(d, "n_toks", L, col("source"), col("doc_id"))
      .orderBy(col("seq_id")).collect()
    val totalToks = d.agg(sum(col("n_toks"))).as[Long].head()
    val nDocs = d.filter(col("n_toks") > 0).count()
    // dense sequence ids from 0
    assert(packed.map(_.getAs[Long]("seq_id")).toSeq ==
      (0L until packed.length).toSeq)
    // token conservation; every sequence full except possibly the last
    assert(packed.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    assert(packed.dropRight(1).forall(_.getAs[Long]("n_tokens") == L))
    // every doc starts exactly once; full docs start where they're full
    assert(packed.map(_.getAs[Long]("n_starts")).sum == nDocs)
    assert(packed.forall(r =>
      r.getAs[Long]("n_full_docs") <= r.getAs[Long]("n_starts")))
  }

  test("packShardPayloads assembles exact fixed-length sequences on " +
      "a handcrafted corpus") {
    // same geometry as the packSequences case (L=4; docs of 5,3,4,6
    // tokens), now with the actual token payloads: the global token
    // stream is a1..a5 b1..b3 c1..c4 d1..d6 and each sequence must be
    // its exact 4-token window of that stream
    val df = Seq(
      (1L, Seq("a1", "a2", "a3", "a4", "a5")),
      (2L, Seq("b1", "b2", "b3")),
      (3L, Seq("c1", "c2", "c3", "c4")),
      (4L, Seq("d1", "d2", "d3", "d4", "d5", "d6")))
      .toDF("id", "toks")
    val got = Packing.packShardPayloads(df, "toks", 4, col("id"))
      .orderBy(col("seq_id"))
      .select(col("seq_id"), col("tokens"), col("n_docs"),
        col("n_tokens"))
      .as[(Long, Seq[String], Long, Long)].collect().toSeq
    val expected = Seq(
      (0L, Seq("a1", "a2", "a3", "a4"), 1L, 4L),
      (1L, Seq("a5", "b1", "b2", "b3"), 2L, 4L),
      (2L, Seq("c1", "c2", "c3", "c4"), 1L, 4L),
      (3L, Seq("d1", "d2", "d3", "d4"), 1L, 4L),
      (4L, Seq("d5", "d6"), 1L, 2L))
    assert(got == expected)
  }

  test("packShardPayloads ∘ writePackedShards round-trips on real " +
      "docs and agrees with the packSequences audit map") {
    val L = 32
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokens(coalesce(col("text"), lit(""))).as("toks"))
    val payloads = Packing.packShardPayloads(d, "toks", L,
      col("source"), col("doc_id"))
    // every sequence except the last is exactly L tokens, and the
    // audit map's (n_tokens, n_docs) agree row for row
    val audit = Packing.packSequences(
      d.select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_toks")),
      "n_toks", L, col("source"), col("doc_id"))
    val joined = payloads.alias("p")
      .join(audit.alias("a"), Seq("seq_id"), "full")
    assert(joined.filter(col("p.n_tokens").isNull ||
      col("a.n_tokens").isNull ||
      col("p.n_tokens") =!= col("a.n_tokens") ||
      col("p.n_docs") =!= col("a.n_docs")).count() == 0L)
    val maxSeq = payloads.agg(max(col("seq_id"))).head().getLong(0)
    assert(payloads.filter(col("seq_id") < maxSeq &&
      size(col("tokens")) =!= L).count() == 0L)
    // shard write → read loses nothing (the training-job read path)
    val dir = java.nio.file.Files
      .createTempDirectory("packshards").toString
    Packing.writePackedShards(payloads, dir, seqsPerShard = 10L)
    val back = spark.read.parquet(dir)
    assert(back.filter(col("shard") =!= expr("seq_id div 10")).count()
      == 0L)
    val diff = back
      .select(col("seq_id"), col("tokens").as("t2"))
      .join(payloads, Seq("seq_id"), "full")
      .filter(col("t2").isNull || col("tokens").isNull ||
        col("t2") =!= col("tokens"))
      .count()
    assert(diff == 0L)
    // reassembling every shard in seq order reproduces the corpus
    // token stream exactly
    val corpusToks = d.orderBy(col("source"), col("doc_id"))
      .select(explode(col("toks")).as("t"))
      .as[String].collect().toSeq
    val packedToks = back.orderBy(col("seq_id"))
      .select(col("tokens")).as[Seq[String]].collect().toSeq.flatten
    assert(packedToks == corpusToks)
  }

  test("chunkOverlap covers every token with the documented overlap") {
    val df = Seq((1L, "a b c d e f g h i j"), // 10 toks: size 4 stride 3
      (2L, "x y"), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Packing.chunkOverlap(df, "doc_id", "text", 4, 3)
      .orderBy(col("doc_id"), col("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_chunk_toks"), col("chunk_text"))
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // doc 1: n=10 -> 1 + ceil((10-4)/3) = 3 chunks at 0,3,6:
    // [a..d][d..g][g..j]
    val expected = Seq(
      (1L, 0L, 0L, 4L, "a b c d"), (1L, 1L, 3L, 4L, "d e f g"),
      (1L, 2L, 6L, 4L, "g h i j"),
      (2L, 0L, 0L, 2L, "x y"),
      (3L, 0L, 0L, 1L, ""), (4L, 0L, 0L, 1L, ""))
    assert(got == expected)
  }

  test("chunkOverlap keeps the trailing partial window") {
    // n=9, size 4, stride 3: ceil(5/3)=2 -> 3 chunks; last has 3 toks
    val df = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val got = Packing.chunkOverlap(df, "doc_id", "text", 4, 3)
      .orderBy(col("chunk_idx"))
      .select(col("start_tok"), col("n_chunk_toks"), col("chunk_text"))
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((0L, 4L, "a b c d"), (3L, 4L, "d e f g"),
      (6L, 3L, "g h i")))
  }
}

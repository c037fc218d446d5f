package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Caching.cached

/** Sequence packing — the "concat-and-chunk" step that turns a curated
  * document corpus into fixed-length training sequences (the layout
  * GPT-style pretraining consumes: every sequence exactly `seqLen`
  * tokens, documents concatenated in a deterministic order and split at
  * sequence boundaries). The pipeline needs the PACKING MAP — which
  * documents land in which sequence, how many cross a boundary, how
  * much of each sequence is fragment — both to write the shards and to
  * audit fragmentation (boundary-crossing docs lose attention context).
  *
  * The global token offset is the crux at scale: each document's offset
  * is the sum of every preceding document's token count under a total
  * order — a prefix sum over the corpus. The naive spelling (one
  * `sum() OVER (ORDER BY …)` window) funnels 100 TB through a single
  * task, exactly like the global `row_number` that [[Ids.contiguousIds]]
  * exists to avoid, and the same two-pass shape fixes it:
  *
  *   1. range-partition by the ordering and sum tokens per partition —
  *      a |partitions|-row aggregate;
  *   2. prefix-sum those totals into per-partition token offsets (a
  *      window over the TINY totals frame) and broadcast them back;
  *   3. running-sum WITHIN each partition and add the broadcast offset.
  *
  * Step 3 is a `Window.partitionBy(_pid)` — the planner re-clusters by
  * `_pid` (RangePartitioning on the order columns does not satisfy the
  * window's ClusteredDistribution, the Ids.scala finding), so the frame
  * crosses the wire twice. Both exchanges are fully distributed — a
  * window partition is one RANGE partition, sized by
  * `spark.sql.shuffle.partitions` / files.maxPartitionBytes like any
  * other task — which is the property the single-task global window
  * lacks. Token counts are whitespace counts here ([[TextAnalysis
  * .tokens]]); any per-doc length column plugs in unchanged.
  *
  * Reference scope: the reference pipeline stops at per-document
  * processing (etl-transparencia-sergipe main.py); packing is part of
  * the training-data extension surface, from the published concat-and-
  * chunk recipe (GPT-2/3 data pipelines, Raffel et al. 2020 §2.2).
  */
object Packing {

  /** Adds `offName` = total tokens in all rows strictly BEFORE this row
    * under `orderCols` (a total order — include a unique tiebreak). */
  def withTokenOffsets(df: DataFrame, nToksCol: String, offName: String,
                       orderCols: Column*): DataFrame = {
    require(orderCols.nonEmpty, "withTokenOffsets needs an ordering")
    // cached: the ranged frame feeds the per-partition totals pass AND
    // the final window pass; recompute would re-shuffle the corpus.
    val ranged = cached(df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("_pid", spark_partition_id()))
    // |partitions|-row aggregate + a window over that tiny frame — the
    // only globally-ordered object in the plan (the Ids.scala shape).
    val perPart = ranged.groupBy(col("_pid"))
      .agg(sum(col(nToksCol)).as("_ptoks"))
      .withColumn("_poff",
        coalesce(sum(col("_ptoks")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_poff"))
    // running sum within the range partition: rowsBetween(…, -1) makes
    // the offset EXCLUSIVE of the current row; ordering must repeat the
    // total order so ties cannot reorder under the re-cluster exchange.
    val local = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(perPart), Seq("_pid"))
      .withColumn(offName,
        col("_poff") + coalesce(sum(col(nToksCol)).over(local), lit(0L)))
      .drop("_pid", "_poff")
  }

  /** Packs the corpus into fixed-`seqLen` sequences and returns the
    * per-sequence audit: tokens filled, docs touching the sequence,
    * docs STARTING in it, and docs fully contained (the non-fragmented
    * ones). A document at global token span [off, off+n) touches
    * sequences ⌊off/L⌋ … ⌊(off+n−1)/L⌋ — the explode is ≤ n/L + 1 rows
    * per doc, so the exploded relation is ~|corpus tokens|/L + |docs|
    * rows total: linear, never quadratic. */
  def packSequences(df: DataFrame, nToksCol: String, seqLen: Int,
                    orderCols: Column*): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val L = lit(seqLen.toLong)
    val withOff = withTokenOffsets(
      df.filter(col(nToksCol) > 0), nToksCol, "_off", orderCols: _*)
    // `div`, not `/`: Column./ is DOUBLE division, and a floor() repair
    // silently loses exactness once offsets outgrow 2^53 — plausible
    // token counts at the 100 TB design point.
    val exploded = withOff
      .withColumn("_n", col(nToksCol).cast("long"))
      .withColumn("_s0", expr(s"_off div $seqLen"))
      .withColumn("_s1", expr(s"(_off + _n - 1) div $seqLen"))
      .select(col("_off"), col("_n"),
        explode(sequence(col("_s0"), col("_s1"))).as("seq_id"))
    val segStart = greatest(col("seq_id") * L, col("_off"))
    val segEnd = least((col("seq_id") + 1) * L, col("_off") + col("_n"))
    exploded
      .withColumn("_contrib", segEnd - segStart)
      .withColumn("_starts",
        (col("_off") >= col("seq_id") * L).cast("long"))
      .withColumn("_full",
        (col("_off") >= col("seq_id") * L &&
          col("_off") + col("_n") <= (col("seq_id") + 1) * L).cast("long"))
      .groupBy(col("seq_id"))
      .agg(sum(col("_contrib")).as("n_tokens"),
        count(lit(1)).as("n_docs"),
        sum(col("_starts")).as("n_starts"),
        sum(col("_full")).as("n_full_docs"))
  }

  /** Materializes the packed sequences' PAYLOAD — the other half of
    * [[packSequences]] (which emits the audit MAP only): each output
    * row is one fixed-`seqLen` training sequence with its actual
    * token array, assembled by slicing every document's tokens at the
    * sequence boundaries and concatenating the slices in corpus
    * order. `df` carries an already-tokenized array column (plain
    * whitespace tokens, or BPE pieces from [[BpeTokenizer.encode]] —
    * the tokenize → pack → write tail of a training pipeline).
    *
    * Scale shape: the same two-pass prefix sum as [[packSequences]]
    * for the offsets, then a per-(doc × touched sequence) explode
    * whose groups are BOUNDED BY CONSTRUCTION — a sequence holds
    * exactly `seqLen` tokens, so no collect_list group exceeds
    * seqLen tokens / seqLen+1 docs regardless of corpus size. The
    * final sequence may be shorter (the corpus tail). */
  def packShardPayloads(df: DataFrame, toksCol: String, seqLen: Int,
                        orderCols: Column*): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val L = lit(seqLen.toLong)
    val withOff = withTokenOffsets(
      df.withColumn("_n",
          org.apache.spark.sql.functions.size(col(toksCol)).cast("long"))
        .filter(col("_n") > 0),
      "_n", "_off", orderCols: _*)
    val exploded = withOff
      .withColumn("_s0", expr(s"_off div $seqLen"))
      .withColumn("_s1", expr(s"(_off + _n - 1) div $seqLen"))
      .select(col(toksCol), col("_off"), col("_n"),
        explode(sequence(col("_s0"), col("_s1"))).as("seq_id"))
    val segStart = greatest(col("seq_id") * L, col("_off"))
    val segEnd = least((col("seq_id") + 1) * L, col("_off") + col("_n"))
    exploded
      .withColumn("_slice", slice(col(toksCol),
        (segStart - col("_off") + 1).cast("int"),
        (segEnd - segStart).cast("int")))
      .groupBy(col("seq_id"))
      // _off is unique under the total order, so the sort key is
      // unambiguous and the concatenation deterministic
      .agg(
        flatten(transform(array_sort(collect_list(
          struct(col("_off"), col("_slice")))), x => x("_slice")))
          .as("tokens"),
        count(lit(1)).as("n_docs"))
      .withColumn("n_tokens",
        org.apache.spark.sql.functions.size(col("tokens")).cast("long"))
  }

  /** Writes [[packShardPayloads]] output as hive-partitioned training
    * shards (`shard=K/` holds `seqsPerShard` consecutive sequences,
    * sorted by seq_id inside each file) — the artifact a training job
    * actually reads, with partition pruning selecting shard ranges. */
  def writePackedShards(payloads: DataFrame, path: String,
                        seqsPerShard: Long): Unit = {
    require(seqsPerShard > 0,
      s"seqsPerShard must be positive, got $seqsPerShard")
    payloads
      .withColumn("shard", expr(s"seq_id div $seqsPerShard"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("seq_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Overlapping token-window chunking — the RAG/embedding-prep step:
    * split each document into windows of `size` tokens advancing by
    * `stride` (< size ⇒ overlap of size − stride), final partial window
    * kept so every token is covered. Chunk k covers tokens
    * [k·stride, min(k·stride + size, n)); the chunk count is
    * 1 + ⌈max(n − size, 0) / stride⌉. Stateless per-document map +
    * explode — no shuffle at all; output rows ≈ |corpus tokens|/stride.
    * All arithmetic integer so an oracle reproduces it exactly. */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = TextAnalysis.tokens(coalesce(col(textCol), lit("")))
    val n = org.apache.spark.sql.functions.size(toks).cast("long")
    docs.select(col(idCol), toks.as("_t"), n.as("_n"))
      // integer `div` for the ceiling — Column./ is double division
      .withColumn("_k", when(col("_n") <= size, lit(1L))
        .otherwise(expr(s"(_n - $size + $stride - 1) div $stride + 1")))
      .select(col(idCol), col("_t"), col("_n"),
        explode(sequence(lit(0L), col("_k") - 1)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .withColumn("n_chunk_toks",
        least(lit(size.toLong), col("_n") - col("start_tok")))
      .withColumn("chunk_text",
        array_join(slice(col("_t"), (col("start_tok") + 1).cast("int"),
          col("n_chunk_toks").cast("int")), " "))
      .drop("_t", "_n")
  }
}

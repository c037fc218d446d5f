package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native predicate — the 100 TB
  * pre-filter: a corpus-sized set compresses to a fixed-size bit array
  * (~1.2 GB per 10⁹ items at 1% fpp) that ships to every task as a
  * literal, so "probably seen before?" costs one in-memory probe per
  * row instead of a join. No false negatives ever (the bloom guarantee
  * the dedup pre-filter depends on); false positives are resolved by an
  * exact join on the survivors only.
  *
  * Build is a distributed treeAggregate (`DataFrameStatFunctions
  * .bloomFilter`); the probe is Spark's own codegen'd
  * `BloomFilterMightContain` (the expression behind runtime row-level
  * filtering), constructed via the Bridge — a native expression, not a
  * UDF. Items and probes must use the SAME 64-bit key: callers hash
  * with `xxhash64` on both sides.
  */
object BloomFns {

  /** Distributed-build a bloom over the xxhash64 of `keyCol`. */
  def buildOverHashes(df: DataFrame, keyCol: Column,
                      expectedItems: Long, fpp: Double): BloomFilter =
    df.select(xxhash64(keyCol).as("_h")).stat
      .bloomFilter("_h", expectedItems, fpp)

  /** Serialize for embedding as a literal in a plan. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(bloom, xxhash64(key))` as a codegen'd predicate.
    * True ⇒ key was PROBABLY inserted; false ⇒ DEFINITELY not. */
  def mightContainHash(bloomBytes: Array[Byte], keyCol: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bloomBytes)),
      Bridge.expression(xxhash64(keyCol))))
}

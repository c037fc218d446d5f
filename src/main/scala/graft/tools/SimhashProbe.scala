package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Dev utility: measures banded-candidate-pair counts for the 64-bit
  * (4×16-bit band) vs 128-bit (4×32-bit band) SimHash schemes at a
  * given SF — the number that quantifies the n²/2^bandwidth birthday
  * saturation PLANS.md documents. Candidates = distinct (id1, id2)
  * sharing ≥1 band BEFORE the hamming verification filter; verified =
  * pairs within the hamming threshold. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables(spark, sfDir, "documents").cache()
    val n = docs.count()

    def candidates(bandCols: org.apache.spark.sql.DataFrame): Long =
      bandCols.as("a")
        .join(bandCols.as("b"),
          col("a.bandh") === col("b.bandh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()

    val tk = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.tokens(col("text"))).as("_tk"))

    val narrowSig = tk
      .select(col("doc_id"),
        transform(col("_tk"), t => xxhash64(t)).as("hs"))
      .select(col("doc_id"), Dedup.simhashFromHashes(col("hs")).as("w0"))
      .cache()
    val narrowBands = narrowSig.select(col("doc_id"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("w0"), i * 16).bitwiseAND(lit(0xFFFFL)).as("bh"))
      ): _*)).as("bandh"))
    val cNarrow = candidates(narrowBands)
    val vNarrow = Dedup.simhashNearDups(docs, "doc_id", "text", 3).count()

    val wideSig = tk
      .select(col("doc_id"),
        transform(col("_tk"), t => xxhash64(t)).as("hs0"),
        transform(col("_tk"), t => xxhash64(lit(1), t)).as("hs1"))
      .select(col("doc_id"),
        Dedup.simhashFromHashes(col("hs0")).as("w0"),
        Dedup.simhashFromHashes(col("hs1")).as("w1"))
      .cache()
    val wideBands = wideSig.select(col("doc_id"),
      explode(array((for (w <- 0 until 2; h <- 0 until 2) yield
        struct(lit(w * 2 + h).as("band"),
          shiftright(col(s"w$w"), h * 32).bitwiseAND(lit(0xFFFFFFFFL)).as("bh"))
      ): _*)).as("bandh"))
    val cWide = candidates(wideBands)
    val vWide = Dedup.simhashNearDupsWide(docs, "doc_id", "text", 3).count()

    println(s"docs=$n allPairs=${n * (n - 1) / 2}")
    println(s"64-bit/16-bit-bands : candidates=$cNarrow verified(d<=3)=$vNarrow")
    println(s"128-bit/32-bit-bands: candidates=$cWide verified(d<=3)=$vWide")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — image/audio/video as opaque `binary` payloads
  * with typed metadata, per the north-star contract.
  *
  * The Spark-side plumbing is real: binary schema, per-partition batch
  * iteration, deterministic output schema, partition-count preservation.
  * The actual codecs are NOT in this container, so the decode kernel is
  * a clearly-marked deterministic fake ([[fakeDecode]]) — swap it for a
  * JNI/FFI codec call without touching the surrounding plan.
  *
  * Why mapPartitions and not an expression: a real decoder amortizes
  * per-batch setup (codec contexts, pinned buffers) across a partition —
  * exactly the shape `mapPartitions` exposes. Metadata-only operations
  * (byte length, content hash, head slice) stay in codegen'd built-ins —
  * see PipelineQueries q27.
  */
object Multimodal {

  /** Ingest a directory of binary media files via Spark's native
    * `binaryFile` source — the on-disk ingestion path for image/audio
    * corpora (one file per asset): each row carries (path,
    * modificationTime, length, content) with the payload as a real
    * `binary` column. The glob filters AT THE SOURCE (pathGlobFilter —
    * non-matching files are never opened), and
    * `spark.sql.files.maxPartitionBytes` governs how many files pack
    * into a task — the small-files story for millions of images. The
    * result feeds [[assets]]/[[decodeFeatures]] unchanged. */
  def readBinaryDir(spark: SparkSession, dir: String,
                    glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("length").as("n_bytes"),
        col("content").as("payload"))

  /** Asset view over any table with an id + a payload-able column:
    * opaque bytes + typed metadata struct. */
  def assets(df: DataFrame, idCol: String, payloadCol: String,
             kind: String): DataFrame =
    df.select(
      col(idCol).as("asset_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(kind).as("kind"),
        length(col(payloadCol).cast("binary")).as("n_bytes")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_mean", DoubleType, nullable = false),
    StructField("frames", ArrayType(BinaryType), nullable = false),
    StructField("resized", BinaryType, nullable = false)))

  /** STUB decode kernel — deterministic fake standing in for an image/
    * audio decoder (none available in this container). Computes a byte
    * mean as the stand-in "feature" and cuts fixed-stride "frames"
    * (byte slices) as the stand-in frame-sample. Real decode would
    * replace ONLY the body of this function. */
  def fakeDecode(payload: Array[Byte], frameSize: Int,
                 resizeStride: Int = 4): (Double, Array[Array[Byte]], Array[Byte]) = {
    var s = 0L
    var i = 0
    while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
    val mean = if (payload.length == 0) 0.0 else s.toDouble / payload.length
    val frames = payload.grouped(frameSize).take(4).toArray
    // "resize": stride subsample — the byte-level stand-in for an image
    // downscale (a real codec's resize replaces this line only)
    val resized = payload.indices.collect {
      case j if j % resizeStride == 0 => payload(j)
    }.toArray
    (mean, frames, resized)
  }

  /** Per-partition feature extraction over asset rows. Output partition
    * count equals input partition count — no shuffle; the decode cost is
    * the dominant term and parallelizes per-partition. */
  def decodeFeatures(spark: SparkSession, assetsDf: DataFrame,
                     frameSize: Int = 16): DataFrame = {
    val rdd = assetsDf
      .select(col("asset_id").cast("long"), col("meta.kind"), col("payload"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val (mean, frames, resized) = fakeDecode(payload, frameSize)
          Row(r.getLong(0), r.getString(1), payload.length, mean,
            frames.toSeq, resized)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}

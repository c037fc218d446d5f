package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — image/audio/video as opaque `binary` payloads
  * with typed metadata, per the north-star contract.
  *
  * The decode kernel is REAL for every format a pure JVM can parse:
  * images via [[ImageCodec]] (PPM P6 + 24-bit BMP by hand, JPEG + PNG
  * via `javax.imageio` — header parse, pixel decode, channel stats,
  * nearest-neighbor thumbnail, row sampling) and audio via
  * [[AudioCodec]] (RIFF/WAVE PCM — chunk walk, sample normalization,
  * RMS/peak/zero-crossing stats, frame sampling). Payloads whose magic
  * neither sniffer recognizes (text, WebP/AVIF, MP3/AAC, video) get
  * deterministic BYTE-level features instead, loudly typed as such:
  * their `format` and every decoded-statistic column are NULL, never
  * faked. A payload whose magic IS recognized but fails to parse
  * (truncated JPEG, float-PCM WAV, a CMYK imageio rejection) gets the
  * same byte-level fallback with `decode_error` set — recorded per
  * row, never job-fatal (the PERMISSIVE-CSV corrupt-record rule
  * applied to media: one bad asset in a 100 TB corpus is data to
  * account for, not an exception to die on).
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
    StructField("resized", BinaryType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_r", DoubleType, nullable = true),
    StructField("mean_g", DoubleType, nullable = true),
    StructField("mean_b", DoubleType, nullable = true),
    StructField("decode_error", StringType, nullable = true)))

  /** Thumbnail edge for the decoded-image `resized` column. */
  val thumbEdge = 8

  /** Byte-level fallback features for payloads the image sniffer does
    * not recognize: payload byte mean, fixed-size head slices as
    * "frames", stride subsample as "resize". Deterministic and honestly
    * byte-typed — the row's `format` stays NULL so a consumer can never
    * mistake these for decoded pixel statistics. */
  def byteFeatures(payload: Array[Byte], frameSize: Int,
                   resizeStride: Int = 4): (Double, Array[Array[Byte]], Array[Byte]) = {
    val mean = byteMean(payload)
    val frames = payload.grouped(frameSize).take(4).toArray
    val resized = payload.indices.collect {
      case j if j % resizeStride == 0 => payload(j)
    }.toArray
    (mean, frames, resized)
  }

  private def byteMean(payload: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
    if (payload.length == 0) 0.0 else s.toDouble / payload.length
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_mean", DoubleType, nullable = false),
    StructField("frames", ArrayType(BinaryType), nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("rms", DoubleType, nullable = true),
    StructField("peak", DoubleType, nullable = true),
    StructField("zero_crossings", LongType, nullable = true),
    StructField("decode_error", StringType, nullable = true)))

  /** One decode attempt, classified for the per-row error contract:
    * Right(Some) = decoded, Right(None) = unrecognized magic (the
    * HONEST fallback — not an error), Left(msg) = recognized magic
    * that failed to parse OR a NULL payload. A failed row must never
    * kill the job (one corrupt asset in a 100 TB corpus is data, not
    * an exception — the PERMISSIVE-CSV rule applied to media), and
    * must never be silently conflated with the unrecognized fallback:
    * `decode_error` records exactly what happened, per row. */
  private def attempt[A](payload: Array[Byte],
                         dec: Array[Byte] => Option[A]): Either[String, Option[A]] =
    if (payload == null) Left("null payload")
    else
      try Right(dec(payload))
      catch {
        case scala.util.control.NonFatal(e) =>
          Left(s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(200))
      }

  /** Audio analog of [[decodeFeatures]] — same mapPartitions shape,
    * same loud-fallback contract: recognized WAV payloads are REALLY
    * decoded ([[AudioCodec]]: header/chunk walk, PCM samples normalized
    * to [−1,1], RMS / peak / zero-crossing stats, evenly-sampled
    * frames); anything else gets [[byteFeatures]] with NULL audio
    * columns (`format` NULL — never faked statistics). */
  def decodeAudioFeatures(spark: SparkSession, assetsDf: DataFrame,
                          frameSize: Int = 16): DataFrame = {
    val rdd = assetsDf
      .select(col("asset_id").cast("long"), col("meta.kind"), col("payload"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val raw = r.getAs[Array[Byte]](2)
          val payload = if (raw == null) Array.emptyByteArray else raw
          attempt(raw, AudioCodec.decode) match {
            case Right(Some(clip)) =>
              val (rms, peak, zc) = AudioCodec.stats(clip)
              Row(r.getLong(0), r.getString(1), payload.length,
                byteMean(payload),
                AudioCodec.sampleFrames(clip, 4).toSeq,
                "wav", clip.sampleRate,
                clip.channels, clip.durationMs, rms, peak, zc, null)
            case other =>
              val err = other.left.toOption.orNull
              val (mean, frames, _) = byteFeatures(payload, frameSize)
              Row(r.getLong(0), r.getString(1), payload.length, mean,
                frames.toSeq, null, null, null, null, null, null, null,
                err)
          }
        }
      }
    spark.createDataFrame(rdd, audioFeatureSchema)
  }

  /** Per-partition feature extraction over asset rows. Output partition
    * count equals input partition count — no shuffle; the decode cost is
    * the dominant term and parallelizes per-partition.
    *
    * Recognized image payloads (PPM/BMP magic) are REALLY decoded:
    * `width`/`height`/`mean_r|g|b` are pixel statistics, `frames` holds
    * up to 4 evenly-sampled raster rows (raw RGB), and `resized` is a
    * PPM-encoded ≤[[thumbEdge]]² nearest-neighbor thumbnail. Other
    * payloads get [[byteFeatures]] with NULL image columns. `byte_mean`
    * is the PAYLOAD byte mean for every row — one definition across
    * both paths. */
  def decodeFeatures(spark: SparkSession, assetsDf: DataFrame,
                     frameSize: Int = 16): DataFrame = {
    val rdd = assetsDf
      .select(col("asset_id").cast("long"), col("meta.kind"), col("payload"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val raw = r.getAs[Array[Byte]](2)
          val payload = if (raw == null) Array.emptyByteArray else raw
          val fmt = ImageCodec.sniff(payload)
          attempt(raw, ImageCodec.decode) match {
            case Right(Some(img)) =>
              val (mr, mg, mb) = ImageCodec.meanChannels(img)
              val thumb = ImageCodec.encodePpm(ImageCodec.resizeNearest(
                img, math.min(thumbEdge, img.width),
                math.min(thumbEdge, img.height)))
              Row(r.getLong(0), r.getString(1), payload.length,
                byteMean(payload), ImageCodec.sampleRows(img, 4).toSeq,
                thumb, fmt.get, img.width,
                img.height, mr, mg, mb, null)
            case other =>
              val err = other.left.toOption.orNull
              val (mean, frames, resized) = byteFeatures(payload, frameSize)
              Row(r.getLong(0), r.getString(1), payload.length, mean,
                frames.toSeq, resized, null, null, null, null, null, null,
                err)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star surface): media as opaque binary
  * columns + typed metadata, with decode/feature-extraction/frame-sampling
  * as batched per-partition transforms.
  *
  * The Spark-side shape is the real thing — binary payload column, typed
  * output schema, batched iteration (the Scala-native analogue of
  * `mapInPandas` batch processing), partition-parallel, nothing on the
  * driver. The byte-level DECODE itself is a deterministic STUB (this
  * container has no image/audio codecs); swap `decodeStub` for a codec
  * call and everything else stands.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      channels: Long,
      feature: Array[Float])

  final case class Frame(doc_id: Long, frame_idx: Long, offset: Long, frame_bytes: Array[Byte])

  /** Documents -> media rows: payload is the utf-8 encoding of the text
    * (stand-in for image/audio bytes; binary type end to end). */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("image").as("modality"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * A real implementation calls the codec here (per batch); the schema,
    * batching, and distribution are production-shaped. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length.toLong
    val feat = r.payload.take(8).map(b => (b & 0xFF).toFloat / 255.0f)
    MediaFeatures(r.doc_id, r.modality,
      n_bytes = n,
      width = 64L + n % 577L,
      height = 64L + (n * 31L) % 577L,
      channels = 3L,
      feature = feat)
  }

  /** Batched decode/feature-extract over partitions. `batchSize` mirrors
    * the arrow-batch shape a pandas-UDF pipeline would use. */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 256): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real codec would amortize setup
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Frame sampling: emit n evenly spaced byte-window "frames" per payload
    * (expression-level explode — the codec-free part of video sampling). */
  def frameSample(media: DataFrame, nFrames: Int, frameLen: Int): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("frame_idx", explode(sequence(lit(0L), lit(nFrames - 1L))))
      // integer div, not `/`: double division then truncation would not be
      // portable to the SQL oracle's `//`
      .withColumn("offset",
        col("frame_idx") * greatest(expr(s"n_bytes div $nFrames"), lit(1L)))
      .select(col("doc_id"), col("frame_idx"), col("offset"),
        expr(s"substring(payload, offset + 1, $frameLen)").as("frame_bytes"))
}

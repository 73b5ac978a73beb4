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
  * driver. [[decodeImages]] is a REAL decoder for the formats the JDK
  * ships codecs for (PNG/JPEG/BMP/GIF via ImageIO — executable right
  * here); `decodeStub` remains the deterministic stand-in for formats
  * the container lacks (webp/avif/video/audio) and is what the q29
  * oracle replays byte-exactly.
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

  final case class ImageFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      decoded: Boolean,
      width: Long,
      height: Long,
      channels: Long,
      feature: Array[Float])

  /** REAL image decode via the JDK's built-in ImageIO — PNG, JPEG, BMP,
    * and GIF need NO external codecs, so this path is genuinely
    * executable in this container (the `decodeStub` caveat applies only
    * to formats the JDK lacks: webp/avif/video/audio). Per image:
    * dimensions and channel count from the decoded raster plus a
    * deterministic 8-bin grayscale histogram feature (normalized counts
    * — the classic cheap dedup/quality signal). Payloads ImageIO cannot
    * parse (non-image bytes, exotic containers) degrade to
    * `decoded = false` with the stub's pseudo-metadata instead of
    * failing the batch — a corrupt image in a 100-TB crawl must never
    * kill the job. Same batched `mapPartitions` shape as
    * [[decodeFeatures]]: partition-parallel, codec setup amortized per
    * batch, nothing on the driver. */
  def decodeImages(spark: SparkSession, media: DataFrame,
      batchSize: Int = 256): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) {
            val s = decodeStub(r)
            ImageFeatures(r.doc_id, r.modality, s.n_bytes, decoded = false,
              s.width, s.height, s.channels, s.feature)
          } else {
            val (w, h) = (img.getWidth, img.getHeight)
            val hist = new Array[Float](8)
            // Row-wise raster reads, not per-pixel getRGB(x,y): each
            // per-pixel call pays sync + bounds + tile lookup + a boxed
            // ColorModel conversion — 2-5x of the decode cost on
            // megapixel crawl images. For the standard sRGB layouts
            // (what ImageIO actually produces for PNG/JPEG/BMP:
            // 3BYTE_BGR / 4BYTE_ABGR / INT_RGB / INT_ARGB) the stored
            // components ARE getRGB's components (non-premultiplied
            // sRGB, band order R,G,B[,A] regardless of byte layout), so
            // reading the raster directly is bit-identical by
            // construction. Everything else (palette GIFs, gray — where
            // gray->sRGB is NOT the identity) goes through bulk
            // row-getRGB: same ColorModel semantics, call overhead
            // amortized across the row.
            import java.awt.image.BufferedImage._
            val fastBands = img.getType match {
              case TYPE_3BYTE_BGR | TYPE_INT_RGB   => 3
              case TYPE_4BYTE_ABGR | TYPE_INT_ARGB => 4
              case _                               => 0
            }
            if (fastBands > 0) {
              val raster = img.getRaster
              val row = new Array[Int](w * fastBands)
              var y = 0
              while (y < h) {
                raster.getPixels(0, y, w, 1, row)
                var x = 0
                while (x < w) {
                  val o = x * fastBands
                  val lum = (row(o) * 299 + row(o + 1) * 587 + row(o + 2) * 114) / 1000
                  hist(math.min(7, lum >> 5)) += 1f
                  x += 1
                }
                y += 1
              }
            } else {
              val row = new Array[Int](w)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, row, 0, w)
                var x = 0
                while (x < w) {
                  val rgb = row(x)
                  val lum = (((rgb >> 16) & 0xFF) * 299 +
                    ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
                  hist(math.min(7, lum >> 5)) += 1f
                  x += 1
                }
                y += 1
              }
            }
            val n = (w.toLong * h).toFloat
            var i = 0
            while (i < 8) { hist(i) /= n; i += 1 }
            ImageFeatures(r.doc_id, r.modality, r.payload.length.toLong,
              decoded = true, w.toLong, h.toLong,
              channels = img.getColorModel.getNumComponents.toLong,
              feature = hist)
          }
        }
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

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
  * driver. [[decodeImages]] and [[decodeAudio]] are REAL decoders for
  * the formats the JDK ships codecs for (PNG/JPEG/BMP/GIF via ImageIO;
  * WAV/AIFF/AU PCM via javax.sound — executable right here);
  * `decodeStub` remains the deterministic stand-in for codecs the
  * container lacks (webp/avif/mp3/aac/video) and is what the q29
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

  final case class AudioFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      decoded: Boolean,
      sample_rate: Long,
      channels: Long,
      n_frames: Long,
      duration_ms: Long,
      peak_abs: Long,
      feature: Array[Float])

  /** REAL audio decode via the JDK's built-in `javax.sound.sampled`
    * stack — WAV/AIFF/AU PCM need NO external codecs, so this path is
    * genuinely executable in this container (the `decodeStub` caveat now
    * applies only to compressed codecs the JDK lacks: mp3/aac/ogg/
    * video). Per clip: format metadata (sample rate, channels, frame
    * count, duration) plus a deterministic 8-segment temporal energy
    * profile — per-segment RMS of the channel-mixed signal normalized by
    * the clip's peak (the classic cheap silence/clipping/structure
    * signal), and the integer peak amplitude. PCM signed 16-bit (either
    * endianness) and unsigned 8-bit decode; payloads the JDK cannot
    * parse degrade to `decoded = false` instead of failing the batch.
    * Same batched `mapPartitions` shape as [[decodeImages]]. */
  def decodeAudio(spark: SparkSession, media: DataFrame,
      batchSize: Int = 256): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val undecoded = AudioFeatures(r.doc_id, r.modality,
            r.payload.length.toLong, decoded = false, 0L, 0L, 0L, 0L, 0L,
            new Array[Float](8))
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            val fmt = ais.getFormat
            val enc = fmt.getEncoding
            val bits = fmt.getSampleSizeInBits
            val pcmOk =
              (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED && bits == 16) ||
                (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
            if (!pcmOk) undecoded
            else {
              val bytes = ais.readAllBytes()
              val ch = fmt.getChannels
              val frameSize = fmt.getFrameSize
              val n = bytes.length / frameSize
              if (n == 0) undecoded
              else {
                val big = fmt.isBigEndian
                // 8 temporal segments: sum of squares of the channel-mixed
                // sample, plus the global peak |sample| over every channel
                val sumSq = new Array[Double](8)
                val segN = new Array[Long](8)
                var peak = 0L
                var f = 0
                while (f < n) {
                  val seg = math.min(7, (f * 8L / n).toInt)
                  var mix = 0.0
                  var c = 0
                  while (c < ch) {
                    val off = f * frameSize + c * (bits / 8)
                    val v: Int =
                      if (bits == 16) {
                        val b0 = bytes(off) & 0xFF; val b1 = bytes(off + 1) & 0xFF
                        val raw = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
                        (raw << 16) >> 16 // sign-extend
                      } else (bytes(off) & 0xFF) - 128
                    if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
                    mix += v
                    c += 1
                  }
                  mix /= ch
                  sumSq(seg) += mix * mix
                  segN(seg) += 1
                  f += 1
                }
                val feat = new Array[Float](8)
                var s = 0
                while (s < 8) {
                  val rms = if (segN(s) == 0) 0.0 else math.sqrt(sumSq(s) / segN(s))
                  feat(s) = if (peak == 0) 0f else (rms / peak).toFloat
                  s += 1
                }
                AudioFeatures(r.doc_id, r.modality, r.payload.length.toLong,
                  decoded = true,
                  sample_rate = fmt.getSampleRate.toLong,
                  channels = ch.toLong,
                  n_frames = n.toLong,
                  duration_ms = n.toLong * 1000L / fmt.getSampleRate.toLong,
                  peak_abs = peak,
                  feature = feat)
              }
            }
          } catch { case scala.util.control.NonFatal(_) => undecoded }
        }
      }
    }
  }

  /** PCM16 mono WAV bytes through the JDK's own writer — the fixture
    * generator for the real-decode gates (the audio twin of the q98
    * in-test PNG encode). */
  def wavPcm16Mono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(i * 2) = (samples(i) & 0xFF).toByte
      bytes(i * 2 + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  final case class PHashRow(doc_id: Long, decoded: Boolean, phash: Long)

  /** PERCEPTUAL IMAGE HASH (pHash, the DCT form): decode, box-downsample
    * the integer luma grid to 32x32, 2D DCT-II (orthonormal), keep the
    * 8x8 low-frequency block, and set bit i iff AC coefficient i exceeds
    * the median of the 63 AC coefficients (DC is excluded — it is pure
    * mean brightness). Two renderings of the SAME pixel content hash
    * IDENTICALLY by construction: re-encodes are byte-different but
    * raster-equal, and an exact k-times upscale (k a power of two)
    * box-averages back to the identical grid (a sum of k^2 equal ints
    * divided by a power of two is IEEE-exact) — so the classic
    * re-encoded / resized near-dup classes land at Hamming distance 0,
    * and small edits land within a few bits. Same batched
    * `mapPartitions` shape as [[decodeImages]]; undecodable payloads
    * degrade to `decoded = false` instead of failing the partition. */
  def perceptualHash(spark: SparkSession, media: DataFrame,
      batchSize: Int = 256): Dataset[PHashRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) PHashRow(r.doc_id, decoded = false, 0L)
          else PHashRow(r.doc_id, decoded = true, phashOf(img))
        }
      }
    }
  }

  /** Integer luma (0..255, the decodeImages weights) row `y` of `img`
    * into `out` — raster fast path for the standard sRGB layouts, bulk
    * row-getRGB otherwise (same rationale as [[decodeImages]]). */
  private def lumaRow(img: java.awt.image.BufferedImage, y: Int,
      rowBuf: Array[Int], out: Array[Int]): Unit = {
    import java.awt.image.BufferedImage._
    val w = img.getWidth
    val fastBands = img.getType match {
      case TYPE_3BYTE_BGR | TYPE_INT_RGB   => 3
      case TYPE_4BYTE_ABGR | TYPE_INT_ARGB => 4
      case _                               => 0
    }
    if (fastBands > 0) {
      img.getRaster.getPixels(0, y, w, 1, rowBuf)
      var x = 0
      while (x < w) {
        val o = x * fastBands
        out(x) = (rowBuf(o) * 299 + rowBuf(o + 1) * 587 + rowBuf(o + 2) * 114) / 1000
        x += 1
      }
    } else {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        out(x) = (((rgb >> 16) & 0xFF) * 299 +
          ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
        x += 1
      }
    }
  }

  private val PhashN = 32

  private[graft] def phashOf(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    // box-downsample to 32x32: block (i,j) covers x in [i*w/N,(i+1)*w/N)
    // x y likewise (the standard integer partition — exact blocks when
    // the dims are multiples of 32). Block sums accumulate as integers;
    // the mean is one double division per block.
    val sums = Array.ofDim[Long](PhashN, PhashN)
    val cnts = Array.ofDim[Long](PhashN, PhashN)
    val rowBuf = new Array[Int](w * 4)
    val lum = new Array[Int](w)
    var y = 0
    while (y < h) {
      lumaRow(img, y, rowBuf, lum)
      val j = math.min(PhashN - 1, y * PhashN / h)
      var x = 0
      while (x < w) {
        val i = math.min(PhashN - 1, x * PhashN / w)
        sums(i)(j) += lum(x)
        cnts(i)(j) += 1
        x += 1
      }
      y += 1
    }
    val grid = Array.ofDim[Double](PhashN, PhashN)
    var i = 0
    while (i < PhashN) {
      var j = 0
      while (j < PhashN) {
        grid(i)(j) = if (cnts(i)(j) == 0) 0.0 else sums(i)(j).toDouble / cnts(i)(j)
        j += 1
      }
      i += 1
    }
    // orthonormal 2D DCT-II, low-frequency 8x8 block only: rows first
    // (8 x 32 partial sums), then columns — 8*32*32 + 8*8*32 mults
    val cosT = Array.tabulate(8, PhashN)((u, x) =>
      math.cos(math.Pi * (2 * x + 1) * u / (2.0 * PhashN)) *
        (if (u == 0) math.sqrt(1.0 / PhashN) else math.sqrt(2.0 / PhashN)))
    val tmp = Array.ofDim[Double](8, PhashN) // tmp(u)(y) = sum_x grid(x)(y) cos(u,x)
    var u = 0
    while (u < 8) {
      var yy = 0
      while (yy < PhashN) {
        var s = 0.0
        var x = 0
        while (x < PhashN) { s += grid(x)(yy) * cosT(u)(x); x += 1 }
        tmp(u)(yy) = s
        yy += 1
      }
      u += 1
    }
    val ac = new Array[Double](63)
    var bit = 0
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          var s = 0.0
          var yy = 0
          while (yy < PhashN) { s += tmp(u)(yy) * cosT(v)(yy); yy += 1 }
          ac(bit) = s
          bit += 1
        }
        v += 1
      }
      u += 1
    }
    val sorted = ac.clone().sorted
    val median = sorted(31) // 32nd smallest of 63
    var hash = 0L
    bit = 0
    while (bit < 63) {
      if (ac(bit) > median) hash |= 1L << bit
      bit += 1
    }
    hash
  }

  /** Near-duplicate image pairs at `maxHamming` pHash bits: hash, then
    * the 4x16-bit banded self-join ([[Dedup.hammingPairs]] — exact
    * recall for maxHamming <= 3 by pigeonhole, never all-pairs). */
  def phashNearDupPairs(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 2): DataFrame =
    Dedup.hammingPairs(
      perceptualHash(spark, media).toDF().where(col("decoded")),
      "doc_id", "phash", maxHamming)

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

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** A media row: opaque binary payload + typed metadata — the multimodal
  * column convention (image/audio/video bytes travel as `BINARY`, everything
  * queryable lives in metadata columns).
  */
case class MediaRow(
    media_id: Long,
    media_type: String,
    payload: Array[Byte],
    width: Int,
    height: Int)

/** Byte-level features extracted from an opaque (non-image) payload. */
case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Int,
    content_hash: String,
    width: Int,
    height: Int)

/** Pixel-level features from a REAL image decode ([[Media.decodeImages]]):
  * dimensions read from the decoded raster (not metadata) and exact integer
  * channel sums — deterministic, so an oracle that knows the pixel function
  * can verify the decode bit-for-bit.
  */
case class ImageFeatures(
    media_id: Long,
    format: String,
    width: Int,
    height: Int,
    n_pixels: Long,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long)

/** Sample-level features from a REAL audio decode ([[Media.decodeWavs]]):
  * the container format fields come from the decoder's parsed header and the
  * integer sample statistics from the decoded PCM frames.
  */
case class AudioFeatures(
    media_id: Long,
    sample_rate: Int,
    channels: Int,
    bits: Int,
    n_samples: Long,
    sum_samples: Long,
    min_sample: Int,
    max_sample: Int)

/** Multimodal-column plumbing for a training-data pipeline (SURVEY-adjacent:
  * the operators a 100 TB multimodal corpus needs on top of the relational
  * core).
  *
  * Design: payloads are opaque `BINARY`; decode / feature-extraction runs
  * batch-at-a-time inside `mapPartitions` (the JVM analogue of `mapInPandas`
  * — one iterator pass per partition, codec state initialized once per
  * partition, never per row). Image decode is REAL: PNG/JPEG codecs ship in
  * the JDK (`javax.imageio`), so [[decodeImages]] reads actual rasters and
  * emits pixel statistics; [[extractFeatures]] remains the byte-level path
  * for payload types this container has no codec for (audio/video), where
  * byte length + content hash are honest features of an opaque payload.
  *
  * Scale: payload bytes dominate I/O. Keep payloads in their own parquet
  * column (columnar pruning skips them unless selected), size
  * `maxPartitionBytes` to bound decoded-batch memory, and repartition by a
  * metadata key before shuffle-heavy stages so the binary column never
  * shuffles more than once.
  */
object Media {

  /** Build a media table from the documents testdata: the UTF-8 bytes stand
    * in for an encoded frame; width/height are deterministic fake metadata.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("doc_id") % 480).cast("int").as("height"))

  /** Byte-level feature pass for payload types without a JDK codec
    * (audio/video): byte count + md5. Image payloads take the real-decode
    * path [[decodeImages]] instead.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
    val digest = java.security.MessageDigest.getInstance("MD5") // per batch, not per row
    batch.map { m =>
      digest.reset()
      val hash = digest.digest(m.payload).map("%02x".format(_)).mkString
      MediaFeatures(m.media_id, m.media_type, m.payload.length, hash, m.width, m.height)
    }
  }

  /** Feature extraction over the media table: partition-wise batched decode.
    * `batchSize` bounds decoder memory exactly like `mapInPandas`'s arrow
    * batch size.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 256): Dataset[MediaFeatures] = {
    val ds = media.as(Encoders.product[MediaRow])
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => decodeBatch(g))
    }(Encoders.product[MediaFeatures])
  }

  // ------------------------------------------------------------------ real
  // image encode/decode via the JDK's javax.imageio (PNG codec is built in —
  // no external library, works headless).

  /** The deterministic test pixel function: channel values at (x, y) of image
    * `id`. Closed-form, so a SQL oracle can replay the expected channel sums
    * without any decoder — the cross-check that proves [[decodeImages]] reads
    * real rasters.
    */
  private[graft] def pixel(id: Long, x: Int, y: Int): (Int, Int, Int) =
    (((id * 7 + x) % 256).toInt, ((x + y) % 256).toInt, ((id + 3L * y) % 256).toInt)

  private[graft] def dims(id: Long): (Int, Int) =
    ((8 + id % 9).toInt, (8 + (id * 3) % 9).toInt)

  /** Render one deterministic RGB PNG per input id — executor-side
    * (`mapPartitions`), the encoder allocated per partition. Stands in for
    * "the corpus arrives as encoded image bytes".
    */
  def renderPngs(ids: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val in = ids.select(ids.columns.headOption.map(c => col(c).cast("long"))
      .getOrElse(sys.error("renderPngs: no id column")))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // stream in memory, no temp files
      it.map { row =>
        val id = row.getLong(0)
        val (w, h) = dims(id)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = pixel(id, x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream(1024)
        require(javax.imageio.ImageIO.write(img, "png", out), s"no PNG writer for id=$id")
        Row(id, out.toByteArray)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL image decode: `javax.imageio` reads the payload bytes, and the
    * features come from the decoded raster — dimensions from the image, exact
    * integer channel sums from `getRGB`. Batched per partition like
    * [[extractFeatures]]; `format` is the codec's own format name (proof the
    * bytes went through a real reader, not a metadata echo).
    *
    * Scale: decode is CPU-bound and embarrassingly parallel — one task per
    * input split, no shuffle; the binary column is pruned away the moment the
    * features are projected.
    */
  def decodeImages(media: DataFrame, batchSize: Int = 64): Dataset[ImageFeatures] = {
    import org.apache.spark.sql.Row
    val pruned = media.select(col("media_id").cast("long"), col("payload"))
    pruned.mapPartitions { (it: Iterator[Row]) =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(0)
          val bytes = row.getAs[Array[Byte]](1)
          val in = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          require(readers.hasNext, s"media_id=$id: no image reader for payload")
          val reader = readers.next()
          try {
            reader.setInput(in)
            val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val img = reader.read(0)
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            ImageFeatures(id, fmt, w, h, w.toLong * h, sr, sg, sb)
          } finally { reader.dispose(); in.close() }
        }
      }
    }(Encoders.product[ImageFeatures])
  }

  // ------------------------------------------------------------------ real
  // audio encode/decode via the JDK's javax.sound.sampled (the WAV reader is
  // pure header+PCM parsing — no audio device, headless-safe).

  /** The deterministic test waveform: 16-bit signed sample `t` of clip `id`.
    * Closed-form so a SQL oracle replays the expected sample statistics
    * without a decoder.
    */
  private[graft] def sample(id: Long, t: Int): Int =
    (((id * 37 + t.toLong * t) % 65536) - 32768).toInt

  private[graft] def nSamples(id: Long): Int = (64 + id % 128).toInt

  /** Render one deterministic mono 16-bit/8 kHz WAV per input id —
    * executor-side, the encoder per partition.
    */
  def renderWavs(ids: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val in = ids.select(ids.columns.headOption.map(c => col(c).cast("long"))
      .getOrElse(sys.error("renderWavs: no id column")))
    in.mapPartitions { it =>
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      it.map { row =>
        val id = row.getLong(0)
        val n = nSamples(id)
        val pcm = new Array[Byte](n * 2)
        var t = 0
        while (t < n) {
          val v = sample(id, t)
          pcm(2 * t) = (v & 0xff).toByte           // little-endian
          pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
          t += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val out = new java.io.ByteArrayOutputStream(n * 2 + 64)
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        Row(id, out.toByteArray)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL audio decode: the JDK WAV reader parses the container header
    * (sample rate / channels / bit depth come from the DECODER, not echoed
    * metadata) and the PCM frames are read back into integer sample
    * statistics. Batched per partition like the other decode paths.
    */
  def decodeWavs(media: DataFrame, batchSize: Int = 64): Dataset[AudioFeatures] = {
    import org.apache.spark.sql.Row
    val pruned = media.select(col("media_id").cast("long"), col("payload"))
    pruned.mapPartitions { (it: Iterator[Row]) =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(0)
          val bytes = row.getAs[Array[Byte]](1)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val f = ais.getFormat
            require(f.getSampleSizeInBits == 16 && !f.isBigEndian,
              s"media_id=$id: expected 16-bit little-endian PCM, got $f")
            val pcm = ais.readAllBytes()
            val n = pcm.length / 2
            var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
            var t = 0
            while (t < n) {
              val v = ((pcm(2 * t + 1) << 8) | (pcm(2 * t) & 0xff))
              sum += v; if (v < mn) mn = v; if (v > mx) mx = v
              t += 1
            }
            AudioFeatures(id, f.getSampleRate.toInt, f.getChannels,
              f.getSampleSizeInBits, n.toLong, sum, mn, mx)
          } finally ais.close()
        }
      }
    }(Encoders.product[AudioFeatures])
  }

  /** Image resize — metadata half: a real build rescales pixels; here only the
    * metadata transform (aspect-preserving fit into maxDim) is real, the
    * payload passes through untouched. Demonstrates metadata-only rewrite
    * without shuffling payload bytes.
    */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val needsResize = col("width") > maxDim || col("height") > maxDim
    val scale = least(lit(maxDim) / greatest(col("width"), lit(1)),
      lit(maxDim) / greatest(col("height"), lit(1)))
    // both dims must scale off the ORIGINAL columns (a chained withColumn
    // would feed the rewritten width into the height branch)
    media.withColumns(Map(
      "width" -> when(needsResize, (col("width") * scale).cast("int")).otherwise(col("width")),
      "height" -> when(needsResize, (col("height") * scale).cast("int")).otherwise(col("height"))))
  }

  /** Frame sampling for video-like payloads: keep every `stride`-th row per
    * media group — the row-pattern a frame sampler produces (payload split
    * upstream into per-frame rows).
    */
  def sampleFrames(frames: DataFrame, orderCol: String, stride: Int): DataFrame =
    frames.filter(col(orderCol) % stride === 0)
}

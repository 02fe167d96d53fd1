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

/** Features extracted from a payload by the (stubbed) decoder. */
case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Int,
    content_hash: String,
    width: Int,
    height: Int)

/** Multimodal-column plumbing for a training-data pipeline (SURVEY-adjacent:
  * the operators a 100 TB multimodal corpus needs on top of the relational
  * core).
  *
  * Design: payloads are opaque `BINARY`; decode / feature-extraction runs
  * batch-at-a-time inside [[extractFeatures]]'s `mapPartitions` (the JVM
  * analogue of `mapInPandas` — one iterator pass per partition, codec state
  * initialized once per partition, never per row). The decode itself is a
  * STUB (this container ships no image/audio codecs): deterministic fake
  * features (byte length + md5) stand in, and the Spark-side contract —
  * schema, partitioning, batch shape, encoder — is real and tested.
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

  /** STUB — a real build decodes here (JPEG/PNG/WAV/MP4 via a codec library);
    * deterministic fake: byte count + md5 of the payload. Signature and batch
    * shape match what a vectorized decoder needs.
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

  /** STUB — image resize: a real build rescales pixels; here only the
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

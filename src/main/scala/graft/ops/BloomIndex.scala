package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import graft.functions.{Bloom, BloomBuild}

/** Per-file Bloom-filter index — Delta's public bloom-filter-index design
  * next to the min/max skipping sidecar ([[DataSkipping]]): a point lookup
  * on a HIGH-CARDINALITY, UNCLUSTERED key is exactly where min/max stats
  * fail (every file's [min, max] spans nearly the whole key domain, so
  * every file is admitted), and a per-file bit set answers "might this
  * file hold key X?" in O(1) with a bounded false-positive rate and ZERO
  * false negatives — the same conservative-superset contract the rest of
  * the skipping layer keeps (pruned scan + residual filter ≡ full filter).
  *
  * Build: one pass over the data grouped by `_metadata`'s file identity —
  * partial-aggregated bit-array OR-merge per file (the [[BloomBuild]]
  * aggregator), sized from the largest file's row count at ~`bitsPerKey`
  * bits. The sidecar is O(rows · bitsPerKey / 8) bytes total, stored as
  * one row per file under `_bloom/` inside the (immutable) data dir —
  * built before the version goes live, like the stats index.
  *
  * Probe: read the sidecar (O(files) rows), hash the literal with the SAME
  * engine hash the build used (`xxhash64`), and test each file's bit set
  * driver-side — no data file is opened. At 100 TB with 1 % fpp a point
  * lookup opens ~1 + 0.01·files of the candidate files instead of all of
  * them.
  */
object BloomIndex {

  private val SidecarName = "_bloom"
  private val Probes = 5 // with 10 bits/key ≈ 1 % false-positive rate

  /** Build the per-file index for `column` inside `dataDir`. */
  def writeIndex(spark: SparkSession, dataDir: String, column: String,
      bitsPerKey: Int = 10): Unit = {
    val data = spark.read.parquet(dataDir)
      .select(input_file_name().as("file"), xxhash64(col(column)).as("h"))
    val maxRows = data.groupBy("file").count().agg(max("count")).head.getLong(0)
    val numBits = Bloom.sizeBits(maxRows, bitsPerKey)
    val build = udaf(new BloomBuild(numBits, Probes),
      org.apache.spark.sql.Encoders.scalaLong)
    data.groupBy(col("file"))
      .agg(build(col("h")).as("bits"), count(lit(1)).as("n"))
      .withColumn("k", lit(Probes))
      .write.mode(SaveMode.Overwrite)
      .parquet(new Path(dataDir, SidecarName).toString)
  }

  /** Files that MIGHT hold `column = value` (admitted, total). Zero false
    * negatives by construction; false positives bounded by the build's
    * bits/key. The caller reads the admitted files and applies the
    * residual filter.
    */
  def selectFiles(spark: SparkSession, dataDir: String,
      value: org.apache.spark.sql.Column): (Seq[String], Int) = {
    val (perKey, total) = selectFilesAll(spark, dataDir, Seq(value))
    (perKey.head, total)
  }

  /** Multi-key probe: the admitted file list PER VALUE (input order), from
    * ONE sidecar read — a point-lookup batch must not re-read the O(files)
    * bit sets once per key. All literals are hashed in one 1-row job with
    * the engine's own xxhash64; each collected bit set is then tested
    * driver-side against every key.
    */
  def selectFilesAll(spark: SparkSession, dataDir: String,
      values: Seq[org.apache.spark.sql.Column]): (Seq[Seq[String]], Int) = {
    require(values.nonEmpty, "selectFilesAll: need at least one probe value")
    val hashes = spark.range(1).select(values.map(v => xxhash64(v)): _*)
      .head.toSeq.map(_.asInstanceOf[Long])
    val side = spark.read.parquet(new Path(dataDir, SidecarName).toString)
      .select("file", "bits", "k").collect() // O(files), ONCE for the batch
    val perKey = hashes.map { h =>
      side.toSeq.filter { r =>
        Bloom.mightContain(r.getSeq[Long](1).toArray, r.getInt(2), h)
      }.map(_.getString(0))
    }
    (perKey, side.length)
  }
}

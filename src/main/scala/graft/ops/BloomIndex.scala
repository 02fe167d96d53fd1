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

  /** The largest per-file row count, from parquet FOOTERS (round 18,
    * guide §1.2): sizing the filter used to cost a FULL extra pass over
    * the data (`groupBy(file).count()`) before the real build pass —
    * at 100 TB that doubles the index build's read volume for one
    * number the footers already hold. O(files) metadata reads, no job.
    */
  private def footerMaxRows(spark: SparkSession, paths: Seq[Path]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    paths.map { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.foldLeft(0L)(math.max)
  }

  private def visibleFiles(spark: SparkSession, dir: Path): Seq[Path] =
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(dir).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(_.getPath)

  /** Evaluate `xxhash64(value)` for literal probe values DRIVER-SIDE —
    * the same engine hash expression, constant-folded locally instead of
    * through a 1-row Spark job per probe batch. Non-foldable probe
    * columns keep the job path.
    */
  private def literalHashes(spark: SparkSession,
      values: Seq[org.apache.spark.sql.Column]): Seq[Long] = {
    val exprs = values.map(v => new org.apache.spark.sql.catalyst.expressions
      .XxHash64(Seq(org.apache.spark.sql.graftcol.toExpression(v))))
    if (exprs.forall(e => e.resolved && e.foldable))
      exprs.map(_.eval(null).asInstanceOf[Long])
    else spark.range(1).select(values.map(v => xxhash64(v)): _*)
      .head.toSeq.map(_.asInstanceOf[Long])
  }

  /** Build the per-file index for `column` inside `dataDir`. */
  def writeIndex(spark: SparkSession, dataDir: String, column: String,
      bitsPerKey: Int = 10): Unit = {
    val data = spark.read.parquet(dataDir)
      .select(input_file_name().as("file"), xxhash64(col(column)).as("h"))
    val maxRows = footerMaxRows(spark, visibleFiles(spark, new Path(dataDir)))
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

  // ------------------------------------------------------------------
  // INDEX MAINTENANCE UNDER DML — Delta's bloom index follows the FILE
  // lifecycle, not the write: entries are per immutable file, so DML
  // composes as (a) new files -> build entries for exactly those,
  // (b) removed files -> their entries go dead and are ignored,
  // (c) byte-copied files (a DV delete carries data files verbatim) ->
  // entries carried, zero rebuild. Correctness NEVER depends on the
  // index being fresh: a live file without an entry is admitted
  // conservatively (the same superset contract as stats-less files), so
  // a probe between a commit and its refresh stays exact — refresh
  // restores PRUNING, not correctness.

  private val LogSidecar = "_bloomlog"

  /** Incrementally index `column` for a log-structured table: build
    * entries ONLY for live files that lack one (O(new data), never
    * O(table)) and append them to the table-level sidecar. Dead entries
    * (removed files) are ignored at probe time; when they outnumber the
    * live ones the sidecar is folded. Returns (built, carried).
    */
  def refresh(spark: SparkSession, tableDir: String, column: String,
      bitsPerKey: Int = 10): (Int, Int) = {
    val live = ActionLog.liveFiles(spark, tableDir).map(_._1)
    val side = new Path(tableDir, LogSidecar)
    val fs = side.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing: Set[String] =
      if (!fs.exists(side)) Set.empty
      else spark.read.parquet(side.toString).filter(col("c") === column)
        .select("file").distinct().collect().map(_.getString(0)).toSet
    val missing = live.filterNot(existing)
    if (missing.nonEmpty) {
      val data = spark.read
        .parquet(missing.map(f => s"$tableDir/data/$f"): _*)
        .select(element_at(split(input_file_name(), "/"), -1).as("file"),
          xxhash64(col(column)).as("h"))
      val maxRows = footerMaxRows(spark,
        missing.map(f => new Path(s"$tableDir/data/$f")))
      val build = udaf(new BloomBuild(Bloom.sizeBits(maxRows, bitsPerKey), Probes),
        org.apache.spark.sql.Encoders.scalaLong)
      data.groupBy(col("file"))
        .agg(build(col("h")).as("bits"))
        .withColumn("k", lit(Probes)).withColumn("c", lit(column))
        .write.mode(SaveMode.Append).parquet(side.toString)
    }
    // fold the sidecar when dead entries dominate — O(files) metadata
    if (fs.exists(side)) {
      val all = spark.read.parquet(side.toString)
      val dead = all.filter(!col("file").isin(live: _*)).count()
      if (dead > live.size) {
        val kept = all.filter(col("file").isin(live: _*)).localCheckpoint()
        kept.write.mode(SaveMode.Overwrite).parquet(side.toString)
      }
    }
    (missing.size, live.size - missing.size)
  }

  /** Batched point probe against the table-level log sidecar: per value,
    * the live files that MIGHT hold it. A live file without an entry is
    * admitted for every key (conservative). Returns (perKeyAdmitted,
    * indexedLiveFiles, liveFiles).
    */
  def probeLog(spark: SparkSession, tableDir: String, column: String,
      values: Seq[org.apache.spark.sql.Column]): (Seq[Seq[String]], Int, Int) = {
    require(values.nonEmpty, "probeLog: need at least one probe value")
    val live = ActionLog.liveFiles(spark, tableDir).map(_._1)
    val side = new Path(tableDir, LogSidecar)
    val fs = side.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(side))
      return (values.map(_ => live), 0, live.size)
    val hashes = literalHashes(spark, values)
    if (live.size <= driverProbeMaxFiles(spark)) {
      // SMALL index: one plain collect beats an aggregation's extra
      // shuffle stage, and the driver memory is bounded by the threshold
      val entries: Map[String, (Array[Long], Int)] =
        spark.read.parquet(side.toString).filter(col("c") === column)
          .select("file", "bits", "k").collect()
          .map(r => r.getString(0) ->
            ((r.getSeq[Long](1).toArray, r.getInt(2)))).toMap
      val perKey = hashes.map { h =>
        live.filter(f => entries.get(f)
          .forall { case (bits, k) => Bloom.mightContain(bits, k, h) })
      }
      return (perKey, live.count(entries.contains), live.size)
    }
    // LARGE index: membership evaluates ENGINE-SIDE over the sidecar scan
    // (the per-row codegen'd probe): the driver collects only admitted +
    // indexed NAMES — never the bit sets, which at a million files are a
    // driver OOM
    val aggs = hashes.zipWithIndex.map { case (h, i) =>
      collect_list(when(Bloom.mightContainRowCol(col("bits"), col("k"),
        lit(h)), col("file"))).as(s"admit_$i")
    } :+ collect_set(col("file")).as("indexed")
    val row = spark.read.parquet(side.toString).filter(col("c") === column)
      .agg(aggs.head, aggs.tail: _*).head
    val indexed = row.getSeq[String](hashes.size).toSet
    val perKey = hashes.indices.map { i =>
      val pass = row.getSeq[String](i).toSet
      // a live file without an entry is admitted for every key
      live.filter(f => !indexed.contains(f) || pass.contains(f))
    }
    (perKey, live.count(indexed), live.size)
  }

  /** Above this many candidate files, bloom probes evaluate on the
    * EXECUTORS and the driver receives names only; at or below it, one
    * plain collect of the bit sets is cheaper than an aggregation's
    * extra shuffle stage AND bounded (≤ ~2 KiB per entry → tens of MiB
    * worst case). The engine-side path is the 100 TB shape; the
    * threshold only recovers the small-table latency the round-12
    * switch cost (q234 measured 1.5×). Conf-overridable so tests pin
    * BOTH branches on the same table.
    */
  val DriverProbeMaxFilesConf = "spark.graft.bloomDriverProbeMaxFiles"
  val DefaultDriverProbeMaxFiles = 8192

  private def driverProbeMaxFiles(spark: SparkSession): Int =
    spark.conf.get(DriverProbeMaxFilesConf,
      DefaultDriverProbeMaxFiles.toString).toInt

  /** Carry a version-dir index across a byte-copy commit (the DV-delete
    * shape: data files copied VERBATIM under the same names into the next
    * version dir): entries whose file exists identically (name + length)
    * in `toDir` are carried with the path rewritten — zero data reads —
    * and only changed/new files are rebuilt. After a true rewrite
    * (DV compaction folds the vectors into fresh files) nothing matches
    * and everything rebuilds, which is exactly right: the old bits
    * described rows that no longer exist at those indexes. Returns
    * (carried, rebuilt).
    */
  def carryIndex(spark: SparkSession, fromDir: String, toDir: String,
      column: String, bitsPerKey: Int = 10): (Int, Int) = {
    val fs = new Path(toDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldSide = new Path(fromDir, SidecarName)
    val oldEntries: Map[String, org.apache.spark.sql.Row] =
      if (!fs.exists(oldSide)) Map.empty
      else spark.read.parquet(oldSide.toString).collect()
        .map(r => new Path(r.getString(0)).getName -> r).toMap
    val dataFiles = fs.listStatus(new Path(toDir)).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    val (carry, rebuild) = dataFiles.partition { st =>
      oldEntries.contains(st.getPath.getName) && {
        val from = new Path(fromDir, st.getPath.getName)
        fs.exists(from) && fs.getFileStatus(from).getLen == st.getLen
      }
    }
    import spark.implicits._
    val carried = carry.map { st =>
      val r = oldEntries(st.getPath.getName)
      (st.getPath.toString, r.getSeq[Long](1), r.getLong(2), r.getInt(3))
    }.toDF("file", "bits", "n", "k")
    val rebuilt =
      if (rebuild.isEmpty) carried.limit(0)
      else {
        val data = spark.read.parquet(rebuild.map(_.getPath.toString): _*)
          .select(input_file_name().as("file"), xxhash64(col(column)).as("h"))
        val maxRows = footerMaxRows(spark, rebuild.map(_.getPath))
        val build = udaf(
          new BloomBuild(Bloom.sizeBits(maxRows, bitsPerKey), Probes),
          org.apache.spark.sql.Encoders.scalaLong)
        data.groupBy(col("file"))
          .agg(build(col("h")).as("bits"), count(lit(1)).as("n"))
          .withColumn("k", lit(Probes))
      }
    carried.unionByName(rebuilt).localCheckpoint()
      .write.mode(SaveMode.Overwrite)
      .parquet(new Path(toDir, SidecarName).toString)
    (carry.size, rebuild.size)
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
    val hashes = literalHashes(spark, values)
    // sidecar size ≈ data-file count — one driver metadata listing
    val dd = new Path(dataDir)
    val fs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nData = fs.listStatus(dd).count(st => st.isFile &&
      !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith("."))
    if (nData <= driverProbeMaxFiles(spark)) {
      // small index: bounded collect, no extra aggregation stage
      val side = spark.read
        .parquet(new Path(dataDir, SidecarName).toString)
        .select("file", "bits", "k").collect()
      val perKey = hashes.map { h =>
        side.toSeq.filter { r =>
          Bloom.mightContain(r.getSeq[Long](1).toArray, r.getInt(2), h)
        }.map(_.getString(0))
      }
      return (perKey, side.length)
    }
    // ONE engine-side aggregation for the whole key batch: the per-row
    // codegen'd probe tests every sidecar entry on the executors, and the
    // driver receives only the admitted file NAMES per key plus a count —
    // O(admitted), never O(files × bit-set bytes)
    val aggs = hashes.zipWithIndex.map { case (h, i) =>
      collect_list(when(Bloom.mightContainRowCol(col("bits"), col("k"),
        lit(h)), col("file"))).as(s"admit_$i")
    } :+ count(lit(1)).as("total")
    val row = spark.read.parquet(new Path(dataDir, SidecarName).toString)
      .agg(aggs.head, aggs.tail: _*).head
    val perKey = hashes.indices.map(i => row.getSeq[String](i).toSeq)
    (perKey, row.getLong(hashes.size).toInt)
  }
}

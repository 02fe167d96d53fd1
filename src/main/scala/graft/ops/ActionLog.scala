package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.schema.LogicalTypeAnnotation

/** LOG-STRUCTURED TABLE — the Delta-log design proper, complementing
  * [[VersionedTable]]'s snapshot-per-version layout: data files are
  * IMMUTABLE and SHARED across versions under `data/`, and each commit
  * appends one action file (`_log/NNNNNNNN.json`, JSON-lines of
  * `add`/`remove` file actions), so an append costs O(delta) — new part
  * files plus one log record — never O(table). Snapshot resolution
  * REPLAYS the log; a CHECKPOINT (`_log/_checkpoint-NNNNNNNN.json`, the
  * materialized file set, pointed to by `_last_checkpoint`) bounds the
  * replay to the post-checkpoint tail, Delta's exact recipe for keeping
  * thousand-commit tables O(1)-resolvable.
  *
  * Why both layouts exist in this library: snapshot-per-version is the
  * right shape for small dims rebuilt wholesale (the reference's daily
  * MERGE targets); at 100 TB fact scale a full snapshot per commit is a
  * write-amplification disaster — the action log is the only design that
  * appends a terabyte to a petabyte table by writing a terabyte.
  *
  * Commit atomicity: the log record is staged and renamed into its slot
  * (create-fails-if-present), so version N exists iff its action file
  * does — a crash mid-data-write leaves orphan part files the next
  * commit ignores (they are unreferenced by any action). Single-writer;
  * multi-writer claims compose with [[Occ]]'s protocol unchanged.
  *
  * Time travel: `read(dir, asOf = v)` replays only actions ≤ v, so
  * compaction (remove+add in one commit) never breaks older versions —
  * removed files stay on disk until a retention sweep drops versions
  * that reference them.
  */
object ActionLog {

  private val LogDir = "_log"
  private val DataDir = "data"
  private val LastCkpt = "_last_checkpoint"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logPath(dir: String, v: Long): Path =
    new Path(s"$dir/$LogDir/${"%08d".format(v)}.json")

  private def ckptPath(dir: String, v: Long): Path =
    new Path(s"$dir/$LogDir/_checkpoint-${"%08d".format(v)}.json")

  private def ckptPartPath(dir: String, v: Long, i: Int, n: Int): Path =
    new Path(s"$dir/$LogDir/_checkpoint-${"%08d".format(v)}" +
      s".p${"%02d".format(i)}-of-${"%02d".format(n)}.json")

  // NOT underscore-prefixed (Delta's `N.checkpoint.parquet` naming, for
  // the same reason): Spark's file index treats `_`-prefixed paths as
  // hidden, and the distributed checkpoint must be spark.read-able
  private def ckptParquetPath(dir: String, v: Long): Path =
    new Path(s"$dir/$LogDir/${"%08d".format(v)}.checkpoint.parquet")

  private def compactPath(dir: String, from: Long, to: Long): Path =
    new Path(s"$dir/$LogDir/_compact-${"%08d".format(from)}-${"%08d".format(to)}.json")

  private val CkptSingle = """_checkpoint-(\d{8})\.json""".r
  // part index/count are \d+ on the READ side while the writer zero-pads
  // to two digits: %02d renders 100 as "100", so a >=100-part checkpoint
  // round-trips — a two-digit-only regex would silently invalidate every
  // such checkpoint (full-log replay + orphan fragments vacuum never owns)
  private val CkptPart = """_checkpoint-(\d{8})\.p(\d+)-of-(\d+)\.json""".r
  private val CkptParquet = """(\d{8})\.checkpoint\.parquet""".r
  // read-side ONLY: rounds before the visible-name rename wrote parquet
  // checkpoints as `_checkpoint-N.parquet` dirs; they stay resolvable
  // (via [[readCkptParquetDf]]'s explicit part-file listing — the dir
  // name itself is hidden to Spark's file index) so a legacy table
  // vacuumed below its checkpoint doesn't become unreadable
  private val CkptParquetLegacy = """_checkpoint-(\d{8})\.parquet""".r
  private val CompactName = """_compact-(\d{8})-(\d{8})\.json""".r

  /** Read a parquet checkpoint dir as a DataFrame, tolerating the legacy
    * `_`-prefixed dir name: Spark's file index silently drops hidden
    * paths EVEN WHEN passed explicitly, so for those the visible
    * `part-*` files are listed driver-side and passed by explicit path.
    */
  private def readCkptParquetDf(spark: SparkSession, fs: FileSystem,
      p: Path): DataFrame =
    if (!p.getName.startsWith("_") && !p.getName.startsWith("."))
      spark.read.parquet(p.toString)
    else {
      val parts = fs.listStatus(p).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(_.getPath.toString).sorted
      require(parts.nonEmpty,
        s"ActionLog: legacy parquet checkpoint $p has no part files")
      spark.read.parquet(parts: _*)
    }

  /** COMPLETE checkpoints ≤ `asOf`: a single-file checkpoint, or a
    * multi-part one with EVERY part present (Delta's validity rule — a
    * writer that crashed mid-parts left an ignorable fragment, never a
    * truncated state). Returns version → the part paths to read.
    */
  private def completeCheckpoints(fs: FileSystem, dir: String,
      asOf: Long): Map[Long, Seq[Path]] = {
    val ld = new Path(s"$dir/$LogDir")
    if (!fs.exists(ld)) return Map.empty
    val names = fs.listStatus(ld).toSeq.map(_.getPath.getName)
    val singles = names.collect { case CkptSingle(v) => v.toLong }
      .filter(_ <= asOf).map(v => v -> Seq(ckptPath(dir, v)))
    val parts = names.collect { case CkptPart(v, i, n) =>
      (v.toLong, i.toInt, n.toInt)
    }.groupBy(_._1).collect {
      case (v, ps) if v <= asOf && ps.map(_._3).distinct.size == 1 &&
        ps.map(_._2).sorted == (0 until ps.head._3) =>
        v -> ps.sortBy(_._2).map(p => ckptPartPath(dir, v, p._2, p._3))
    }
    (singles ++ parts).toMap
  }

  /** COMPLETE parquet checkpoints ≤ `asOf` — the DISTRIBUTED checkpoint
    * form ([[checkpointParquet]]): a directory of parquet part files
    * written by a Spark job, complete iff its `_SUCCESS` marker landed
    * (a writer crashing mid-job leaves an ignorable fragment, same
    * validity rule as multi-part JSON).
    */
  private def completeParquetCheckpoints(fs: FileSystem, dir: String,
      asOf: Long): Map[Long, Path] = {
    val ld = new Path(s"$dir/$LogDir")
    if (!fs.exists(ld)) return Map.empty
    fs.listStatus(ld).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case CkptParquet(v) if v.toLong <= asOf &&
            fs.exists(new Path(st.getPath, "_SUCCESS")) =>
            Some(v.toLong -> st.getPath)
          case CkptParquetLegacy(v) if v.toLong <= asOf &&
            fs.exists(new Path(st.getPath, "_SUCCESS")) =>
            Some(v.toLong -> st.getPath)
          case _ => None
        }
    }.flatten.toMap
  }

  /** Whether this table is on the PARQUET-CHECKPOINT plane: once one
    * distributed checkpoint lands, [[readWhere]]'s pruning goes fully
    * engine-side (O(kept) driver collect), [[vacuum]] materializes its
    * horizon checkpoint as a parquet job, and every [[replayState]]-based
    * path seeds from the executor-parsed checkpoint instead of
    * single-threaded JSON. Legacy tables (JSON checkpoints only) keep the
    * original plane byte-for-byte.
    */
  private def onParquetPlane(fs: FileSystem, dir: String): Boolean =
    completeParquetCheckpoints(fs, dir, Long.MaxValue).nonEmpty

  /** The `_last_checkpoint` hint, tolerant of a torn/empty pointer file:
    * `fs.create(overwrite = true)` is not atomic, so a crashed writer can
    * leave zero bytes — an unreadable hint is treated as ABSENT (the next
    * checkpoint overwrites it), never an exception that wedges the plane.
    */
  private def lastCkptHint(fs: FileSystem, dir: String): Option[Long] = {
    val lc = new Path(s"$dir/$LogDir/$LastCkpt")
    if (!fs.exists(lc)) None
    else scala.util.Try(readLines(fs, lc)).toOption
      .flatMap(_.headOption).flatMap(_.trim.toLongOption)
  }

  private def writeCkptHint(fs: FileSystem, dir: String, v: Long): Unit = {
    val out = fs.create(new Path(s"$dir/$LogDir/$LastCkpt"), true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // every action line the log writes fits this one struct; from_json
  // null-pads absent fields, so add/remove/txn parse with a single schema
  private val ActionJsonSchema =
    "a STRING, p STRING, lo BIGINT, hi BIGINT, n BIGINT, app STRING, batch BIGINT"

  /** Parse raw JSON action lines (column `value`, with a `ver` column
    * already attached) into typed action rows — DISTRIBUTED, the parse
    * the driver-side replay cannot afford at a million files.
    */
  private def parseActions(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.filter(org.apache.spark.sql.functions.length(col("value")) > 0)
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType.fromDDL(ActionJsonSchema)).as("j"), col("ver"))
      .select(col("j.a").as("a"), col("j.p").as("p"), col("j.lo").as("lo"),
        col("j.hi").as("hi"), col("j.n").as("n"), col("j.app").as("app"),
        col("j.batch").as("batch"), col("ver"))
  }

  /** Raw JSON action lines parallelized from a driver-side read — the
    * bridge for UNDERSCORE-PREFIXED log artifacts (JSON checkpoints,
    * compacted fragments): Spark's file index treats `_`/`.`-prefixed
    * paths as hidden and SILENTLY drops them even when they are passed
    * explicitly, so `spark.read.text` on them loses the whole artifact —
    * a silently-wrong live set, never an error. Lines are read
    * driver-side (bounded: JSON checkpoints belong to the legacy
    * driver plane, fragments are net sets of a compacted range) and
    * parsed on the executors; the SCALE plane's checkpoint is parquet
    * ([[checkpointParquet]]), whose directory read is not affected.
    */
  private def linesDf(spark: SparkSession, fs: FileSystem,
      paths: Seq[Path], ver: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    spark.createDataset(paths.flatMap(readLines(fs, _))).toDF("value")
      .withColumn("ver", lit(ver))
  }

  /** The replay state at `asOf` AS A DATAFRAME — snapshot resolution as a
    * Spark job, the shape a million-file log needs (Delta's parquet
    * checkpoint + distributed log replay): the newest complete checkpoint
    * ≤ `asOf` (parquet preferred, JSON accepted) seeds the state, the
    * post-checkpoint tail is text-read and JSON-parsed ON THE EXECUTORS
    * (version recovered from each record's file name), and per-path
    * last-action-wins resolves the live set in one `max_by` aggregation —
    * legal because staged file names are writer-unique, so a path carries
    * at most one action per version. Driver memory: O(1).
    *
    * Columns: `a` ("add" rows = live files with optional lo/hi/n stats;
    * "txn" rows = per-app batch high-water marks), `p`, `lo`, `hi`, `n`,
    * `app`, `batch`.
    */
  def stateDfAt(spark: SparkSession, dir: String, asOf: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val fs = fsOf(spark, dir)
    val jc = completeCheckpoints(fs, dir, asOf)
    val pc = completeParquetCheckpoints(fs, dir, asOf)
    val baseV = (jc.keys ++ pc.keys).maxOption
    val base: Option[DataFrame] = baseV.map { v =>
      if (pc.contains(v))
        readCkptParquetDf(spark, fs, pc(v)).withColumn("ver", lit(v))
      else
        // JSON checkpoint files are _-prefixed = hidden to Spark's file
        // index: read driver-side, parse distributed (see linesDf)
        parseActions(linesDf(spark, fs, jc(v), v))
    }
    val base0 = baseV.getOrElse(0L)
    val vs = versions(spark, dir)
    // cap at the latest on-disk version for ANY over-latest asOf (not just
    // the MaxValue sentinel): resolveDf/read cap this way for their
    // callers, and an uncapped explicit asOf would trip the contiguity
    // require below with a misleading "window was vacuumed" error
    val effAsOf = math.min(asOf, vs.lastOption.getOrElse(0L))
    // Tail plan honoring COMPACTED-LOG fragments: at version v with a
    // compaction [v, to] fully inside the tail, read the ONE net fragment
    // in place of versions v..to — the bounded-tail contract transfers to
    // the distributed plane. The `ver` regex below assigns a fragment's
    // lines ver = its range END (the trailing 8 digits before `.json`),
    // which is exactly the last-action-wins position the net set occupies.
    val compacts: Map[Long, Long] = {
      val ld = new Path(s"$dir/$LogDir")
      if (!fs.exists(ld)) Map.empty
      else fs.listStatus(ld).toSeq.map(_.getPath.getName).collect {
        case CompactName(f, t) => (f.toLong, t.toLong)
      }.filter { case (f, t) => f > base0 && t <= effAsOf }
        .groupBy(_._1).map { case (f, ts) => f -> ts.map(_._2).max }
    }
    val tailVs = vs.filter(v => v > base0 && v <= effAsOf)
    val tailPlain = scala.collection.mutable.ArrayBuffer.empty[String]
    val tailFrags = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val covered = scala.collection.mutable.ArrayBuffer.empty[Long]
    var idx = 0
    while (idx < tailVs.size) {
      val v = tailVs(idx)
      compacts.get(v) match {
        case Some(to) =>
          tailFrags += ((v, to))
          covered ++= (v to to)
          idx = tailVs.indexWhere(_ > to, idx)
          if (idx < 0) idx = tailVs.size
        case None =>
          tailPlain += logPath(dir, v).toString
          covered += v
          idx += 1
      }
    }
    // Contiguity contract (the expired-read rule): a vacuum may have
    // dropped records in (baseV, effAsOf] while retaining an OLDER
    // checkpoint — seeding from it with a holed tail would silently
    // return the wrong historical state. Fail loudly instead.
    require(covered.toSeq == (base0 + 1 to effAsOf).toSeq,
      s"ActionLog.stateDfAt($dir): versions (${base0}, $effAsOf] are not " +
        s"contiguous on disk (have ${covered.mkString(",")}) — the read " +
        "window was vacuumed")
    // plain NNNNNNNN.json version files are visible to the file index and
    // text-read distributed; _compact-* fragments are hidden files, so
    // each is read driver-side with ver = its range END — exactly the
    // last-action-wins position the net set occupies
    val plainDf: Option[DataFrame] =
      if (tailPlain.isEmpty) None
      else Some(spark.read.text(tailPlain.toSeq: _*)
        .withColumn("ver", regexp_extract(input_file_name(),
          "(\\d{8})\\.json", 1).cast("long")))
    val fragDfs: Seq[DataFrame] = tailFrags.toSeq.map { case (f, t) =>
      linesDf(spark, fs, Seq(compactPath(dir, f, t)), t)
    }
    val tail: Option[DataFrame] = (plainDf.toSeq ++ fragDfs)
      .reduceOption(_.unionByName(_)).map(parseActions)
    val all = (base.toSeq ++ tail.toSeq).reduceOption(_.unionByName(_))
      .getOrElse(sys.error(s"ActionLog.stateDfAt($dir): empty log"))
    val nulls = Seq("lo", "hi", "n").map(c => lit(null).cast("long").as(c))
    val files = all.filter(col("a").isin("add", "remove"))
      .groupBy(col("p"))
      .agg(max_by(struct(col("a"), col("lo"), col("hi"), col("n")),
        col("ver")).as("last"))
      .filter(col("last.a") === "add")
      .select(lit("add").as("a"), col("p"), col("last.lo").as("lo"),
        col("last.hi").as("hi"), col("last.n").as("n"),
        lit(null).cast("string").as("app"), lit(null).cast("long").as("batch"))
    val txns = all.filter(col("a") === "txn")
      .groupBy(col("app")).agg(max(col("batch")).as("batch"))
      .select((lit("txn").as("a") +: lit(null).cast("string").as("p") +:
        nulls) ++ Seq(col("app"), col("batch")): _*)
    files.unionByName(txns)
  }

  /** The live file inventory at `asOf` (default latest) as a DataFrame of
    * (p, lo, hi, n) — [[resolve]]'s scale twin: pruning predicates apply
    * ENGINE-SIDE and callers collect only what survives.
    */
  def resolveDf(spark: SparkSession, dir: String,
      asOf: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.col
    val v = versions(spark, dir).lastOption.map(math.min(_, asOf)).getOrElse(
      sys.error(s"ActionLog.resolveDf($dir): empty log"))
    stateDfAt(spark, dir, v).filter(col("a") === "add")
      .select("p", "lo", "hi", "n")
  }

  /** Write the state at `asOf` (default latest) as a DISTRIBUTED parquet
    * checkpoint (`_log/V.checkpoint.parquet/`, Delta's checkpoint form):
    * a Spark job materializes [[stateDfAt]] as parquet parts, `_SUCCESS`
    * is the all-or-nothing validity marker, and `_last_checkpoint`
    * advances. The driver never holds the state — at a million files the
    * JSON checkpoint writer is the metadata plane's ceiling, this is its
    * replacement. Replay, vacuum and the catalog consume it transparently
    * ([[stateDfAt]] prefers it; the legacy driver replay bootstraps from
    * it). Returns the checkpointed version.
    */
  def checkpointParquet(spark: SparkSession, dir: String,
      asOf: Long = Long.MaxValue): Long = {
    val fs = fsOf(spark, dir)
    val v = versions(spark, dir).lastOption.map(math.min(_, asOf)).getOrElse(
      sys.error(s"ActionLog.checkpointParquet($dir): empty log"))
    if (!completeParquetCheckpoints(fs, dir, v).contains(v)) {
      val out = ckptParquetPath(dir, v)
      stateDfAt(spark, dir, v)
        .write.mode("overwrite").parquet(out.toString)
      require(fs.exists(new Path(out, "_SUCCESS")),
        s"ActionLog.checkpointParquet($dir): job completed without _SUCCESS")
    }
    if (lastCkptHint(fs, dir).forall(_ < v)) writeCkptHint(fs, dir, v)
    v
  }

  /** Committed versions, ascending — the action files that exist. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fsOf(spark, dir)
    val ld = new Path(s"$dir/$LogDir")
    if (!fs.exists(ld)) Seq.empty
    else fs.listStatus(ld).toSeq.map(_.getPath.getName)
      .filter(_.matches("\\d{8}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted
  }

  private def writeText(fs: FileSystem, p: Path, text: String): Unit = {
    val out = fs.create(p, false) // create-fails-if-present = the commit claim
    try out.write(text.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Stage `df`'s rows as immutable part files under `data/`, named by the
    * version that adds them. Returns the new file names.
    */
  private def stageData(df: DataFrame, dir: String, v: Long): Seq[String] = {
    val spark = df.sparkSession
    val fs = fsOf(spark, dir)
    val tmp = new Path(s"$dir/.stage-$v")
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(new Path(s"$dir/$DataDir"))
    val moved = fs.listStatus(tmp).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
      .zipWithIndex.map { case (st, i) =>
        val name = s"v$v-$i.parquet"
        require(fs.rename(st.getPath, new Path(s"$dir/$DataDir/$name")),
          s"ActionLog: staging rename failed for $name")
        name
      }
    fs.delete(tmp, true)
    moved
  }

  /** Append-only commit: O(delta) — writes only `df`'s part files and one
    * log record of `add` actions. With `statsCol` (a long column), each
    * add action carries the file's min/max/rowcount for that column —
    * Delta's write-time per-file stats, collected in ONE pass over the
    * just-written delta (grouped by `input_file_name`), so later scans
    * can skip files from the LOG alone, zero footer reads. Returns the
    * new version.
    */
  def append(df: DataFrame, dir: String, statsCol: Option[String] = None): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, dir)
    val v = versions(spark, dir).lastOption.getOrElse(0L) + 1L
    val files = stageData(df, dir, v)
    writeText(fs, logPath(dir, v),
      addLines(spark, dir, files, statsCol).mkString("\n"))
    v
  }

  /** Add-action lines for `files`, with write-time per-file stats when a
    * stats column is named — read from the staged files' parquet FOOTERS
    * (round 18, guide §1.2/§6): min/max/rowcount for an integral column
    * are exact in the footer's column-chunk statistics, so the stats
    * pass costs O(delta files) metadata reads and ZERO Spark jobs. The
    * previous form re-read the whole just-written delta as a distributed
    * group-by-file aggregation — one full O(delta bytes) scan plus a job
    * round-trip per commit, on the hottest path the table layer has
    * (every append/rewrite/OCC/COW commit). Iceberg's write-side metrics
    * collection reads the same footer source.
    */
  private def addLines(spark: SparkSession, dir: String, files: Seq[String],
      statsCol: Option[String]): Seq[String] = {
    statsCol.foreach(recordStatsColumn(spark, dir, _))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = fsOf(spark, dir)
    statsCol match {
      case None => files.map(f => s"""{"a":"add","p":"$f"}""")
      case Some(c) =>
        files.flatMap { f =>
          val p = new Path(s"$dir/$DataDir/$f")
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(p, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          val (rows, st) = try {
            val md = r.getFooter
            val schema = md.getFileMetaData.getSchema
            require(schema.containsField(c),
              s"ActionLog($dir): stats column '$c' is absent from staged " +
                s"file $f")
            val field = schema.getType(schema.getFieldIndex(c))
            // Integral ONLY: min/max are recorded via long truncation and
            // the catalog's pushdown tightens bounds with ±1 integer
            // arithmetic — for a double/decimal/date column those bounds
            // can PRUNE FILES THAT CONTAIN MATCHING ROWS. Refusing loudly
            // here protects readWhere and every catalog scan downstream.
            // (Physically: INT32/INT64 with no annotation or a signed
            // int annotation — date/decimal/timestamp share the physical
            // type but carry their own annotations.)
            val integral = field.isPrimitive && {
              val pt = field.asPrimitiveType()
              val ann = pt.getLogicalTypeAnnotation
              (pt.getPrimitiveTypeName ==
                org.apache.parquet.schema.PrimitiveType
                  .PrimitiveTypeName.INT32 ||
                pt.getPrimitiveTypeName ==
                  org.apache.parquet.schema.PrimitiveType
                    .PrimitiveTypeName.INT64) &&
              (ann == null || (ann match {
                case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
                  i.isSigned
                case _ => false
              }))
            }
            require(integral, s"ActionLog($dir): stats column '$c' must " +
              s"be integral (byte/short/int/long), got $field — " +
              "truncated long bounds would make range pruning drop rows")
            import scala.jdk.CollectionConverters._
            var lo = Long.MaxValue
            var hi = Long.MinValue
            var nonNull = false
            var statless = false
            md.getBlocks.asScala.foreach { b =>
              b.getColumns.asScala.find { cc =>
                val path = cc.getPath.toArray
                path.length == 1 && path(0) == c
              } match {
                case Some(cc) =>
                  val s = cc.getStatistics
                  if (s == null || s.isEmpty) statless = true
                  else if (s.hasNonNullValue) {
                    (s.genericGetMin, s.genericGetMax) match {
                      case (mn: Number, mx: Number) =>
                        lo = math.min(lo, mn.longValue)
                        hi = math.max(hi, mx.longValue)
                        nonNull = true
                      case _ => statless = true
                    }
                  }
                case None => statless = true
              }
            }
            require(!statless,
              s"ActionLog($dir): staged file $f carries no footer " +
                s"statistics for '$c' — the writer must record them")
            require(r.getRecordCount == 0L || nonNull,
              s"ActionLog($dir): stats column '$c' is entirely NULL in " +
                s"staged file $f — a NULL band cannot support range pruning")
            (r.getRecordCount, (lo, hi))
          } finally r.close()
          if (rows == 0L) {
            // An empty write task's file (layouts with explicit
            // partitioners produce them): DROP it — an empty data file
            // serves no reader and breaks the all-files-have-stats
            // invariant that maintenance planning (e.g. IvfIndex
            // rebalance) relies on.
            fs.delete(p, false)
            None
          } else
            Some(s"""{"a":"add","p":"$f","lo":${st._1},"hi":${st._2},"n":$rows}""")
        }
    }
  }

  /** Rewrite commit: the new content replaces the whole live file set —
    * one log record of `remove` actions for every live file plus `add`
    * actions for the rewritten files. Old versions keep reading the
    * removed files (they stay on disk). The compaction form.
    */
  def rewrite(df: DataFrame, dir: String, numFiles: Int,
      statsCol: Option[String] = None): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, dir)
    val v = versions(spark, dir).lastOption.getOrElse(0L) + 1L
    val (live, _, _) = resolve(spark, dir, v - 1)
    val files = stageData(df.repartition(numFiles), dir, v)
    writeText(fs, logPath(dir, v),
      (live.map(f => s"""{"a":"remove","p":"$f"}""") ++
        addLines(spark, dir, files, statsCol)).mkString("\n"))
    v
  }

  /** Materialize the file set at the latest version as a checkpoint and
    * advance `_last_checkpoint`, bounding every later replay to the tail.
    *
    * `parts > 1` writes Delta's MULTI-PART checkpoint: the state's add
    * actions are hash-partitioned across `parts` files
    * (`_checkpoint-V.pII-of-NN.json`), each a self-contained JSON-lines
    * fragment — at 100 TB the checkpoint of a million-file table outgrows
    * one writer, and hash-split parts can be written (and re-read) by N
    * workers independently. Validity is all-or-nothing: a replay uses a
    * multi-part checkpoint only when every part is present, so a writer
    * crashing mid-parts leaves ignorable fragments, never truncated
    * state. Txn high-water marks ride part 0 (Delta's rule: checkpoints
    * persist SetTransaction, or vacuumed logs would double-apply
    * batches).
    */
  def checkpoint(spark: SparkSession, dir: String, parts: Int = 1): Long = {
    require(parts >= 1, "checkpoint: parts must be >= 1")
    val fs = fsOf(spark, dir)
    val v = versions(spark, dir).lastOption.getOrElse(
      sys.error(s"ActionLog.checkpoint($dir): empty log"))
    val (state, _, _, txns) = replayState(spark, dir, v)
    def addLine(f: String, st: Option[(Long, Long, Long)]) = st match {
      case Some((lo, hi, n)) => s"""{"a":"add","p":"$f","lo":$lo,"hi":$hi,"n":$n}"""
      case None => s"""{"a":"add","p":"$f"}"""
    }
    val txnLines = txns.toSeq.sortBy(_._1).map { case (a, b) =>
      s"""{"a":"txn","app":"$a","batch":$b}"""
    }
    if (parts == 1)
      writeText(fs, ckptPath(dir, v),
        (state.toSeq.map((addLine _).tupled) ++ txnLines).mkString("\n"))
    else {
      val byPart = state.toSeq.groupBy { case (f, _) =>
        math.floorMod(f.hashCode, parts)
      }
      (0 until parts).foreach { i =>
        val lines = byPart.getOrElse(i, Seq.empty).map((addLine _).tupled) ++
          (if (i == 0) txnLines else Seq.empty)
        writeText(fs, ckptPartPath(dir, v, i, parts), lines.mkString("\n"))
      }
    }
    if (lastCkptHint(fs, dir).forall(_ < v)) writeCkptHint(fs, dir, v)
    v
  }

  /** LOG COMPACTION (Delta's compacted-log files): fold versions
    * `[from, to]` into ONE net action file replay applies in their
    * place, bounding the between-checkpoint tail without touching the
    * originals (time travel inside the range still replays the
    * per-version records). The net set: adds surviving the range,
    * removes of files that predate it, and the range's txn high-water
    * marks — removes FIRST, so applying the fragment onto the prior
    * state stays a valid replay.
    */
  def compactLog(spark: SparkSession, dir: String, from: Long, to: Long): Unit = {
    require(from <= to, s"compactLog: bad range [$from, $to]")
    val fs = fsOf(spark, dir)
    val have = versions(spark, dir).filter(v => v >= from && v <= to)
    require(have == (from to to).toSeq,
      s"ActionLog.compactLog($dir): range [$from, $to] has missing versions")
    val adds = scala.collection.mutable
      .LinkedHashMap.empty[String, Option[(Long, Long, Long)]]
    val outerRemoves = scala.collection.mutable.ArrayBuffer.empty[String]
    val txns = scala.collection.mutable.Map.empty[String, Long]
    have.foreach { v =>
      readLines(fs, logPath(dir, v)).foreach {
        case AddStats(p, lo, hi, n) =>
          adds.put(p, Some((lo.toLong, hi.toLong, n.toLong))); ()
        case Add(p) => adds.put(p, None); ()
        case Remove(p) =>
          if (adds.remove(p).isEmpty) outerRemoves += p
        case Txn(app, b) =>
          txns(app) = math.max(txns.getOrElse(app, Long.MinValue), b.toLong); ()
        case l => sys.error(s"ActionLog.compactLog: bad line at v$v: $l")
      }
    }
    writeText(fs, compactPath(dir, from, to),
      (outerRemoves.toSeq.map(f => s"""{"a":"remove","p":"$f"}""") ++
        adds.toSeq.map {
          case (f, Some((lo, hi, n))) =>
            s"""{"a":"add","p":"$f","lo":$lo,"hi":$hi,"n":$n}"""
          case (f, None) => s"""{"a":"add","p":"$f"}"""
        } ++ txns.toSeq.sortBy(_._1).map { case (a, b) =>
          s"""{"a":"txn","app":"$a","batch":$b}"""
        }).mkString("\n"))
  }

  /** Stage with writer-unique names (no version prefix) — the OCC path's
    * staging, which commutes across concurrent writers by construction.
    */
  private def stageDataNamed(df: DataFrame, dir: String): Seq[String] = {
    val tag = "c" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(10)
    val spark = df.sparkSession
    val fs = fsOf(spark, dir)
    val tmp = new Path(s"$dir/.stage-$tag")
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(new Path(s"$dir/$DataDir"))
    val moved = fs.listStatus(tmp).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
      .zipWithIndex.map { case (st, i) =>
        val name = s"$tag-$i.parquet"
        require(fs.rename(st.getPath, new Path(s"$dir/$DataDir/$name")),
          s"ActionLog: staging rename failed for $name")
        name
      }
    fs.delete(tmp, true)
    moved
  }

  /** Claim slot `v` atomically WITH its action lines ([[AtomicPut]]): a
    * concurrent reader either sees the whole record or no record — never
    * a claimed-but-empty version, which would be a torn commit to any
    * replay racing the claim. False = lost the race.
    */
  private def tryClaim(fs: FileSystem, dir: String, v: Long,
      text: String): Boolean =
    AtomicPut(fs, logPath(dir, v), text.getBytes(StandardCharsets.UTF_8))

  /** OPTIMISTICALLY CONCURRENT APPEND — Delta's commit loop: stage once
    * (writer-unique file names make staging commutative), then claim the
    * next slot; a lost race just retries at the new head, because a blind
    * append is rebase-compatible with ANY interleaved commit — its adds
    * reference only its own files. `hook` fires between staging and the
    * first claim — the window every interesting interleaving lives in.
    */
  def appendOcc(df: DataFrame, dir: String, statsCol: Option[String] = None,
      hook: () => Unit = () => (),
      raceHook: Long => Unit = _ => ()): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, dir)
    val files = stageDataNamed(df, dir)
    val lines = addLines(spark, dir, files, statsCol).mkString("\n")
    hook()
    var committed = -1L
    var attempts = 0
    while (committed < 0) {
      attempts += 1
      require(attempts <= 20, s"ActionLog.appendOcc($dir): livelocked")
      val v = versions(spark, dir).lastOption.getOrElse(0L) + 1L
      raceHook(v) // test seam: a competitor lands between read and claim
      if (tryClaim(fs, dir, v, lines)) committed = v
    }
    maybeAutoCheckpoint(spark, dir, committed)
    committed
  }

  /** AUTO-CHECKPOINT POLICY (Delta's `checkpointInterval`): every
    * `spark.graft.parquetCheckpointInterval`-th commit on the OCC and
    * exactly-once paths materializes a DISTRIBUTED parquet checkpoint,
    * so long-lived tables enter the parquet plane in the ordinary course
    * of writing — bounded replay tails and O(kept) engine-side pruning
    * without any operator intervention. `0` disables (tests that pin
    * replay accounting set it); the single-writer [[append]] path is
    * exempt so deterministic version/checkpoint fixtures stay exact.
    */
  val AutoCheckpointConf = "spark.graft.parquetCheckpointInterval"
  val DefaultAutoCheckpointInterval = 10

  private def maybeAutoCheckpoint(spark: SparkSession, dir: String,
      v: Long): Unit = {
    // Runs AFTER the commit claim has landed: the append IS durable, so
    // neither a malformed interval conf nor a checkpoint failure may
    // propagate — the caller would see failure for a commit that
    // succeeded and retry into a duplicate (Delta treats post-commit
    // checkpoint failure as non-fatal for the same reason).
    val raw = spark.conf
      .get(AutoCheckpointConf, DefaultAutoCheckpointInterval.toString)
    val interval = raw.trim.toIntOption.getOrElse {
      System.err.println(s"[graft] warn: $AutoCheckpointConf='$raw' is not " +
        s"an integer — using default $DefaultAutoCheckpointInterval")
      DefaultAutoCheckpointInterval
    }
    if (interval > 0 && v > 0 && v % interval == 0)
      scala.util.Try(checkpointParquet(spark, dir, v)) match {
        case scala.util.Failure(e) => System.err.println(
          s"[graft] warn: post-commit auto-checkpoint of $dir at v$v " +
            s"failed (commit itself is durable): ${e.getMessage}")
        case _ => ()
      }
  }

  /** Compaction that COMMUTES with concurrent appends (Delta OPTIMIZE's
    * conflict rule): removes exactly the files it read — never "all live
    * at commit time" — so an append that lands mid-compaction is simply
    * untouched. The only true conflict is a target file leaving the live
    * set (a concurrent rewrite of the same files): checked under the
    * claim loop and failed LOUDLY. `hook` as in [[appendOcc]].
    */
  def compactFiles(spark: SparkSession, dir: String, targets: Seq[String],
      numFiles: Int, statsCol: Option[String] = None,
      hook: () => Unit = () => (),
      raceHook: Long => Unit = _ => ()): Long = {
    val fs = fsOf(spark, dir)
    val content = spark.read
      .parquet(targets.map(f => s"$dir/$DataDir/$f"): _*)
      .repartition(numFiles)
    val files = stageDataNamed(content, dir)
    val lines = (targets.map(f => s"""{"a":"remove","p":"$f"}""") ++
      addLines(spark, dir, files, statsCol)).mkString("\n")
    hook()
    var committed = -1L
    var attempts = 0
    while (committed < 0) {
      attempts += 1
      require(attempts <= 20, s"ActionLog.compactFiles($dir): livelocked")
      raceHook(attempts) // test seam: a competitor lands inside the window
      val v = versions(spark, dir).lastOption.getOrElse(0L) + 1L
      val (live, _, _) = resolve(spark, dir, v - 1)
      require(targets.forall(live.contains),
        s"ActionLog.compactFiles($dir): a target file left the live set — " +
          "concurrent rewrite conflict")
      if (tryClaim(fs, dir, v, lines)) committed = v
    }
    committed
  }

  /** Partial REWRITE: one commit that removes exactly `targets` and adds
    * `content` in their place — every other live file is carried by
    * reference, zero bytes moved. This is [[compactFiles]]'s commit rule
    * (commutes with concurrent appends; conflicts loudly when a target
    * leaves the live set) generalized to content that is NOT the targets'
    * own bytes — the primitive behind surgical maintenance like
    * [[graft.similarity.IvfIndex.rebalance]], where a hot band's rows are
    * re-keyed and re-laid-out without touching the rest of the table.
    * `content`'s physical layout is the caller's (pre-partition before
    * calling); stats are re-recorded per new file when `statsCol` is set.
    */
  def replaceFiles(spark: SparkSession, dir: String, targets: Seq[String],
      content: DataFrame, statsCol: Option[String] = None): Long = {
    require(targets.nonEmpty, s"ActionLog.replaceFiles($dir): no targets")
    val fs = fsOf(spark, dir)
    val files = stageDataNamed(content, dir)
    val lines = (targets.map(f => s"""{"a":"remove","p":"$f"}""") ++
      addLines(spark, dir, files, statsCol)).mkString("\n")
    var committed = -1L
    var attempts = 0
    while (committed < 0) {
      attempts += 1
      require(attempts <= 20, s"ActionLog.replaceFiles($dir): livelocked")
      val v = versions(spark, dir).lastOption.getOrElse(0L) + 1L
      val (live, _, _) = resolve(spark, dir, v - 1)
      require(targets.forall(live.contains),
        s"ActionLog.replaceFiles($dir): a target file left the live set — " +
          "concurrent rewrite conflict")
      if (tryClaim(fs, dir, v, lines)) committed = v
    }
    committed
  }

  /** INCREMENTAL RE-CLUSTERING (the public liquid-clustering motivation):
    * rewrite ONLY the files whose stats-column key ranges OVERLAP — the
    * overlap bands are what defeats range pruning — into range-disjoint
    * replacements, and CARRY every already-disjoint file untouched (in
    * the log layout "carried" is literal: the immutable data file stays
    * shared, zero bytes moved). A fully-clustered table is a NO-OP with
    * no commit at all, so scheduled re-clustering converges instead of
    * rewriting the world each run (q228/q244's whole-table OPTIMIZE is
    * exactly what this replaces at 100 TB: after a day of appends only
    * the new files' bands pay).
    *
    * Commit rule = [[compactFiles]]'s: removes exactly the files it read,
    * checked still-live under the claim loop, so it COMMUTES with
    * concurrent appends and conflicts loudly with concurrent rewrites of
    * the same files. Stats are re-recorded per replacement file, so
    * range pruning is restored the moment the commit lands.
    *
    * Returns (version or -1 for no-op, rewritten files, carried files).
    */
  def optimizeClustered(spark: SparkSession, dir: String,
      hook: () => Unit = () => ()): (Long, Seq[String], Seq[String]) = {
    import org.apache.spark.sql.functions.col
    val c = statsColumn(spark, dir).getOrElse(sys.error(
      s"ActionLog.optimizeClustered($dir): no recorded stats column — " +
        "clustering needs per-file key ranges"))
    val live = liveFiles(spark, dir)
    require(live.forall(_._2.isDefined),
      s"ActionLog.optimizeClustered($dir): every live file needs '$c' stats")
    val sorted = live.map { case (f, st) =>
      val (lo, hi, _) = st.get; (f, lo, hi)
    }.sortBy(t => (t._2, t._3))
    // transitive interval clustering: a file joins the open cluster when
    // its lo is inside the cluster's running hi — O(files log files)
    val clusters = scala.collection.mutable
      .ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[(String, Long, Long)]]
    var runningHi = Long.MinValue
    sorted.foreach { t =>
      if (clusters.nonEmpty && t._2 <= runningHi) {
        clusters.last += t; runningHi = math.max(runningHi, t._3)
      } else {
        clusters += scala.collection.mutable.ArrayBuffer(t); runningHi = t._3
      }
    }
    val targets = clusters.filter(_.size > 1).flatMap(_.map(_._1)).toSeq
    val carried = live.map(_._1).filterNot(targets.toSet)
    if (targets.isEmpty) return (-1L, Seq.empty, carried)
    val fs = fsOf(spark, dir)
    val content = spark.read
      .parquet(targets.map(f => s"$dir/$DataDir/$f"): _*)
      .repartitionByRange(targets.size, col(c))
      .sortWithinPartitions(col(c))
    val files = stageDataNamed(content, dir)
    val lines = (targets.map(f => s"""{"a":"remove","p":"$f"}""") ++
      addLines(spark, dir, files, Some(c))).mkString("\n")
    hook()
    var committed = -1L
    var attempts = 0
    while (committed < 0) {
      attempts += 1
      require(attempts <= 20, s"ActionLog.optimizeClustered($dir): livelocked")
      val v = versions(spark, dir).lastOption.getOrElse(0L) + 1L
      val (liveNow, _, _) = resolve(spark, dir, v - 1)
      require(targets.forall(liveNow.contains),
        s"ActionLog.optimizeClustered($dir): a target file left the live " +
          "set — concurrent rewrite conflict")
      if (tryClaim(fs, dir, v, lines)) committed = v
    }
    (committed, targets, carried)
  }

  /** The overlap-band TARGET SELECTION of [[optimizeClustered]] as a
    * Spark job — (capped target file names, TOTAL overlapping count).
    * The live inventory comes from [[resolveDf]] (driver O(1)); the
    * transitive interval clustering is one global-ordered window pass
    * (metadata scale: a million (p, lo, hi) rows is ~tens of MB through
    * one task); only files in multi-file clusters come back, LARGEST
    * clusters first (the worst pruning offenders), capped at `maxFiles`
    * so one maintenance pass stays bounded however ugly the table —
    * repeated passes converge because every rewrite produces
    * range-disjoint replacements.
    */
  def clusterTargetsDf(spark: SparkSession, dir: String,
      maxFiles: Int): (Seq[String], Long) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val live = resolveDf(spark, dir)
    require(live.filter(col("n").isNull).limit(1).count() == 0L,
      s"ActionLog.clusterTargetsDf($dir): every live file needs stats")
    val ord = Window.orderBy(col("lo"), col("hi"), col("p"))
    val runHi = max(col("hi"))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val withCid = live
      .withColumn("newc",
        when(runHi.isNull || col("lo") > runHi, 1L).otherwise(0L))
      .withColumn("cid", sum(col("newc"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val clustered = withCid
      .withColumn("csize", count(lit(1)).over(Window.partitionBy(col("cid"))))
      .filter(col("csize") > 1)
    val total = clustered.count()
    // whole clusters, largest first, until the cap — a HALF-taken
    // cluster would rewrite files into ranges that still overlap the
    // left-behind half, so the cap rounds DOWN to cluster boundaries
    // (but always admits at least the largest cluster)
    val sizes = clustered.select(col("cid"), col("csize")).distinct()
      .orderBy(col("csize").desc, col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val keep = scala.collection.mutable.ArrayBuffer.empty[Long]
    var budget = maxFiles.toLong
    sizes.foreach { case (cid, sz) =>
      if (sz <= budget || keep.isEmpty) { keep += cid; budget -= sz }
    }
    val targets = clustered
      .filter(col("cid").isInCollection(keep.toSeq))
      .select(col("p")).collect().map(_.getString(0)).toSeq
    (targets, total)
  }

  /** [[optimizeClustered]]'s MILLION-FILE twin (the same handoff rule as
    * [[vacuumDistributed]]): target selection runs engine-side
    * ([[clusterTargetsDf]]) and the driver holds only the capped target
    * list; the still-live commit check probes [[resolveDf]] instead of
    * the driver replay. One pass rewrites at most `maxFilesPerPass`
    * files (whole clusters, largest first); a fully-clustered table is a
    * no-op with no commit. Returns (version or -1, rewritten files,
    * TOTAL overlapping count including what the cap deferred — callers
    * loop until rewritten covers it).
    */
  def optimizeClusteredDistributed(spark: SparkSession, dir: String,
      maxFilesPerPass: Int = 10000,
      hook: () => Unit = () => ()): (Long, Seq[String], Long) = {
    import org.apache.spark.sql.functions.col
    val c = statsColumn(spark, dir).getOrElse(sys.error(
      s"ActionLog.optimizeClusteredDistributed($dir): no recorded stats " +
        "column — clustering needs per-file key ranges"))
    val (targets, total) = clusterTargetsDf(spark, dir, maxFilesPerPass)
    if (targets.isEmpty) return (-1L, Seq.empty, total)
    val fs = fsOf(spark, dir)
    val content = spark.read
      .parquet(targets.map(f => s"$dir/$DataDir/$f"): _*)
      .repartitionByRange(targets.size, col(c))
      .sortWithinPartitions(col(c))
    val files = stageDataNamed(content, dir)
    val lines = (targets.map(f => s"""{"a":"remove","p":"$f"}""") ++
      addLines(spark, dir, files, Some(c))).mkString("\n")
    hook()
    var committed = -1L
    var attempts = 0
    while (committed < 0) {
      attempts += 1
      require(attempts <= 20,
        s"ActionLog.optimizeClusteredDistributed($dir): livelocked")
      // still-live probe on the DISTRIBUTED plane: count the targets in
      // the current live inventory engine-side (the driver replay behind
      // resolve() refuses at the very scale this path exists for)
      import spark.implicits._
      val stillLive = resolveDf(spark, dir)
        .join(targets.toDF("p"), Seq("p"), "left_semi").count()
      require(stillLive == targets.size.toLong,
        s"ActionLog.optimizeClusteredDistributed($dir): a target file " +
          "left the live set — concurrent rewrite conflict")
      val v = versions(spark, dir).lastOption.getOrElse(0L) + 1L
      if (tryClaim(fs, dir, v, lines)) committed = v
    }
    (committed, targets, total)
  }

  private val Add = """\{"a":"add","p":"([^"]+)"\}""".r
  private val AddStats =
    """\{"a":"add","p":"([^"]+)","lo":(-?\d+),"hi":(-?\d+),"n":(\d+)\}""".r
  private val Remove = """\{"a":"remove","p":"([^"]+)"\}""".r
  private val Txn = """\{"a":"txn","app":"([^"]+)","batch":(-?\d+)\}""".r

  /** HANDOFF THRESHOLD for the driver-resident replay (round 17 #4):
    * [[replayState]] (behind [[liveFiles]]/[[read]]/[[vacuum]]) holds one
    * entry per live file on the driver — ~250 bytes each with map
    * overhead, so 500k files ≈ 125 MB of driver heap PER PLAN plus
    * seconds of replay. Above this bound the driver-resident path
    * refuses loudly and names the distributed twins: [[stateDfAt]] /
    * [[resolveDf]] resolve the same inventory as a Spark job (driver
    * O(1)), pruning predicates apply engine-side, and callers collect
    * only what survives — the million-file regime's only safe shape.
    * The 1M-file StressMeta probe pins both halves: the refusal here,
    * and resolveDf planning through the parquet checkpoint in seconds.
    */
  val DriverReplayMaxFiles: Int = 500000

  /** Full replay state: file → optional (lo, hi, rows) stats, plus the
    * replay accounting. Stats survive checkpoints (the checkpoint writes
    * stats-carrying add lines).
    */
  private def replayState(spark: SparkSession, dir: String, asOf: Long):
      (scala.collection.mutable.LinkedHashMap[String, Option[(Long, Long, Long)]],
        Int, Option[Long], Map[String, Long]) = {
    val fs = fsOf(spark, dir)
    // newest COMPLETE checkpoint ≤ asOf — discovered by listing, with
    // `_last_checkpoint` as nothing more than the usual fast-path hint
    // (a vacuum may retain checkpoints the pointer no longer names; an
    // incomplete multi-part set is invisible here by construction).
    // BOTH planes are consulted: a parquet checkpoint ([[checkpointParquet]])
    // seeds the replay exactly like a JSON one — parsed ON THE EXECUTORS
    // and collected once — so a table checkpointed only via the
    // distributed plane never pays unbounded driver replay.
    val ckpts = completeCheckpoints(fs, dir, asOf)
    val pCkpts = completeParquetCheckpoints(fs, dir, asOf)
    val ckptBase = (ckpts.keys ++ pCkpts.keys).toSeq.sorted.lastOption
    val base = scala.collection.mutable
      .LinkedHashMap.empty[String, Option[(Long, Long, Long)]]
    val txns = scala.collection.mutable.Map.empty[String, Long]
    def applyLine(line: String, v: String): Unit = line match {
      case AddStats(p, lo, hi, n) =>
        base.put(p, Some((lo.toLong, hi.toLong, n.toLong))); ()
      case Add(p) => base.put(p, None); ()
      case Remove(p) =>
        require(base.remove(p).isDefined,
          s"ActionLog: remove of unreferenced file $p at $v")
      case Txn(app, b) =>
        txns(app) = math.max(txns.getOrElse(app, Long.MinValue), b.toLong); ()
      case l => sys.error(s"ActionLog: bad log line at $v: $l")
    }
    // the handoff gate, BEFORE materializing a checkpoint-sized state on
    // the driver: a parquet checkpoint knows its row count from footers
    // (one cheap distributed count, no driver materialization)
    def handoff(n: Long, what: String): Unit =
      require(n <= DriverReplayMaxFiles,
        s"ActionLog($dir): $what holds $n entries — beyond the " +
          s"$DriverReplayMaxFiles-file driver-resident replay bound; " +
          "resolve this table through stateDfAt/resolveDf (distributed, " +
          "driver O(1)), checkpoint through checkpointParquet, and " +
          "maintain through vacuumDistributed — all driver-bounded")
    ckptBase.foreach { cv =>
      if (pCkpts.contains(cv)) { // prefer the engine-parsed plane when both exist
        // ONE plan over the checkpoint (round-17 advisory): cache before
        // the gate count so the collect reuses the materialized rows
        // instead of planning the parquet scan twice on the hot replay
        // path; and count only "add" rows — txn high-water marks are
        // O(apps), not files, and must not trip the FILE-count refusal.
        val ckptDf = readCkptParquetDf(spark, fs, pCkpts(cv)).cache()
        try {
          handoff(ckptDf
            .filter(org.apache.spark.sql.functions.col("a") === "add")
            .count(), s"parquet checkpoint $cv")
          ckptDf.collect().foreach { r =>
            r.getAs[String]("a") match {
              case "add" =>
                val st = if (r.isNullAt(r.fieldIndex("n"))) None
                  else Some((r.getAs[Long]("lo"), r.getAs[Long]("hi"),
                    r.getAs[Long]("n")))
                base.put(r.getAs[String]("p"), st); ()
              case "txn" =>
                val app = r.getAs[String]("app")
                txns(app) = math.max(txns.getOrElse(app, Long.MinValue),
                  r.getAs[Long]("batch")); ()
              case a => sys.error(s"ActionLog: bad parquet-checkpoint action " +
                s"'$a' at ckpt-$cv")
            }
          }
        } finally { ckptDf.unpersist(); () }
      } else {
        ckpts(cv).foreach(p =>
          readLines(fs, p).foreach(applyLine(_, s"ckpt-$cv")))
        handoff(base.size.toLong, s"json checkpoint $cv")
      }
    }
    val base0 = ckptBase.getOrElse(0L)
    val tail = versions(spark, dir).filter(v => v > base0 && v <= asOf)
    // compacted-log jumps: at version v with a compaction [v, to] fully
    // inside the tail, apply the ONE net fragment and skip to to+1 —
    // the bounded-tail contract between checkpoints
    val compacts: Map[Long, Long] = {
      val ld = new Path(s"$dir/$LogDir")
      if (!fs.exists(ld)) Map.empty
      else fs.listStatus(ld).toSeq.map(_.getPath.getName).collect {
        case CompactName(f, t) => (f.toLong, t.toLong)
      }.filter { case (f, t) => f > base0 && t <= asOf }
        .groupBy(_._1).map { case (f, ts) => f -> ts.map(_._2).max }
    }
    var replayed = 0
    var idx = 0
    while (idx < tail.size) {
      val v = tail(idx)
      compacts.get(v) match {
        case Some(to) =>
          readLines(fs, compactPath(dir, v, to)).foreach { line =>
            replayed += 1
            applyLine(line, s"compact-$v-$to")
          }
          idx = tail.indexWhere(_ > to, idx)
          if (idx < 0) idx = tail.size
        case None =>
          readLines(fs, logPath(dir, v)).foreach { line =>
            replayed += 1
            applyLine(line, s"v$v")
          }
          idx += 1
      }
      handoff(base.size.toLong, s"replayed state at v$v")
    }
    (base, replayed, ckptBase, txns.toMap)
  }

  /** The live file set at `asOf`: (files, actionsReplayed, checkpointUsed).
    * Replay starts from the newest checkpoint ≤ asOf when one exists —
    * the bounded-tail contract callers pin.
    */
  def resolve(spark: SparkSession, dir: String,
      asOf: Long): (Seq[String], Int, Option[Long]) = {
    val (state, replayed, ckpt, _) = replayState(spark, dir, asOf)
    (state.keys.toSeq, replayed, ckpt)
  }

  /** DATA SKIPPING FROM THE LOG (Delta's per-file stats): scan only the
    * files whose recorded `[lo, hi]` intersects the probe range — zero
    * parquet footers opened for the skipped ones — with the exact
    * predicate re-applied as the residual. A stats-less file is admitted
    * conservatively. Returns (frame, filesKept, filesTotal).
    */
  def readWhere(spark: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions._
    val fs = fsOf(spark, dir)
    val latest = versions(spark, dir).lastOption.getOrElse(
      sys.error(s"ActionLog.readWhere($dir): empty log"))
    val (keep: Seq[String], total: Int) =
      if (onParquetPlane(fs, dir)) {
        // parquet-checkpoint plane: the inventory stays a DataFrame, the
        // range predicate evaluates ON THE EXECUTORS, and the driver
        // collects ONLY surviving names plus one count — O(kept), never
        // O(files). ONE aggregation job (collect_list skips the nulls the
        // `when` leaves on pruned files), not a collect + a second count
        // re-running the whole stateDfAt DAG.
        val row = resolveDf(spark, dir, latest).agg(
          count(lit(1)).as("total"),
          collect_list(when(col("n").isNull ||
            (col("hi") >= lo && col("lo") <= hi), col("p"))).as("kept"))
          .head()
        (row.getSeq[String](1).toSeq, row.getLong(0).toInt)
      } else {
        val (state, _, _, _) = replayState(spark, dir, latest)
        (state.toSeq.collect {
          case (f, Some((flo, fhi, _))) if fhi >= lo && flo <= hi => f
          case (f, None) => f
        }, state.size)
      }
    require(keep.nonEmpty, s"ActionLog.readWhere($dir): nothing to read")
    val df = spark.read.parquet(keep.map(f => s"$dir/$DataDir/$f"): _*)
      .filter(col(c) >= lo && col(c) <= hi)
    (df, keep.size, total)
  }

  /** Table row count from the LOG alone — O(files) metadata, zero data
    * reads; None when any live file lacks recorded stats.
    */
  def rowCountFromLog(spark: SparkSession, dir: String): Option[Long] = {
    val latest = versions(spark, dir).lastOption.getOrElse(0L)
    val (state, _, _, _) = replayState(spark, dir, latest)
    val counts = state.values.toSeq
    if (counts.exists(_.isEmpty)) None
    else Some(counts.flatten.map(_._3).sum)
  }

  /** VACUUM — physically delete data files no LIVE-OR-RETAINED version
    * references (Delta's vacuum with version-count retention): versions
    * older than the newest `keepVersions` lose time-travel support — their
    * log records are dropped — and any data file referenced ONLY by
    * dropped versions is deleted, together with orphan staging debris.
    * A file still referenced by a retained version (e.g. added at v1,
    * never removed) survives regardless of age. Returns
    * (logRecordsDropped, dataFilesDeleted). Expired reads fail loudly
    * afterwards — the log record is gone, so `resolve` simply cannot
    * construct the version (same contract as [[VersionedTable.gc]]).
    *
    * Checkpoint discipline (Delta's log-cleanup rule): a checkpoint is
    * materialized AT the horizon FIRST, so every retained version resolves
    * from it — only then are older records and checkpoints dropped.
    *
    * Concurrency (Delta's mtime retention): an OCC writer stages its part
    * files into `data/` BEFORE claiming a log slot, so "unreferenced" is
    * not "garbage" — it may be an in-flight commit. Files younger than
    * `graceMs` are therefore NEVER deleted; the default window comfortably
    * exceeds any staging-to-claim gap. `graceMs = 0` is the RETAIN 0 HOURS
    * form: only safe when the caller can prove no writer is in flight
    * (single-writer tests); running it against live writers can delete a
    * commit's staged files and corrupt the table.
    */
  val DefaultVacuumGraceMs: Long = 10L * 60 * 1000

  def vacuum(spark: SparkSession, dir: String, keepVersions: Int,
      graceMs: Long = DefaultVacuumGraceMs): (Int, Int) = {
    require(keepVersions >= 1, "vacuum must keep at least the live version")
    val fs = fsOf(spark, dir)
    val vs = versions(spark, dir)
    if (vs.isEmpty) return (0, 0)
    // Even with nothing to expire, the FILE sweep still runs: a previous
    // vacuum may have dropped the referencing log records while the grace
    // window protected the files — this pass is when they age out.
    val horizon = // oldest retained version
      if (vs.size <= keepVersions) vs.head else vs.takeRight(keepVersions).head
    // files referenced by ANY retained version = live set at the horizon
    // ∪ every add after it (a file live at any v ≥ horizon either was
    // live at the horizon or was added later) — ONE bounded replay plus
    // a tail scan, never a replay per retained version (the O(retained ×
    // replay) shape cost 38 s at 2 000 commits / keep=200 in StressMeta)
    val referenced = {
      val refs = scala.collection.mutable.Set.empty[String]
      refs ++= replayState(spark, dir, horizon)._1.keys
      vs.filter(_ > horizon).foreach { v =>
        readLines(fs, logPath(dir, v)).foreach {
          case AddStats(p, _, _, _) => refs += p; ()
          case Add(p) => refs += p; ()
          case _ => ()
        }
      }
      refs.toSet
    }
    // checkpoint BEFORE cleanup: retained versions must resolve without
    // the records about to be dropped (a complete multi-part checkpoint
    // at the horizon counts, on EITHER plane). A parquet-plane table gets
    // a parquet horizon checkpoint — the sweep below would otherwise keep
    // re-seeding the driver plane on a table that has left it.
    if (vs.size > keepVersions && onParquetPlane(fs, dir) &&
      !completeParquetCheckpoints(fs, dir, horizon).contains(horizon) &&
      !completeCheckpoints(fs, dir, horizon).contains(horizon)) {
      checkpointParquet(spark, dir, horizon); ()
    }
    if (vs.size > keepVersions &&
      !completeParquetCheckpoints(fs, dir, horizon).contains(horizon) &&
      !completeCheckpoints(fs, dir, horizon).contains(horizon)) {
      val (state, _, _, txns) = replayState(spark, dir, horizon)
      writeText(fs, ckptPath(dir, horizon),
        (state.toSeq.map {
          case (f, Some((lo, hi, n))) =>
            s"""{"a":"add","p":"$f","lo":$lo,"hi":$hi,"n":$n}"""
          case (f, None) => s"""{"a":"add","p":"$f"}"""
        } ++ txns.toSeq.sortBy(_._1).map { case (a, b) =>
          s"""{"a":"txn","app":"$a","batch":$b}"""
        }).mkString("\n"))
    }
    val dataDir = new Path(s"$dir/$DataDir")
    val cutoff = System.currentTimeMillis() - graceMs
    val victims = fs.listStatus(dataDir).toSeq
      .filter(st => st.isFile && !referenced.contains(st.getPath.getName) &&
        st.getModificationTime <= cutoff)
    victims.foreach(st => fs.delete(st.getPath, false))
    val expired = sweepExpiredLog(fs, dir, vs, horizon)
    (expired, victims.size)
  }

  /** Shared tail of both vacuum forms: drop expired per-version records,
    * sweep sub-horizon checkpoint/compaction artifacts, and keep the
    * `_last_checkpoint` hint at least at the horizon checkpoint (only
    * when that checkpoint actually exists on either plane — a
    * file-sweep-only pass may not have materialized one). Driver cost is
    * O(log artifacts), never O(data files).
    */
  private def sweepExpiredLog(fs: FileSystem, dir: String, vs: Seq[Long],
      horizon: Long): Int = {
    val expired = vs.filter(_ < horizon)
    expired.foreach(v => fs.delete(logPath(dir, v), false))
    val ld = new Path(s"$dir/$LogDir")
    fs.listStatus(ld).toSeq.map(_.getPath).foreach { p =>
      p.getName match {
        case CkptSingle(v) if v.toLong < horizon => fs.delete(p, false); ()
        case CkptPart(v, _, _) if v.toLong < horizon => fs.delete(p, false); ()
        // parquet checkpoint DIRS below the horizon: recursive delete, or
        // they leak forever AND a later time-travel read could seed from a
        // stale one (stateDfAt's contiguity contract now also guards that)
        case CkptParquet(v) if v.toLong < horizon => fs.delete(p, true); ()
        case CkptParquetLegacy(v) if v.toLong < horizon =>
          fs.delete(p, true); ()
        // a compaction whose range starts below the horizon can never be
        // applied again (replay starts at the horizon checkpoint)
        case CompactName(f, _) if f.toLong < horizon => fs.delete(p, false); ()
        case _ => ()
      }
    }
    if ((completeCheckpoints(fs, dir, horizon).contains(horizon) ||
      completeParquetCheckpoints(fs, dir, horizon).contains(horizon)) &&
      lastCkptHint(fs, dir).forall(_ < horizon))
      writeCkptHint(fs, dir, horizon)
    expired.size
  }

  /** [[vacuum]]'s MILLION-FILE twin (round-17 verdict #3): above
    * [[DriverReplayMaxFiles]] the driver-resident replay behind
    * [[vacuum]] refuses, which left big tables readable
    * ([[stateDfAt]]/[[resolveDf]]) but unmaintainable. Here the
    * referenced set — the live inventory at the horizon ∪ every add
    * logged after it (the same rule as [[vacuum]]) — is resolved as a
    * Spark job, and the data-dir listing streams through it in bounded
    * batches: each batch anti-joins engine-side and only its VICTIMS
    * return to the driver, which hands them back to the executors for
    * parallel deletion. Driver memory is O(listBatch + victims-per-
    * batch), never O(table files); the horizon checkpoint is written on
    * the parquet plane ([[checkpointParquet]]) so retained versions keep
    * resolving after the expired records drop. Same grace-window
    * concurrency contract as [[vacuum]].
    */
  def vacuumDistributed(spark: SparkSession, dir: String, keepVersions: Int,
      graceMs: Long = DefaultVacuumGraceMs,
      listBatch: Int = 200000): (Int, Long) = {
    import org.apache.spark.sql.functions.{col, lit}
    require(keepVersions >= 1, "vacuum must keep at least the live version")
    require(listBatch >= 1, "vacuumDistributed: listBatch must be >= 1")
    val fs = fsOf(spark, dir)
    val vs = versions(spark, dir)
    if (vs.isEmpty) return (0, 0L)
    val horizon =
      if (vs.size <= keepVersions) vs.head else vs.takeRight(keepVersions).head
    // referenced = live set at the horizon ∪ every add after it — the
    // tail's raw per-version files are VISIBLE paths (NNNNNNNN.json), so
    // they text-read distributed exactly like stateDfAt's tail; ver is a
    // placeholder (no last-action-wins here — ANY add after the horizon
    // keeps the file, removes don't matter)
    val tailPaths = vs.filter(_ > horizon).map(logPath(dir, _).toString)
    val tailAdds: Option[DataFrame] =
      if (tailPaths.isEmpty) None
      else Some(parseActions(spark.read.text(tailPaths: _*)
          .withColumn("ver", lit(0L)))
        .filter(col("a") === "add").select(col("p")))
    val referenced = (stateDfAt(spark, dir, horizon)
        .filter(col("a") === "add").select(col("p")) +: tailAdds.toSeq)
      .reduce(_.unionByName(_)).distinct().cache()
    referenced.count() // materialize ONCE; every batch probe reuses it
    try {
      // checkpoint BEFORE cleanup, on the parquet plane — this path IS
      // the scale plane, a JSON horizon checkpoint would re-seed the
      // driver-resident replay it exists to replace
      if (vs.size > keepVersions &&
        !completeParquetCheckpoints(fs, dir, horizon).contains(horizon) &&
        !completeCheckpoints(fs, dir, horizon).contains(horizon)) {
        checkpointParquet(spark, dir, horizon); ()
      }
      val dataDir = new Path(s"$dir/$DataDir")
      val cutoff = System.currentTimeMillis() - graceMs
      val dataBase = dataDir.toString
      val sconf =
        new graft.source.SerializableConf(spark.sparkContext.hadoopConfiguration)
      var victims = 0L
      val batch = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      def flush(): Unit = if (batch.nonEmpty) {
        import spark.implicits._
        val cand = spark.createDataset(batch.toSeq).toDF("name", "mtime")
          .filter(col("mtime") <= cutoff)
        batch.clear()
        val doomed = cand
          .join(referenced, cand("name") === referenced("p"), "left_anti")
          .select(col("name")).as[String].collect()
        if (doomed.nonEmpty) {
          // deletes run ON THE EXECUTORS (one object-store call each is
          // the bottleneck at scale, not the driver loop that issues them)
          spark.createDataset(doomed.toSeq)
            .foreachPartition { (ps: Iterator[String]) =>
              val f = new Path(dataBase).getFileSystem(sconf.value)
              ps.foreach(n => f.delete(new Path(dataBase, n), false))
            }
          victims += doomed.length
        }
      }
      if (fs.exists(dataDir)) {
        val it = fs.listStatusIterator(dataDir)
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile) {
            batch += ((st.getPath.getName, st.getModificationTime))
            if (batch.size >= listBatch) flush()
          }
        }
        flush()
      }
      (sweepExpiredLog(fs, dir, vs, horizon), victims)
    } finally { referenced.unpersist(); () }
  }

  /** Commit ALREADY-STAGED part files as a REWRITE of the table (the
    * row-level SQL write path: executors streamed the replacement into
    * `stageDir`, no second copy). The staged files move into `data/`
    * under writer-unique names, and ONE log record removes the replaced
    * files and adds the replacements — claimed at `base + 1`, failing
    * LOUDLY (stage cleaned up) when any commit landed since the
    * replacement was computed.
    *
    * `only` is the GROUP-granular form (Delta/Iceberg copy-on-write):
    * the runtime group filter proved every row of every other live file
    * survives untouched, so the record removes exactly those files and
    * the rest stay live BY REFERENCE — the log holds names, no bytes
    * move. None = full rewrite (every live file removed).
    */
  def rewriteStaged(spark: SparkSession, dir: String, stageDir: String,
      base: Long, only: Option[Seq[String]] = None): Long = {
    val fs = fsOf(spark, dir)
    val head = versions(spark, dir).lastOption.getOrElse(0L)
    def stale(reason: String): Nothing = {
      fs.delete(new Path(stageDir), true)
      sys.error(s"ActionLog.rewriteStaged($dir): $reason — the " +
        "materialized replacement read a snapshot that is no longer current")
    }
    if (head != base) stale(s"head moved $base -> $head")
    val (live, _, _) = resolve(spark, dir, base)
    val removed = only match {
      case Some(fs) =>
        // the filter admitted these from the live set it scanned; a
        // name that is no longer live means the plan and the log
        // disagree — never publish over that
        val liveSet = live.toSet
        val gone = fs.filterNot(liveSet)
        if (gone.nonEmpty)
          stale(s"replaced file(s) ${gone.mkString(",")} are not live at $base")
        fs
      case None => live
    }
    val tag = "c" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    fs.mkdirs(new Path(s"$dir/$DataDir"))
    val moved = fs.listStatus(new Path(stageDir)).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
      .zipWithIndex.map { case (st, i) =>
        val name = s"$tag-$i.parquet"
        require(fs.rename(st.getPath, new Path(s"$dir/$DataDir/$name")),
          s"ActionLog.rewriteStaged: rename failed for $name")
        name
      }
    fs.delete(new Path(stageDir), true)
    val lines = (removed.map(f => s"""{"a":"remove","p":"$f"}""") ++
      addLines(spark, dir, moved, statsColumn(spark, dir))).mkString("\n")
    if (!tryClaim(fs, dir, base + 1L, lines)) {
      moved.foreach(f => fs.delete(new Path(s"$dir/$DataDir/$f"), false))
      stale(s"version ${base + 1} was claimed concurrently")
    }
    base + 1L
  }

  /** The live file inventory with recorded stats — the planning surface
    * for catalog-integrated scans: (fileName, Option[(lo, hi, rows)]).
    */
  def liveFiles(spark: SparkSession, dir: String):
      Seq[(String, Option[(Long, Long, Long)])] = {
    val latest = versions(spark, dir).lastOption.getOrElse(
      sys.error(s"ActionLog.liveFiles($dir): empty log"))
    replayState(spark, dir, latest)._1.toSeq
  }

  /** [[liveFiles]] as of a version — the planning surface for
    * time-traveled stats-pruned reads (the IVF probe scan).
    */
  def liveFilesAt(spark: SparkSession, dir: String, asOf: Long):
      Seq[(String, Option[(Long, Long, Long)])] = {
    val v = versions(spark, dir).lastOption.map(math.min(_, asOf)).getOrElse(
      sys.error(s"ActionLog.liveFilesAt($dir): empty log"))
    replayState(spark, dir, v)._1.toSeq
  }

  /** This app's last committed batch id, or None — the Delta
    * SetTransaction lookup, checkpoint-durable.
    */
  def lastBatchId(spark: SparkSession, dir: String, appId: String): Option[Long] =
    versions(spark, dir).lastOption.flatMap(v =>
      replayState(spark, dir, v)._4.get(appId))

  /** EXACTLY-ONCE append — Delta's txn action in the log: the batch's add
    * actions and its `{"a":"txn"}` high-water mark land in ONE action
    * file (atomic with the slot claim), so a re-delivered micro-batch
    * (crash, or full checkpoint loss and replay) appends NOTHING. Returns
    * the new version, or None for an already-committed batch.
    */
  def appendCommitted(df: DataFrame, dir: String, appId: String,
      batchId: Long, statsCol: Option[String] = None): Option[Long] =
    if (lastBatchId(df.sparkSession, dir, appId).exists(_ >= batchId)) None
    else {
      val spark = df.sparkSession
      val fs = fsOf(spark, dir)
      val v = versions(spark, dir).lastOption.getOrElse(0L) + 1L
      val files = stageData(df, dir, v)
      writeText(fs, logPath(dir, v),
        (addLines(spark, dir, files, statsCol) :+
          s"""{"a":"txn","app":"$appId","batch":$batchId}""").mkString("\n"))
      maybeAutoCheckpoint(spark, dir, v)
      Some(v)
    }

  /** The column the log's per-file stats describe, recorded at the first
    * stats-carrying append (`_log/_statscol`); later stats appends must
    * agree — mixed-column stats would make every pruning decision wrong.
    */
  def statsColumn(spark: SparkSession, dir: String): Option[String] = {
    val fs = fsOf(spark, dir)
    val p = new Path(s"$dir/$LogDir/_statscol")
    if (!fs.exists(p)) None else Some(readLines(fs, p).head.trim)
  }

  private def recordStatsColumn(spark: SparkSession, dir: String,
      c: String): Unit = {
    val fs = fsOf(spark, dir)
    statsColumn(spark, dir) match {
      case Some(existing) => require(existing == c,
        s"ActionLog($dir): stats column is '$existing', cannot switch to '$c'")
      case None =>
        val out = fs.create(new Path(s"$dir/$LogDir/_statscol"), true)
        try out.write(c.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }
  }

  /** One version's actions, parsed: (added files, removed files) — the
    * streaming source's planning surface.
    */
  def actionsOf(spark: SparkSession, dir: String,
      v: Long): (Seq[String], Seq[String]) = {
    val fs = fsOf(spark, dir)
    val p = logPath(dir, v)
    require(fs.exists(p), s"ActionLog.actionsOf($dir): version $v is missing")
    val adds = scala.collection.mutable.ArrayBuffer.empty[String]
    val removes = scala.collection.mutable.ArrayBuffer.empty[String]
    readLines(fs, p).foreach {
      case AddStats(f, _, _, _) => adds += f
      case Add(f) => adds += f
      case Remove(f) => removes += f
      case l => sys.error(s"ActionLog: bad log line at v$v: $l")
    }
    (adds.toSeq, removes.toSeq)
  }

  /** DESCRIBE HISTORY from the LOG alone — O(log) metadata, zero data
    * reads: per version, its action counts, whether it carried a txn
    * mark, and the CUMULATIVE row count as of that version (from the
    * recorded per-file stats; None when any live file lacks them).
    */
  def history(spark: SparkSession, dir: String):
      Seq[(Long, Int, Int, Boolean, Option[Long])] = {
    val fs = fsOf(spark, dir)
    val vs = versions(spark, dir)
    if (vs.isEmpty) return Seq.empty
    // ONE bounded replay to the state at the first retained version, then
    // an incremental walk — O(total actions), never O(versions × replay).
    // The quadratic shape is exactly what a 2 000-commit DESCRIBE HISTORY
    // cannot afford (StressMeta pins the figures).
    val state = replayState(spark, dir, vs.head)._1
    // running (known-rows, files-without-stats) so `cum` is O(1) per step
    var statless = state.values.count(_.isEmpty)
    var knownRows = state.values.flatten.map(_._3).sum
    def cum: Option[Long] =
      if (state.isEmpty || statless > 0) None else Some(knownRows)
    vs.zipWithIndex.map { case (v, i) =>
      var (adds, removes, txn) = (0, 0, false)
      readLines(fs, logPath(dir, v)).foreach { line =>
        line match {
          case AddStats(p, lo, hi, n) =>
            adds += 1
            if (i > 0) {
              state.put(p, Some((lo.toLong, hi.toLong, n.toLong)))
              knownRows += n.toLong
            }
          case Add(p) =>
            adds += 1
            if (i > 0) { state.put(p, None); statless += 1 }
          case Remove(p) =>
            removes += 1
            if (i > 0) state.remove(p) match {
              case Some(Some((_, _, n))) => knownRows -= n
              case Some(None) => statless -= 1
              case None => sys.error(
                s"ActionLog.history: remove of unreferenced file $p at v$v")
            }
          case Txn(_, _) => txn = true
          case l => sys.error(s"ActionLog.history: bad line at v$v: $l")
        }
      }
      (v, adds, removes, txn, cum)
    }
  }

  /** Read the table as of `asOf` (default: latest). */
  def read(spark: SparkSession, dir: String, asOf: Long = Long.MaxValue): DataFrame = {
    val v = versions(spark, dir).lastOption
      .map(math.min(_, asOf))
      .getOrElse(sys.error(s"ActionLog.read($dir): empty log"))
    val (files, _, _) = resolve(spark, dir, v)
    require(files.nonEmpty, s"ActionLog.read($dir): empty file set at v$v")
    spark.read.parquet(files.map(f => s"$dir/$DataDir/$f"): _*)
  }
}

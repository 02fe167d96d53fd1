package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

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
    * log record of `add` actions. Returns the new version.
    */
  def append(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, dir)
    val v = versions(spark, dir).lastOption.getOrElse(0L) + 1L
    val files = stageData(df, dir, v)
    writeText(fs, logPath(dir, v),
      files.map(f => s"""{"a":"add","p":"$f"}""").mkString("\n"))
    v
  }

  /** Rewrite commit: the new content replaces the whole live file set —
    * one log record of `remove` actions for every live file plus `add`
    * actions for the rewritten files. Old versions keep reading the
    * removed files (they stay on disk). The compaction form.
    */
  def rewrite(df: DataFrame, dir: String, numFiles: Int): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, dir)
    val v = versions(spark, dir).lastOption.getOrElse(0L) + 1L
    val (live, _, _) = resolve(spark, dir, v - 1)
    val files = stageData(df.repartition(numFiles), dir, v)
    writeText(fs, logPath(dir, v),
      (live.map(f => s"""{"a":"remove","p":"$f"}""") ++
        files.map(f => s"""{"a":"add","p":"$f"}""")).mkString("\n"))
    v
  }

  /** Materialize the file set at the latest version as a checkpoint and
    * advance `_last_checkpoint`, bounding every later replay to the tail.
    */
  def checkpoint(spark: SparkSession, dir: String): Long = {
    val fs = fsOf(spark, dir)
    val v = versions(spark, dir).lastOption.getOrElse(
      sys.error(s"ActionLog.checkpoint($dir): empty log"))
    val (live, _, _) = resolve(spark, dir, v)
    writeText(fs, ckptPath(dir, v),
      live.map(f => s"""{"a":"add","p":"$f"}""").mkString("\n"))
    val out = fs.create(new Path(s"$dir/$LogDir/$LastCkpt"), true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    v
  }

  private val Add = """\{"a":"add","p":"([^"]+)"\}""".r
  private val Remove = """\{"a":"remove","p":"([^"]+)"\}""".r

  /** The live file set at `asOf`: (files, actionsReplayed, checkpointUsed).
    * Replay starts from the newest checkpoint ≤ asOf when one exists —
    * the bounded-tail contract callers pin.
    */
  def resolve(spark: SparkSession, dir: String,
      asOf: Long): (Seq[String], Int, Option[Long]) = {
    val fs = fsOf(spark, dir)
    val ckptBase = {
      val lc = new Path(s"$dir/$LogDir/$LastCkpt")
      if (!fs.exists(lc)) None
      else Some(readLines(fs, lc).head.trim.toLong).filter(_ <= asOf)
    }
    val base = scala.collection.mutable.LinkedHashSet.empty[String]
    ckptBase.foreach { cv =>
      readLines(fs, ckptPath(dir, cv)).foreach {
        case Add(p) => base += p
        case l => sys.error(s"ActionLog: bad checkpoint line $l")
      }
    }
    val tail = versions(spark, dir)
      .filter(v => v > ckptBase.getOrElse(0L) && v <= asOf)
    var replayed = 0
    tail.foreach { v =>
      readLines(fs, logPath(dir, v)).foreach { line =>
        replayed += 1
        line match {
          case Add(p) => base += p
          case Remove(p) =>
            require(base.remove(p),
              s"ActionLog: remove of unreferenced file $p at v$v")
          case l => sys.error(s"ActionLog: bad log line $l")
        }
      }
    }
    (base.toSeq, replayed, ckptBase)
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

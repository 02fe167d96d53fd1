package graft.source

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.ActionLog

/** STREAMING SOURCE OVER THE ACTION LOG — Delta's "stream a table" design
  * for append-only tables: offsets ARE log versions, a micro-batch is the
  * set of files ADDED by the admitted versions (each row tagged
  * `_commit_version`), and admission control bounds versions per trigger.
  * A REMOVE action inside the streamed range fails LOUDLY — Delta raises
  * the same "detected a data update/delete" error — because silently
  * skipping a rewrite would deliver rows that no longer exist; the
  * documented recovery is a fresh stream from the post-rewrite snapshot
  * (changes-from-now), which q269 exercises. Exactly-once falls out of
  * version offsets + the sink checkpoint, identical to [[CdfStream]].
  *
  * The executor path reuses [[CdfReaderFactory]] verbatim: immutable data
  * files decoded by name against the requested schema, the version
  * synthesized from the partition — an added file IS an insert-only
  * change capture.
  */
class LogStreamSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LogStream.changeSchema(SparkSession.active, options.get("path"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new LogStreamTable(schema, new CaseInsensitiveStringMap(properties))
}

private[source] class LogStreamTable(schema: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val path = Option(options.get("path")).getOrElse(sys.error("path option required"))
  override def name(): String = s"log_stream($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new LogStreamScan(path, schema, options)
}

private[source] class LogStreamScan(path: String, schema: StructType,
    options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String = s"LogStreamScan [$path]"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogMicroBatchStream(path, schema,
      Option(options.get("startingVersion")).map(_.toLong),
      Option(options.get("maxVersionsPerTrigger")).map(_.toInt))
}

private[source] class LogMicroBatchStream(path: String, schema: StructType,
    startingVersion: Option[Long], maxVersionsPerTrigger: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl {

  require(maxVersionsPerTrigger.forall(_ >= 1),
    "log stream: maxVersionsPerTrigger must be >= 1")

  private def live(): Long = {
    val ld = new Path(s"$path/_log")
    val fs = ld.getFileSystem(new Configuration())
    if (!fs.exists(ld)) 0L
    else fs.listStatus(ld).toSeq.map(_.getPath.getName)
      .filter(_.matches("\\d{8}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted.lastOption.getOrElse(0L)
  }

  override def initialOffset(): Offset =
    VersionOffset(startingVersion.getOrElse(live()))

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    sys.error("log stream: latestOffset(start, limit) is the admission-control path")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset].v
    val end = live().max(s)
    limit match {
      case r: ReadMaxRows => VersionOffset(math.min(end, s + r.maxRows()))
      case _ => VersionOffset(end)
    }
  }

  override def reportLatestOffset(): Offset = VersionOffset(live())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    if (e <= s) return Array.empty
    val spark = SparkSession.active
    (s + 1 to e).flatMap { v =>
      val (adds, removes) = ActionLog.actionsOf(spark, path, v)
      require(removes.isEmpty,
        s"log stream($path): version $v is not append-only (it removes " +
          s"${removes.size} file(s)) — a streamed table must be append-only; " +
          "restart the stream from the post-rewrite snapshot instead")
      adds.map(f => CdfFilePartition(v, s"$path/data/$f"): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdfReaderFactory(schema)

  override def deserializeOffset(json: String): Offset = VersionOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object LogStream {

  /** The stream's schema: the table's columns plus `_commit_version`. */
  def changeSchema(spark: SparkSession, tableDir: String): StructType =
    StructType(ActionLog.read(spark, tableDir).schema.fields.toSeq :+
      StructField(graft.ops.ChangeFeed.CommitVersion, LongType, nullable = false))

  /** Open an action-log table as a streaming DataFrame with version
    * offsets; options mirror the public Delta source.
    */
  def read(spark: SparkSession, tableDir: String,
      startingVersion: Option[Long] = None,
      maxVersionsPerTrigger: Option[Int] = None): DataFrame = {
    var r = spark.readStream.format(classOf[LogStreamSource].getName)
      .schema(changeSchema(spark, tableDir))
      .option("path", tableDir)
    startingVersion.foreach(v => r = r.option("startingVersion", v.toString))
    maxVersionsPerTrigger.foreach(n => r = r.option("maxVersionsPerTrigger", n.toString))
    r.load()
  }
}

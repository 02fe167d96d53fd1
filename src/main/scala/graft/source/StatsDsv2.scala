package graft.source

import java.util.OptionalLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 source that REPORTS TABLE STATISTICS (`SupportsReportStatistics`,
  * public Spark 3/4 connector API — the path Iceberg/Delta use to feed
  * snapshot-level size/row counts into Catalyst's cost model): without it a
  * v2 relation's size defaults to `spark.sql.defaultSizeInBytes`
  * (Long.MaxValue), so a KILOBYTE-sized dimension read through a connector
  * can never win a broadcast and every star join degenerates to a full
  * sort-merge shuffle of the fact table. With the scan reporting its actual
  * on-disk bytes, `JoinSelection` sees the true size and plans the
  * broadcast — at 100 TB the difference between shipping a 1000-executor
  * fact shuffle and shipping one small dim to each executor. The reported
  * numbers are overridable via options so a query can pin BOTH planning
  * outcomes (accurate → broadcast, inflated → merge) against one layout.
  */
class StatsReportSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedDsv2.schemaOf(options.get("c1"), options.get("c2"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new StatsReportTable(new CaseInsensitiveStringMap(properties))
}

private[source] class StatsReportTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val path = Option(options.get("path")).getOrElse(sys.error("path option required"))
  override def name(): String = s"stats_report($path)"
  override def schema(): StructType =
    KeyedDsv2.schemaOf(options.get("c1"), options.get("c2"))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new StatsReportScan(path, schema(),
      Option(options.get("sizeInBytes")).map(_.toLong),
      Option(options.get("numRows")).map(_.toLong))
}

private[source] class StatsReportScan(path: String, schema: StructType,
    bytes: Option[Long], rows: Option[Long])
    extends KeyBucketScan(path, schema) with SupportsReportStatistics {

  override def estimateStatistics(): Statistics = {
    // actual on-disk footprint when no override is given — one namenode
    // content summary, the same O(files) metadata call a manifest read costs
    val size = bytes.getOrElse {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.getContentSummary(root).getLength
    }
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(size)
      override def numRows(): OptionalLong =
        rows.map(OptionalLong.of).getOrElse(OptionalLong.empty())
    }
  }
}

object StatsDsv2 {
  /** Read a [[KeyedDsv2.writeBucketed]] layout with statistics reported:
    * actual on-disk bytes by default, or pinned overrides for plan probes.
    */
  def read(spark: SparkSession, path: String, c1: String, c2: String,
      sizeInBytes: Option[Long] = None, numRows: Option[Long] = None): DataFrame = {
    val r = spark.read.format(classOf[StatsReportSource].getName)
      .option("path", path).option("c1", c1).option("c2", c2)
    val r2 = sizeInBytes.fold(r)(b => r.option("sizeInBytes", b.toString))
    numRows.fold(r2)(n => r2.option("numRows", n.toString)).load()
  }
}

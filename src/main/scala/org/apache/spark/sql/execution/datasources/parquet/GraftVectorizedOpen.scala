package org.apache.spark.sql.execution.datasources.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterPredicate
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.internal.SQLConf

/** Package shim over [[VectorizedParquetRecordReader]]'s row-group-reader
  * initialize: opens the file ONCE (footer + row-group planning share one
  * reader), applies an optional parquet `FilterPredicate` so statistics /
  * dictionary / bloom ROW-GROUP PRUNING happens inside parquet-mr before
  * a single page is decoded, and hands the vectorized reader exactly the
  * projected schema. Lives in Spark's parquet package because the
  * `ParquetRowGroupReader` plumbing is package-private — the same shim
  * shape the public lakehouse connectors use for their own scans.
  *
  * The filter is a PRUNING hint only: callers keep every pushed filter as
  * a residual, so a row group that survives (stats overlap) still has the
  * exact predicate re-applied by Spark above the scan.
  */
object GraftVectorizedOpen {

  /** One opened file: its schema, and the columns of `wanted` present in
    * it (file order is irrelevant — the requested order rules).
    */
  final case class Opened(reader: ParquetFileReader, fileSchema: MessageType)

  /** One shared, effectively-immutable Configuration for every open:
    * constructing a fresh Configuration per file re-parses the Hadoop
    * default XML resources inside the TASK hot path — measurable against
    * sub-second scans. Never mutated after init; concurrent reads of a
    * loaded Configuration are safe.
    */
  private lazy val sharedConf: Configuration = {
    val conf = new Configuration()
    // mirror the defaults the stock test-path initialize() pins
    conf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key, false)
    conf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, true)
    conf.setBoolean(SQLConf.CASE_SENSITIVE.key, false)
    conf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, true)
    conf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, false)
    conf.size() // force the resource load once, here, not in a race
    conf
  }

  def open(path: String, predicate: Option[FilterPredicate]): Opened = {
    val conf = sharedConf
    val p = new Path(path)
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    var ob = HadoopReadOptions.builder(conf, p).withRange(0, len)
    predicate.foreach(fp => ob = ob.withRecordFilter(FilterCompat.get(fp)))
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf), ob.build())
    Opened(r, r.getFooter.getFileMetaData.getSchema)
  }

  /** Initialize `reader` over the already-opened (and row-group-filtered)
    * file with the given projection. Ownership of `opened.reader` passes
    * to the vectorized reader (closed via its close()).
    */
  def init(reader: VectorizedParquetRecordReader, opened: Opened,
      requested: MessageType): Unit = {
    val total = opened.reader.getFilteredRecordCount
    require(total <= Int.MaxValue,
      s"GraftVectorizedOpen: $total rows in one file exceeds the reader's range")
    GraftRowGroupBridge.init(reader, opened.fileSchema, requested,
      opened.reader, total.toInt)
  }
}

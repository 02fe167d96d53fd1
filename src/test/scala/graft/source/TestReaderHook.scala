package graft.source

import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Test-only bridge into the package-private columnar reader: counts the
  * rows a single-file columnar read delivers under pushed filters — the
  * observable for row-group-pruning pins.
  */
object TestReaderHook {
  def columnarRows(schema: StructType, pushed: Seq[Filter],
      file: String): Long = {
    val fac = new CdfReaderFactory(schema, columnar = true, pushed = pushed)
    val r = fac.createColumnarReader(CdfFilePartition(0L, file))
    var n = 0L
    try { while (r.next()) n += r.get().numRows() } finally r.close()
    n
  }
}

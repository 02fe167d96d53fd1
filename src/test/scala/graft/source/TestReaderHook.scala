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

  /** The long values of column 0 a single-file columnar read delivers
    * under pushed filters — the observable for the page-level
    * (column-index) filtering pin: WHICH rows survive matters, not just
    * how many (the broken bridge delivered the right COUNT of the wrong
    * rows — an unfiltered prefix).
    */
  def columnarLongs(schema: StructType, pushed: Seq[Filter],
      file: String): Seq[Long] = {
    val fac = new CdfReaderFactory(schema, columnar = true, pushed = pushed)
    val r = fac.createColumnarReader(CdfFilePartition(0L, file))
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      while (r.next()) {
        val b = r.get()
        var i = 0
        while (i < b.numRows()) { out += b.column(0).getLong(i); i += 1 }
      }
    } finally r.close()
    out.toSeq
  }

  /** Drain every file through the factory's row or columnar reader and
    * return the total row count — the harness for timing the two mapped-
    * table paths over identical data.
    */
  def drain(schema: StructType, nameMap: Map[String, String],
      fill: Map[String, Any], files: Seq[String], columnar: Boolean): Long = {
    val fac = new CdfReaderFactory(schema, nameMap, fill, columnar = columnar)
    files.map { f =>
      val p = CdfFilePartition(0L, f)
      var n = 0L
      if (columnar) {
        val r = fac.createColumnarReader(p)
        try { while (r.next()) n += r.get().numRows() } finally r.close()
      } else {
        val r = fac.createReader(p)
        try { while (r.next()) n += 1 } finally r.close()
      }
      n
    }.sum
  }

  /** Construct the CDF micro-batch stream on `path` — the observable for
    * the typed-table refusal pin (construction must throw; a typed dir's
    * epochs live under `data/` where the stream would plan zero files).
    */
  def cdfStreamCtor(path: String, schema: StructType): Unit = {
    new CdfMicroBatchStream(path, schema, None, None, None)
    ()
  }

  /** Row-path read of one file with an evolution fill map: returns
    * (isNull, value) per row for the given string column — the observable
    * for the present-but-null fill pin (a stored NULL in a column the
    * file PHYSICALLY carries must read as NULL, not the fill).
    */
  def rowStrings(schema: StructType, fill: Map[String, Any], file: String,
      colIdx: Int): Seq[Option[String]] = {
    val fac = new CdfReaderFactory(schema, fill = fill)
    val r = fac.createReader(CdfFilePartition(0L, file))
    val out = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    try {
      while (r.next()) {
        val row = r.get()
        out += (if (row.isNullAt(colIdx)) None
          else Some(row.getUTF8String(colIdx).toString))
      }
    } finally r.close()
    out.toSeq
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition of the content-addressed hash fraction that keys every
  * reproducible-sampling and sketch operator (KMV distinct, hash sampling,
  * weighted sampling, streaming KMV). Batch (SketchQueries) and streaming
  * (StreamingSketch) both build on this column, so the streaming-equals-batch
  * equality proof can never drift out from under a divergent copy.
  */
object ContentHash {

  /** Uniform [0,1) hash fraction from the first 8 md5 hex chars of `c`. */
  def hashFrac(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long").cast("double") /
      lit(4294967296.0)

  /** The SAME fraction in DuckDB-portable SQL (oracle side): '0x' || hex
    * parses as BIGINT there, matching Spark's conv(_, 16, 10).
    */
  def oracleFrac(sqlExpr: String): String =
    s"CAST(CAST('0x' || substring(md5(CAST($sqlExpr AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0"
}

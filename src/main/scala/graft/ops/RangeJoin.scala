package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join on time: pairs (l, r) with matching keys and
  * `r.time ∈ [l.time + lower, l.time + upper]`.
  *
  * A naive inequality join plans as BroadcastNestedLoop/cartesian — quadratic
  * and unusable at scale. The standard fix, used here: quantize time into
  * buckets of the window width, equi-join on (keys, bucket) — each left row
  * probes at most ⌈(upper-lower)/width⌉+1 buckets — then apply the exact
  * range predicate. The join becomes a hash join with a bounded expansion
  * factor, shuffling on (keys, bucket).
  */
object RangeJoin {

  /** Time-window join over microsecond-timestamp columns.
    *
    * @param lowerUs window start offset relative to left time (inclusive), µs
    * @param upperUs window end offset (inclusive), µs — must be >= lowerUs
    */
  def timeWindow(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs >= lowerUs, "empty window")
    val width = math.max(upperUs - lowerUs, 1L)
    val lt = unix_micros(col(leftTs))
    val rt = unix_micros(col(rightTs))
    val lBuckets = sequence(
      floor((lt + lit(lowerUs)) / lit(width)).cast("long"),
      floor((lt + lit(upperUs)) / lit(width)).cast("long"))
    val l = left.withColumn("__bucket", explode(lBuckets)).withColumn("__lt", lt)
    val r = right.withColumn("__bucket", floor(rt / lit(width)).cast("long"))
      .withColumn("__rt", rt)
    l.join(r, keys :+ "__bucket")
      .filter(col("__rt") >= col("__lt") + lit(lowerUs) &&
        col("__rt") <= col("__lt") + lit(upperUs))
      .drop("__bucket", "__lt", "__rt")
  }
}

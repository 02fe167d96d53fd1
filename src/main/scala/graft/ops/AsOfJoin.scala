package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row with
  * `rightTime <= leftTime` on matching keys (the market-data primitive:
  * "the prevailing quote at trade time"; generalizes the reference's
  * prior-day lookup, dax_measures.md:18, to irregular time series).
  *
  * Spark has no native as-of join. Preference order from the design brief is
  * compose-first, and composition wins here: tag and union both sides, then
  * one window pass per key ordered by (time, side) carries the latest right
  * payload forward onto each left row. Cost: ONE shuffle on the keys + an
  * in-partition sort — the same price as the sort-merge join a custom
  * `SparkPlan` would do, with AQE/skew handling inherited for free. A custom
  * exec node would only win if both inputs were already co-partitioned and
  * time-sorted on disk.
  *
  * Determinism contract: right rows must be unique per (keys, rightTime)
  * (pre-dedup with [[Dedup.latestBy]] otherwise); at `leftTime ==
  * rightTime` the right row is visible (inclusive, ASOF `>=`).
  */
object AsOfJoin {

  /** Left as-of-backward join. Output: all left columns plus the requested
    * right `payload` columns (null when no right row precedes).
    *
    * @param payload right-side columns to carry (renamed as given)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    // ALL payload columns travel in ONE struct: the window then carries the
    // whole prevailing right row, so a NULL field of that row stays NULL
    // instead of falling back to an older row's value (ASOF semantics —
    // per-column last(ignoreNulls) would mix columns from different rows)
    val payloadType = right
      .select(payload.map { case (in, out) => col(in).as(out) }: _*).schema
    val sideL = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__side")) ++
          leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) :+
          lit(null).cast(payloadType).as("__r"): _*)
    val sideR = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(1))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__side")) ++
          leftCols.filterNot(keys.contains).map(c => lit(null).as(s"__l_$c")) :+
          struct(payload.map { case (in, out) => col(in).as(out) }: _*).as("__r"): _*)
    // right sorts before left at equal time (inclusive >=); the carried
    // payload is the last right row seen so far in time order
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = sideL.unionByName(sideR)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 0)
      .select(
        keys.map(col) ++
          leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
          payload.map { case (_, out) => col("__c").getField(out).as(out) }: _*)
  }
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytical query surface — the five Power BI DAX measures
  * (powerbi/dax_measures.md) re-expressed as Spark column expressions /
  * window pipelines (SURVEY §2.5 A4-A8, §2.6 W2-W3).
  *
  * Numeric discipline: money/quantity arithmetic is done in DECIMAL (exact,
  * shuffle-order independent) and only converted to DOUBLE at the very end —
  * this is what makes results bit-stable under Spark's parallel partial
  * aggregation and hash-comparable against a sequential oracle engine.
  */
object Measures {

  private val Dec = "decimal(18,6)"

  /** A4: `DISTINCTCOUNT(dim_security[SYMBOL])` — "Securities Tracked"
    * (dax_measures.md:3). Exact distinct count (hash aggregate, 2-phase).
    */
  def distinctCount(c: Column): Column = countDistinct(c)

  /** A5: `AVERAGE(fact[CLOSE])` (dax_measures.md:8). Exact decimal sum then a
    * single double division — deterministic across partitionings.
    */
  def avgExact(c: Column): Column =
    sum(c.cast(Dec)).cast("double") / count(c)

  /** A6: `SUM(fact[VOLUME])` — "Total Volume" (dax_measures.md:30). */
  def totalVolume(c: Column): Column = sum(c.cast("decimal(38,0)"))

  /** A7: `SUMX(fact, VOLUME * CLOSE)` — "Total Value" (dax_measures.md:25):
    * row-level expression, then sum.
    */
  def totalValue(volume: Column, close: Column): Column =
    sum((volume.cast(Dec) * close.cast(Dec)).cast("decimal(38,6)")).cast("decimal(38,6)")

  /** W2: "Daily Change %" (dax_measures.md:11-21): percent change vs the prior
    * trading day's close, 0 when there is no prior day (`DIVIDE(c-p, p, 0)`).
    *
    * The reference's DAX sums DATE_SK on line 14 — an evident typo; we
    * implement the documented intent (prior-day CLOSE). `DATEADD(-1, DAY)` is
    * a calendar shift (Monday's prev = Sunday = no row); `lag` over trading
    * days is the faithful-to-intent primary; the calendar-shift self-join
    * variant is exposed by [[calendarShiftJoin]].
    */
  def dailyChangePct(df: DataFrame, partitionKeys: Seq[Column], dateCol: Column,
      closeCol: Column): DataFrame = {
    val w = Window.partitionBy(partitionKeys: _*).orderBy(dateCol.asc)
    val prev = lag(closeCol, 1).over(w)
    val cur = closeCol.cast("double")
    val p = prev.cast("double")
    df.withColumn("prev_close", prev)
      .withColumn("daily_change_pct",
        when(p.isNull || p === 0d, lit(0d)).otherwise((cur - p) / p))
  }

  /** D11 variant of W2: previous *calendar* day via self-join on
    * `date_add(d, -1)` — the literal `DATEADD(CAL_DATE,-1,DAY)` semantics
    * (dax_measures.md:18), kept as a documented variant. `daily` must be one
    * row per (keys..., dateCol).
    */
  def calendarShiftJoin(daily: DataFrame, keys: Seq[String], dateCol: String,
      valueCol: String): DataFrame = {
    val prev = daily.select(
      (keys.map(col) :+ date_add(col(dateCol), 1).as(dateCol) :+
        col(valueCol).as(s"prev_$valueCol")): _*)
    daily.join(prev, keys :+ dateCol, "left")
  }

  /** W3: trailing 7-day average volume
    * (`AVERAGEX(DATESINPERIOD(..., -7, DAY), [Total Volume])`,
    * dax_measures.md:33-40): a RANGE frame of 6 preceding calendar days over a
    * day-indexed ordering. `daily` must be one row per (keys..., dayIdxCol);
    * `dayIdxCol` is an integer day number so the range frame is engine-neutral.
    * Average = exact decimal window sum / window count, divided in double.
    */
  def trailingAvg(daily: DataFrame, keys: Seq[Column], dayIdx: Column,
      valueCol: Column, days: Int, outName: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(dayIdx.asc)
      .rangeBetween(-(days - 1).toLong, 0L)
    daily.withColumn(outName,
      sum(valueCol.cast("decimal(38,6)")).over(w).cast("double") /
        count(valueCol).over(w))
  }
}

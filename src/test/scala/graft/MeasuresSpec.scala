package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Measures

/** The DAX measure surface: W2 daily change (incl. DIVIDE(_,_,0) semantics),
  * W3 trailing window saturation, D11 calendar-shift gap behaviour.
  */
class MeasuresSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val daily = Seq(
    // symbol, date, close — includes a Fri->Mon gap
    ("AAPL", "2026-08-06", 100.0), // Thu
    ("AAPL", "2026-08-07", 110.0), // Fri
    ("AAPL", "2026-08-10", 99.0),  // Mon (calendar gap: no Sat/Sun rows)
    ("MSFT", "2026-08-06", 50.0)
  ).toDF("symbol", "d", "close").select($"symbol", to_date($"d").as("d"), $"close")

  test("W2: lag-based daily change, first day -> 0 (dax_measures.md:11-21)") {
    val out = Measures.dailyChangePct(daily, Seq($"symbol"), $"d", $"close")
      .orderBy("symbol", "d").collect()
    assert(out(0).getAs[Double]("daily_change_pct") === 0.0, "no prior day -> 0")
    assert(math.abs(out(1).getAs[Double]("daily_change_pct") - 0.10) < 1e-12)
    // Monday compares against Friday (trading-day lag, not calendar day)
    assert(math.abs(out(2).getAs[Double]("daily_change_pct") - (99.0 - 110.0) / 110.0) < 1e-12)
    assert(out(3).getAs[Double]("daily_change_pct") === 0.0)
  }

  test("W2 zero-prev: DIVIDE(c-p, p, 0) yields 0, not null/inf") {
    val z = Seq(("X", "2026-01-01", 0.0), ("X", "2026-01-02", 5.0))
      .toDF("symbol", "d", "close").select($"symbol", to_date($"d").as("d"), $"close")
    val out = Measures.dailyChangePct(z, Seq($"symbol"), $"d", $"close")
      .orderBy("d").collect()
    assert(out(1).getAs[Double]("daily_change_pct") === 0.0, "prev=0 -> 0")
  }

  test("D11 variant: calendar shift finds no Monday->Friday edge") {
    val out = Measures.calendarShiftJoin(daily, Seq("symbol"), "d", "close")
    val monday = out.filter($"d" === "2026-08-10").head()
    assert(monday.isNullAt(out.columns.indexOf("prev_close")),
      "calendar DATEADD(-1) has no Sunday row — documented reference semantics")
    val friday = out.filter($"d" === "2026-08-07").head()
    assert(friday.getAs[Double]("prev_close") === 100.0)
  }

  test("W3: trailing 7-day window saturates and averages exactly (dax_measures.md:33-40)") {
    // 10 consecutive days, volume = day index: trailing avg of day 10 = avg(4..10) = 7
    val rows = (1 to 10).map(i => ("S", i, i.toDouble))
    val df = rows.toDF("s", "day_idx", "vol")
    val out = Measures.trailingAvg(df, Seq($"s"), $"day_idx", $"vol", 7, "t7")
      .orderBy("day_idx").collect()
    assert(out(0).getAs[Double]("t7") === 1.0)
    assert(out(6).getAs[Double]("t7") === 4.0, "first saturated window avg(1..7)")
    assert(out(9).getAs[Double]("t7") === 7.0, "avg(4..10)")
  }

  test("A4-A7 aggregate measures compute exactly in decimal") {
    val f = Seq(("A", 10.0, 2.0), ("A", 20.0, 3.0), ("B", 30.0, 4.0))
      .toDF("sym", "volume", "close")
    val out = f.groupBy($"sym").agg(
      Measures.distinctCount($"sym").as("n"),
      Measures.avgExact($"close").as("avg_close"),
      Measures.totalVolume($"volume").as("tv"),
      Measures.totalValue($"volume", $"close").as("val"))
      .orderBy("sym").collect()
    assert(out(0).getAs[Double]("avg_close") === 2.5)
    assert(out(0).getAs[java.math.BigDecimal]("tv").longValueExact() === 30L)
    assert(out(0).getAs[java.math.BigDecimal]("val").doubleValue() === 80.0) // 10*2+20*3
  }
}

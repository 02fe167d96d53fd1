package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Vwap
import graft.model.EodPrice
import graft.ops.Diagnostics
import graft.source.EodSource

/** S3 sink round-trip, P8 diagnostics, §2.10 typed Aggregator, V6 typed
  * Dataset contract.
  */
class ExtrasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("S3: bronze CSV sink round-trips through the bronze reader") {
    val dir = TestSpark.tmpDir("csvsink") + "/out"
    val src = EodSource.fromJsonRecords(spark,
      Seq("""{"T":"AAPL","o":"189.5","h":"191.2","l":"188.9","c":"190.4","v":"51234567"}""",
        """{"T":"MSFT","c":"424.3"}"""),
      "2026-08-11")
    EodSource.writeBronzeCsv(src, dir)
    val back = EodSource.readBronzeCsv(spark, dir)
    assert(back.count() === 2)
    val aapl = back.filter($"symbol" === "AAPL").head()
    assert(aapl.getDecimal(back.columns.indexOf("close")).toPlainString === "190.400000")
    val msft = back.filter($"symbol" === "MSFT").head()
    assert(msft.isNullAt(back.columns.indexOf("open")), "empty field -> NULL round-trip")
  }

  test("P8: session diagnostics returns one row of context") {
    val r = Diagnostics.sessionInfo(spark).head()
    assert(r.getAs[String]("version").nonEmpty)
    assert(r.getAs[String]("app_id").nonEmpty)
    assert(r.getAs[Int]("default_parallelism") > 0)
  }

  test("Vwap aggregator: exact on known values, zero-volume -> 0") {
    val df = Seq(("A", 10.0, 2.0), ("A", 20.0, 6.0), ("B", 5.0, 0.0))
      .toDF("sym", "px", "qty")
    val out = df.groupBy($"sym").agg(Vwap.column($"px", $"qty").as("vwap"))
      .orderBy("sym").collect()
    assert(out(0).getAs[Double]("vwap") === (10 * 2 + 20 * 6) / 8.0)
    assert(out(1).getAs[Double]("vwap") === 0.0, "DIVIDE-by-zero guard")
  }

  test("V6: CORE layer reads as a typed Dataset[EodPrice]") {
    val bronze = TestSpark.tmpDir("typed")
    val f = new java.io.File(bronze, "eod.csv")
    val w = new java.io.PrintWriter(f)
    Seq("trade_date,symbol,open,high,low,close,volume",
      "2026-08-11,AAPL,189.5,191.2,188.9,190.4,51234567").foreach(w.println)
    w.close()
    val pipe = new graft.pipeline.EodPipeline(TestSpark.tmpDir("wh-typed"), minTickers = 1)
    pipe.runDate(spark, f.toString, "2026-08-11")
    val ds = spark.read.schema(graft.model.Schemas.core).parquet(pipe.corePath).as[EodPrice]
    val row = ds.head()
    assert(row.symbol === "AAPL" && row.close.toPlainString === "190.400000")
  }
}

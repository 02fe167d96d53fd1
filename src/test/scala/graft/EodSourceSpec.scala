package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.source.EodSource

/** S5/S6/P1-P4 semantics on the FIXTURES.md A2 bronze CSV: normalization,
  * three-token NULL_IF, try_cast null-on-failure, lineage columns.
  */
class EodSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeCsv(rows: Seq[String]): String = {
    val dir = TestSpark.tmpDir("bronze")
    val f = new java.io.File(dir, "eod_prices_2026-08-11.csv")
    val w = new java.io.PrintWriter(f)
    ("trade_date,symbol,open,high,low,close,volume" +: rows).foreach(w.println)
    w.close()
    f.toString
  }

  test("typed read with NULL_IF and try_cast semantics (copy_to_raw.sql:21-35)") {
    val path = writeCsv(Seq(
      "2026-08-11,AAPL,189.5,191.2,188.9,190.4,51234567",
      "2026-08-11,msft ,421.1,425.0,419.8,424.3,18345678",
      "2026-08-11,BAD,x,,NaN,NULL,1.5"))
    val df = EodSource.readBronzeCsv(spark, path)
    assert(df.count() === 3)
    val bad = df.filter(col("symbol") === "BAD").head()
    assert(bad.isNullAt(df.columns.indexOf("open")), "unparseable -> NULL")
    assert(bad.isNullAt(df.columns.indexOf("high")), "empty -> NULL")
    assert(bad.isNullAt(df.columns.indexOf("low")), "NaN token -> NULL")
    assert(bad.isNullAt(df.columns.indexOf("close")), "NULL token -> NULL")
    // Snowflake TRY_TO_NUMBER('1.5',38,0) rounds to 2 (scale coercion), and
    // Spark try_cast matches — rounding, not NULL.
    assert(bad.getDecimal(df.columns.indexOf("volume")).longValueExact === 2L,
      "scale-coerced volume rounds like TRY_TO_NUMBER")
    val aapl = df.filter(col("symbol") === "AAPL").head()
    assert(aapl.getDecimal(df.columns.indexOf("open")).toPlainString === "189.500000")
    assert(!df.filter(col("_src_file").contains("eod_prices_2026-08-11")).isEmpty,
      "METADATA$FILENAME lineage")
  }

  test("JSON record source renames T/o/h/l/c/v (eod_data_downloader.py:150-163)") {
    val df = EodSource.fromJsonRecords(spark,
      Seq("""{"T":"AAPL","o":"189.5","h":"191.2","l":"188.9","c":"190.4","v":"51234567"}""",
        """{"T":"NOHL","c":"10.0"}"""),
      "2026-08-11")
    assert(df.columns.toSeq ===
      Seq("trade_date", "symbol", "open", "high", "low", "close", "volume"))
    val nohl = df.filter(col("symbol") === "NOHL").head()
    assert(nohl.isNullAt(2) && nohl.isNullAt(6), "missing fields -> NULL")
  }

  test("idempotent sink skips existing target (get_securities_data.py:117-132)") {
    val target = TestSpark.tmpDir("sink") + "/out"
    val df = spark.range(3).toDF("n")
    assert(EodSource.writeIfAbsent(df, target))
    assert(!EodSource.writeIfAbsent(df, target), "second write skipped")
  }
}

package graft.model

import org.apache.spark.sql.types._

/** Layer schemas of the EOD pricing star schema, re-expressed as Spark types.
  *
  * Derived from the reference DDL/projections (see SURVEY.md §1.2):
  *  - RAW:  dags/sql/copy_to_raw.sql:6-27  (typed positional COPY projection)
  *  - CORE: dags/sql/merge_core.sql:27-33
  *  - DIM_SECURITY: dags/sql/merge_dim_security.sql:13-14
  *  - DIM_DATE: dags/sql/merge_dim_date.sql:7-18
  *  - FACT: dags/sql/merge_facts_daily.sql:30-38
  */
object Schemas {
  val Price: DecimalType  = DecimalType(18, 6) // TRY_TO_DECIMAL($n,18,6), copy_to_raw.sql:21-24
  val Volume: DecimalType = DecimalType(38, 0) // TRY_TO_NUMBER($7,38,0),  copy_to_raw.sql:25

  /** Bronze CSV as landed: all strings; typing happens in the RAW projection
    * (mirrors Snowflake's staged-file read where $1..$7 are untyped).
    */
  val bronzeCsv: StructType = StructType(Seq(
    StructField("trade_date", StringType),
    StructField("symbol", StringType),
    StructField("open", StringType),
    StructField("high", StringType),
    StructField("low", StringType),
    StructField("close", StringType),
    StructField("volume", StringType)))

  val raw: StructType = StructType(Seq(
    StructField("trade_date", DateType),
    StructField("symbol", StringType),
    StructField("open", Price), StructField("high", Price),
    StructField("low", Price), StructField("close", Price),
    StructField("volume", Volume),
    StructField("_src_file", StringType),
    StructField("_ingest_ts", TimestampType)))

  val core: StructType = StructType(Seq(
    StructField("trade_date", DateType),
    StructField("symbol", StringType),
    StructField("open", Price), StructField("high", Price),
    StructField("low", Price), StructField("close", Price),
    StructField("volume", Volume),
    StructField("load_ts", TimestampType)))

  val dimSecurity: StructType = StructType(Seq(
    StructField("security_id", LongType),
    StructField("symbol", StringType)))

  val dimDate: StructType = StructType(Seq(
    StructField("date_sk", IntegerType),
    StructField("cal_date", DateType),
    StructField("year_num", IntegerType),
    StructField("quarter_num", IntegerType),
    StructField("month_num", IntegerType),
    StructField("month_name", StringType),
    StructField("day_num", IntegerType),
    StructField("day_name", StringType),
    StructField("day_of_week", IntegerType), // Sunday=0 (reference encoding, merge_dim_date.sql:16-18)
    StructField("week_of_year", IntegerType),
    StructField("is_weekend", BooleanType)))

  val factDailyPrice: StructType = StructType(Seq(
    StructField("security_id", LongType),
    StructField("date_sk", IntegerType),
    StructField("trade_date", DateType),
    StructField("open", Price), StructField("high", Price),
    StructField("low", Price), StructField("close", Price),
    StructField("volume", Volume),
    StructField("load_ts", TimestampType)))
}

/** Typed row for the CORE layer where compile-time safety pays off. */
case class EodPrice(
    trade_date: java.sql.Date,
    symbol: String,
    open: java.math.BigDecimal,
    high: java.math.BigDecimal,
    low: java.math.BigDecimal,
    close: java.math.BigDecimal,
    volume: java.math.BigDecimal,
    load_ts: java.sql.Timestamp)

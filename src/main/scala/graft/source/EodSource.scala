package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas
import graft.ops.Normalize

/** Source-side operators of the reference pipeline (SURVEY §2.1 S1-S7).
  *
  * S1 (REST JSON fetch) is connector logic: at test scale the driver-side
  * fetch lands records that we turn into a DataFrame ([[fromJsonRecords]]);
  * the bulk path is the CSV bronze layer ([[readBronzeCsv]]) which mirrors
  * Snowflake's `COPY INTO ... FILE_FORMAT=(CSV SKIP_HEADER=1 NULL_IF=('',
  * 'NULL','NaN') EMPTY_FIELD_AS_NULL=TRUE) ON_ERROR='CONTINUE'`
  * (copy_to_raw.sql:5-38, load_daily_eod_prices.sql:15-30).
  */
object EodSource {

  /** S1/S2: Polygon grouped-daily JSON (`{"T":...,"o":...,...}` records,
    * eod_data_downloader.py:150-163) → typed rows. The JSON text is parsed
    * distributed via `from_json`, field-renamed T/o/h/l/c/v →
    * symbol/open/.../volume; missing fields yield NULL (the Python writer's
    * `""` + NULL_IF semantics collapse to the same).
    */
  def fromJsonRecords(spark: SparkSession, records: Seq[String], tradeDate: String): DataFrame = {
    import spark.implicits._
    val jsonSchema = "T STRING, o STRING, h STRING, l STRING, c STRING, v STRING"
    spark.createDataset(records).toDF("json")
      .select(from_json(col("json"), org.apache.spark.sql.types.StructType.fromDDL(jsonSchema)).as("r"))
      .select(
        to_date(lit(tradeDate)).as("trade_date"),
        col("r.T").as("symbol"),
        typed(col("r.o"), Schemas.Price).as("open"),
        typed(col("r.h"), Schemas.Price).as("high"),
        typed(col("r.l"), Schemas.Price).as("low"),
        typed(col("r.c"), Schemas.Price).as("close"),
        typed(col("r.v"), Schemas.Volume).as("volume"))
  }

  /** S5 + S6 + P1-P3: bronze CSV → RAW frame. Reads header CSVs permissively
    * (bad rows → NULLs, the `ON_ERROR='CONTINUE'` analogue), applies the
    * three-token NULL_IF, `try_cast`s to the declared decimal types, and adds
    * the `_src_file` / `_ingest_ts` lineage columns.
    */
  def readBronzeCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(Schemas.bronzeCsv)
      .csv(path)
    val typedDf = raw.select(
      to_date(col("trade_date")).as("trade_date"),
      col("symbol"),
      typed(col("open"), Schemas.Price).as("open"),
      typed(col("high"), Schemas.Price).as("high"),
      typed(col("low"), Schemas.Price).as("low"),
      typed(col("close"), Schemas.Price).as("close"),
      typed(col("volume"), Schemas.Volume).as("volume"))
    Normalize.withLineage(typedDf)
  }

  private def typed(c: org.apache.spark.sql.Column, dt: org.apache.spark.sql.types.DataType) =
    Normalize.tryTo(Normalize.nullIfTokens(c), dt)

  /** S3: bronze CSV sink — header + comma layout exactly as the reference's
    * writer emits it (`trade_date,symbol,open,...`, eod_data_downloader.py:
    * 153-163). Missing values serialize as empty fields (the writer's
    * `ticker_data.get(field, "")`), which [[readBronzeCsv]]'s NULL_IF maps
    * back to NULL — the round-trip is lossless.
    */
  def writeBronzeCsv(df: DataFrame, path: String): Unit =
    df.select(
        col("trade_date").cast("string"), col("symbol"),
        col("open").cast("string"), col("high").cast("string"),
        col("low").cast("string"), col("close").cast("string"),
        col("volume").cast("string"))
      .write.option("header", "true").option("emptyValue", "").csv(path)

  /** S4: idempotent sink — skip the write if the target already exists
    * (`replace=False` S3 upload, get_securities_data.py:117-132). Returns
    * true when a write happened.
    */
  def writeIfAbsent(df: DataFrame, path: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path))) false
    else { df.write.parquet(path); true }
  }

  /** S7: stage listing (`LIST @stage`) analogue. */
  def listStage(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.toString).toIndexedSeq.sorted
  }
}

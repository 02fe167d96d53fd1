package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Projection / scalar normalization operators (SURVEY §2.2 P1-P6).
  * All are pure, codegen'd column expressions — they stay inside
  * WholeStageCodegen and never force a shuffle.
  */
object Normalize {

  /** `UPPER(TRIM(x))` key normalization (merge_core.sql:9,
    * premerge_metrics.sql:13,23, merge_dim_security.sql:8).
    */
  def normKey(c: Column): Column = upper(trim(c))

  /** Snowflake `NULL_IF ('', 'NULL', 'NaN')` CSV semantics
    * (copy_to_raw.sql:34-35): map the sentinel tokens to NULL before typing.
    */
  def nullIfTokens(c: Column, tokens: Seq[String] = Seq("", "NULL", "NaN")): Column =
    when(c.isin(tokens.map(lit): _*), lit(null)).otherwise(c)

  /** `TRY_TO_DECIMAL` / `TRY_TO_NUMBER`: NULL on parse failure instead of
    * error (copy_to_raw.sql:21-25) — Spark's `try_cast`.
    */
  def tryTo(c: Column, dt: DataType): Column = c.try_cast(dt)

  /** Lineage columns `_SRC_FILE` (METADATA$FILENAME, copy_to_raw.sql:26) and
    * `_INGEST_TS` (CURRENT_TIMESTAMP(), copy_to_raw.sql:27).
    */
  def withLineage(df: DataFrame): DataFrame = df
    .withColumn("_src_file", input_file_name())
    .withColumn("_ingest_ts", current_timestamp())

  /** Audit timestamp column (merge_core.sql:26,32, merge_facts_daily.sql:29,37). */
  def withLoadTs(df: DataFrame): DataFrame = withLoadTs(df, current_timestamp())

  /** P6 with an explicit stamp: a batch run stamps every row with the SAME
    * load timestamp (the reference stamps per-statement, not per-row), and a
    * pinned stamp keeps replays / differential tests deterministic.
    */
  def withLoadTs(df: DataFrame, ts: Column): DataFrame =
    df.withColumn("load_ts", ts)
}

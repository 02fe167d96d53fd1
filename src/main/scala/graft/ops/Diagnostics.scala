package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P8 / §3.2: the engine's "hello world" — session-context scalars, the
  * analogue of the reference's connectivity-test DAGs
  * (dags/test_snowflake_conn.py:17-23 `SELECT CURRENT_USER(), ...`;
  * dags/test_aws_conn.py S3 listing → [[graft.source.EodSource.listStage]]).
  */
object Diagnostics {

  /** 1-row frame of session context — user, version, app id, core count,
    * shuffle partitions.
    */
  def sessionInfo(spark: SparkSession): DataFrame =
    spark.sql("SELECT current_user() AS current_user, version() AS version")
      .withColumn("app_id", lit(spark.sparkContext.applicationId))
      .withColumn("default_parallelism", lit(spark.sparkContext.defaultParallelism))
      .withColumn("shuffle_partitions",
        lit(spark.conf.get("spark.sql.shuffle.partitions")))
}

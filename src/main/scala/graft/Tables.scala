package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata layout (TESTDATA.md): one parquet file per
  * table under `sfDir`. All `SparkEntry.queries` read through here so the scan
  * path (vectorized parquet, pushdown) is uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.parquet`'s `ts` physical type has varied across driver testdata
    * generations: TIMESTAMP(NANOS) (rejected by Spark's reader unless read as
    * long and rescaled — values are microsecond-grained, so lossless) and
    * naive TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ, which event-time
    * streaming and unix_micros reject). Normalize every variant to a UTC
    * TimestampType here so callers are independent of both the generator
    * vintage and who built the SparkSession (sessions pin UTC, so the
    * NTZ→LTZ cast is instant-preserving).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name != "events") spark.read.parquet(path)
    else {
      // Left set for the session: it only affects ns-timestamp parquet files,
      // and those must always be read this way. (Unsetting after planning
      // would break the lazy scan, which consults the conf at execution too.)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path)
      df.schema("ts").dataType match {
        case LongType =>
          // integer division: `/` is double division and epoch-ns magnitudes
          // exceed 2^53, which silently perturbs the low microsecond digit
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    }
  }
}

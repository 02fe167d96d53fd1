package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver testdata layout (TESTDATA.md): one parquet file per
  * table under `sfDir`. All `SparkEntry.queries` read through here so the scan
  * path (vectorized parquet, pushdown) is uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects by default. The values are microsecond-grained (ns % 1000 == 0
    * across all scale factors), so reading nanos as long and rescaling to a
    * microsecond TimestampType is lossless. Scoped here so callers are
    * independent of who built the SparkSession.
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
      if (df.schema("ts").dataType == LongType)
        // integer division: `/` is double division and epoch-ns magnitudes
        // exceed 2^53, which silently perturbs the low microsecond digit
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    }
  }
}

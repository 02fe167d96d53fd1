package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: a Spark pipeline plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet tables.
  *
  * Numeric discipline for oracle parity (hash compare): arithmetic in DECIMAL
  * (exact, partitioning-order independent), a single deterministic
  * decimal→double conversion at the end when a ratio is needed; column names
  * and types aligned on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

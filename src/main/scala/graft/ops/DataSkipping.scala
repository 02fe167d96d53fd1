package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** File-level min/max data skipping — the Delta/Iceberg stats-index pattern
  * on plain parquet. Parquet row-group stats prune WITHIN a file, but the
  * scan still opens every footer; at 100 TB (millions of files) the win that
  * matters is deciding from a tiny side table which FILES to list at all.
  * Delta keeps per-file min/max in its transaction log
  * (org.apache.spark.sql.delta.stats.StatisticsCollection — public Delta
  * code) and prunes during planning; this is that index re-expressed as a
  * parquet side table inside each immutable [[VersionedTable]] version dir.
  *
  * - [[writeStats]] runs ONE distributed aggregation (group by
  *   `input_file_name`) over the freshly staged snapshot and writes the
  *   per-file stats as parquet under `dataDir/_stats` — never collected to
  *   the driver, O(files) rows however large the data. The underscore name
  *   keeps it invisible to parquet discovery of the data dir.
  * - [[pruneBetween]] reads the stats table (KBs), keeps files whose
  *   [min, max] interval can intersect the predicate band, and plans a scan
  *   over only those paths. Selection is CONSERVATIVE: a file with NULL
  *   stats (all-null column) is kept, and callers re-apply the residual
  *   predicate — skipping only ever removes files that provably hold no
  *   matching rows.
  *
  * The stats pass is an extra O(data) scan at write time — the price of the
  * index, paid once per snapshot and amortized over every pruned read (Delta
  * folds it into the writer; a custom parquet committer could do the same
  * here). Stats-column choice mirrors layout: stats on a column only help if
  * the layout clusters it ([[Layout.zOrderWrite]] / `repartitionByRange`),
  * else every file spans the full value range and nothing prunes.
  */
object DataSkipping {

  val StatsDir = "_stats"

  private def minCol(c: String) = s"${c}__min"
  private def maxCol(c: String) = s"${c}__max"

  /** Compute and persist per-file min/max stats for `cols` over `dataDir`. */
  def writeStats(spark: SparkSession, dataDir: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "writeStats: need at least one stats column")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(minCol(c)), max(col(c)).as(maxCol(c))))
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(s"$dataDir/$StatsDir")
  }

  /** The stats side table (one row per data file). */
  def stats(spark: SparkSession, dataDir: String): DataFrame =
    spark.read.parquet(s"$dataDir/$StatsDir")

  /** Scan only the files whose stats admit `lo <= c <= hi`. Returns
    * (pruned scan, files selected, files total). Callers still apply the
    * row-level predicate — file selection is a superset guarantee.
    */
  def pruneBetween(spark: SparkSession, dataDir: String, c: String,
      lo: Column, hi: Column): (DataFrame, Int, Int) = {
    val st = stats(spark, dataDir)
    // a file is skippable only when its stats PROVE emptiness; NULL stats
    // (all-null column in that file) compare to NULL -> kept via coalesce
    val disjoint = col(maxCol(c)) < lo || col(minCol(c)) > hi
    val selected = st.select(col("file"), coalesce(!disjoint, lit(true)).as("keep"))
      .collect()
    val keep = selected.filter(_.getBoolean(1)).map(_.getString(0))
    val df =
      if (keep.nonEmpty) spark.read.parquet(keep.toIndexedSeq: _*)
      else { // provably no matching file: empty frame with the table's schema
        val schema = spark.read.parquet(dataDir).schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    (df, keep.length, selected.length)
  }
}

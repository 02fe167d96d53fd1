package graft.ops

import org.apache.spark.sql.DataFrame

/** Physical-layout helpers: bucketing for co-located joins.
  *
  * A table bucketed (and sorted) by its join key joins against another table
  * bucketed the same way with NO shuffle exchange on either side — the
  * sort-merge join reads matching buckets directly. For the 100 TB layers
  * (CORE/FACT keyed by security/date), bucketing the stored layout on the
  * merge keys turns every daily MERGE's joins into exchange-free merges;
  * pair with date partitioning for pruning. Bucketed layout requires the
  * table catalog (`saveAsTable`) — plain path parquet does not carry bucket
  * metadata.
  */
object Layout {

  /** Write `df` as a bucketed, sorted catalog table (overwrite). `path`
    * makes it an external table at that location (bucket metadata still
    * lives in the catalog — only catalog-backed reads join exchange-free).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String],
      path: Option[String] = None): Unit = {
    val w = df.write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}

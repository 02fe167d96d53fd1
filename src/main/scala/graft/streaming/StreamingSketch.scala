package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cardinality estimation with BOUNDED state — the unbounded-stream
  * twin of the batch KMV sketch (q81). An exact streaming `countDistinct`
  * needs state proportional to the number of distinct keys ever seen; the
  * KMV state is k doubles per group, forever, and the estimate converges to
  * the batch sketch's value on the same data (identical hash family, so the
  * equality is exact, not approximate — proven in StreamingSketchSpec).
  */
object StreamingSketch {

  case class KmvEstimate(key: String, n_kept: Int, est_distinct: Double)

  /** The content-addressed hash fraction — the SHARED definition
    * ([[graft.functions.ContentHash.hashFrac]]) the batch sketch also uses,
    * so the streaming-equals-batch guarantee cannot drift.
    */
  def hashFrac(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ContentHash.hashFrac(c)

  /** Per-key KMV distinct estimate over a stream: `df` must carry a string
    * `key` column and a double `frac` column (from [[hashFrac]]). State per
    * key: the k smallest distinct fractions (a sorted vector, capped).
    * Emits the running estimate each micro-batch (update mode); the last
    * emission per key equals the batch KMV over everything delivered.
    */
  def kmvDistinct(df: DataFrame, k: Int): Dataset[KmvEstimate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("key").cast("string"), col("frac").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[Vector[Double], KmvEstimate](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[Vector[Double]]) =>
          var kept = state.getOption.getOrElse(Vector.empty[Double]) // ascending
          rows.foreach { case (_, f) =>
            // distinct insert, keep k smallest: values hash identically on
            // re-delivery, so duplicates are free
            if (!kept.contains(f) && (kept.size < k || f < kept.last)) {
              kept = (kept :+ f).sorted.take(k)
            }
          }
          state.update(kept)
          val est =
            if (kept.size < k) kept.size.toDouble else (k - 1).toDouble / kept.last
          KmvEstimate(key, kept.size, est)
      }
  }

  /** Convenience: run to completion with AvailableNow and return the final
    * estimate per key (last update wins).
    */
  def runToFinal(est: Dataset[KmvEstimate], name: String): DataFrame = {
    val q = est.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val spark = est.sparkSession
    // The final state per key is recoverable without row order: n_kept grows
    // monotonically, and once saturated the kth-min only decreases, so the
    // estimate (k-1)/kth-min only increases — the last update is exactly the
    // (max n_kept, then max est) row.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key"))
      .orderBy(col("n_kept").desc, col("est_distinct").desc)
    spark.table(name)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

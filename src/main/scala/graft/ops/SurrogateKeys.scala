package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment (SURVEY §1.3 / §7.3 hard part 2).
  *
  * The reference relies on a Snowflake IDENTITY column for
  * `DIM_SECURITY.SECURITY_ID` (the insert lists only SYMBOL,
  * merge_dim_security.sql:13-14, yet SECURITY_ID is joined on in
  * merge_facts_daily.sql:8,13). Spark has no distributed auto-increment;
  * `monotonically_increasing_id` is not stable across runs (breaks oracle
  * comparison and any incremental reload), so we assign
  * `max(existing) + row_number() OVER (ORDER BY orderCol)` on the insert-only
  * delta: deterministic, dense, and only the (small) delta passes through the
  * single-partition window — the multi-TB existing dimension contributes one
  * scalar max.
  */
object SurrogateKeys {

  /** Append `keyCol` to `delta` starting above `existingMax`, ordered by
    * `orderCols` for determinism. The global window is a single-partition
    * sort — acceptable because deltas (new dimension members per batch) are
    * small by construction; do NOT use this on fact-sized inputs.
    */
  def assign(delta: DataFrame, keyCol: String, existingMax: Long, orderCols: Seq[String]): DataFrame = {
    val w = Window.orderBy(orderCols.map(col(_).asc): _*)
    delta.withColumn(keyCol, lit(existingMax) + row_number().over(w).cast("long"))
  }

  /** Current max key of a dimension (0 for an empty one). */
  def maxKey(dim: DataFrame, keyCol: String): Long = {
    val r = dim.agg(max(col(keyCol))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}

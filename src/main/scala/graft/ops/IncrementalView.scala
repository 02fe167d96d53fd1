package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over a [[ChangeFeed]] — the classic
  * delta-rule fold for additive aggregates (count / sum; avg = sum ÷ count
  * downstream). The reference recomputes its aggregate views from full
  * snapshots every run (dags/sql/load_daily_eod_prices.sql rebuilds the
  * day's aggregates wholesale); at 100 TB a maintained view must cost
  * O(changes), never O(table).
  *
  * The fold is one `groupBy` over the feed: `insert` / `update_postimage`
  * rows add their measures, `delete` / `update_preimage` rows subtract —
  * so a row whose GROUP ATTRIBUTE changes moves between groups for free
  * (preimage cancels it from the old group, postimage lands it in the new
  * one). A signed count `_n` is always maintained; a group whose count
  * reaches zero leaves the view (its sums are exactly cancelled by the
  * same rows that zeroed the count). [[merge]] preserves the view's
  * column types, so maintenance cycles never widen the schema.
  *
  * Exactness contract: with decimal measures the fold is associative and
  * the maintained view equals a full recompute BIT-FOR-BIT; with doubles
  * it is equal up to float reassociation. q201 runs the decimal form and
  * requires exact equality in-query.
  */
object IncrementalView {

  /** The always-maintained signed row count (group-liveness driver). */
  val NCol = "_n"

  /** Additive aggregate spec: group keys + named sum measures. */
  final case class Spec(keyCols: Seq[String], sums: Seq[(String, Column)])

  /** Full recompute — the initial materialization and the audit twin of
    * the maintained view.
    */
  def full(df: DataFrame, spec: Spec): DataFrame = {
    val aggs = count(lit(1)).cast("long").as(NCol) +:
      spec.sums.map { case (name, c) => sum(c).as(name) }
    df.groupBy(spec.keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Signed per-group delta of a change feed slice — O(changes) rows in,
    * one shuffle on the group key. Unknown change types fail loudly.
    */
  def delta(changes: DataFrame, spec: Spec): DataFrame = {
    val sign = when(
      col(ChangeFeed.ChangeType).isin("insert", "update_postimage"), lit(1))
      .when(col(ChangeFeed.ChangeType).isin("delete", "update_preimage"), lit(-1))
    val signed = changes.withColumn("_sign", coalesce(sign, raise_error(
      concat(lit("IncrementalView: unknown change type "),
        col(ChangeFeed.ChangeType)))))
    val aggs = sum(col("_sign")).cast("long").as(NCol) +:
      spec.sums.map { case (name, c) =>
        sum(when(col("_sign") === 1, c).otherwise(-c)).as(name)
      }
    signed.groupBy(spec.keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The appId under which a persistent view's txn marker records the last
    * source commit folded in.
    */
  val RefreshApp = "ivm"

  /** PERSISTENT materialized-view refresh (the `REFRESH MATERIALIZED VIEW`
    * a warehouse schedules): the view lives as its own [[VersionedTable]]
    * whose txn marker records the last source commit applied. Each call
    * reads ONLY `tableChanges(lastApplied, live)` — O(changes) — folds it,
    * and commits the new view version with the marker advanced, so a crash
    * between fold and commit re-folds idempotently from the marker. An
    * up-to-date view is a NO-OP (no new version — refresh storms cost
    * nothing); the first call bootstraps with a full recompute. Returns
    * the new view version, or None when already current.
    */
  def refreshTable(spark: org.apache.spark.sql.SparkSession, viewDir: String,
      tableDir: String, keyCols: Seq[String], spec: Spec): Option[Long] = {
    val live = VersionedTable.currentVersion(spark, tableDir).getOrElse(
      sys.error(s"IncrementalView.refreshTable: no live version in $tableDir"))
    VersionedTable.lastBatchId(spark, viewDir, RefreshApp) match {
      case Some(applied) if applied >= live => None
      case Some(applied) =>
        val folded = merge(VersionedTable.read(spark, viewDir),
          delta(ChangeFeed.tableChanges(spark, tableDir, applied, live, keyCols),
            spec), spec)
        Some(VersionedTable.write(folded, viewDir, Map(RefreshApp -> live)))
      case None =>
        Some(VersionedTable.write(
          full(VersionedTable.read(spark, tableDir), spec), viewDir,
          Map(RefreshApp -> live)))
    }
  }

  /** NON-ADDITIVE maintenance (min / max / count-distinct): a delete can't
    * fold out of an extremum, so the delta rule doesn't apply — the
    * standard fallback recomputes ONLY the groups the feed touched, from
    * the live snapshot, and keeps every untouched group's row as-is:
    * O(touched groups' rows), still never O(table) when changes
    * concentrate. `recompute` receives the snapshot restricted to the
    * touched groups and must return one row per group (same schema as the
    * view). A group whose rows all died simply yields no recomputed row
    * and its old row is dropped with the touched set.
    */
  def refreshGroups(view: DataFrame, snapshot: DataFrame, changes: DataFrame,
      groupCols: Seq[String])(recompute: DataFrame => DataFrame): DataFrame = {
    val touched = changes.select(groupCols.map(col): _*).distinct()
    val fresh = recompute(snapshot.join(touched, groupCols, "left_semi"))
    view.join(touched, groupCols, "left_anti").unionByName(fresh)
  }

  /** Fold a delta into the maintained view: union + re-aggregate (map-side
    * combinable), drop dead groups, and cast measures back to the view's
    * own types so repeated maintenance never widens the schema.
    */
  def merge(view: DataFrame, d: DataFrame, spec: Spec): DataFrame = {
    val measures = NCol +: spec.sums.map(_._1)
    val folded = view.unionByName(d)
      .groupBy(spec.keyCols.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
      .filter(col(NCol) =!= 0L)
    folded.select(spec.keyCols.map(col) ++ measures.map(m =>
      col(m).cast(view.schema(m).dataType).as(m)): _*)
  }
}

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

  /** Signed multiplicity column of Z-relation deltas ([[signed]]) and the
    * multiplicity column of counted views ([[counted]]) — one name, so
    * [[applyCounted]] can union them directly.
    */
  val SignCol = "_sign"

  /** SIGNED Z-RELATION projection of a feed slice (the ±1-multiplicity
    * algebra DBSP and differential dataflow publish): `insert` /
    * `update_postimage` rows carry +1, `delete` / `update_preimage` −1, so
    * an update is the sum of a retraction and an assertion and every
    * downstream operator only needs to be LINEAR in its input. Unknown
    * change types fail loudly (same contract as [[delta]]).
    */
  def signed(changes: DataFrame, cols: Seq[String]): DataFrame = {
    val sign = when(
      col(ChangeFeed.ChangeType).isin("insert", "update_postimage"), lit(1L))
      .when(col(ChangeFeed.ChangeType).isin("delete", "update_preimage"), lit(-1L))
    changes.select(cols.map(col) :+ coalesce(sign, raise_error(
      concat(lit("IncrementalView.signed: unknown change type "),
        col(ChangeFeed.ChangeType)))).as(SignCol): _*)
  }

  /** A snapshot's multiplicity-counted form: one row per distinct tuple
    * with its count — the representation a maintained JOIN view lives in
    * (join outputs are bags, not sets, once non-key columns are projected).
    */
  def counted(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).cast("long").as(SignCol))

  /** JOIN-VIEW DELTA — the bilinear rule over Z-relations:
    * Δ(A⋈B) = ΔA⋈B₀ + A₀⋈ΔB + ΔA⋈ΔB, signs multiplying through the join.
    * `aOld`/`bOld` are the PRE-commit snapshots (projected to joinCols +
    * payload, payload column sets disjoint); `dA`/`dB` are [[signed]] feed
    * slices with the same shapes. Cost is O(ΔA·B + A·ΔB) join work — the
    * deltas are batch-sized, so at 100 TB both delta-side joins broadcast
    * the delta and the view never pays an O(A·B) recompute. An absent delta
    * passes an empty frame and its two terms vanish.
    */
  def joinDelta(aOld: DataFrame, dA: DataFrame, bOld: DataFrame,
      dB: DataFrame, joinCols: Seq[String]): DataFrame = {
    val a0 = aOld.withColumn(SignCol, lit(1L))
    val b0 = bOld.withColumn(SignCol, lit(1L))
    def term(l: DataFrame, r: DataFrame): DataFrame = {
      val rr = r.withColumnRenamed(SignCol, "_sign_r")
      l.join(rr, joinCols)
        .withColumn(SignCol, col(SignCol) * col("_sign_r"))
        .drop("_sign_r")
    }
    term(dA, b0).unionByName(term(a0, dB)).unionByName(term(dA, dB))
  }

  /** Fold a signed delta into a counted view: union, re-count, drop tuples
    * whose multiplicity reaches zero. The counted twin of [[merge]].
    */
  def applyCounted(view: DataFrame, delta: DataFrame,
      cols: Seq[String]): DataFrame =
    view.unionByName(delta)
      .groupBy(cols.map(col): _*)
      .agg(sum(col(SignCol)).cast("long").as(SignCol))
      .filter(col(SignCol) =!= 0L)

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

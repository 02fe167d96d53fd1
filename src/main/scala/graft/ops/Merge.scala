package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full multi-clause MERGE INTO (SQL:2003 / Delta's complete surface —
  * `Upsert.merge` is the keyed-upsert special case): WHEN MATCHED
  * [AND cond] THEN UPDATE/DELETE, WHEN NOT MATCHED [AND cond] THEN
  * INSERT, WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE, with
  * SQL's clause-order semantics (the FIRST clause whose condition holds
  * wins for a row; later clauses never see it).
  *
  * Plan shape: ONE full-outer join of target and source on the merge
  * keys (aliased `t` / `s` — conditions and set expressions reference
  * `col("t.x")` / `col("s.x")`), side-presence via struct-nullness (the
  * [[ChangeFeed.diff]] convention, so null key values never masquerade
  * as absence), then a single projected when-chain per row. The merge
  * reads each side once and shuffles on the keys only — the same cost
  * envelope as the plain upsert; reference: dags/sql/merge_core.sql's
  * single-clause MERGE, generalized.
  *
  * The caller must route the result through [[VersionedTable.write]] or
  * [[ChangeFeed.commit]]; a duplicate source key per target row is the
  * caller's contract to prevent (same as SQL MERGE's cardinality rule) —
  * [[requireUniqueKeys]] is the explicit guard.
  */
object Merge {

  sealed trait Clause
  /** WHEN MATCHED [AND cond] THEN UPDATE SET col = expr, ... (unset
    * columns keep the target's value). */
  final case class MatchedUpdate(cond: Column, set: Map[String, Column]) extends Clause
  /** WHEN MATCHED [AND cond] THEN DELETE. */
  final case class MatchedDelete(cond: Column) extends Clause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT (all target columns must be
    * given). */
  final case class NotMatchedInsert(cond: Column, values: Map[String, Column]) extends Clause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE. */
  final case class NotMatchedBySourceDelete(cond: Column) extends Clause

  /** Fail fast when `df` carries duplicate merge keys — SQL MERGE's
    * cardinality violation, which would otherwise multiply target rows
    * through the join.
    */
  def requireUniqueKeys(df: DataFrame, keyCols: Seq[String], side: String): Unit = {
    val dups = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    require(dups == 0L, s"Merge: $side carries $dups duplicate merge keys")
  }

  /** Execute the merge; returns the NEW full target snapshot. */
  def merge(target: DataFrame, source: DataFrame, keyCols: Seq[String],
      clauses: Seq[Clause]): DataFrame = {
    val outCols = target.columns.toSeq
    val t = target.select(struct(outCols.map(col): _*).as("t"))
    val s = source.select(struct(source.columns.toSeq.map(col): _*).as("s"))
    val joined = t.join(s,
      keyCols.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _),
      "full_outer")
    val matched = col("t").isNotNull && col("s").isNotNull
    val notMatched = col("t").isNull
    val bySource = col("s").isNull

    // row survival + value: fold the clauses IN ORDER into one when-chain.
    // `keep` = the untouched target row; clause hits either rewrite it,
    // insert, or tombstone (null struct) it.
    val keep = col("t")
    def updated(set: Map[String, Column]): Column =
      struct(outCols.map(c => set.getOrElse(c, col(s"t.$c")).as(c)): _*)
    def inserted(values: Map[String, Column]): Column = {
      val missing = outCols.filterNot(values.contains)
      require(missing.isEmpty, s"Merge: INSERT must set all target columns, missing $missing")
      struct(outCols.map(c => values(c).as(c)): _*)
    }
    val tomb = lit(null).cast(target.schema)
    val result = clauses.foldLeft(when(lit(false), keep)) { (chain, cl) =>
      cl match {
        case MatchedUpdate(cond, set) => chain.when(matched && cond, updated(set))
        case MatchedDelete(cond) => chain.when(matched && cond, tomb)
        case NotMatchedInsert(cond, values) => chain.when(notMatched && cond, inserted(values))
        case NotMatchedBySourceDelete(cond) => chain.when(bySource && cond, tomb)
      }
    }.otherwise(when(notMatched, tomb).otherwise(keep))
    // ^ fall-through: unmatched-source rows with no insert clause vanish;
    //   matched / by-source rows with no applicable clause keep the target

    joined.select(result.as("r")).filter(col("r").isNotNull)
      .select(outCols.map(c => col(s"r.$c").as(c)): _*)
  }

  /** MERGE WITH SCHEMA EVOLUTION (Delta's `withSchemaEvolution` /
    * `schema.autoMerge` — public semantics): source columns the target
    * lacks WIDEN the target schema (existing rows read null); the merge
    * then runs UPDATE-SET-source-columns / INSERT-source-columns — an
    * update never nulls a target-only column the source doesn't carry,
    * an insert null-fills them. A same-named column whose type differs
    * fails LOUDLY — silent coercion is how merges corrupt tables
    * (lossless widening is [[TypeWidening]]'s job, a deliberate separate
    * commit). Cost envelope unchanged: the evolution is a plan-side
    * null-column projection, the merge is still one keyed full-outer
    * join.
    */
  def upsertEvolve(target: DataFrame, source: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val tCols = target.columns.toSeq
    source.schema.fields.filter(f => tCols.contains(f.name)).foreach { f =>
      val tt = target.schema(f.name).dataType
      require(tt == f.dataType,
        s"Merge.upsertEvolve: column ${f.name} type conflict ($tt vs ${f.dataType})")
    }
    val newCols = source.schema.fields.filterNot(f => tCols.contains(f.name))
    val evolved = newCols.foldLeft(target)((d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType)))
    val outCols = evolved.columns.toSeq
    val setCols = source.columns.toSeq.filterNot(keyCols.contains)
    merge(evolved, source, keyCols, Seq(
      MatchedUpdate(lit(true), setCols.map(c => c -> col(s"s.$c")).toMap),
      NotMatchedInsert(lit(true), outCols.map { c =>
        if (source.columns.contains(c)) c -> col(s"s.$c")
        else c -> lit(null).cast(evolved.schema(c).dataType)
      }.toMap)))
  }
}

package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MATERIALIZED-VIEW AUTO-REWRITE — the transparent aggregate-rollup
  * substitution every warehouse publishes (Calcite's materialized-view
  * rules, Snowflake/BigQuery MV rewrite, Databricks MV): a query that
  * aggregates the BASE table is answered from a registered summary table
  * when the plan PROVES derivability, turning an O(table) scan into an
  * O(groups) one. At 100 TB a (flag, status) summary is a few kilobytes —
  * the rewrite is the difference between re-scanning the fact table for
  * every dashboard refresh and reading a cached rollup.
  *
  * Sound scope (rewrite only when ALL hold):
  *   - the query is `Aggregate(G, aggs, base)` where `base` is exactly the
  *     registered base relation (optionally under an attribute-only
  *     pruning Project) — no filters, no joins in between;
  *   - every grouping expression is a plain base column ⊆ the MV's
  *     grouping columns (rollup subsumption);
  *   - every output is a grouping column or an aliased SUM(col) /
  *     COUNT(*) with a registered MV measure: SUM(x) re-sums `sum_x`,
  *     COUNT(*) re-sums `cnt` (the distributive-aggregate algebra; AVG
  *     callers derive sum÷count downstream, exactly like the IVM layer).
  *     DISTINCT and filtered aggregates never match.
  * Anything outside the envelope leaves the plan untouched — the negative
  * controls in q255 pin that.
  *
  * Freshness is the registrant's contract (a real catalog records the
  * base snapshot version and invalidates on commit — this library's
  * `IncrementalView.refreshTable` is the maintenance half); registrations
  * are session-global, so probes `clear()` in a finally.
  *
  * Output attribute ids are preserved through the rewrite (each replacement
  * is aliased under the original exprId), so parent operators re-resolve
  * nothing.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** A derivable MV measure. */
  sealed trait Measure { def mvCol: String }
  /** `COUNT(*)` stored as `mvCol`; queries re-sum it. */
  final case class CountStar(mvCol: String) extends Measure
  /** `SUM(inputCol)` stored as `mvCol`; queries re-sum it. */
  final case class SumOf(inputCol: String, mvCol: String) extends Measure

  private final case class Mv(basePath: String, mvPath: String,
      groupCols: Seq[String], measures: Seq[Measure])

  private val registry = TrieMap.empty[String, Mv]

  /** Register a summary table for `basePath`. `mvPath` must hold one row
    * per MV group with `groupCols` plus each measure's column.
    */
  def register(basePath: String, mvPath: String, groupCols: Seq[String],
      measures: Seq[Measure]): Unit =
    registry.put(basePath, Mv(basePath, mvPath, groupCols, measures))

  def clear(): Unit = registry.clear()

  /** Scheme-insensitive canonical form: the URI path with trailing
    * slashes stripped, so `file:/a/b`, `file:///a/b/` and `/a/b` all
    * compare EQUAL — and, crucially, nothing else does. A suffix match
    * here would silently rewrite a DIFFERENT table whose location happens
    * to end with the registered path (`/backup/data/events` vs
    * `/data/events`), producing wrong results with no error.
    */
  private def canonPath(p: String): String = {
    val path = new org.apache.hadoop.fs.Path(p).toUri.getPath
    val stripped = path.replaceAll("/+$", "")
    if (stripped.isEmpty) "/" else stripped
  }

  /** The registered MV whose base relation `plan` is, if any. */
  private def mvFor(plan: LogicalPlan): Option[Mv] = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      val roots = fs.location.rootPaths.map(p => canonPath(p.toString))
      registry.values.find(mv => roots.contains(canonPath(mv.basePath)))
    case Project(projList, child) if projList.forall(_.isInstanceOf[Attribute]) =>
      mvFor(child)
    case _ => None
  }

  /** Fresh analyzed plan of the MV table — new attribute ids per use, so
    * one query may be rewritten against the MV more than once. (A real
    * catalog caches the snapshot plan; the relist here is O(mv files).)
    */
  private def mvScan(path: String): LogicalPlan =
    SparkSession.active.read.parquet(path).queryExecution.analyzed

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        rewrite(agg, groupings, aggExprs, child).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] =
    mvFor(child).flatMap { mv =>
      // rollup subsumption: every query grouping is an MV grouping column
      val groupAttrs = groupings.map {
        case a: Attribute if mv.groupCols.contains(a.name) => Some(a)
        case _ => None
      }
      val scanOpt =
        if (groupAttrs.exists(_.isEmpty)) None
        else Some(mvScan(mv.mvPath)).filter(p =>
          // the MV table must actually carry every declared column
          (mv.groupCols ++ mv.measures.map(_.mvCol))
            .forall(c => p.output.exists(_.name == c)))
      scanOpt.flatMap { scan =>
        val mvOut = scan.output.map(a => a.name -> a).toMap
        def measureFor(fn: AggregateFunction): Option[Attribute] = fn match {
          case Count(Seq(Literal(_, _))) =>
            mv.measures.collectFirst { case CountStar(c) => mvOut(c) }
          case Sum(a: Attribute, _) =>
            mv.measures.collectFirst {
              case SumOf(in, c) if in == a.name => mvOut(c) }
          case _ => None
        }
        val rewritten = aggExprs.map {
          case a: Attribute if mv.groupCols.contains(a.name) =>
            Some(Alias(mvOut(a.name), a.name)(exprId = a.exprId))
          case al @ Alias(ae: AggregateExpression, name)
              if !ae.isDistinct && ae.filter.isEmpty =>
            measureFor(ae.aggregateFunction).flatMap { mvAttr =>
              val resum = ae.copy(aggregateFunction = Sum(mvAttr))
              // derivability must preserve the column's type exactly —
              // Sum(long)=long, Sum(double)=double; a changed type (e.g.
              // Sum(int)=long vs a stored int) would corrupt the schema
              if (resum.dataType == al.dataType)
                Some(Alias(resum, name)(exprId = al.exprId))
              else None
            }
          case _ => None
        }
        if (rewritten.exists(_.isEmpty)) None
        else Some(Aggregate(groupAttrs.flatten.map(a => mvOut(a.name)),
          rewritten.flatten, scan))
      }
    }
}

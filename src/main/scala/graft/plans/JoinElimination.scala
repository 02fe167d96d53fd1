package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Join elimination on provable key uniqueness — the optimization
  * RELY-style constraints buy in warehouse engines (Snowflake, Oracle,
  * BigQuery all publish it), restricted here to the case Spark can PROVE
  * instead of trust: a LEFT OUTER equi-join whose right side is
  * key-unique BY CONSTRUCTION (an Aggregate grouping exactly on the join
  * keys — which is also what `Distinct` optimizes to) and whose output is
  * never referenced above the join adds exactly zero rows and zero
  * columns — every left row survives exactly once. The join, its
  * exchange, and the entire right-side subtree (often a full dimension
  * scan) are dropped.
  *
  * Why it matters at 100 TB: generated BI layers and semantic models
  * routinely emit star joins for measures that end up touching only fact
  * columns; each eliminated dim is a scan + a build side + (for big dims)
  * a shuffle that never runs. The rule is SOUND, not trusted: a
  * non-unique right side (no aggregate) or any referenced right column
  * leaves the plan untouched.
  *
  * Runs in the user-provided optimizer batch (after ColumnPruning /
  * ReplaceDistinctWithAggregate), so the two shapes to match are
  * Project-over-Join and Aggregate-over-Join, with the right side
  * possibly wrapped in pruning Projects.
  */
object JoinElimination extends Rule[LogicalPlan] with PredicateHelper {

  /** Strip pruning projections (plain attribute lists) off the right
    * side, remapping the join-key attributes through them.
    */
  @scala.annotation.tailrec
  private def lookThrough(plan: LogicalPlan,
      keys: Seq[Attribute]): (LogicalPlan, Seq[Attribute]) = plan match {
    case Project(projList, child) if projList.forall(_.isInstanceOf[Attribute]) =>
      lookThrough(child, keys)
    case _ => (plan, keys)
  }

  /** Is `plan` provably unique on `keys`? True when it is an Aggregate
    * whose EVERY grouping expression is covered by a join key — grouping
    * on (a) is unique on (a); joining only on a subset of a wider
    * grouping set is not.
    */
  private def uniqueOn(plan: LogicalPlan, keys: Seq[Attribute]): Boolean = {
    val (p, ks) = lookThrough(plan, keys)
    p match {
      case Aggregate(groupingExprs, aggExprs, _, _) if groupingExprs.nonEmpty =>
        // map each join-key output attribute back to its grouping expression
        val keyed = ks.flatMap { k =>
          aggExprs.find(_.toAttribute.semanticEquals(k)).map {
            case a: Attribute => a: Expression
            case Alias(child, _) => child
            case other => other
          }
        }
        keyed.size == ks.size &&
          groupingExprs.forall(g => keyed.exists(_.semanticEquals(g)))
      case _ => false
    }
  }

  /** The right-side attributes of an all-equi-conjunct join condition
    * between `l` and `r`; None when any conjunct is not a plain
    * left-attr = right-attr equality.
    */
  private def rightKeys(cond: Expression, l: LogicalPlan,
      r: LogicalPlan): Option[Seq[Attribute]] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val keys = conjuncts.map {
      case EqualTo(a: Attribute, b: Attribute)
          if l.outputSet.contains(a) && r.outputSet.contains(b) => Some(b)
      case EqualTo(b: Attribute, a: Attribute)
          if l.outputSet.contains(a) && r.outputSet.contains(b) => Some(b)
      case _ => None
    }
    if (keys.forall(_.nonEmpty)) Some(keys.flatten) else None
  }

  private def dropIfDead(join: Join,
      refsAbove: AttributeSet): Option[LogicalPlan] = join match {
    case Join(l, r, LeftOuter, Some(cond), _)
        if refsAbove.subsetOf(l.outputSet) =>
      rightKeys(cond, l, r).filter(ks => uniqueOn(r, ks)).map(_ => l)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, j: Join) =>
      dropIfDead(j, AttributeSet(projList.flatMap(_.references)))
        .map(l => Project(projList, l)).getOrElse(p)
    case a @ Aggregate(groupingExprs, aggExprs, j: Join, _) =>
      dropIfDead(j, AttributeSet(
          (groupingExprs ++ aggExprs).flatMap(_.references)))
        .map(l => a.copy(child = l)).getOrElse(a)
  }
}

package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftcol
import org.apache.spark.sql.types.IntegerType

/** Custom whole-operator: top-k rows per group with a bounded heap.
  *
  * The built-in expression of this query shape —
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` — materializes
  * and FULLY SORTS every group before ranking, O(n log n) time and O(n)
  * memory per group, then throws away all but k rows. This operator keeps a
  * k-bounded heap per group: O(n log k) time, O(groups·k) memory, no sort
  * buffer spills — the difference between "sorts 100 TB" and "streams 100 TB
  * through fixed memory" when k is small. (SURVEY preference ladder (c): a
  * whole-operator semantic Spark's built-ins can't express efficiently.)
  *
  * Physical contract: requires clustering by the group keys (Spark inserts
  * the exchange via `requiredChildDistribution`); one pass per partition;
  * emits child columns + `rank` (1-based, by `order`). Ties: `order` must be
  * total (include a unique tiebreaker) for deterministic output — same
  * contract as QUALIFY row_number().
  */
case class TopKPerGroupNode(k: Int, groupExprs: Seq[Expression],
    order: Seq[SortOrder], rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  // rankAttr is a constructor param (not minted per instance): Catalyst
  // copies nodes freely, and the produced attribute's exprId must stay
  // stable or downstream references dangle.
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerGroupNode =>
      TopKPerGroupExec(n.k, n.groupExprs, n.order, n.rankAttr, planLater(n.child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
    order: Seq[SortOrder], rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) Seq(org.apache.spark.sql.catalyst.plans.physical.AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupsLocal = groupExprs
    val orderLocal = order
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitions({ iter =>
      val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      val groupProj = UnsafeProjection.create(groupsLocal, childOutput)
      val ordering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(orderLocal, childOutput)
      // max-heap of the kept rows, worst (largest under `ordering`) on top
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      while (iter.hasNext) {
        val row = toUnsafe(iter.next()) // reused buffer; copy on keep
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              ordering.asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(
        (childOutput :+ rankAttr).map(_.dataType).toArray)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        val kept: IndexedSeq[UnsafeRow] = heap.dequeueAll.toIndexedSeq
        kept.reverseIterator.zipWithIndex.map { pair: (UnsafeRow, Int) =>
          rankRow.update(0, pair._2 + 1)
          outProj(joined(pair._1, rankRow)): InternalRow
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** User-facing API + strategy registration. */
object TopK {

  /** Idempotently install the planner strategy into a live session. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[TopKStrategy.type]))
      spark.experimental.extraStrategies = cur :+ TopKStrategy
  }

  /** Top-k rows per group, ranked by `orderCols` (each (name, descending)).
    * Output = df's columns + `rank`.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val plan = graftcol.logicalPlan(df)
    def attr(name: String): Attribute = plan.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val order = orderCols.map { case (c, desc) =>
      SortOrder(attr(c), if (desc) Descending else Ascending)
    }
    graftcol.toDataFrame(spark,
      TopKPerGroupNode(k, groupCols.map(attr), order,
        AttributeReference("rank", IntegerType, nullable = false)(), plan))
  }
}

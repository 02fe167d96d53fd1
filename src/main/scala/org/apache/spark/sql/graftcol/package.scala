/** Bridge into Spark's Column internals.
  *
  * Spark 4 routes the public Column API through ColumnNode (the Connect
  * refactor); wrapping a raw Catalyst `Expression` into a `Column` now goes
  * through `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This file lives under the `org.apache.spark.sql` package
  * solely to re-export those two conversions for graft's native expressions
  * (the standard extension-library pattern; no Spark behavior is modified).
  */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

package object graftcol {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (resolved) logical plan — `Dataset.ofRows` is
    * `private[sql]`; needed to hand custom logical operators to the planner.
    */
  def toDataFrame(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}

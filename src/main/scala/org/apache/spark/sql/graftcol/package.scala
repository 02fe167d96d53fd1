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
}

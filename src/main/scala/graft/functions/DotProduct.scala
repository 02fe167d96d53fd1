package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftcol.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: in-order double dot product over two numeric
  * arrays (`ARRAY<FLOAT>` or `ARRAY<DOUBLE>`, independently per side).
  *
  * Why a custom expression instead of `aggregate(zip_with(...))`: Spark's
  * higher-order functions evaluate their lambda interpreted, one function
  * call per element, and the zip materializes an intermediate array per row.
  * This expression generates a tight primitive loop inside whole-stage
  * codegen — the hot path of every cosine similarity in [[graft.similarity.Knn]]
  * (Q·N pair evaluations at 64 doubles each).
  *
  * Numeric contract (oracle parity): accumulation is a sequential left fold
  * in index order with each element widened to double before the multiply —
  * bit-identical to the `aggregate(zip_with(cast(a as array<double>), ...))`
  * formulation and to DuckDB's `list_dot_product` on `DOUBLE[]`.
  *
  * Returns null if either side is null; folds over min(len(a), len(b)).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var acc = 0d
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point: `dot_product(a, b)`. */
  def apply(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftcol.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Shared algorithm body (interpreted eval + generated code call the same
  * static method — the NfcNormalizeAlgo pattern).
  *
  * The classic xy→d walk of the 2-D Hilbert curve (public algorithm — the
  * quadrant-rotation formulation described on the "Hilbert curve" Wikipedia
  * page and in Hamilton's "Compact Hilbert Indices" TR-2006): descend from
  * the top bit, accumulate the sub-square index, and rotate/reflect the
  * coordinate frame so each quadrant is traversed in curve order.
  */
object HilbertAlgo {
  /** Map bucket coords (x, y) ∈ [0, 2^bits)² to their Hilbert distance. */
  def xy2d(bits: Int, xIn: Long, yIn: Long): Long = {
    var x = xIn; var y = yIn
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the frame so the next level's quadrants walk in curve order
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Native Catalyst expression: 2-D Hilbert-curve index of two pre-scaled
  * bucket coordinates (see [[graft.ops.Layout.rangeBucket]]).
  *
  * Why a Hilbert option next to Z-order: Morton interleaving has long
  * "jumps" — adjacent key ranges can span opposite corners of the value
  * space, so a file's min/max box over a Z range is loose, and the effect
  * worsens when the two dimensions have very different cardinalities. The
  * Hilbert curve is fully locality-preserving (every step moves one cell),
  * so equal key ranges cover tighter boxes and file/row-group min/max stats
  * prune harder — the reason Delta Lake added `HILBERT` clustering next to
  * `ZORDER` (public Delta docs/literature). Pure long arithmetic inside
  * whole-stage codegen; a UDF here would break the write pipeline's stage.
  *
  * Out-of-range buckets are the caller's bug, not silently wrapped: inputs
  * must already be clamped by rangeBucket.
  */
case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert bits must fit 2 dims in a long: $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_xy2d expects (bigint, bigint) bucket coords, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertAlgo.xy2d(bits, l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.HilbertAlgo.xy2d($bits, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2D {
  /** Column-API entry point: `hilbert_xy2d(xBucket, yBucket, bits)`. */
  def apply(x: Column, y: Column, bits: Int): Column =
    toColumn(HilbertIndex2D(toExpression(x), toExpression(y), bits))
}

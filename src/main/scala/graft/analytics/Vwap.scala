package graft.analytics

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` (SURVEY §2.10): volume-weighted average price — the
  * market-data measure the DAX surface implies (`SUMX(VOLUME*CLOSE)` /
  * `SUM(VOLUME)`, dax_measures.md:25,30) packaged as a reusable named
  * aggregate.
  *
  * Numeric contract matches the engine-wide discipline: the buffer holds
  * exact decimal partial sums (associative and commutative, so partial
  * aggregation and merge order cannot perturb the result), with one
  * double division in `finish` — identical to the SQL formulation
  * `CAST(SUM(px*qty AS DECIMAL) AS DOUBLE) / CAST(SUM(qty AS DECIMAL) AS
  * DOUBLE)` in any engine.
  */
object Vwap extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

  private def dec6(d: Double): JBigDecimal =
    // same value Spark's cast(double as decimal(18,6)) produces:
    // shortest-representation BigDecimal, then scale-6 HALF_UP
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) = (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal), in: (Double, Double)): (JBigDecimal, JBigDecimal) = {
    val (price, qty) = in
    val p = dec6(price); val q = dec6(qty)
    (b._1.add(p.multiply(q)), b._2.add(q))
  }

  override def merge(a: (JBigDecimal, JBigDecimal), b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(b: (JBigDecimal, JBigDecimal)): Double =
    if (b._2.signum() == 0) 0d else b._1.doubleValue() / b._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Untyped Column form: `vwap(price, qty)` over double columns. */
  def column(price: Column, qty: Column): Column =
    udaf(Vwap).apply(price, qty)
}

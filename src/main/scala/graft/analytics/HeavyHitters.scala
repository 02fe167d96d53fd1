package graft.analytics

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy hitters (SURVEY §2.10 family): the bounded-state
  * frequent-items summary — at most `k` counters regardless of stream
  * length, where an exact per-term count would shuffle every distinct term.
  * The 100 TB use case is corpus curation: dominant domains / boilerplate
  * tokens / hot keys surface from one combiner-friendly pass with constant
  * per-partition state.
  *
  * Guarantees (Misra & Gries '82; merge form Agarwal et al. '13,
  * "Mergeable Summaries"): after summarizing a stream of length n with
  * capacity k, (1) every item with true count > n/k is present, and
  * (2) every estimate undercounts by at most n/k:
  * `true − n/k ≤ estimate ≤ true`. Both properties survive arbitrary
  * partial-aggregation merge trees, so the summary is safe under Spark's
  * map-side combine. The MERGE step sums counters pairwise and, when more
  * than k survive, subtracts the (k+1)-th largest value from all (the
  * offset trick that preserves the error bound), keeping only positives.
  *
  * Like every sketch in this engine, the summary itself is never
  * oracle-compared (counter sets are merge-path dependent); q137 `require`s
  * the two theorems against exact counts in-query and returns the exact
  * top-k for DuckDB.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1L)
      case None if buf.size < k => buf.updated(term, 1L)
      case None => // decrement-all step: drops counters that reach zero
        buf.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (summed.size <= k) summed
    else {
      val offset = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (t, c) => if (c > offset) Some(t -> (c - offset)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    implicitly(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]())

  override def outputEncoder: Encoder[Map[String, Long]] =
    implicitly(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]())
}

object MisraGries {
  /** Untyped Column form: `heavy_hitters(term)` with capacity `k`. */
  def column(k: Int, term: Column): Column = udaf(new MisraGries(k)).apply(term)
}

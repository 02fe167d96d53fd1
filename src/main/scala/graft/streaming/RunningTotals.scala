package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Arbitrary stateful processing via Spark 4's `transformWithState` — the
  * successor API to `flatMapGroupsWithState` (SPARK-46815): typed state
  * variables are declared against a `StatefulProcessorHandle` instead of a
  * single state object, which is what lets the engine store each variable
  * (values, lists, maps, timers) as its own column family in RocksDB and
  * evolve them independently.
  *
  * The operator: per-key running totals (count + id sum) across
  * micro-batches, emitting one cumulative snapshot per key per batch that
  * touches it. The batch twin is a plain groupBy aggregation over each
  * prefix of the input — so every emitted row is SQL-replayable, and the
  * LAST snapshot per key must equal the full-input aggregate exactly
  * (required in-query by q188).
  *
  * State is O(1) per key (two longs). transformWithState requires the
  * RocksDB state store provider — the same provider q186 already proves
  * semantics-neutral for the windowed path.
  */
object RunningTotals {

  case class In(etype: String, eventId: Long)
  case class Out(etype: String, n_total: Long, id_sum: Long)
  // Must be publicly visible: Janino-generated encoder code resolves the
  // constructor reflectively from a different classloader package, and a
  // `private` modifier makes codegen fail ("no applicable constructor") and
  // silently fall back to interpreted serialization on the per-row state
  // hot path. EncoderCodegenSpec pins CODEGEN_ONLY for all graft encoders.
  case class Tot(n: Long, idSum: Long)

  class Processor extends StatefulProcessor[String, In, Out] {
    @transient private var tot: ValueState[Tot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      tot = getHandle.getValueState[Tot]("tot", Encoders.product[Tot], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      var st = if (tot.exists()) tot.get() else Tot(0L, 0L)
      var touched = false
      rows.foreach { r =>
        touched = true
        st = Tot(st.n + 1L, st.idSum + r.eventId)
      }
      if (!touched) Iterator.empty
      else {
        tot.update(st)
        Iterator.single(Out(key, st.n, st.idSum))
      }
    }
  }

  def totals(events: Dataset[In]): Dataset[Out] = {
    implicit val outEnc: Encoder[Out] = Encoders.product[Out]
    events.groupByKey(_.etype)(Encoders.STRING)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append(), outEnc)
  }
}

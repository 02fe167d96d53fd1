package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ordered-pattern detection (CEP-lite, the MATCH_RECOGNIZE shape): emit a
  * match for every `purchase` chained to the latest qualifying `click`
  * (click ≤ purchase, within `stepUs`) that is itself anchored to the latest
  * qualifying `view` (view ≤ click, within `stepUs`).
  *
  * Pattern instances may share a prefix (two purchases can chain to one
  * click) — the non-consuming semantics that make the operator exactly
  * SQL-replayable: the batch twin is two keyed max-joins, which is also the
  * 100 TB backfill plan (no per-event state machine needed offline).
  *
  * Streaming state is O(1) PER KEY — three longs: the latest view, and the
  * latest anchored (click, view) pair. Because each micro-batch is processed
  * in event-time order and "latest qualifying X" is monotone, holding only
  * the latest candidate is lossless: if the stored click is too old for a
  * purchase, every earlier click is older still. Production bounds key count
  * with a state TTL (ProcessingTimeTimeout); the demo keeps NoTimeout so the
  * cross-batch chains stay observable.
  */
object Cep {

  case class CepEvent(key: Long, tsUs: Long, etype: String)
  /** -1 sentinels = "none yet"; ancViewUs/ancClickUs move together.
    * (hwmUs, hwmPrio) is a per-key high-water mark over the TOTAL processing
    * order (ts, pattern-priority): "latest qualifying X" state is only
    * lossless when each key's events arrive in that order ACROSS
    * micro-batches (within a batch we sort by it). Rather than leave the
    * precondition implied, events below the high-water mark are dropped —
    * the same convention a watermark applies to late data. Tracking the
    * priority in the mark (not just ts) makes the equal-timestamp case
    * exact: a purchase in a later batch at the ts of an already-processed
    * click still chains (it is ≥ in pattern order), while a view arriving
    * AFTER a same-instant click was processed is pattern-order-late — the
    * batch twin would have anchored that click to it, so admitting it could
    * not converge anyway; it is dropped as late, deterministically, instead
    * of half-applied.
    */
  case class CepState(lastViewUs: Long, ancViewUs: Long, ancClickUs: Long,
                      hwmUs: Long, hwmPrio: Int)
  case class CepMatch(key: Long, v_us: Long, c_us: Long, p_us: Long)

  /** Same-instant events process in pattern order (view < click < purchase),
    * matching the batch twin's `<=` bounds.
    */
  private val prio = Map("view" -> 0, "click" -> 1, "purchase" -> 2)

  def matches(events: Dataset[CepEvent], stepUs: Long): Dataset[CepMatch] = {
    implicit val outEnc = Encoders.product[CepMatch]
    implicit val stEnc = Encoders.product[CepState]
    events.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[CepState, CepMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[CepEvent], state: GroupState[CepState]) =>
          var st = state.getOption.getOrElse(
            CepState(-1L, -1L, -1L, Long.MinValue, Int.MinValue))
          val out = scala.collection.mutable.ListBuffer.empty[CepMatch]
          it.toSeq.sortBy(e => (e.tsUs, prio.getOrElse(e.etype, 3))).foreach { e =>
            val p = prio.getOrElse(e.etype, 3)
            // cross-batch order guard: drop events below this key's
            // high-water mark in (ts, pattern-priority) order — same-instant
            // events still process iff they arrive in pattern order, exactly
            // the order the within-batch sort (and the batch twin) uses.
            // Belt-and-braces, the state updates below are ALSO monotone
            // (max / only-if-newer), so an exact-duplicate replay is
            // idempotent regardless.
            if (e.tsUs > st.hwmUs || (e.tsUs == st.hwmUs && p >= st.hwmPrio)) {
              st = if (e.tsUs > st.hwmUs) st.copy(hwmUs = e.tsUs, hwmPrio = p)
                   else st.copy(hwmPrio = math.max(st.hwmPrio, p))
              e.etype match {
                case "view" =>
                  st = st.copy(lastViewUs = math.max(st.lastViewUs, e.tsUs))
                case "click"
                    if st.lastViewUs >= 0 && e.tsUs - st.lastViewUs <= stepUs &&
                       e.tsUs >= st.ancClickUs =>
                  st = st.copy(ancViewUs = st.lastViewUs, ancClickUs = e.tsUs)
                case "purchase"
                    if st.ancClickUs >= 0 && e.tsUs >= st.ancClickUs &&
                       e.tsUs - st.ancClickUs <= stepUs =>
                  out += CepMatch(key, st.ancViewUs, st.ancClickUs, e.tsUs)
                case _ => () // unanchored click / unmatched purchase / other
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }
}

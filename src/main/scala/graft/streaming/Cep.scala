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

  /** State for the QUANTIFIED pattern `A B+ C` (below): the latest A, the
    * current B-run (anchor A, first/last B, count, anchored?), and the
    * (ts, prio) high-water mark. Still O(1) per key — the + quantifier
    * adds a counter, not a buffer, because runs are contiguous.
    */
  case class RunState(lastA: Long, anchorA: Long, bFirst: Long, bLast: Long,
                      nB: Long, anchored: Boolean, hwmUs: Long, hwmPrio: Int)
  case class RunMatch(key: Long, a_us: Long, b_first_us: Long,
                      b_last_us: Long, n_b: Long, c_us: Long)

  /** Quantified ordered pattern — SQL:2016 MATCH_RECOGNIZE's
    * `PATTERN (A B+ C)` with per-adjacency gap bound `stepUs` and
    * non-consuming (SKIP TO NEXT ROW) semantics, generalizing [[matches]]'
    * hard-coded 3-step chain: a C event emits one match for the CURRENT
    * B-run — the maximal contiguous sequence of B's (inter-B gap ≤ step,
    * no A in between) whose first B lies within step of the latest
    * preceding A — carrying the full quantifier evidence (first/last B
    * and the B count).
    *
    * Run-break rules make the state O(1) and the operator exactly
    * window-replayable (the oracle's gaps-and-islands form): a new B
    * starts a fresh run when the gap exceeds step OR an A intervened
    * (lastA > bLast); the fresh run is anchored iff it starts within step
    * of that A. An unanchorable B still REPLACES the run (as an unanchored
    * island) rather than being ignored — "latest island" is what the
    * batch twin sees, so keeping a stale anchored run would diverge.
    * Same-instant events process in pattern order (A < B < C) and the
    * (ts, prio) high-water mark drops pattern-order-late cross-batch
    * arrivals, exactly as [[matches]] does.
    */
  def quantified(events: Dataset[CepEvent], aType: String, bType: String,
      cType: String, stepUs: Long): Dataset[RunMatch] = {
    implicit val outEnc = Encoders.product[RunMatch]
    implicit val stEnc = Encoders.product[RunState]
    val qprio = Map(aType -> 0, bType -> 1, cType -> 2)
    events.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[RunState, RunMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[CepEvent], state: GroupState[RunState]) =>
          var st = state.getOption.getOrElse(
            RunState(-1L, -1L, -1L, -1L, 0L, false, Long.MinValue, Int.MinValue))
          val out = scala.collection.mutable.ListBuffer.empty[RunMatch]
          it.toSeq.sortBy(e => (e.tsUs, qprio.getOrElse(e.etype, 3))).foreach { e =>
            val p = qprio.getOrElse(e.etype, 3)
            if (e.tsUs > st.hwmUs || (e.tsUs == st.hwmUs && p >= st.hwmPrio)) {
              st = if (e.tsUs > st.hwmUs) st.copy(hwmUs = e.tsUs, hwmPrio = p)
                   else st.copy(hwmPrio = math.max(st.hwmPrio, p))
              e.etype match {
                case `aType` =>
                  st = st.copy(lastA = math.max(st.lastA, e.tsUs))
                case `bType` =>
                  if (st.nB > 0 && e.tsUs - st.bLast <= stepUs &&
                      st.lastA <= st.bLast) // contiguous: in gap, no A between
                    st = st.copy(bLast = e.tsUs, nB = st.nB + 1)
                  else // new island; anchored iff within step of the latest A
                    st = st.copy(anchorA = st.lastA, bFirst = e.tsUs,
                      bLast = e.tsUs, nB = 1L,
                      anchored = st.lastA >= 0 && e.tsUs - st.lastA <= stepUs)
                case `cType`
                    if st.nB > 0 && st.anchored &&
                       e.tsUs - st.bLast <= stepUs =>
                  out += RunMatch(key, st.anchorA, st.bFirst, st.bLast,
                    st.nB, e.tsUs)
                case _ => () // unmatched C / foreign type
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** The batch twin of [[quantified]] — the gaps-and-islands window form a
    * 100 TB backfill runs (no state machine): latest-A per event, B-island
    * assignment (break on gap or intervening A), per-island running
    * evidence, then each C picks the last B row at or before it.
    */
  def quantifiedBatch(events: org.apache.spark.sql.DataFrame, aType: String,
      bType: String, cType: String, stepUs: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ev = events // (key, tsUs, etype)
      .withColumn("prio",
        when(col("etype") === aType, 0).when(col("etype") === bType, 1)
          .when(col("etype") === cType, 2).otherwise(3))
      .filter(col("prio") <= 2)
    val wOrd = Window.partitionBy(col("key")).orderBy(col("tsUs"), col("prio"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withA = ev.withColumn("lastA",
      max(when(col("prio") === 0, col("tsUs"))).over(wOrd))
    val wb = Window.partitionBy(col("key")).orderBy(col("tsUs"))
    val bs = withA.filter(col("prio") === 1)
      .withColumn("prevB", lag(col("tsUs"), 1).over(wb))
      .withColumn("newi", (col("prevB").isNull ||
        col("tsUs") - col("prevB") > stepUs ||
        col("lastA") > col("prevB")).cast("long"))
      .withColumn("island", sum(col("newi"))
        .over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wi = Window.partitionBy(col("key"), col("island")).orderBy(col("tsUs"))
    val b4 = bs
      .withColumn("bFirst", first(col("tsUs")).over(wi))
      .withColumn("nSoFar", count(lit(1))
        .over(wi.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("anchorA", first(col("lastA")).over(wi))
      .withColumn("anchored", first(col("lastA")).over(wi).isNotNull &&
        col("bFirst") - first(col("lastA")).over(wi) <= stepUs)
    val runT = "struct<anchorA:bigint,bFirst:bigint,bLast:bigint,nSoFar:bigint,anchored:boolean>"
    val u = b4.select(col("key"), col("tsUs"), lit(1).as("prio"),
        struct(col("anchorA"), col("bFirst"), col("tsUs").as("bLast"),
          col("nSoFar"), col("anchored")).as("run"))
      .unionByName(ev.filter(col("prio") === 2)
        .select(col("key"), col("tsUs"), lit(2).as("prio"),
          lit(null).cast(runT).as("run")))
    val wu = Window.partitionBy(col("key"))
      .orderBy(col("tsUs"), col("prio"), coalesce(col("run.nSoFar"), lit(0L)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("r", last(col("run"), ignoreNulls = true).over(wu))
      .filter(col("prio") === 2 && col("r").isNotNull && col("r.anchored") &&
        col("tsUs") - col("r.bLast") <= stepUs)
      .select(col("key"), col("r.anchorA").as("a_us"),
        col("r.bFirst").as("b_first_us"), col("r.bLast").as("b_last_us"),
        col("r.nSoFar").as("n_b"), col("tsUs").as("c_us"))
  }

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

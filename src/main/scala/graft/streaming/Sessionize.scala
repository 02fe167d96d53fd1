package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — assign events to sessions that close after
  * `gap` of inactivity. Two equivalent implementations:
  *
  *  - [[batch]]: the classic window formulation — per key, a session starts
  *    where the gap from the previous event exceeds the threshold; session id
  *    = running count of session starts (`lag` + conditional `sum`). One
  *    shuffle on the key; exactly the plan a 100 TB backfill wants.
  *  - [[stateful]]: `flatMapGroupsWithState` for the live stream — state is
  *    one (open-session aggregate) per key, emitted and cleared on timeout.
  *    The streaming-native form the reference's daily micro-batch would grow
  *    into with sub-day latency requirements.
  *
  * The batch form is the oracle for the streaming form (see SessionizeSpec).
  */
object Sessionize {

  /** Per-event session assignment: adds `session_id` (1-based per key) —
    * deterministic integer arithmetic, engine-portable.
    */
  def batch(events: DataFrame, keyCol: String, tsCol: String, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    val gapUs = gapMinutes * 60L * 1000000L
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isStart = when(prev.isNull ||
      (unix_micros(col(tsCol)) - prev) > gapUs, 1).otherwise(0)
    events.withColumn("__start", isStart)
      .withColumn("session_id", sum(col("__start")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("int"))
      .drop("__start")
  }

  /** Session summaries from the batch assignment: one row per (key, session). */
  def batchSummary(events: DataFrame, keyCol: String, tsCol: String,
      gapMinutes: Int): DataFrame =
    batch(events, keyCol, tsCol, gapMinutes)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"))

  case class SessionEvent(key: Long, tsUs: Long)
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(key: Long, session_id: Int, n_events: Long,
      start_us: Long, end_us: Long)

  /** Streaming sessionization with explicit state: emits a session once the
    * event-time gap to the next event exceeds the threshold. Each key's
    * final session stays open in state (production closes it via a state
    * timeout); the spec checks closed sessions against the batch oracle.
    */
  def stateful(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[SessionOut] = {
    val gapUs = gapMinutes * 60L * 1000000L
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[(List[SessionState], Int)]
    events.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[(List[SessionState], Int), SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[SessionEvent],
            state: GroupState[(List[SessionState], Int)]) =>
          // micro-batch arrives unordered: sort this batch's events; state
          // carries the open session and the next session ordinal
          val (openList, nextId0) = state.getOption.getOrElse((Nil, 1))
          var open = openList.headOption
          var nextId = nextId0
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          it.toSeq.sortBy(_.tsUs).foreach { e =>
            open match {
              case Some(s) if e.tsUs - s.end <= gapUs =>
                open = Some(SessionState(s.start, e.tsUs, s.n + 1))
              case Some(s) =>
                out += SessionOut(key, nextId, s.n, s.start, s.end)
                nextId += 1
                open = Some(SessionState(e.tsUs, e.tsUs, 1))
              case None =>
                open = Some(SessionState(e.tsUs, e.tsUs, 1))
            }
          }
          state.update((open.toList, nextId))
          out.iterator
      }
  }

}

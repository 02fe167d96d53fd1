package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** EVENT-TIME TIMERS via `transformWithState` — the half of Spark 4's
  * arbitrary-state API that [[RunningTotals]] (q188) does not touch:
  * per-key timers registered against the EVENT clock, fired by watermark
  * passage, checkpoint-durable across restarts. The operator is the
  * classic inactivity detector every session/SLA pipeline needs: each
  * event RESETS its user's timer to `lastSeen + gap`; when the watermark
  * passes an unreset timer the user has provably been quiet for the gap
  * (modulo allowed lateness) and ONE timeout record (user, last activity,
  * events since last timeout) is emitted, state cleared — a later event
  * starts a fresh episode.
  *
  * Why timers and not a windowed aggregate: the emission condition is the
  * ABSENCE of data, which no per-row operator can observe — only the
  * watermark (a global lower bound on future event times) can prove a
  * negative. State is O(1) per live user (three longs + one timer), and
  * dead users leave the store at timeout — the state-boundedness the
  * q104-class entries pin for windows, delivered here by timers.
  *
  * Determinism contract (the oracle replays it): with one data batch per
  * run, a timer fires in run R's watermark-advance batch iff
  * `floor(lastUs/1000) + gapMs <= floor(maxSeenUs/1000) - delayMs` — the
  * millisecond arithmetic Spark's watermark tracker uses.
  */
object InactivityTimeout {

  // public for the same Janino-codegen reason as RunningTotals.Tot
  case class Seen(n: Long, maxUs: Long, timerMs: Long)
  case class Timeout(user_id: Long, last_us: Long, n_events: Long)

  class Detector(gapMs: Long) extends StatefulProcessor[Long, (Long, Long), Timeout] {
    @transient private var seen: ValueState[Seen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Seen]("seen", Encoders.product[Seen],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[Timeout] = {
      var st = if (seen.exists()) seen.get() else Seen(0L, Long.MinValue, 0L)
      rows.foreach { case (_, us) =>
        st = Seen(st.n + 1L, math.max(st.maxUs, us), st.timerMs)
      }
      if (st.timerMs > 0L) getHandle.deleteTimer(st.timerMs) // reset, not stack
      val timerMs = st.maxUs / 1000L + gapMs
      getHandle.registerTimer(timerMs)
      seen.update(Seen(st.n, st.maxUs, timerMs))
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Timeout] = {
      val st = seen.get()
      seen.clear() // episode over — a revenant user starts fresh
      Iterator.single(Timeout(key, st.maxUs, st.n))
    }
  }

  /** Timeouts over `events(user_id, ts, …)`: one record per episode whose
    * user stayed quiet for `gapMs` within the watermark's proof horizon.
    */
  def detect(events: DataFrame, gapMs: Long, delay: String): Dataset[Timeout] = {
    val s = events.sparkSession
    implicit val inEnc: Encoder[(Long, Long)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc: Encoder[Timeout] = Encoders.product[Timeout]
    events.withWatermark("ts", delay)
      .select(col("user_id").cast("long"), unix_micros(col("ts")))
      .as[(Long, Long)]
      .groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new Detector(gapMs), TimeMode.EventTime(),
        OutputMode.Append(), outEnc)
  }
}

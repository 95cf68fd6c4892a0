package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/**
 * Operators on Spark 4's `transformWithState` (state-v2) API — the
 * successor to `flatMapGroupsWithState` with named state variables,
 * first-class EVENT-TIME timers, and per-state TTL, backed by the RocksDB
 * state store. Where the `flatMapGroupsWithState` sessionizer
 * ([[EventTimeOps.sessionizeStreaming]]) closes sessions on
 * processing-time quiet gaps (wall-clock dependent), this one closes them
 * on the WATERMARK — replay the same data and the same sessions come out,
 * which is the property a backfill-then-streaming pipeline needs.
 *
 * Requires `spark.sql.streaming.stateStore.providerClass =
 * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
 * (transformWithState does not run on the default HDFS-backed store).
 */
object TwsOps {

  case class TwsEvent(key: String, ts: java.sql.Timestamp)
  case class TwsSessionState(startMs: Long, lastMs: Long, n: Long)
  case class TwsSession(key: String, start_ms: Long, end_ms: Long,
    n_events: Long)

  /**
   * Event-time gap sessionizer. A session closes two ways:
   *
   *  - DATA-driven: a new event more than `gapMs` past the open session's
   *    last event proves the gap — the old session emits in the same
   *    batch and the event starts a fresh one (events inside a batch
   *    process in ts order, so one batch can close several sessions);
   *  - TIMER-driven: the final session of a key, which no later event
   *    will ever close, flushes when the WATERMARK passes
   *    (last event time + gapMs) — an event-time timer, re-armed on every
   *    extension (the stale timer is deleted; a late-fired stale timer
   *    no-ops against the expiry guard).
   *
   * One ValueState row per OPEN session and one timer per key — state is
   * bounded by concurrently open sessions, not history. Late rows under
   * the watermark are dropped by the engine before the processor, so
   * extents are replay-deterministic.
   */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, TwsEvent, TwsSession] {
    @transient private var sess: ValueState[TwsSessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[TwsSessionState]("sess",
        Encoders.product[TwsSessionState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TwsEvent],
        timers: TimerValues): Iterator[TwsSession] = {
      val cur = if (sess.exists()) sess.get() else null
      var open = cur
      val closed = scala.collection.mutable.ArrayBuffer.empty[TwsSession]
      rows.map(_.ts.getTime).toArray.sorted.foreach { t =>
        open match {
          case null =>
            open = TwsSessionState(t, t, 1L)
          case st if t <= st.lastMs + gapMs =>
            open = TwsSessionState(math.min(st.startMs, t),
              math.max(st.lastMs, t), st.n + 1L)
          case st => // the gap is proven by this event: close, start anew
            closed += TwsSession(key, st.startMs, st.lastMs, st.n)
            open = TwsSessionState(t, t, 1L)
        }
      }
      if (cur != null) getHandle.deleteTimer(cur.lastMs + gapMs)
      if (open != null) {
        sess.update(open)
        getHandle.registerTimer(open.lastMs + gapMs)
      }
      closed.iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[TwsSession] = {
      if (!sess.exists()) return Iterator.empty
      val st = sess.get()
      // only the session's CURRENT close timer may emit; an undeleted
      // stale timer (earlier extent) fires into this guard and no-ops
      if (expired.getExpiryTimeInMs < st.lastMs + gapMs) return Iterator.empty
      sess.clear()
      Iterator.single(TwsSession(key, st.startMs, st.lastMs, st.n))
    }
  }

  /** Sessionize `(keyCol, tsCol)` rows with watermark-driven closes. */
  def sessionizeTws(df: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long, delay: String): Dataset[TwsSession] = {
    require(gapMs > 0L, "gapMs must be positive")
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", delay)
      .as[TwsEvent]
      .groupByKey(_.key)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[TwsSession])
  }
}

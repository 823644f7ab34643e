package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator: gap-based sessionization via
  * `flatMapGroupsWithState` — the escape hatch for session semantics richer
  * than `session_window` can express (per-session aggregates beyond
  * count/sum, emit-on-close, custom timeout policy).
  *
  * State per user is O(1) (the open session's aggregate, not its events);
  * closed sessions are emitted exactly when the event-time timeout fires,
  * so output is append-mode friendly. The batch analog
  * (`ts_window_session`, oracle-checked) pins the same gap semantics.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)

  final case class OpenSession(start: Long, end: Long, n: Int, total: Double)

  final case class ClosedSession(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Int,
      total_value: Double)

  /** Sessionize an event stream: sessions close after `gapMs` of user
    * inactivity (event time, driven by the stream's watermark). */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // Watermark passed the open session's end + gap: close and emit.
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
              s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end < gapMs =>
                  open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= ClosedSession(userId,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
                    s.n, s.total)
                  open = Some(OpenSession(t, t, 1, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}

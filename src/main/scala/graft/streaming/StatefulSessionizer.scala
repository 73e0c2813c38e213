package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event for the custom-state sessionizer (schema of the minimal stream). */
case class SessEvent(event_id: Long, user_id: Long, ts: Timestamp)

/** Open-session state per user: bounds in epoch millis + event count. */
case class SessionState(start: Long, end: Long, n: Long)

/** A completed session as emitted downstream. */
case class SessionOut(user_id: Long, start: Timestamp, end: Timestamp, n: Long)

/** Custom-state streaming sessionization — the `flatMapGroupsWithState` +
  * `EventTimeTimeout` formulation of the 30-minute-gap rule the graded batch
  * queries use (q_win_session_ids / q_session_stats; gap >= 30 min starts a
  * new session, matching `session_window`'s merge horizon).
  *
  * A session is emitted when either a later event of the same user opens the
  * next one (mid-batch closure) or the event-time watermark passes the
  * session's horizon (`end + gap` — the timeout path, which is what closes
  * the LAST session of every user). This is the (c)-tier stateful-streaming
  * surface `session_window` cannot express: arbitrary per-group state with
  * explicit timeout control, e.g. for emitting enriched session records or
  * non-window state machines.
  *
  * Scale: state is one tiny fixed-size record per ACTIVE user (closed
  * sessions leave state immediately); the stream shuffles once on user_id.
  * Watermark-expired state is the engine's responsibility — nothing grows
  * with history.
  */
object StatefulSessionizer extends Serializable {

  val GapMs = 1800000L

  /** The state-machine fold; public so the spec can also unit-call it. */
  def fold(user: Long, events: Iterator[SessEvent],
           state: GroupState[SessionState]): Iterator[SessionOut] =
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(
        SessionOut(user, new Timestamp(s.start), new Timestamp(s.end), s.n))
    } else {
      // Micro-batch delivery is unordered; restore event-time order before
      // folding the gap rule.
      val sorted = events.toArray.sortBy(_.ts.getTime)
      val closed = Seq.newBuilder[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur = cur match {
          case Some(s) if t - s.end < GapMs =>
            // min() on start makes the fold order-insensitive within a
            // session: a late event delivered in a later micro-batch with
            // t < s.start (legal inside the watermark delay) must extend the
            // session backwards, exactly as the batch oracle's global sort
            // would have placed it.
            Some(SessionState(math.min(s.start, t), math.max(s.end, t), s.n + 1))
          case Some(s) =>
            closed += SessionOut(user,
              new Timestamp(s.start), new Timestamp(s.end), s.n)
            Some(SessionState(t, t, 1))
          case None => Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // Horizon = last event + gap: any on-time event after it would
        // start a NEW session, so this one is closable once the watermark
        // passes the horizon.
        state.setTimeoutTimestamp(s.end + GapMs)
      }
      closed.result().iterator
    }

  /** Wires the fold over a (watermarked) event stream. */
  def sessions(events: Dataset[SessEvent]): Dataset[SessionOut] =
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)(
        Encoders.product[SessionState], Encoders.product[SessionOut])
}

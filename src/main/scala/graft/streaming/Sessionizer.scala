package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Windows.eventsSessionize`: gap-based sessionization
  * (30-minute inactivity closes a session) via flatMapGroupsWithState.
  *
  * State per user is ONE open session (start, end, count, sum) — O(users)
  * state, independent of event volume. The event-time timeout fires when
  * the watermark passes session end + gap, emitting the closed session;
  * out-of-order events within the watermark slack merge into the open
  * session or close-and-open as the gap dictates. SessionizeSpec equates
  * the emitted sessions with the batch operator on the same data.
  */
object Sessionizer {

  val GapMs = 30L * 60 * 1000

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Session(
    user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)
  final case class SessState(startMs: Long, endMs: Long, n: Long, sum: Double)

  def step(userId: Long, events: Iterator[Ev], state: GroupState[SessState]): Iterator[Session] = {
    def toSession(st: SessState) = Session(
      userId, new java.sql.Timestamp(st.startMs), new java.sql.Timestamp(st.endMs),
      st.n, st.sum)

    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession).iterator
      state.remove()
      return out
    }

    val sorted = events.toVector.sortBy(_.ts.getTime)
    var closed = Vector.empty[Session]
    var open = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        // within one gap of the open session on either side: merge. The
        // backward bound matters — an out-of-order event more than a gap
        // BEFORE the session start is its own (already-closed) session,
        // not a backward extension (t - end <= gap alone is vacuously
        // true for any earlier event).
        case Some(st) if t - st.endMs <= GapMs && st.startMs - t <= GapMs =>
          open = Some(SessState(math.min(st.startMs, t), math.max(st.endMs, t),
            st.n + 1, st.sum + e.value))
        case Some(st) if t < st.startMs - GapMs =>
          // too late to merge and earlier than the open session: emit it
          // as its own single-event closed session, keep the open one
          closed :+= Session(userId, new java.sql.Timestamp(t),
            new java.sql.Timestamp(t), 1, e.value)
        case Some(st) =>
          closed :+= toSession(st)
          open = Some(SessState(t, t, 1, e.value))
        case None =>
          open = Some(SessState(t, t, 1, e.value))
      }
    }
    open.foreach { st =>
      state.update(st)
      state.setTimeoutTimestamp(st.endMs + GapMs)
    }
    closed.iterator
  }

  /** Wire the stateful step over a (streaming or batch) event Dataset. */
  def sessionize(s: SparkSession, events: Dataset[Ev]): Dataset[Session] = {
    import s.implicits._
    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Windows.eventsSessionize`: gap-based sessionization
  * (30-minute inactivity closes a session) via flatMapGroupsWithState.
  *
  * State per user is the list of sessions still mergeable given the
  * watermark — almost always ONE (out-of-order islands only exist within
  * the 1-minute watermark slack vs the 30-minute gap), so state stays
  * O(users), independent of event volume.
  *
  * A session is emitted ONLY once the watermark passes `end + gap`:
  * before that an admissible event could still extend or bridge it, so
  * eager emission would diverge from the batch operator (the round-3
  * ADVICE late-event edge: an event more than a gap before the open
  * session used to be emitted as its own closed session immediately;
  * now it is held as a second pending session until its own timeout,
  * and a bridging event merges the islands exactly as batch does).
  * SessionizeSpec equates the emitted sessions with the batch operator.
  */
object Sessionizer {

  val GapMs = 30L * 60 * 1000

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Session(
    user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)
  final case class SessState(startMs: Long, endMs: Long, n: Long, sum: Double)
  /** Pending (not yet watermark-closed) sessions, kept sorted by start. */
  final case class PendingSessions(sessions: Seq[SessState])

  /** Batch-semantics coalesce: sort by start, merge neighbors whose gap
    * is within GapMs. Treating every new event as a 1-event session and
    * re-coalescing (state ∪ events) IS the batch definition applied to
    * everything seen so far — stream ≡ batch for all admitted events. */
  private def coalesce(ss: Seq[SessState]): Vector[SessState] =
    ss.sortBy(s => (s.startMs, s.endMs)).foldLeft(Vector.empty[SessState]) {
      case (acc :+ prev, cur) if cur.startMs - prev.endMs <= GapMs =>
        acc :+ SessState(prev.startMs, math.max(prev.endMs, cur.endMs),
          prev.n + cur.n, prev.sum + cur.sum)
      case (acc, cur) => acc :+ cur
    }

  def step(userId: Long, events: Iterator[Ev],
           state: GroupState[PendingSessions]): Iterator[Session] = {
    def toSession(st: SessState) = Session(
      userId, new java.sql.Timestamp(st.startMs), new java.sql.Timestamp(st.endMs),
      st.n, st.sum)

    // Batch execution has no watermark node (withWatermark is eliminated
    // on a non-streaming frame), so getCurrentWatermarkMs throws. In
    // batch every event is final — an infinite watermark closes every
    // session inline (and `pending` is then empty, so the event-time
    // timeout registration below never runs either).
    val wm = try state.getCurrentWatermarkMs() catch {
      case _: UnsupportedOperationException => Long.MaxValue
    }
    val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
    val merged = coalesce(prior ++
      events.map(e => SessState(e.ts.getTime, e.ts.getTime, 1, e.value)))

    // closed = no admissible future event (ts >= wm) can merge (needs
    // ts <= end + gap, inclusive — so strict `<` here)
    val (closed, pending) = merged.partition(_.endMs + GapMs < wm)
    if (pending.isEmpty) state.remove()
    else {
      state.update(PendingSessions(pending))
      // earliest possible close; must sit strictly past the watermark
      state.setTimeoutTimestamp(
        math.max(pending.map(_.endMs + GapMs).min, wm + 1))
    }
    closed.iterator.map(toSession)
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

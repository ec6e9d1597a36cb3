package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Windows.pathTransitionsOf`: the path-transition
  * matrix maintained across micro-batches. Emits one `(user, from,
  * to)` PAIR row per adjacency in the user's event-time-ordered
  * stream — a plain additive count fold downstream (`groupBy(from_step,
  * to_step).count`, or a PointStore sum) IS the batch matrix.
  *
  * Adjacency depends on global event-time order (an out-of-order event
  * arriving later SPLICES into the middle of pairs an eager fold would
  * already have emitted), so the watermark-final discipline of the
  * funnel/retention twins applies: events hold until `ts < wm`, then
  * fold in ascending (ts, seq) order — the sessionizer's deterministic
  * tie-break — chaining off the last FINALIZED event. Every admissible
  * future event sorts at or above the watermark and therefore after
  * every finalized event, so a finalized pair can never be spliced.
  *
  * State per user: the single last-finalized event (one long + one
  * string) plus the held events above the watermark — the smallest
  * state of the three product-analytics twins, and irreducible: the
  * last event must survive to link the user's next pair (there is no
  * horizon after which a user's NEXT event stops being adjacent, so
  * unlike the funnel there is no eviction point; ~tag-size bytes/user
  * forever is the operator's floor, the price of exactly-once pairs).
  */
object StreamingPaths {

  final case class Ev(
    user_id: Long, ts: java.sql.Timestamp, seq: Long, event_type: String)
  final case class Pair(user_id: Long, from_step: String, to_step: String)
  /** last = (tsUs, seq, type) of the last finalized event; buf = held.
    * Times are epoch MICROSECONDS ([[EventTime]]): the batch twin
    * orders adjacency by the events table's full µs grain, and a
    * ms-truncated state would misorder two events inside one
    * millisecond (and misjudge a µs-fine session gap). */
  final case class PathState(
    last: Option[(Long, Long, String)], buf: Seq[(Long, Long, String)])

  /** `gapMs` bounds adjacency to the gap-session grain exactly as the
    * batch twin's `withinGapMs` does: a finalized pair whose gap
    * exceeds it spans two sessions and is suppressed — the chain
    * still advances (`last` becomes the new event; the next session
    * starts there), so suppression changes which pairs EMIT, never
    * the fold order. The gap compares at the state's µs grain
    * (boundary inclusive, the batch twin's rule). */
  def step(gapMs: Option[Long])(userId: Long, events: Iterator[Ev],
           state: GroupState[PathState]): Iterator[Pair] = {
    val wm = try state.getCurrentWatermarkMs() catch {
      case _: UnsupportedOperationException => Long.MaxValue
    }
    val wmUs = EventTime.msToUsSat(wm)
    val gapUs = gapMs.map(EventTime.msToUsSat)
    val prior = state.getOption.getOrElse(PathState(None, Nil))
    val (ready, hold) = (prior.buf ++
        events.map(e => (EventTime.usOf(e.ts), e.seq, e.event_type)))
      .partition(_._1 < wmUs)
    val emitted = Vector.newBuilder[Pair]
    var last = prior.last
    ready.sortBy(e => (e._1, e._2)).foreach { e =>
      last.filter(p => gapUs.forall(e._1 - p._1 <= _))
        .foreach(p => emitted += Pair(userId, p._3, e._3))
      last = Some(e)
    }
    if (last.isEmpty && hold.isEmpty) state.remove() // ≡ default
    else {
      state.update(PathState(last, hold))
      if (hold.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(hold.map(_._1).min / 1000 + 1, wm + 1))
    }
    emitted.result().iterator
  }

  /** Wire the stateful fold over a (streaming or batch) event Dataset. */
  def pairs(s: SparkSession, events: Dataset[Ev],
            gapMs: Option[Long] = None): Dataset[Pair] = {
    import s.implicits._
    require(gapMs.forall(_ > 0), s"gap must be positive, got $gapMs")
    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step(gapMs))
  }
}

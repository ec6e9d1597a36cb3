package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Windows.eventsPathsSegmented2`'s law: the
  * transition matrix with each pair attributed to BOTH attributes of
  * its FROM event — the maintained face of simultaneous dimension
  * expansion on paths. [[StreamingPathsSegmented]]'s fold is unchanged
  * (the from event is finalized when its pair emits, so no new
  * finality argument); the attributed payload simply widens to the
  * (seg, seg2) pair, and the (seg, seg2, from, to) counts stay
  * additive with both "all" axes a read-time 2^2 rollup. State grows
  * by one string on the last-event link and one per held event. */
object StreamingPathsSegmented2 {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, seq: Long,
                      event_type: String, seg: String, seg2: String)
  final case class Pair(user_id: Long, seg: String, seg2: String,
                        from_step: String, to_step: String)
  /** last = (tsUs, seq, type, seg, seg2) of the last finalized event;
    * buf = held events. Times are epoch MICROSECONDS ([[EventTime]]). */
  final case class Seg2PathState(
    last: Option[(Long, Long, String, String, String)],
    buf: Seq[(Long, Long, String, String, String)])

  /** `gapMs` bounds adjacency to the gap-session grain exactly as
    * [[StreamingPaths.step]] does. */
  def step(gapMs: Option[Long])(userId: Long, events: Iterator[Ev],
           state: GroupState[Seg2PathState]): Iterator[Pair] = {
    val wm = try state.getCurrentWatermarkMs() catch {
      case _: UnsupportedOperationException => Long.MaxValue
    }
    val wmUs = EventTime.msToUsSat(wm)
    val gapUs = gapMs.map(EventTime.msToUsSat)
    val prior = state.getOption.getOrElse(Seg2PathState(None, Nil))
    val (ready, hold) = (prior.buf ++
        events.map(e =>
          (EventTime.usOf(e.ts), e.seq, e.event_type, e.seg, e.seg2)))
      .partition(_._1 < wmUs)
    val emitted = Vector.newBuilder[Pair]
    var last = prior.last
    ready.sortBy(e => (e._1, e._2)).foreach { e =>
      last.filter(p => gapUs.forall(e._1 - p._1 <= _))
        .foreach(p => emitted += Pair(userId, p._4, p._5, p._3, e._3))
      last = Some(e)
    }
    if (last.isEmpty && hold.isEmpty) state.remove() // ≡ default
    else {
      state.update(Seg2PathState(last, hold))
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

package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Windows.funnelOf`: the ordered conversion funnel
  * maintained per user across micro-batches, emitting each (user, step)
  * reach the moment the watermark makes it FINAL.
  *
  * The batch law (a user reaches step k via their first step-k event
  * STRICTLY AFTER the step-(k-1) reach time) depends on global event-time
  * order, so an eagerly-folded reach could be wrong — a step-1 event
  * arriving later with an earlier timestamp would retroactively qualify
  * step-2 events the eager fold already rejected. The watermark is the
  * finality contract that makes folding safe: once `wm` passes, no
  * admissible event below it remains unseen, so folding the buffered
  * events with `ts < wm` in ascending time order assigns exactly the
  * chained-min reach times the batch operator computes ([[graft.operators
  * .Windows.funnelOf]]'s "min ts after a per-user bound" staging).
  *
  * State per user is bounded: the finalized reach-time vector (K longs)
  * plus only the buffered events that can still matter — an event for an
  * already-reached step can never fold (reach times are first-only), so
  * it drops immediately, and everything below the watermark drops after
  * its fold pass. What remains is events within the watermark slack for
  * not-yet-reached steps, the same O(users × slack) envelope the
  * Sessionizer carries. An event-time timeout re-fires the group when
  * the watermark passes its earliest buffered event, so reaches finalize
  * without waiting for the user's next event. StreamingSpec equates the
  * emitted reaches with the batch operator per stage, out-of-order
  * chunks included.
  */
object StreamingFunnel {

  /** The registered path, shared with the batch operator. */
  val Steps: Seq[String] = graft.operators.Windows.FunnelSteps

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class Reach(
    user_id: Long, step: Int, step_name: String, ts: java.sql.Timestamp)
  /** fin(i) = finalized reach time of step i+1 (-1 = unreached); buf =
    * (tsMs, stepIdx) events still admissible and still able to fold. */
  final case class FunnelState(fin: Seq[Long], buf: Seq[(Long, Int)])

  def step(userId: Long, events: Iterator[Ev],
           state: GroupState[FunnelState]): Iterator[Reach] = {
    // batch execution has no watermark node: every event is final
    val wm = try state.getCurrentWatermarkMs() catch {
      case _: UnsupportedOperationException => Long.MaxValue
    }
    val stepIdx = Steps.zipWithIndex.toMap
    val prior = state.getOption
      .getOrElse(FunnelState(Seq.fill(Steps.size)(-1L), Nil))
    val fin = prior.fin.toArray
    val incoming = events
      .flatMap(e => stepIdx.get(e.event_type).map(i => (e.ts.getTime, i)))
      .filterNot { case (_, i) => fin(i) >= 0 }
    val (ready, hold) = (prior.buf ++ incoming).partition(_._1 < wm)
    val emitted = Vector.newBuilder[Reach]
    ready.sorted.foreach { case (t, i) =>
      if (fin(i) < 0 && (i == 0 || (fin(i - 1) >= 0 && t > fin(i - 1)))) {
        fin(i) = t
        emitted += Reach(userId, i + 1, Steps(i), new java.sql.Timestamp(t))
      }
    }
    // re-screen the held events against the reaches this fold assigned.
    // The state is NEVER removed: reaches are first-only, so a fully
    // converted user's fin vector must survive — dropping it would let
    // a later event of the same type re-emit a second "first" reach.
    // K longs per user ever seen is the funnel's inherent state floor.
    val pending = hold.filterNot { case (_, i) => fin(i) >= 0 }
    state.update(FunnelState(fin.toSeq, pending))
    if (pending.nonEmpty)
      // fire again once the watermark passes the earliest held event
      state.setTimeoutTimestamp(math.max(pending.map(_._1).min + 1, wm + 1))
    emitted.result().iterator
  }

  /** Wire the stateful fold over a (streaming or batch) event Dataset. */
  def funnel(s: SparkSession, events: Dataset[Ev]): Dataset[Reach] = {
    import s.implicits._
    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Windows.funnelOf`: the ordered conversion funnel
  * maintained per user across micro-batches, emitting each (user, step)
  * reach the moment the watermark makes it FINAL.
  *
  * The batch law (a user reaches step k via their first step-k event
  * STRICTLY AFTER the step-(k-1) reach time, and — when a conversion
  * `horizon` is set — within the horizon of it, boundary inclusive)
  * depends on global event-time order, so an eagerly-folded reach could
  * be wrong — a step-1 event arriving later with an earlier timestamp
  * would retroactively qualify step-2 events the eager fold already
  * rejected. The watermark is the finality contract that makes folding
  * safe: once `wm` passes, no admissible event below it remains unseen,
  * so folding the buffered events with `ts < wm` in ascending time
  * order assigns exactly the chained-min reach times the batch operator
  * computes ([[graft.operators.Windows.funnelOf]]'s "min ts after a
  * per-user bound" staging).
  *
  * State per user: the finalized reach-time vector (K longs, ~8·K bytes
  * plus row overhead — at a billion users and K=3 that is ~24 GB of
  * state-store payload across the cluster, the inherent floor of
  * first-only semantics because a reached user's vector must survive to
  * suppress a duplicate "first" reach forever) plus only the buffered
  * events that can still matter. An event is held ONLY while it could
  * still fold: events for an already-reached step drop immediately
  * (reach times are first-only), events provably outside the chained
  * law drop too — at or before a finalized previous reach, or (with a
  * horizon) past that reach's conversion deadline. The horizon is what
  * makes long-lived users CHEAP: once the watermark passes
  * `reach(deepest) + horizon`, every future event for the next step
  * misses its deadline by finality, so the hold-buffer empties and
  * stays empty — an expired user carries exactly the K-long vector and
  * never re-fires a timeout. Users who never reached step 1 and hold
  * nothing are EVICTED outright (`state.remove()`): their state is
  * indistinguishable from the default a later event would recreate, so
  * eviction cannot change emitted reaches (pinned in StreamingSpec).
  * An event-time timeout re-fires the group when the watermark passes
  * its earliest buffered event, so reaches finalize without waiting for
  * the user's next event. StreamingSpec equates the emitted reaches
  * with the batch operator per stage, out-of-order chunks included,
  * with and without the horizon.
  */
object StreamingFunnel {

  /** The registered path, shared with the batch operator. */
  val Steps: Seq[String] = graft.operators.Windows.FunnelSteps

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  /** `lat_us` = µs since the previous step's reach (-1 at step 1) —
    * the hop latency is known the moment a reach folds (the previous
    * reach time is sitting in the fin vector), so the funnel twin
    * emits it for free and the hop-latency distributions become one
    * more additive fold downstream (`latency_maintained`), never a
    * second stateful pairing. */
  final case class Reach(
    user_id: Long, step: Int, step_name: String, ts: java.sql.Timestamp,
    lat_us: Long)
  /** fin(i) = finalized reach time of step i+1 (-1 = unreached); buf =
    * (tsUs, stepIdx) events still admissible and still able to fold.
    * Times are epoch MICROSECONDS ([[EventTime]]): the batch law
    * resolves strict order and horizon deadlines at the events table's
    * full µs grain, and a ms-truncated state would miss a hop landing
    * inside the reach's millisecond. */
  final case class FunnelState(fin: Seq[Long], buf: Seq[(Long, Int)])

  def step(horizonMs: Option[Long], steps: Seq[String] = Steps)(
           userId: Long, events: Iterator[Ev],
           state: GroupState[FunnelState]): Iterator[Reach] = {
    // batch execution has no watermark node: every event is final
    val wm = try state.getCurrentWatermarkMs() catch {
      case _: UnsupportedOperationException => Long.MaxValue
    }
    val wmUs = EventTime.msToUsSat(wm)
    val hUs = horizonMs.map(EventTime.msToUsSat)
    val stepIdx = steps.zipWithIndex.toMap
    val prior = state.getOption
      .getOrElse(FunnelState(Seq.fill(steps.size)(-1L), Nil))
    val fin = prior.fin.toArray
    // the chained law for step i at time t, against CURRENT reaches:
    // step 1 is unbounded below; step i+1 needs t strictly after — and
    // within horizon of, inclusive — the step-i reach (subtraction
    // form: t > fin guarantees t - fin > 0, so the deadline compare
    // can't overflow a saturated horizon)
    def folds(t: Long, i: Int): Boolean =
      fin(i) < 0 && (i == 0 || (fin(i - 1) >= 0 && t > fin(i - 1) &&
        hUs.forall(h => t - fin(i - 1) <= h)))
    // an event can never fold once its step is reached, or once the
    // previous reach is FINAL and the event sits outside the law
    // (at/before the reach, or past its conversion deadline) — first-
    // only reach times never change, so these are permanent verdicts
    def deadVsFinal(t: Long, i: Int): Boolean =
      fin(i) >= 0 || (i > 0 && fin(i - 1) >= 0 && (t <= fin(i - 1) ||
        hUs.exists(h => t - fin(i - 1) > h)))
    val incoming = events
      .flatMap(e => stepIdx.get(e.event_type).map(i => (EventTime.usOf(e.ts), i)))
      .filterNot { case (t, i) => deadVsFinal(t, i) }
    val (ready, hold) = (prior.buf ++ incoming).partition(_._1 < wmUs)
    val emitted = Vector.newBuilder[Reach]
    ready.sorted.foreach { case (t, i) =>
      if (folds(t, i)) {
        fin(i) = t
        emitted += Reach(userId, i + 1, steps(i), EventTime.tsOfUs(t),
          if (i == 0) -1L else t - fin(i - 1))
      }
    }
    // re-screen the held events against the reaches this fold assigned.
    // With a horizon, an expired user's holds all die here (every held
    // t >= wm > reach + horizon), so the state shrinks to the vector.
    val pending = hold.filterNot { case (t, i) => deadVsFinal(t, i) }
    if (fin.forall(_ < 0) && pending.isEmpty)
      // nothing reached, nothing held: the default state a future
      // event recreates — evict instead of storing K longs of -1
      state.remove()
    else {
      // Reached-state is NEVER removed: reaches are first-only, so a
      // fully converted (or horizon-expired) user's fin vector must
      // survive — dropping it would let a later event of the same type
      // re-emit a second "first" reach. K longs per reached user is
      // the funnel's inherent state floor.
      state.update(FunnelState(fin.toSeq, pending))
      if (pending.nonEmpty)
        // fire again once the (ms) watermark passes the earliest held
        // µs event: the first finalizing watermark is tUs/1000 + 1
        state.setTimeoutTimestamp(
          math.max(pending.map(_._1).min / 1000 + 1, wm + 1))
    }
    emitted.result().iterator
  }

  /** Wire the stateful fold over a (streaming or batch) event Dataset.
    * `horizon` is the compact-duration conversion window shared with
    * the batch operator (`"30m"`, `"1d"` —
    * [[graft.operators.Windows.parseHorizon]]); None = unbounded.
    * `steps` is the ordered path (default = the registered one — an
    * analyst's custom path is a parameter here exactly as it is on
    * the batch faces). */
  def funnel(s: SparkSession, events: Dataset[Ev],
             horizon: Option[String] = None,
             steps: Seq[String] = Steps): Dataset[Reach] = {
    import s.implicits._
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct, got $steps")
    val h = horizon.map(graft.operators.Windows.parseHorizon)
    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step(h, steps))
  }
}

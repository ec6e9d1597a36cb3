package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Windows.funnelDeepestOf`: the ANCHORED
  * deepest-chain funnel maintained per user, emitting each (user,
  * depth-k-reached) fact exactly once, the moment some anchor's chain
  * first attains depth k.
  *
  * Why eager emission is safe HERE and not in the chained twin: the
  * deepest-chain depth is defined EXISTENTIALLY over the event set —
  * "some in-order chain of k distinct steps fits inside some anchor's
  * `[t1, t1+h]` window" — and adding events can only add chains, never
  * retract one. A depth once attained is attained forever, so a
  * depth-increase emission over FINALIZED events is final by
  * construction. (The chained law, by contrast, is a function of the
  * FIRST occurrence, which a late earlier event rewrites — that twin
  * must hold everything to finality before folding.) Events still fold
  * only once final (`ts < wm`), in ascending time order, because the
  * per-anchor GREEDY state (earliest valid next hop) is only optimal
  * when fed the complete prefix in order — an eager out-of-order fold
  * could discard an event a late arrival would have made chainable,
  * and discarded events are gone.
  *
  * The BOUNDED-ANCHOR state contract (the r14 design note, built):
  *   - live anchors: step-1 events whose window can still admit a
  *     future admissible event — `t1 + h ≥ wm`. Each carries the
  *     greedy (depth, tLast) pair; count bounded by the user's step-1
  *     rate × (horizon + watermark delay), never their lifetime count.
  *   - expired anchors VANISH: every emission already happened at its
  *     depth-increase moment, so an anchor past its deadline holds no
  *     information the emitted-depth int doesn't.
  *   - `emitted` (one int) is the only immortal state: it suppresses a
  *     re-emission when a later anchor re-attains a depth — the
  *     deepest twin's analog of the chained twin's K-long fin vector,
  *     and strictly smaller.
  *   - holds: events at/above the watermark, as everywhere in the
  *     family. A held event can matter to an anchor that hasn't
  *     arrived yet (both sit above the watermark), so there is no
  *     pre-watermark pruning; a READY event, though, is consumed by
  *     the sweep and discarded — every anchor that could ever use it
  *     (t1 < e.ts, t1 below the watermark too) is already in state,
  *     because a later-arriving anchor below the watermark would be
  *     late data the engine drops.
  *
  * Times are epoch µs ([[EventTime]]), the family's grain. Anchors
  * dedupe on t1 (the batch operator's `.distinct()`); chains need
  * strictly increasing ts, so same-µs ties never chain on either
  * engine and the sweep's (ts, step) tie-break is inert. */
object StreamingFunnelDeepest {

  val Steps: Seq[String] = graft.operators.Windows.FunnelSteps

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class Reach(
    user_id: Long, step: Int, step_name: String, ts: java.sql.Timestamp)
  /** anchors = (t1Us, depth, tLastUs) per live anchor; buf = held
    * (tsUs, stepIdx); emitted = deepest step ever emitted (immortal). */
  final case class DeepState(
    emitted: Int, anchors: Seq[(Long, Int, Long)], buf: Seq[(Long, Int)])

  def step(steps: Seq[String], horizonMs: Long)(
      userId: Long, events: Iterator[Ev],
      state: GroupState[DeepState]): Iterator[Reach] = {
    val wm = try state.getCurrentWatermarkMs() catch {
      case _: UnsupportedOperationException => Long.MaxValue
    }
    val wmUs = EventTime.msToUsSat(wm)
    val hUs = EventTime.msToUsSat(horizonMs)
    val stepIdx = steps.zipWithIndex.toMap
    val prior = state.getOption.getOrElse(DeepState(0, Nil, Nil))
    val incoming = events
      .flatMap(e => stepIdx.get(e.event_type).map(i => (EventTime.usOf(e.ts), i)))
    val (ready, hold) = (prior.buf ++ incoming).partition(_._1 < wmUs)
    var emitted = prior.emitted
    var anchors = prior.anchors.toVector
    val out = Vector.newBuilder[Reach]
    def reach(depth: Int, tUs: Long): Unit =
      if (depth > emitted) {
        // a depth jump can't skip levels: depth grows by 1 per hop and
        // every lower level was emitted when first attained
        out += Reach(userId, depth, steps(depth - 1), EventTime.tsOfUs(tUs))
        emitted = depth
      }
    ready.sorted.foreach { case (t, i) =>
      // extend every live anchor whose greedy next step this is —
      // strictly after its last hop, within its anchor deadline
      anchors = anchors.map { case a @ (t1, d, tl) =>
        if (d < steps.size && i == d && t > tl && t - t1 <= hUs) {
          reach(d + 1, t)
          (t1, d + 1, t)
        } else a
      }
      if (i == 0 && !anchors.exists(_._1 == t)) { // a new anchor (dedup on t1)
        anchors :+= ((t, 1, t))
        reach(1, t)
      }
    }
    // expired windows can't deepen; their depths are already emitted
    anchors = anchors.filter { case (t1, _, _) => wmUs - t1 <= hUs }
    if (emitted == 0 && anchors.isEmpty && hold.isEmpty)
      state.remove() // ≡ the default a future event recreates
    else {
      state.update(DeepState(emitted, anchors, hold))
      // wake when the watermark next changes something observable: a
      // hold finalizes, or the earliest live anchor expires (a pure
      // state shrink — keeps dormant users at the one-int floor)
      val wake = (hold.map(_._1 / 1000 + 1) ++
        anchors.map { case (t1, _, _) =>
          // saturating: a near-MaxValue horizon must not wrap the wake
          val exp = if (hUs >= Long.MaxValue - t1) Long.MaxValue - 1000 else t1 + hUs
          exp / 1000 + 1
        }).minOption
      // batch execution (wm saturated — no watermark node) cannot
      // register an event-time timeout (setTimeoutTimestamp throws
      // without a watermark) and needs none: everything below the
      // saturated watermark already folded, so a wake could never
      // change observable state. Reachable only with a horizon large
      // enough to saturate msToUsSat keeping anchors past the expiry
      // filter — mirror the getCurrentWatermarkMs catch.
      if (wm != Long.MaxValue)
        wake.foreach(w => state.setTimeoutTimestamp(math.max(w, wm + 1)))
    }
    out.result().iterator
  }

  /** Wire the stateful fold. `horizon` is the compact duration shared
    * with the batch operator ([[graft.operators.Windows.parseHorizon]])
    * — required: the deepest search IS anchored. */
  def funnel(s: SparkSession, events: Dataset[Ev], horizon: String,
             steps: Seq[String] = Steps): Dataset[Reach] = {
    import s.implicits._
    val h = graft.operators.Windows.parseHorizon(horizon)
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct, got $steps")
    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step(steps, h))
  }
}

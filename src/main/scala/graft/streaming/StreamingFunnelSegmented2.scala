package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Windows.funnelOf(by = struct(a, b))`: the ordered
  * funnel segmented by TWO user attributes at once — the maintained
  * face of `events_funnel_segmented2` (the reference's SIMULTANEOUS
  * dimension expansion, crunch_global.sql:38-50, carried into the
  * maintenance loop). [[StreamingFunnelSegmented]]'s fold is unchanged;
  * the entry payload widens to a pair:
  *
  *   - each wire event carries BOTH attribute values (`seg`, `seg2` —
  *     two STRING columns in the drop schema);
  *   - the user's (seg, seg2) pair is fixed by the event that folds as
  *     their step-1 reach. Finalized events sort ascending
  *     `(ts, step, seg, seg2)`, so among duplicate-timestamp entries
  *     the LEXICOGRAPHICALLY smallest pair folds first — exactly the
  *     batch operator's `min over (ts, struct(a, b))` tuple law
  *     (struct ordering is field-by-field), which keeps the sample
  *     deterministic and stream ≡ batch;
  *   - every later reach emits the entry pair, so the store cells
  *     aggregate additively at (seg, seg2, step) grain: one user, one
  *     cell per step — which is why BOTH "all" axes are read-time
  *     GROUPING SETS over the store rows (2^2, the batch report's
  *     cube), never a second materialization.
  *
  * State per user beyond the single-axis twin's: one more pinned
  * string and one more per-held-candidate string — same bounds, same
  * eviction contract. */
object StreamingFunnelSegmented2 {

  /** The registered path, shared with the batch operator. */
  val Steps: Seq[String] = graft.operators.Windows.FunnelSteps

  final case class Ev(user_id: Long, ts: java.sql.Timestamp,
                      event_type: String, seg: String, seg2: String)
  /** `lat_us` rides exactly as on the other funnel twins (the fin
    * vector holds the previous reach at fold time). */
  final case class Reach(user_id: Long, seg: String, seg2: String,
                         step: Int, step_name: String,
                         ts: java.sql.Timestamp, lat_us: Long)
  /** fin(i) = finalized reach time of step i+1 (-1 = unreached);
    * entrySeg/entrySeg2 = the step-1 fold's pair (null until reached);
    * buf = (tsUs, stepIdx, seg, seg2) events still admissible. */
  final case class Seg2State(fin: Seq[Long], entrySeg: String,
                             entrySeg2: String,
                             buf: Seq[(Long, Int, String, String)])

  def step(horizonMs: Option[Long], steps: Seq[String] = Steps)(
           userId: Long, events: Iterator[Ev],
           state: GroupState[Seg2State]): Iterator[Reach] = {
    val wm = try state.getCurrentWatermarkMs() catch {
      case _: UnsupportedOperationException => Long.MaxValue
    }
    val wmUs = EventTime.msToUsSat(wm)
    val hUs = horizonMs.map(EventTime.msToUsSat)
    val stepIdx = steps.zipWithIndex.toMap
    val prior = state.getOption
      .getOrElse(Seg2State(Seq.fill(steps.size)(-1L), null, null, Nil))
    val fin = prior.fin.toArray
    var entrySeg = prior.entrySeg
    var entrySeg2 = prior.entrySeg2
    def folds(t: Long, i: Int): Boolean =
      fin(i) < 0 && (i == 0 || (fin(i - 1) >= 0 && t > fin(i - 1) &&
        hUs.forall(h => t - fin(i - 1) <= h)))
    def deadVsFinal(t: Long, i: Int): Boolean =
      fin(i) >= 0 || (i > 0 && fin(i - 1) >= 0 && (t <= fin(i - 1) ||
        hUs.exists(h => t - fin(i - 1) > h)))
    val incoming = events
      .flatMap(e => stepIdx.get(e.event_type)
        .map(i => (EventTime.usOf(e.ts), i, e.seg, e.seg2)))
      .filterNot { case (t, i, _, _) => deadVsFinal(t, i) }
    val (ready, hold) = (prior.buf ++ incoming).partition(_._1 < wmUs)
    val emitted = Vector.newBuilder[Reach]
    // ascending (ts, step, seg, seg2): the pair tie-break IS the batch
    // operator's min-over-(ts, struct) tuple law at the entry
    ready.sorted.foreach { case (t, i, seg, seg2) =>
      if (folds(t, i)) {
        fin(i) = t
        if (i == 0) { entrySeg = seg; entrySeg2 = seg2 }
        emitted += Reach(userId, entrySeg, entrySeg2, i + 1, steps(i),
          EventTime.tsOfUs(t), if (i == 0) -1L else t - fin(i - 1))
      }
    }
    val pending = hold.filterNot { case (t, i, _, _) => deadVsFinal(t, i) }
    if (fin.forall(_ < 0) && pending.isEmpty)
      state.remove()
    else {
      state.update(Seg2State(fin.toSeq, entrySeg, entrySeg2, pending))
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(pending.map(_._1).min / 1000 + 1, wm + 1))
    }
    emitted.result().iterator
  }

  /** Wire the stateful fold over a (streaming or batch) event Dataset —
    * [[StreamingFunnelSegmented.funnel]]'s contract with the pair. */
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

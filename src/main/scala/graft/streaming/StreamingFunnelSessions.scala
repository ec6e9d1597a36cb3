package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Windows.funnelSessionsOf`: the SESSION-bounded
  * funnel — conversion within a single visit, the flavor product teams
  * usually mean by "the signup funnel" — maintained per user across
  * micro-batches. The batch operator composes the sessionizer's gap law
  * with the chained funnel at a composite (user, session) key
  * (Windows.scala `funnelSessionsOf`); this twin composes the SAME two
  * laws in ONE stateful pass, because both are driven by the same
  * finality contract: once the watermark passes, the user's finalized
  * events replay in event-time order, so session assignment (a new
  * session starts when the gap to the previous event exceeds `gapMs`)
  * and the within-session chained law (first step-k event strictly
  * after the step-(k-1) reach) are both decided exactly as the batch
  * window functions decide them.
  *
  * ==Session finality and the watermark==
  * A session's boundary is final as soon as both sides of the gap are:
  * processing events in watermark order means every event between the
  * session's last event and a candidate continuation has already been
  * seen, so "gap exceeded → new session" is never retracted. Reaches
  * therefore emit EAGERLY, per finalized event — a session does not
  * need to CLOSE for its reaches to be correct, because within-session
  * reach times are first-only and later events can only extend the
  * session forward. The close matters only for state: once the
  * watermark passes `lastTs + gap`, no admissible event can continue
  * the visit (anything later starts a new one), so the session fields
  * drop. NON-step events flow through the twin too — they carry no
  * reach but they hold sessions open, exactly as the batch gap law
  * counts them.
  *
  * ==Cells and state==
  * Emission grain is (user, session, step), exactly once: `sid` is the
  * session's first event time in µs — unique per (user, session)
  * because a user's sessions are disjoint in time, so no cross-session
  * counter has to survive eviction. Each reach also carries
  * `first_user` — true on the user's first-ever reach of that step
  * across ALL sessions — so the maintained store folds BOTH report
  * measures additively: `visits` = count of cells (sessions reaching
  * the step), `users` = sum of first_user (distinct users), no
  * distinct aggregation downstream. State per user: the permanent
  * `seen` step bitmask (what makes first_user exact — the same
  * K-bits-per-reached-user floor as [[StreamingFunnel]]'s fin vector,
  * required by ANY exact distinct-user count), plus the OPEN session's
  * (sid, lastTs, fin) and the watermark-slack hold buffer, both of
  * which drop at session close — a user between visits carries one
  * long. Users who never reached any step evict outright: their state
  * is the default a later event recreates.
  *
  * StreamingSpec equates the emitted cells with the batch operator per
  * stage, out-of-order chunks and cross-chunk session splits included.
  */
object StreamingFunnelSessions {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  /** One (user, session, step) reach. `sid` = the session's first event
    * time (µs); `first_user` = this is the user's first-ever reach of
    * this step, across all their sessions. */
  final case class Reach(user_id: Long, sid: Long, step: Int,
                         step_name: String, ts: java.sql.Timestamp,
                         first_user: Boolean)

  /** `seen` = bitmask of steps this user ever reached; `sid`/`lastTs` =
    * the open session's start and last event time (µs, -1 = none
    * open); `fin` = the open session's reach vector (empty when none
    * open); `buf` = (tsUs, stepIdx) events still above the watermark,
    * stepIdx -1 for non-step events (they matter to the gap law). */
  final case class SessState(seen: Long, sid: Long, lastTs: Long,
                             fin: Seq[Long], buf: Seq[(Long, Int)])

  def step(gapMs: Long, steps: Seq[String])(
           userId: Long, events: Iterator[Ev],
           state: GroupState[SessState]): Iterator[Reach] = {
    // batch execution has no watermark node: every event is final
    val wm = try state.getCurrentWatermarkMs() catch {
      case _: UnsupportedOperationException => Long.MaxValue
    }
    val wmUs = EventTime.msToUsSat(wm)
    val gapUs = gapMs * 1000L
    val stepIdx = steps.zipWithIndex.toMap
    val prior = state.getOption.getOrElse(SessState(0L, -1L, -1L, Nil, Nil))
    var seen = prior.seen
    var sid = prior.sid
    var lastTs = prior.lastTs
    val fin = (if (prior.fin.nonEmpty) prior.fin
               else Seq.fill(steps.size)(-1L)).toArray
    // LATE incoming events (below the batch's watermark — disorder
    // beyond the slack, which the nightly-order contract already calls
    // inadmissible) are dropped here, not processed: the chained funnel
    // tolerates arbitrary-distance disorder because reach verdicts only
    // ever depend on fin-vector state, but the gap law does not — an
    // event below an already-processed one would regress `lastTs` and
    // mis-split every later gap. Held events are exempt: they were
    // admissible when buffered and finalize as the watermark passes
    // them. Batch mode (saturated wm) has no lateness.
    val lateCutUs = if (wm == Long.MaxValue) 0L else wmUs
    val incoming = events
      .map(e => (EventTime.usOf(e.ts), stepIdx.getOrElse(e.event_type, -1)))
      .filterNot(_._1 < lateCutUs)
    val (ready, hold) = (prior.buf ++ incoming).partition(_._1 < wmUs)
    val emitted = Vector.newBuilder[Reach]
    ready.sorted.foreach { case (t, i) =>
      if (sid < 0 || t - lastTs > gapUs) { // the sessionizer's gap law
        sid = t
        java.util.Arrays.fill(fin, -1L)
      }
      lastTs = t
      // the chained law, scoped to the open session (no horizon: the
      // session bound IS the conversion bound, as on the batch face)
      if (i >= 0 && fin(i) < 0 &&
          (i == 0 || (fin(i - 1) >= 0 && t > fin(i - 1)))) {
        fin(i) = t
        val first = (seen & (1L << i)) == 0L
        seen |= (1L << i)
        emitted += Reach(userId, sid, i + 1, steps(i),
          EventTime.tsOfUs(t), first)
      }
    }
    // session finality: past lastTs + gap every admissible event starts
    // a NEW visit, so the open session's fields are dead weight
    val sessionOpen = sid >= 0 && wmUs <= lastTs + gapUs
    if (!sessionOpen) { sid = -1L; lastTs = -1L }
    if (seen == 0L && hold.isEmpty && !sessionOpen) state.remove()
    else {
      state.update(SessState(seen, sid, lastTs,
        if (sessionOpen) fin.toSeq else Nil, hold))
      // wake when the earliest hold finalizes or the open session's
      // continuation window lapses, whichever first; a user carrying
      // only the seen bitmask never re-fires
      val wakes = (if (hold.nonEmpty) Seq(hold.map(_._1).min / 1000 + 1)
                   else Nil) ++
        (if (sessionOpen) Seq((lastTs + gapUs) / 1000 + 1) else Nil)
      if (wakes.nonEmpty)
        state.setTimeoutTimestamp(math.max(wakes.min, wm + 1))
    }
    emitted.result().iterator
  }

  /** Wire the stateful fold over a (streaming or batch) event Dataset.
    * `steps` is the ordered path (≤ 64 steps — the first-user bitmask
    * is one long). */
  def reaches(s: SparkSession, events: Dataset[Ev], gapMs: Long,
              steps: Seq[String] = StreamingFunnel.Steps): Dataset[Reach] = {
    import s.implicits._
    require(gapMs > 0, s"session gap must be positive, got $gapMs")
    require(steps.nonEmpty && steps.distinct.size == steps.size &&
      steps.size <= 64, s"steps must be non-empty, distinct, ≤64: $steps")
    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(gapMs, steps))
  }
}

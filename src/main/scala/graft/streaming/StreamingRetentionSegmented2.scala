package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.time.{DayOfWeek, Instant, LocalDate, ZoneOffset}

/** Streaming twin of `Windows.eventsRetentionSegmented2`'s law: the
  * cohort matrix segmented by TWO attributes at once — the maintained
  * face of the reference's simultaneous dimension expansion
  * (crunch_global.sql:38-50) on retention.
  * [[StreamingRetentionSegmented]]'s design is unchanged (cohort pins
  * off the finalized minimum, cells emit exactly once per
  * (user, offset), state bounded by the calendar); the pinned payload
  * widens to the (seg, seg2) PAIR:
  *
  *   - the pair FINALIZES with the cohort by the same watermark
  *     argument, and the pin takes the minimum (ts, seg, seg2) TRIPLE
  *     — lexicographic, so among duplicate-timestamp cohort events ONE
  *     event's pair is sampled (the batch operator's
  *     min-over-(ts, tuple) law; independent per-attribute mins would
  *     fabricate a pair no event carried);
  *   - every cell emits the pinned pair, so the (seg, seg2, cohort,
  *     offset) counts are additive and BOTH "all" axes are read-time
  *     2^2 GROUPING SETS over store rows.
  *
  * State per user beyond the single-axis twin's: one more pinned
  * string and one more per-held-event string. */
object StreamingRetentionSegmented2 {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp,
                      seg: String, seg2: String)
  final case class Cell(user_id: Long, seg: String, seg2: String,
                        cohort: java.sql.Timestamp, offset: Int)
  /** cohortDay = epoch day of the truncated cohort period (-1 =
    * unpinned); seg/seg2 = the entry pair (pinned with the cohort);
    * offsets = cells already emitted; buf = held (ms, seg, seg2). */
  final case class Seg2RetState(cohortDay: Long, seg: String, seg2: String,
                                offsets: Seq[Int],
                                buf: Seq[(Long, String, String)])

  private def truncDay(ms: Long, period: String): Long = {
    val d = LocalDate.ofInstant(Instant.ofEpochMilli(ms), ZoneOffset.UTC)
    (period match {
      case "day"   => d
      case "week"  => d.`with`(java.time.temporal.TemporalAdjusters
        .previousOrSame(DayOfWeek.MONDAY))
      case "month" => d.withDayOfMonth(1)
    }).toEpochDay
  }

  private def offsetOf(evDay: Long, cohortDay: Long, period: String): Int =
    period match {
      case "day"  => (evDay - cohortDay).toInt
      case "week" => ((evDay - cohortDay) / 7).toInt
      case "month" =>
        val e = LocalDate.ofEpochDay(evDay)
        val c = LocalDate.ofEpochDay(cohortDay)
        (e.getYear - c.getYear) * 12 + (e.getMonthValue - c.getMonthValue)
    }

  def step(period: String)(userId: Long, events: Iterator[Ev],
           state: GroupState[Seg2RetState]): Iterator[Cell] = {
    val wm = try state.getCurrentWatermarkMs() catch {
      case _: UnsupportedOperationException => Long.MaxValue
    }
    val prior = state.getOption
      .getOrElse(Seg2RetState(-1L, null, null, Nil, Nil))
    val (ready, hold) = (prior.buf ++
        events.map(e => (e.ts.getTime, e.seg, e.seg2))).partition(_._1 < wm)
    var cohortDay = prior.cohortDay
    var seg = prior.seg
    var seg2 = prior.seg2
    var offsets = prior.offsets
    val emitted = Vector.newBuilder[Cell]
    if (ready.nonEmpty) {
      if (cohortDay < 0) {
        // the pin takes the minimum (ts, seg, seg2) TRIPLE — the batch
        // tuple entry sample, final by the watermark argument
        val e = ready.min
        cohortDay = truncDay(e._1, period)
        seg = e._2
        seg2 = e._3
      }
      val cohortTs = new java.sql.Timestamp(
        LocalDate.ofEpochDay(cohortDay).atStartOfDay
          .toInstant(ZoneOffset.UTC).toEpochMilli)
      ready.foreach { case (ms, _, _) =>
        val off = offsetOf(truncDay(ms, period), cohortDay, period)
        if (!offsets.contains(off)) {
          offsets = offsets :+ off
          emitted += Cell(userId, seg, seg2, cohortTs, off)
        }
      }
    }
    if (cohortDay < 0 && hold.isEmpty) state.remove() // ≡ default: evict
    else {
      state.update(Seg2RetState(cohortDay, seg, seg2, offsets, hold))
      if (hold.nonEmpty)
        state.setTimeoutTimestamp(math.max(hold.map(_._1).min + 1, wm + 1))
    }
    emitted.result().iterator
  }

  /** Wire the stateful fold over a (streaming or batch) event Dataset. */
  def cells(s: SparkSession, events: Dataset[Ev],
            period: String = "week"): Dataset[Cell] = {
    require(Set("day", "week", "month")(period),
      s"period must be day|week|month, got '$period'")
    import s.implicits._
    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step(period))
  }
}

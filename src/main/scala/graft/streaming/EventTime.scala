package graft.streaming

/** Event-time unit discipline for the stateful twins: Spark's
  * GroupState API speaks MILLISECONDS (watermark, timeouts) while the
  * events tables carry microsecond-fine timestamps — truncating state
  * to ms would lose the strict-order comparisons the batch operators
  * resolve at µs (two funnel hops inside one millisecond, a
  * sub-millisecond adjacency tie). The twins therefore hold state in
  * epoch MICROSECONDS and convert only at the GroupState boundary:
  * finality is `tUs < wm·1000` (an event at exactly the watermark is
  * not final, same verdict either unit), timeouts re-fire at
  * `tUs/1000 + 1` ms (the first watermark that finalizes the event).
  */
object EventTime {
  /** Exact epoch µs of a Timestamp — `getTime` alone floors to ms. */
  def usOf(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** Timestamp from epoch µs, fraction exact. */
  def tsOfUs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000L))
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Saturating ms→µs for watermark and horizon bounds (the batch-mode
    * "no watermark" sentinel is Long.MaxValue ms and must stay the
    * everything-is-final sentinel in µs). */
  def msToUsSat(ms: Long): Long =
    if (ms >= Long.MaxValue / 1000) Long.MaxValue else ms * 1000
}

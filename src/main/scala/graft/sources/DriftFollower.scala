package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Push-shaped drift alerting: a [[ChangefeedFollower]]-shaped consumer
  * that maintains a MIRROR of a profile store (any
  * [[graft.operators.Profile.profilePartial]]-shaped [[PointStore]])
  * at O(changes) per [[poll]], and emits the per-column drift frame —
  * and its thresholded [[graft.operators.Profile.checkDrift]] verdicts
  * — for each window the poll folded. `GET /drift` answers "what
  * changed between versions V and W" on demand by reading two
  * snapshots of ONE store; this follower answers the ALERTING question
  * ("did tonight's fold break a contract?") without anyone asking:
  * a scheduler polls after each night, and a non-empty result IS the
  * night's drift report, priced at the night's changes plus an
  * O(columns) join — never O(corpus), never a profile re-run.
  *
  * Mechanics: the mirror is a [[ChangefeedFollower]] with the identity
  * derive (the profile store's column-grain partials are already the
  * partials the mirror folds — sums re-sum, extremes re-fold, the
  * distinct sketches merge), so the window fold inherits the family's
  * exactly-once tag-ledger checkpoint: a crashed poll retried is a
  * manifest-level no-op, and a rebuilt wrapper (restart) resumes from
  * the ledger. The drift frame's FROM endpoint is the mirror snapshot
  * captured just before the fold (member paths resolve at capture;
  * the dirs stay on disk until the mirror is vacuumed), which is
  * exactly why a mirror is maintained at all: the upstream is free to
  * compact and vacuum its history away on its own schedule — the
  * follower owns the poll-boundary content its drift reads need.
  * Falling behind the upstream's changefeed retention fails LOUDLY on
  * poll (the [[PointStore.changesSince]] contract); [[resync]]
  * rebuilds the mirror from the upstream snapshot — after which the
  * next window's drift baseline is the resync point.
  *
  * Mirror compaction is deferred to the START of the next poll, never
  * run inside the poll that just computed a drift frame; read (or
  * materialize) a poll's frame before calling [[vacuumMirror]] — the
  * vacuum deletes the folded-away member files a lazy frame still
  * points at.
  */
final class DriftFollower(spark: SparkSession, upstream: PointStore,
                          path: String, compactEvery: Int = 8) {

  import graft.operators.Profile

  private val mirror = new ChangefeedFollower(spark, upstream, path,
    identity,
    keys = Seq("column"),
    sums = Seq("n_rows", "n_null", "sum_len"),
    maxes = Seq("max_num", "max_str"),
    sketches = Seq("dsk"),
    mins = Seq("min_num", "min_str"))

  /** The mirror store (all state on disk; a restart reconstructs the
    * wrapper and resumes from its tag ledger). */
  def store: PointStore = mirror.store

  /** Upstream version the mirror has folded through. */
  def checkpoint: Long = mirror.checkpoint

  /** Fold upstream changes since [[checkpoint]] and return the drift
    * frame of exactly that window (per-column deltas, the
    * [[graft.operators.Profile.driftBetween]] shape). None when caught
    * up, and None on the FIRST fold — that one establishes the
    * baseline; drift needs two endpoints. */
  def poll(): Option[DataFrame] = {
    // deferred compaction from the previous poll (see class doc)
    if (store.deltaCount >= compactEvery) store.compact()
    // capture the FROM endpoint before folding: the snapshot resolves
    // its member paths now, and those dirs outlive later appends and
    // compactions (only vacuum reclaims them) — so the drift read
    // needs no time travel and survives a vacuumed-through change log
    val pre = if (mirror.result.isDefined) Some(store.snapshot) else None
    val preV = store.version
    mirror.poll(compactEvery = Int.MaxValue)
    if (store.version == preV) None
    else pre.map(p => Profile.driftBetween(p, store.snapshot))
  }

  /** [[poll]] thresholded: the window's long-format
    * `(rule, observed, passed)` alerting report
    * ([[graft.operators.Profile.checkDrift]]). None when caught up or
    * on the baseline fold. */
  def pollGate(): Option[DataFrame] = poll().map(Profile.checkDrift)

  /** Rebuild the mirror from the upstream snapshot (the
    * fell-behind-retention escape hatch). The next window's drift
    * baseline is this resync point. */
  def resync(): Long = mirror.resync()

  /** Reclaim the mirror's unreferenced members. Only safe once every
    * returned drift frame has been read — vacuum deletes the pre-fold
    * member files a lazy frame still points at. */
  def vacuumMirror(): Unit = store.vacuum()
}

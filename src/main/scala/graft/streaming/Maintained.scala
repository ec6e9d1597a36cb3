package graft.streaming

import graft.sources.PointStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The product-analytics reports as MAINTAINED tables — the
  * [[IncrementalCruncher]]/[[StreamingPointStore]] loop applied to the
  * analytics family: the streaming twins' exactly-once emitted cells
  * ([[StreamingFunnel]] reaches, [[StreamingRetention]] cohort cells,
  * [[StreamingPaths]] adjacency pairs) fold into persisted PointStores
  * as each micro-batch lands, so the report READ is O(store) — a
  * handful of key-grain rows — instead of the O(events) re-scan every
  * GET /funnel //retention//paths otherwise pays. At 100 TB of events
  * the difference is the whole point: the scan happens once, in the
  * stream, and the dashboard read never touches it.
  *
  * Exactly-once end to end: the twins emit each cell once by the
  * watermark-finality contract (StreamingSpec), and
  * [[StreamingPointStore.foldBatch]] commits each micro-batch's
  * additive partial under the store's tag ledger, so a foreachBatch
  * redelivery is a no-op and the snapshot is always a prefix-exact
  * report.
  *
  * The registered lifecycles (`funnel_maintained`,
  * `retention_maintained`, `paths_maintained`) drive the loop the way
  * production would: the events table lands as three parquet "nightly
  * drops" sliced by TIME tertiles — a night's file holds that night's
  * events, the shape a watermark is a contract about. (A content-hash
  * slice was tried first and is exactly what the watermark promises
  * NOT to survive: whole files of data arrive below the watermark the
  * previous file advanced, and the engine rightly drops them as late —
  * at this SF the funnel's saturated counts masked it, the
  * paths/retention matrices did not. Cross-batch DISORDER coverage
  * belongs to the twins' own specs, which drive admissible disorder;
  * the lifecycle models the drop cadence.) Each night runs its own
  * maintenance pass with `Trigger.AvailableNow` and the engine
  * RESTARTS between nights — the watermark and file ledger ride the
  * on-disk checkpoint, so the per-night runs also guarantee file order
  * (a consumed night is in the ledger before the next lands). Two
  * far-future watermark-advance sentinels finalize the tail, and each
  * query returns its maintained report — oracled against the one-shot
  * batch SQL over the same events. */
object Maintained {

  /** Sentinel rows advance the watermark; the funnel twin never folds
    * them (not a step), and the retention/paths partials filter the
    * sentinel user before the store commit. */
  val SentinelType = "_watermark"
  val SentinelUser = -1L

  /** A maintained report's fold recipe: the streaming twin's wiring
    * plus the store grain it folds into — ONE definition per report
    * type, shared by the registered lifecycles below and the served
    * ingest face (QueryServer's POST /ingest/report), so the two
    * drive the exact same exactly-once chain. */
  final case class ReportFold(keys: Seq[String], sums: Seq[String],
                              quantiles: Seq[String],
                              wire: DataFrame => DataFrame,
                              partialOf: DataFrame => DataFrame)

  /** Report types a maintained store can hold, with their applicable
    * configuration: `windowMs` = the funnel conversion horizon
    * (REQUIRED for funnel_deepest — the search is anchored — optional
    * for funnel/latency), `period` = the retention calendar grain,
    * `gapMs` = the paths session bound. Inapplicable parameters are
    * refused loudly (a maintained store is one materialization; its
    * configuration must be exact, not silently defaulted). */
  val ReportTypes: Set[String] = Set("funnel", "funnel_deepest",
    "retention", "retention_rolling", "paths", "latency")

  def foldOf(s: SparkSession, typ: String, windowMs: Option[Long] = None,
             period: Option[String] = None,
             gapMs: Option[Long] = None,
             steps: Option[Seq[String]] = None): ReportFold = {
    import s.implicits._
    require(ReportTypes(typ),
      s"report type must be ${ReportTypes.toSeq.sorted.mkString("|")}, got '$typ'")
    def no(p: Option[_], name: String): Unit =
      require(p.isEmpty, s"$name does not apply to report type '$typ'")
    // the funnel family's ordered path is a parameter exactly as on
    // the batch/read faces (an analyst's custom path is configuration,
    // not a redeploy) — and the custom-path read discipline
    // (funnelReportFrom serves a custom store's rows alone) already
    // matches on the way out
    val path = steps.getOrElse(StreamingFunnel.Steps)
    require(path.nonEmpty && path.distinct.size == path.size,
      s"steps must be non-empty and distinct, got $path")
    def funnelEvs(df: DataFrame) =
      df.select(col("user_id"), col("ts"), col("event_type"))
        .as[StreamingFunnel.Ev]
    val notSentinel = (cells: DataFrame) =>
      cells.filter(col("user_id") =!= SentinelUser)
    typ match {
      case "funnel" =>
        no(period, "period"); no(gapMs, "gap")
        ReportFold(Seq("step", "step_name"), Seq("users"), Nil,
          df => StreamingFunnel.funnel(s, funnelEvs(df),
            windowMs.map(ms => s"${ms}ms"), path).toDF,
          _.groupBy("step", "step_name").agg(count(lit(1)).as("users")))
      case "funnel_deepest" =>
        no(period, "period"); no(gapMs, "gap")
        val h = windowMs.getOrElse(throw new IllegalArgumentException(
          "funnel_deepest requires a window (the search is anchored)"))
        ReportFold(Seq("step", "step_name"), Seq("users"), Nil,
          df => StreamingFunnelDeepest.funnel(s,
            df.select(col("user_id"), col("ts"), col("event_type"))
              .as[StreamingFunnelDeepest.Ev], s"${h}ms", path).toDF,
          _.groupBy("step", "step_name").agg(count(lit(1)).as("users")))
      case "retention" | "retention_rolling" =>
        no(steps, "steps"); no(windowMs, "window"); no(gapMs, "gap")
        val evs = (df: DataFrame) =>
          df.select(col("user_id"), col("ts")).as[StreamingRetention.Ev]
        val p = period.getOrElse("week")
        ReportFold(Seq("cohort", "offset"), Seq("users"), Nil,
          df => (if (typ == "retention") StreamingRetention.cells(s, evs(df), p)
                 else StreamingRetention.rollingCells(s, evs(df), p)).toDF,
          cells => notSentinel(cells)
            .groupBy("cohort", "offset").agg(count(lit(1)).as("users")))
      case "paths" =>
        no(steps, "steps"); no(windowMs, "window"); no(period, "period")
        ReportFold(Seq("from_step", "to_step"), Seq("n"), Nil,
          df => StreamingPaths.pairs(s,
            df.select(col("user_id"), col("ts"),
              col("event_id").as("seq"), col("event_type"))
              .as[StreamingPaths.Ev], gapMs).toDF,
          cells => notSentinel(cells)
            .groupBy("from_step", "to_step").agg(count(lit(1)).as("n")))
      case "latency" =>
        no(period, "period"); no(gapMs, "gap")
        import graft.functions.SketchOps
        require(path.size >= 2,
          s"latency needs at least two steps (a hop), got $path")
        val hops = array(path.sliding(2).map { case Seq(a, b) =>
          lit(s"$a->$b") }.toSeq: _*)
        ReportFold(Seq("hop"), Seq("n_users"), Seq("sk"),
          df => StreamingFunnel.funnel(s, funnelEvs(df),
            windowMs.map(ms => s"${ms}ms"), path).toDF.filter(col("step") > 1),
          _.withColumn("hop", element_at(hops, col("step") - 1))
            .groupBy("hop").agg(count(lit(1)).as("n_users"),
              SketchOps.quantileSketch(col("lat_us"),
                graft.operators.TextOps.QuantileK).as("sk")))
    }
  }

  /** Land a frame as ONE parquet file — the "nightly file lands in the
    * bucket" shape a streaming file source consumes. */
  private[graft] def dropFile(df: DataFrame, dir: java.io.File, name: String): Unit = {
    val stage = new java.io.File(dir.getParentFile,
      s"stage_${dir.getName}_$name")
    df.coalesce(1).write.mode("overwrite").parquet(stage.getPath)
    val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(dir, s"$name.parquet").toPath)
    PointStore.deleteRec(stage)
  }

  /** The staged drop files, built ONCE per (JVM, sf dir) and shared by
    * the three lifecycles — the `historicalBase` fixture doctrine: the
    * drops are immutable INPUTS (hardlinked, never mutated, into each
    * query's own watched dir), so in production terms each entry times
    * the maintenance loop, not the upstream export that produced the
    * night files. Five files: the three time-tertile nights plus the
    * two watermark sentinels (max+2d, max+4d). */
  private val stagedDrops =
    new java.util.concurrent.ConcurrentHashMap[String, java.io.File]()

  /** Bench hook (the CurateStore/DedupIndex convention): the staged
    * drops are the upstream exporter's output, not the maintenance
    * loop any entry measures — warm them untimed so the first
    * maintained entry doesn't pay the one-time export. */
  def warmLifecycleFixture(s: SparkSession, d: String): Unit =
    nightsFixture(s, d)

  private def nightsFixture(s: SparkSession, d: String): java.io.File =
    stagedDrops.computeIfAbsent(d, _ => {
      import s.implicits._
      val dir = graft.operators.DedupIndex.freshRunDir("graft_nights_", d)
      dir.mkdirs()
      val ev = graft.Tables.events(s, d)
        .select(col("user_id").cast("long").as("user_id"),
          col("ts").cast("timestamp").as("ts"),
          col("event_id").cast("long").as("event_id"), col("event_type"))
      // time-tertile nights off the two-value bound (driver scalars)
      val b = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts"))), max(col("ts"))).head
      val (mnUs, spanUs) = (b.getLong(0), b.getLong(1) - b.getLong(0) + 1)
      val maxTs = b.getTimestamp(2)
      val night = least(
        floor((unix_micros(col("ts")) - mnUs) * 3.0 / spanUs), lit(2L))
      (0 to 2).foreach(i => dropFile(ev.filter(night === i), dir, s"n$i"))
      Seq(("s1", 2), ("s2", 4)).foreach { case (n, plusDays) =>
        dropFile(Seq((SentinelUser,
            new java.sql.Timestamp(maxTs.getTime + plusDays * 86400000L),
            0L, SentinelType)).toDF("user_id", "ts", "event_id", "event_type"),
          dir, n)
      }
      dir
    })

  /** The funnel report read from a maintained (step, step_name)/users
    * store. A store maintained over the DEFAULT path zero-fills its
    * absent steps (the batch report's exact shape, every step present
    * — an unreached step is zero users, it never vanishes). A store
    * maintained over a CUSTOM path serves ITS rows alone: interleaving
    * default-step zeros into a custom path's rows would read as a
    * funnel nobody maintained (e.g. (1,'land',n) beside (1,'view',0)),
    * so the zero-fill applies only when every store step is on the
    * default list. The step set is key-grain store metadata (a
    * handful of rows), so the custom check is an O(store) read like
    * the report itself. */
  def funnelReportFrom(s: SparkSession, store: PointStore): DataFrame = {
    import s.implicits._
    val defaults = StreamingFunnel.Steps.zipWithIndex
      .map { case (n, i) => (i + 1, n) }
    val snap = store.snapshot
      .select(col("step").cast("int").as("step"), col("step_name"),
        col("users"))
    val custom = snap.select(col("step"), col("step_name"))
      .as[(Int, String)].collect().exists(!defaults.contains(_))
    if (custom) snap
    else {
      val steps = defaults.toDF("step", "step_name")
        .select(col("step").cast("int").as("step"), col("step_name"))
      steps.join(snap, Seq("step", "step_name"), "left")
        .select(col("step"), col("step_name"),
          coalesce(col("users"), lit(0L)).as("users"))
    }
  }

  /** One maintenance pass: consume whatever NEW files sit in `watched`
    * (the checkpoint's file ledger decides what is new — a consumed
    * file is a no-op forever), fold the twin's cells into `store`
    * exactly-once on the store's batch-tag ledger. The unit the
    * registered lifecycles run per night and the served ingest
    * (POST /ingest/report) runs per posted drop. */
  private[graft] def maintainOnce(s: SparkSession, fold: ReportFold,
                                  store: PointStore, watched: String,
                                  ckpt: String): Unit = {
    val stream = s.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")
      .parquet(watched)
    val q = fold.wire(stream).writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        StreamingPointStore.foldBatch(store, fold.partialOf, b, id))
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drive one report's whole maintenance lifecycle against the events
    * table: hardlink the staged drops into this query's watched dir
    * cycle by cycle, run the maintenance job once per cycle (a full
    * engine RESTART between — the checkpoint carries the watermark and
    * file ledger, so consumed files are in the ledger before the next
    * lands), return the maintained store. `fold` is the report type's
    * recipe ([[foldOf]]); `cycles` is the drop schedule — files
    * landing in one cycle share a batch (a set; within-batch order
    * can't matter), files in later cycles see the watermark the
    * earlier ones advanced. */
  private def driveMaintained(s: SparkSession, d: String, prefix: String,
                              fold: ReportFold,
                              cycles: Seq[Seq[String]]): PointStore = {
    val fixture = nightsFixture(s, d)
    val root = graft.operators.DedupIndex.freshRunDir(prefix, d)
    val watched = new java.io.File(root, "drops"); watched.mkdirs()
    val store = new PointStore(s, new java.io.File(root, "report").getPath,
      keys = fold.keys, sums = fold.sums, maxes = Nil,
      quantiles = fold.quantiles)
    val ckpt = new java.io.File(root, "ckpt").getPath
    cycles.foreach { names =>
      names.foreach(n => java.nio.file.Files.createLink(
        new java.io.File(watched, s"$n.parquet").toPath,
        new java.io.File(fixture, s"$n.parquet").toPath))
      maintainOnce(s, fold, store, watched.getPath, ckpt)
    }
    store
  }

  /** The flagship per-night choreography: one cycle per night, then
    * each sentinel alone — five engine restarts, the full nightly
    * cadence. */
  private val PerNight =
    Seq(Seq("n0"), Seq("n1"), Seq("n2"), Seq("s1"), Seq("s2"))
  /** The condensed choreography retention/paths use: same proof
    * obligations (fold across restarts, watermark finality, sentinel
    * tail flush) in three cycles — the per-night cadence is the funnel
    * flagship's job, and a cycle's files share one batch (a set), so
    * grouping loses nothing the twins' own specs don't cover. */
  private val Condensed = Seq(Seq("n0", "n1"), Seq("n2", "s1"), Seq("s2"))

  /** `funnel_maintained`: the chained funnel report as a maintained
    * table. Oracle = the one-shot staged-min funnel SQL. */
  def funnelMaintained(s: SparkSession, d: String): DataFrame = {
    val store = driveMaintained(s, d, "graft_funmaint_",
      foldOf(s, "funnel"), cycles = PerNight)
    funnelReportFrom(s, store)
  }

  /** `funnel_deepest_maintained`: the anchored deepest-chain funnel as
    * a maintained table — the [[StreamingFunnelDeepest]] twin driven
    * against real events. Its reaches are exactly-once per (user,
    * step), so the additive count fold IS the distinct-user depth
    * report, and the read face is the same (step, step_name, users)
    * shape GET /funnel?store= already serves. Oracle = the anchor-
    * grain staged SQL at the registered 1-day horizon. */
  def funnelDeepestMaintained(s: SparkSession, d: String): DataFrame = {
    val store = driveMaintained(s, d, "graft_deepmaint_",
      foldOf(s, "funnel_deepest", windowMs = Some(graft.operators.Windows
        .parseHorizon(graft.operators.Windows.FunnelHorizon))),
      cycles = Condensed)
    funnelReportFrom(s, store)
  }

  /** `retention_maintained`: the weekly cohort matrix as a maintained
    * table. Oracle = the one-shot retention SQL (the cells are emitted
    * exactly once per (user, offset), so the additive fold IS the
    * matrix). */
  def retentionMaintained(s: SparkSession, d: String): DataFrame = {
    val store = driveMaintained(s, d, "graft_retmaint_",
      foldOf(s, "retention", period = Some("week")), cycles = Condensed)
    store.snapshot.select(graft.Tables.tstr(col("cohort")).as("cohort"),
      col("offset"), col("users"))
  }

  /** `retention_rolling_maintained`: the churn curve as a maintained
    * table — the rolling reading ("active at offset k OR LATER")
    * beside the classic matrix. The rolling twin emits the (cohort, k]
    * INCREMENTS as each user's max offset advances (exactly once per
    * (user, offset), eager-safe because the frontier is monotone —
    * [[StreamingRetention.stepRolling]]'s scaladoc), so the same
    * additive (cohort, offset)/users store grain serves both readings;
    * which one a store holds is fixed by the lifecycle that maintains
    * it (a store is ONE materialization — the read face is identical).
    * Oracle = the one-shot rolling SQL over the same events. */
  def retentionRollingMaintained(s: SparkSession, d: String): DataFrame = {
    val store = driveMaintained(s, d, "graft_rollmaint_",
      foldOf(s, "retention_rolling", period = Some("week")),
      cycles = Condensed)
    store.snapshot.select(graft.Tables.tstr(col("cohort")).as("cohort"),
      col("offset"), col("users"))
  }

  /** `paths_maintained`: the transition matrix as a maintained table.
    * Oracle = the one-shot lead-window SQL (pairs are emitted exactly
    * once per adjacency; the µs state grain makes the stream's
    * (ts, event_id) ordering identical to the batch window's). */
  def pathsMaintained(s: SparkSession, d: String): DataFrame = {
    val store = driveMaintained(s, d, "graft_pathmaint_",
      foldOf(s, "paths"), cycles = Condensed)
    store.snapshot.select(col("from_step"), col("to_step"), col("n"))
  }

  /** `paths_sessionized_maintained`: the transition matrix bounded to
    * the registered 30-minute gap-session, as a maintained table — the
    * [[StreamingPaths]] twin's `gapMs` (batch parity with
    * `events_paths_sessionized`'s `withinGapMs`) driven through the
    * nightly lifecycle. Same (from_step, to_step)/n store grain as the
    * unbounded matrix: suppression changes which pairs EMIT, never the
    * fold, so GET /paths?store= serves either store unchanged (which
    * one it holds is the lifecycle's configuration). Oracle = the
    * one-shot sessionized lead-window SQL. */
  def pathsSessionizedMaintained(s: SparkSession, d: String): DataFrame = {
    val store = driveMaintained(s, d, "graft_spathmaint_",
      foldOf(s, "paths", gapMs = Some(1800000L)), cycles = Condensed)
    store.snapshot.select(col("from_step"), col("to_step"), col("n"))
  }

  /** `latency_maintained`: the funnel hop-latency distributions as a
    * maintained table. Every reach the funnel twin emits carries its
    * hop latency (`Reach.lat_us` — the previous reach time was in the
    * fin vector, so it rides for free), so the per-hop p25/p50/p75/p95
    * is ONE more additive fold: a (hop)-keyed store with a count sum
    * and a mergeable QuantileSketch measure, no second stateful
    * pairing, no user-grain join. Exact-regime at the oracle SF (per-
    * hop counts ≪ the sketch's k=4096), so the quantile_disc oracle
    * hash-matches — the quantiles_by_lang convention applied to the
    * funnel's time-to-convert. */
  def latencyMaintained(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchOps
    val store = driveMaintained(s, d, "graft_latmaint_",
      foldOf(s, "latency"), cycles = Condensed)
    store.snapshot.select(col("hop") +: col("n_users") +:
      graft.operators.TextOps.QuantilePoints.map { case (q, n) =>
        SketchOps.quantileAt(col("sk"), q).as(n) }: _*)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Every registered query must run and (except possibly the pair-finders
  * at tiny SF) return rows; plus per-operator invariants that the DuckDB
  * oracle can't express. */
class EngineSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all registered queries run at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("core queries are non-empty at sf0.001") {
    val core = Seq("crunch_global", "crunch_player", "dim_rollup_all",
      "hero_vs_hero", "events_window", "dedup_exact", "ann_topk",
      "text_stats", "multimodal_meta")
    core.foreach { name =>
      withClue(s"$name: ") { assert(SparkEntry.queries(name)(spark, sf).count() > 0) }
    }
  }

  test("every oracle name is a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("window_topn keeps at most 3 rows per customer, ranked") {
    val df = operators.Windows.windowTopN(spark, sf)
    val bad = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(bad == 0)
    assert(df.filter(col("rn") < 1 || col("rn") > 3).count() == 0)
  }

  test("events_funnel: order matters — a step before the previous " +
      "step's reach time never converts, ties are strict") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1 converts the whole path in order
      (1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "purchase"),
      // user 2's purchase PRECEDES the view: reaches view+click only
      (2L, t(1), "purchase"), (2L, t(2), "view"), (2L, t(3), "click"),
      // user 3 never views: reaches nothing
      (3L, t(1), "click"), (3L, t(2), "purchase"),
      // user 4's click ties the first view exactly: strict > rejects it
      (4L, t(5), "view"), (4L, t(5), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = operators.Windows.funnelOf(ev, operators.Windows.FunnelSteps)
      .map(_.select("user_id").as[Long].collect().toSet)
    assert(got == Seq(Set(1L, 2L, 4L), Set(1L, 2L), Set(1L)))
    // and the registered report is non-increasing with named steps
    val report = operators.Windows.eventsFunnel(spark, sf)
      .orderBy("step").collect()
    assert(report.map(_.getString(1)).toSeq ==
      operators.Windows.FunnelSteps)
    val users = report.map(_.getLong(2))
    assert(users.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("events_funnel_windowed: each hop bounded by the horizon, the " +
      "boundary event INCLUSIVE, and greedy first-occurrence (no " +
      "deepest-chain rescue by a later in-window pair)") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val h = Some(operators.Windows.parseHorizon("10m"))
    val ev = Seq(
      // user 1: click at exactly view+10m — the boundary converts
      (1L, t(1), "view"), (1L, t(11), "click"), (1L, t(12), "purchase"),
      // user 2: click one past the deadline — no conversion
      (2L, t(1), "view"), (2L, t(12), "click"),
      // user 3: FIRST in-order click misses the deadline; a later
      // (view, click) pair would fit in a window, but chained-min is
      // greedy on the FIRST view — deliberately not ClickHouse's
      // deepest-chain search (scaladoc'd on funnelOf)
      (3L, t(1), "view"), (3L, t(40), "view"), (3L, t(45), "click"),
      // user 4: in-window hop chain, purchase deadline runs off the
      // CLICK's reach, not the view's
      (4L, t(1), "view"), (4L, t(9), "click"), (4L, t(18), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = operators.Windows
      .funnelOf(ev, operators.Windows.FunnelSteps, h)
      .map(_.select("user_id").as[Long].collect().toSet)
    assert(got == Seq(Set(1L, 2L, 3L, 4L), Set(1L, 4L), Set(1L, 4L)))
    // horizon must be positive and well-formed
    intercept[IllegalArgumentException] {
      operators.Windows.funnelOf(ev, Seq("view"), Some(0L)) }
    intercept[IllegalArgumentException] {
      operators.Windows.parseHorizon("10 minutes") }
    assert(operators.Windows.parseHorizon("90s") == 90000L &&
      operators.Windows.parseHorizon("1d") == 86400000L &&
      operators.Windows.parseHorizon("500ms") == 500L)
    // a 15-digit day count would wrap Long millis — must be the same
    // 400-shaped IllegalArgumentException, never a negative (500) or a
    // double-wrapped wrong positive
    intercept[IllegalArgumentException] {
      operators.Windows.parseHorizon("999999999999999d") }
    intercept[IllegalArgumentException] {
      operators.Windows.parseHorizon("999999999999999h") }
    assert(operators.Windows.parseHorizon("999999999999999ms") ==
      999999999999999L) // in-range stays exact
    // the registered windowed report binds strictly tighter than the
    // unbounded one past step 1
    val unb = operators.Windows.eventsFunnel(spark, sf)
      .orderBy("step").collect().map(_.getLong(2))
    val win = operators.Windows.eventsFunnelWindowed(spark, sf)
      .orderBy("step").collect().map(_.getLong(2))
    assert(win(0) == unb(0) && win(1) < unb(1) && win(2) < unb(2),
      s"win=${win.toSeq} unb=${unb.toSeq}")
  }

  test("funnelOf stepWhere: a per-step predicate narrows that step's " +
      "CANDIDATE set before the chain law — a failing first candidate " +
      "shifts the reach min (moving the next deadline), a user with no " +
      "qualifying event converts unfiltered but never filtered, and " +
      "the predicate composes with horizon + exclude unchanged") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: clicks at 2 ($5, fails) and 4 ($25, passes) — the
      // reach is the QUALIFYING min t(4), not t(2)
      (1L, t(1), "view", 100.0), (1L, t(2), "click", 5.0),
      (1L, t(4), "click", 25.0), (1L, t(5), "purchase", 60.0),
      // user 2 converts unfiltered but its only purchase is $10:
      // filtered stops at click
      (2L, t(1), "view", 100.0), (2L, t(2), "click", 30.0),
      (2L, t(3), "purchase", 10.0),
      // user 3: no qualifying click at all
      (3L, t(1), "view", 100.0), (3L, t(2), "click", 5.0),
      (3L, t(3), "purchase", 60.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val where = Map(2 -> (col("value") > 20.0), 3 -> (col("value") > 50.0))
    val got = operators.Windows
      .funnelOf(ev, operators.Windows.FunnelSteps, stepWhere = where)
      .map(_.select("user_id").as[Long].collect().toSet)
    assert(got == Seq(Set(1L, 2L, 3L), Set(1L, 2L), Set(1L)))
    // the shifted reach: user 1's click min is the qualifying t(4)
    val s2 = operators.Windows
      .funnelOf(ev, operators.Windows.FunnelSteps, stepWhere = where)(1)
      .filter(col("user_id") === 1L).select("t").collect().head.getTimestamp(0)
    assert(s2 == t(4))
    // horizon composes on the NARROWED set: a 2-minute horizon kills
    // user 1 (its qualifying click sits 3 min after the view) even
    // though the non-qualifying click was in time
    val win = operators.Windows.funnelOf(ev, operators.Windows.FunnelSteps,
      Some(120000L), stepWhere = where)
    assert(win(1).select("user_id").as[Long].collect().toSet == Set(2L))
    // a step-1 predicate gates entry itself
    val e1 = operators.Windows.funnelOf(ev, Seq("view", "click"),
      stepWhere = Map(1 -> (col("value") < 0)))
    assert(e1.head.count() == 0)
    // keys index steps 1..n, loudly
    intercept[IllegalArgumentException] {
      operators.Windows.funnelOf(ev, Seq("view"),
        stepWhere = Map(2 -> lit(true))) }
    // the registered report: step 1 untouched (no entry predicate) and
    // step 2 a SUBSET of the windowed step 2 (a theorem: same entries,
    // narrowed click candidates; step 3 is deliberately NOT compared —
    // a shifted click reach moves the purchase deadline later, so
    // set-inclusion stops being a theorem past the first filtered hop)
    val win0 = operators.Windows.eventsFunnelWindowed(spark, sf)
      .orderBy("step").collect().map(_.getLong(2))
    val fil = operators.Windows.eventsFunnelFiltered(spark, sf)
      .orderBy("step").collect().map(_.getLong(2))
    assert(fil(0) == win0(0) && fil(1) <= win0(1),
      s"fil=${fil.toSeq} win=${win0.toSeq}")
  }

  test("funnelDeepestOf exclude: PER-ANCHOR voiding — an excluded " +
      "event strictly between an anchor's consecutive reaches voids " +
      "THAT anchor's hop (open interval, no same-anchor rescue) while " +
      "the user's other anchors search on") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val h = operators.Windows.parseHorizon("30m")
    val x = Map(2 -> "error", 3 -> "error")
    val ev = Seq(
      // user 1: one anchor; error between click reach (5) and purchase
      // (10) voids hop 3 — depth stops at click. The later clean
      // purchase (12) must NOT rescue the anchor (greedy candidate is
      // the min at 10, already voided... 10 is the candidate; void).
      (1L, t(0), "view"), (1L, t(5), "click"), (1L, t(7), "error"),
      (1L, t(10), "purchase"), (1L, t(12), "purchase"),
      // user 2: same poisoned anchor PLUS a second clean anchor at
      // t(40) — per-anchor voiding lets the clean anchor carry the
      // user to depth 3 (the chained law would have no second chance)
      (2L, t(0), "view"), (2L, t(5), "click"), (2L, t(7), "error"),
      (2L, t(10), "purchase"),
      (2L, t(40), "view"), (2L, t(45), "click"), (2L, t(50), "purchase"),
      // user 3: error at EXACTLY the click reach instant — the open
      // interval does not void (strict on both ends)
      (3L, t(0), "view"), (3L, t(5), "click"), (3L, t(5), "error"),
      (3L, t(8), "purchase"),
      // user 4: error before the anchor window's first hop entirely
      // (at the anchor instant itself) — never voids
      (4L, t(0), "error"), (4L, t(1), "view"), (4L, t(5), "click"),
      (4L, t(8), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = operators.Windows
      .funnelDeepestOf(ev, operators.Windows.FunnelSteps, h, exclude = x)
      .map(_.select("user_id").as[Long].distinct.collect().toSet)
    assert(got == Seq(Set(1L, 2L, 3L, 4L), Set(1L, 2L, 3L, 4L),
      Set(2L, 3L, 4L)), got.toString)
    // user 3's purchase hop survives because the t(5) error is NOT
    // strictly between t(5) and t(8)... but an error at t(6) voids it
    val ev3 = ev.union(Seq((3L, t(6), "error")).toDF(
      "user_id", "ts", "event_type"))
    val got3 = operators.Windows
      .funnelDeepestOf(ev3, operators.Windows.FunnelSteps, h, exclude = x)
    assert(!got3(2).select("user_id").as[Long].collect().contains(3L))
    // refusals: out-of-range key, excluded type that is a step
    intercept[IllegalArgumentException] {
      operators.Windows.funnelDeepestOf(ev, Seq("view"), h,
        exclude = Map(2 -> "error")) }
    intercept[IllegalArgumentException] {
      operators.Windows.funnelDeepestOf(ev,
        operators.Windows.FunnelSteps, h, exclude = Map(2 -> "click")) }
    // the registered report binds strictly tighter than the plain
    // deepest one past step 1
    val un = operators.Windows.eventsFunnelDeepest(spark, sf)
      .orderBy("step").collect().map(_.getLong(2))
    val exd = operators.Windows.eventsFunnelDeepestExcluded(spark, sf)
      .orderBy("step").collect().map(_.getLong(2))
    assert(exd(0) == un(0) && exd(1) <= un(1) && exd(2) <= un(2),
      s"excluded=${exd.toSeq} plain=${un.toSeq}")
  }

  test("events_window_tz: the daily series regroups on the market's " +
      "calendar — a UTC evening and the next UTC morning are ONE Tokyo " +
      "day; totals conserved, bucket sets differ from pinned UTC") {
    val tzd = operators.Windows.eventsWindowTz(spark, sf)
    val utc = Tables.events(spark, sf)
      .groupBy(Tables.tstr(date_trunc("day", col("ts"))).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    // conservation: every event lands in exactly one local bucket
    assert(tzd.agg(sum("n")).head.getLong(0) ==
      utc.agg(sum("n")).head.getLong(0))
    // the shift binds: the local bucket set is NOT the UTC set
    val tzStarts = tzd.select("window_start").distinct
      .collect().map(_.getString(0)).toSet
    val utcStarts = utc.select("window_start").distinct
      .collect().map(_.getString(0)).toSet
    assert(tzStarts != utcStarts, "Tokyo day grouping must regroup")
    // every local bucket is a midnight-on-the-wall-clock boundary
    assert(tzStarts.forall(_.endsWith("00:00:00")))
  }

  test("retentionSegmentedOf multi-axis: the entry sample is ONE " +
      "event's (a1..ak) TUPLE (lexicographic min over (ts, tuple)) — " +
      "never independent per-attribute mins — and the 2^2 sets cover " +
      "both 'all' axes") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-01-0$d 10:00:00")
    // user 1's two cohort-day events tie on ts with pairs (B, A) and
    // (A, Z): the tuple law samples (A, Z); independent mins would
    // fabricate (A, A), a pair no event carried
    val ev = Seq(
      (1L, t(1), "B", "A"), (1L, t(1), "A", "Z"), (1L, t(2), "Q", "Q"),
      (2L, t(1), "C", "M"))
      .toDF("user_id", "ts", "seg", "region")
    val m = operators.Windows.retentionSegmentedOf(ev, "day",
      by = Seq("seg" -> "segment", "region" -> "region"))
    val rows = m.collect().map(r => (r.getString(0), r.getString(1),
      r.getInt(3), r.getLong(4))).toSet
    // user 1 is (A, Z) at offsets 0 and 1; user 2 is (C, M) at 0
    assert(rows.contains(("A", "Z", 0, 1L)) &&
      rows.contains(("A", "Z", 1, 1L)) &&
      !rows.exists(r => r._1 == "A" && r._2 == "A"), rows.toString)
    // all four grouping sets present, (all, all) = the plain matrix
    assert(rows.contains(("all", "all", 0, 2L)) &&
      rows.contains(("A", "all", 0, 1L)) &&
      rows.contains(("all", "Z", 0, 1L)), rows.toString)
    // loud on duplicate axes
    intercept[IllegalArgumentException] {
      operators.Windows.retentionSegmentedOf(ev, "day",
        by = Seq("seg" -> "segment", "seg" -> "s2")) }
  }

  test("events_funnel's executed plan: per-step scans pruned by pushed " +
      "type filters; repeated stage subtrees dedupe via exchange reuse") {
    val df = operators.Windows.eventsFunnel(spark, sf)
    df.collect() // reuse only materializes in the FINAL adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // every events scan reads one step's rows (EqualTo pushed to parquet)
    val scans = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
    assert(scans.nonEmpty &&
      scans.forall(_.contains("EqualTo(event_type,")), plan.take(2000))
    // the report's three branches re-state earlier stages; AQE must
    // reuse those exchanges, not recompute the chain per branch
    assert(plan.contains("ReusedExchange") ||
      plan.contains("ReusedQueryStage"), plan.take(2000))
    // "shuffles on user_id alone": every hash exchange in the plan keys
    // on the user — the joins and the re-aggregations after them all
    // ride one partitioning (the only other exchanges are the 3-row
    // report's SinglePartition counts)
    val hashEx = "Exchange hashpartitioning\\([^)]*".r.findAllIn(plan).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("user_id")),
      hashEx.mkString("\n"))
  }

  test("events_funnel_deepest: anchor-grain window search — a later " +
      "in-window chain rescues the user chained-min rejects; every " +
      "stage bounded by the ANCHOR's deadline; bucket join stays equi") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val h = operators.Windows.parseHorizon("10m")
    val ev = Seq(
      // user 3 (the EXACT frame from the chained test): first in-order
      // click misses the first view's deadline, but the second view
      // anchors a window the click fits — deepest converts, chained
      // does not
      (3L, t(1), "view"), (3L, t(40), "view"), (3L, t(45), "click"),
      // user 4: chain fits hop-wise (click at v+9, purchase at c+9)
      // but the purchase is OUTSIDE the anchor's window (v+18 > v+10):
      // deepest stops at click — the anchored bound, not the chained
      (4L, t(1), "view"), (4L, t(9), "click"), (4L, t(18), "purchase"),
      // user 5: full chain at the boundary — purchase at exactly v+10
      (5L, t(1), "view"), (5L, t(5), "click"), (5L, t(11), "purchase"),
      // user 6: purchase before the click never chains
      (6L, t(1), "view"), (6L, t(3), "purchase"), (6L, t(5), "click")
    ).toDF("user_id", "ts", "event_type")
    val deep = operators.Windows
      .funnelDeepestOf(ev, operators.Windows.FunnelSteps, h)
      .map(_.select("user_id").distinct().as[Long].collect().toSet)
    assert(deep == Seq(Set(3L, 4L, 5L, 6L), Set(3L, 4L, 5L, 6L), Set(5L)),
      deep.toString)
    val chained = operators.Windows
      .funnelOf(ev, operators.Windows.FunnelSteps, Some(h))
      .map(_.select("user_id").as[Long].collect().toSet)
    // the documented disagreement: user 3 converts to click only under
    // the deepest search; user 4's purchase converts under CHAINED
    // (per-hop deadline) but not under the anchored window
    assert(!chained(1).contains(3L) && deep(1).contains(3L))
    assert(chained(2).contains(4L) && !deep(2).contains(4L))

    // the bucket trick is a plan detail: no cartesian/nested loop, and
    // the registered report is well-formed with deepest ≥ chained
    val df = operators.Windows.eventsFunnelDeepest(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val deepCounts = df.orderBy("step").collect().map(_.getLong(2))
    val chainedCounts = operators.Windows.eventsFunnelWindowed(spark, sf)
      .orderBy("step").collect().map(_.getLong(2))
    // deepest ≥ chained is a theorem only through step 2 (a chained
    // convert's first-view window contains its click); step 3+ is
    // incomparable in general — users 3 and 4 above are the two
    // directions — though on this data deepest is wider everywhere
    assert(deepCounts.take(2).zip(chainedCounts.take(2))
      .forall { case (d, c) => d >= c },
      s"deep=${deepCounts.toSeq} chained=${chainedCounts.toSeq}")
    assert(deepCounts.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("events_funnel_excluded: an intervening excluded event voids " +
      "the hop (open interval, greedy first-occurrence — no rescue by " +
      "a later clean pair)") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val ex = Map(2 -> "error", 3 -> "error")
    val ev = Seq(
      // user 1: clean full conversion
      (1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "purchase"),
      // user 2: error BETWEEN view and first click voids step 2 — and
      // greedy first-occurrence means the later clean click does NOT
      // rescue (the candidate reach is the FIRST in-order click)
      (2L, t(1), "view"), (2L, t(2), "error"), (2L, t(3), "click"),
      (2L, t(10), "click"),
      // user 3: error BEFORE the view (at the bound) does not void —
      // the interval is open at t_prev
      (3L, t(1), "error"), (3L, t(1), "view"), (3L, t(2), "click"),
      // user 4: error at EXACTLY the click instant does not void (open
      // at the reach), but a second error between click and purchase
      // voids step 3
      (4L, t(1), "view"), (4L, t(2), "error"), (4L, t(2), "click"),
      (4L, t(3), "error"), (4L, t(4), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = operators.Windows
      .funnelOf(ev, operators.Windows.FunnelSteps, exclude = ex)
      .map(_.select("user_id").as[Long].collect().toSet)
    assert(got == Seq(Set(1L, 2L, 3L, 4L), Set(1L, 3L, 4L), Set(1L)),
      got.toString)
    // without the exclusion users 2 and 4 convert where the path exists
    val plain = operators.Windows
      .funnelOf(ev, operators.Windows.FunnelSteps)
      .map(_.select("user_id").as[Long].collect().toSet)
    assert(plain(1) == Set(1L, 2L, 3L, 4L) && plain(2) == Set(1L, 4L))
    // exclusion composes with the horizon: the horizon gates the STEP
    // candidate; the void still reads off the first in-order reach
    val h = Some(operators.Windows.parseHorizon("5m"))
    val withH = operators.Windows
      .funnelOf(ev, operators.Windows.FunnelSteps, h, exclude = ex)
      .map(_.select("user_id").as[Long].collect().toSet)
    assert(withH(1) == Set(1L, 3L, 4L), withH.toString)
    // malformed exclusions are loud: out-of-range hop index, a step
    // named as its own excluded type
    intercept[IllegalArgumentException] {
      operators.Windows.funnelOf(ev, Seq("view", "click"),
        exclude = Map(1 -> "error")) }
    intercept[IllegalArgumentException] {
      operators.Windows.funnelOf(ev, Seq("view", "click"),
        exclude = Map(2 -> "view")) }
    // the registered report binds between the plain and windowed runs
    val rep = operators.Windows.eventsFunnelExcluded(spark, sf)
      .orderBy("step").collect().map(_.getLong(2))
    val unb = operators.Windows.eventsFunnel(spark, sf)
      .orderBy("step").collect().map(_.getLong(2))
    assert(rep(0) == unb(0) && rep(1) <= unb(1) && rep(2) <= unb(2) &&
      rep.sliding(2).forall(p => p(0) >= p(1)),
      s"rep=${rep.toSeq} unb=${unb.toSeq}")

    // the PER-VISIT reading composes: the sessioned frame keys every
    // event by its visit, so an error in the SAME visit voids while
    // the identical error pattern in ANOTHER visit never does
    val sev = Seq(
      // user 1: error between view and click, one visit — voided
      (1L, t(1), 1L, "view"), (1L, t(2), 2L, "error"),
      (1L, t(3), 3L, "click"),
      // user 2: clean first visit converts; the error OPENS the second
      // visit (before its view) — neither visit voids
      (2L, t(1), 4L, "view"), (2L, t(3), 5L, "click"),
      (2L, t(60), 6L, "error"), (2L, t(61), 7L, "view"),
      (2L, t(62), 8L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val sessExcl = operators.Windows
      .funnelSessionsOf(sev, operators.Windows.FunnelSteps,
        exclude = Map(2 -> "error"))
    assert(sessExcl(1).select(col("user_id.u")).as[Long]
      .collect().toSeq.sorted == Seq(2L, 2L), "same-visit error must " +
      "void user 1; user 2's other-visit error must not")
    val sessPlain = operators.Windows
      .funnelSessionsOf(sev, operators.Windows.FunnelSteps)
    assert(sessPlain(1).select(col("user_id.u")).distinct().as[Long]
      .collect().toSet == Set(1L, 2L))
  }

  test("events_retention_tz: cohort boundaries at the market's own " +
      "midnight — a UTC evening and the next UTC morning are ONE local " +
      "day at UTC+9; unknown zones are loud") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      // 20:00 UTC Jan 1 = 05:00 Tokyo Jan 2; 02:00 UTC Jan 2 = 11:00
      // Tokyo Jan 2 — two UTC days, ONE Tokyo day
      (1L, Timestamp.valueOf("2024-01-01 20:00:00")),
      (1L, Timestamp.valueOf("2024-01-02 02:00:00"))
    ).toDF("user_id", "ts")
    val utc = operators.Windows.retentionOf(ev, "day")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(utc == Set(("2024-01-01 00:00:00", 0, 1L),
      ("2024-01-01 00:00:00", 1, 1L)), utc.toString)
    val tokyo = operators.Windows
      .retentionOf(ev, "day", Some(operators.Windows.RetentionTz))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(tokyo == Set(("2024-01-02 00:00:00", 0, 1L)), tokyo.toString)
    // the rolling reading takes the same zone
    val rollTokyo = operators.Windows
      .retentionRollingOf(ev, "day", Some(operators.Windows.RetentionTz))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(rollTokyo == Set(("2024-01-02 00:00:00", 0, 1L)),
      rollTokyo.toString)
    // an unknown zone 400s eagerly, never a mid-job executor error
    intercept[IllegalArgumentException] {
      operators.Windows.retentionOf(ev, "day", Some("Mars/Olympus")) }
  }

  test("events_funnel_deepest_segmented: the segment is the ENTRY " +
      "sample (the user's first step-1 event), never the converting " +
      "anchor's; duplicate-timestamp entries tie-break on the value") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val h = operators.Windows.parseHorizon("10m")
    val ev = Seq(
      // user 1: entry view carries seg A; only the LATER view (seg B)
      // anchors the converting window — the reported segment must
      // still be A (the defining-moment rule, funnelDeepestOf scaladoc)
      (1L, t(1), "view", "A"), (1L, t(40), "view", "B"),
      (1L, t(45), "click", "B"), (1L, t(47), "purchase", "B"),
      // user 2: two entry views at the SAME instant — the (ts, seg)
      // pair min breaks the tie on the value: B, deterministically
      (2L, t(1), "view", "Z"), (2L, t(1), "view", "B"),
      (2L, t(2), "click", "Z")
    ).toDF("user_id", "ts", "event_type", "seg")
    val stages = operators.Windows.funnelDeepestOf(ev,
      operators.Windows.FunnelSteps, h, by = Some(col("seg")))
    val segOf = stages.map(_.select(col("user_id"), col("_seg"))
      .distinct().as[(Long, String)].collect().toMap)
    assert(segOf(0) == Map(1L -> "A", 2L -> "B"), segOf(0).toString)
    assert(segOf(2) == Map(1L -> "A"), segOf(2).toString)
    // the registered report's "all" members equal the unsegmented
    // deepest counts (GROUPING SETS recomputes the distinct count)
    val all = operators.Windows.eventsFunnelDeepestSegmented(spark, sf)
      .filter(col("segment") === "all")
      .orderBy("step").collect().map(_.getLong(3))
    val unseg = operators.Windows.eventsFunnelDeepest(spark, sf)
      .orderBy("step").collect().map(_.getLong(2))
    assert(all.toSeq == unseg.toSeq, s"all=${all.toSeq} unseg=${unseg.toSeq}")
  }

  test("events_funnel_sessions: conversion counts only within one " +
      "gap-session; a user with two converting visits is one user, " +
      "two visits") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val ev = Seq(
      // user 1: view then click 40 min later — SAME journey under the
      // plain funnel, but the 30-min gap splits the visit: no session
      // conversion
      (1L, t(1), 1L, "view"), (1L, t(41), 2L, "click"),
      // user 2: converts twice, in two separate visits
      (2L, t(1), 3L, "view"), (2L, t(2), 4L, "click"),
      (2L, t(100), 5L, "view"), (2L, t(101), 6L, "click"),
      // user 3: in-session view→click, and a NEW session's purchase
      // does not complete yesterday's chain
      (3L, t(1), 7L, "view"), (3L, t(5), 8L, "click"), (3L, t(90), 9L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val stages = operators.Windows
      .funnelSessionsOf(ev, operators.Windows.FunnelSteps)
    val users = stages.map(_.select("user_id.u").distinct()
      .as[Long].collect().toSet)
    assert(users == Seq(Set(1L, 2L, 3L), Set(2L, 3L), Set.empty[Long]),
      users.toString)
    // visit grain: user 2's two converting sessions are two rows
    assert(stages(1).filter(col("user_id.u") === 2L).count() == 2)
    // the plain funnel would have converted user 1 — the session bound
    // is what rejects it
    val plain = operators.Windows
      .funnelOf(ev, operators.Windows.FunnelSteps)
      .map(_.select("user_id").as[Long].collect().toSet)
    assert(plain(1).contains(1L))
  }

  test("events_retention's executed plan: two-column scan, partial " +
      "set-dedup before the user shuffle, nothing user-grain past the " +
      "matrix exchange") {
    val df = operators.Windows.eventsRetention(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the scan reads only the two columns the matrix needs
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(plan).toSeq
    assert(readSchemas.nonEmpty && readSchemas.forall { rs =>
      rs.contains("user_id") && rs.contains("ts") && !rs.contains("value")
    }, readSchemas.mkString("\n"))
    // collect_set is an ObjectHashAggregate with a partial pass below
    // the exchange — a hot user's events dedupe to its period set
    // map-side, inside the scan stage
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    // exactly two hash partitionings: the user shuffle and the matrix
    // key (the computed (cohort, offset) pair prints as two grouping
    // expressions)
    val hashEx = "Exchange hashpartitioning\\([^)]*".r.findAllIn(plan).toSeq
    assert(hashEx.exists(_.contains("user_id")) &&
      hashEx.forall(e => e.contains("user_id") ||
        e.count(_ == ',') == 2), // two grouping keys + partition count
      hashEx.mkString("\n"))
  }

  test("hero_vs_hero has no self-pairs and a symmetric match count") {
    val df = operators.Joins.heroVsHero(spark, sf).cache()
    // pairing is over distinct line numbers; the aggregate keyed both ways
    // must count the same total pairs
    val total = df.agg(sum("played")).head.getLong(0)
    assert(total > 0 && total % 2 == 0) // every (a,b) line pair appears twice
    df.unpersist()
  }

  test("crunch_global_full grand-total row equals the ungrouped fact totals") {
    val df = operators.Crunch.globalFull(spark, sf)
    val grand = df.filter(
      col("filter") === "all" && col("region") === "all" &&
      col("game_mode") === "all" &&
      col("role") === "all" && col("skill_tier") === "all" && col("build") === "all")
    assert(grand.count() == 1)
    val played = grand.select("played").head.getLong(0)
    // sum of every fully-concrete cell must re-add to the grand total
    // (within the filter='all' member — named filters overlap by design)
    val leaves = df.filter(
      col("filter") === "all" &&
      col("region") =!= "all" && col("game_mode") =!= "all" &&
      col("role") =!= "all" && col("skill_tier") =!= "all" && col("build") =!= "all")
      .agg(sum("played")).head.getLong(0)
    assert(played == leaves && played > 0)
    // every named filter member is present and strictly smaller than 'all'
    for ((n, _) <- operators.Crunch.filterDefs) {
      val fPlayed = df.filter(
        col("filter") === n && col("region") === "all" &&
        col("game_mode") === "all" && col("role") === "all" &&
        col("skill_tier") === "all" && col("build") === "all")
        .select("played").head.getLong(0)
      assert(fPlayed > 0 && fPlayed < played, s"filter member $n: $fPlayed")
    }
  }

  test("dim_rollup_all grand total equals lineitem join count") {
    val df = operators.Dimensions.rollupAll(spark, sf)
    val grand = df.filter(col("region") === "all" && col("game_mode") === "all")
      .agg(sum("played")).head.getLong(0)
    val spine = operators.Crunch.spine(spark, sf).count()
    assert(grand == spine)
  }

  test("asof_join matches orders at or before the event time") {
    val df = operators.Joins.asofJoin(spark, sf)
    val joined = df.filter(col("match_order").isNotNull)
    assert(joined.count() > 0)
    // re-join to orders to check the invariant o_orderdate <= ts
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("match_order"), col("o_orderdate"))
    val bad = joined.join(ord, "match_order")
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss") > col("ts"))
    assert(bad.count() == 0)
  }
}

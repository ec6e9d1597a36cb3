package graft

import org.apache.spark.sql.functions._
import graft.streaming.Maintained
import graft.sources.PointStore

/** Library-face coverage of the wire-maintained verbs (the served faces
  * are ServerSpec's; the full lifecycle is the registered
  * `report_takedown` oracle): the config pin's roundtrip and the
  * takedown's crash-heal contract, which no happy path reaches. */
class MaintainedSpec extends SparkSpec {

  test("configOf / foldOfConfig roundtrip every report type's " +
      "configuration and refuse inapplicable parameters") {
    for (cfg <- Seq(
        Maintained.configOf("funnel"),
        Maintained.configOf("funnel", windowMs = Some(60000L),
          steps = Some(Seq("a", "b"))),
        Maintained.configOf("funnel_deepest", windowMs = Some(86400000L)),
        Maintained.configOf("retention", period = Some("week")),
        Maintained.configOf("retention_rolling", period = Some("day")),
        Maintained.configOf("paths", gapMs = Some(1800000L)),
        Maintained.configOf("latency")))
      Maintained.foldOfConfig(spark, cfg) // parses and validates
    intercept[IllegalArgumentException](
      Maintained.foldOfConfig(spark, "type=nope"))
    intercept[IllegalArgumentException](
      Maintained.foldOfConfig(spark, "type=retention;gap_ms=5"))
    intercept[IllegalArgumentException](
      Maintained.foldOfConfig(spark, "window_ms=5"))
  }

  test("takedownUsers heals a crash between purge and flip — the " +
      ".pending marker forces the rebuild even when nothing is left " +
      "to purge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tkdheal")
      .resolve("report").toFile
    val cfg = Maintained.configOf("funnel")
    def ev(u: Long, t: String, id: Long, typ: String) =
      (u, java.sql.Timestamp.valueOf(t), id, typ)
    val cols = Seq("user_id", "ts", "event_id", "event_type")
    Maintained.ingestDrop(spark, dir, cfg, "n1", Seq(
      ev(1, "2024-01-01 10:00:00.000001", 1, "view"),
      ev(2, "2024-01-01 11:00:00.000002", 2, "view")).toDF(cols: _*))
    Maintained.ingestDrop(spark, dir, cfg, "s1",
      Seq(ev(-1, "2024-01-05 00:00:00.0", 0, "_watermark")).toDF(cols: _*))
    def step1Users: Long = Maintained
      .funnelReportFrom(spark, PointStore.open(spark, dir.getPath))
      .filter(col("step") === 1).head.getLong(2)
    assert(step1Users == 2L)
    // simulate the crash: the purge of u2 completed (the drop rewritten
    // by hand, exactly what the first attempt would have left) and the
    // .pending marker was laid, but the flip never ran — the store
    // still reports u2
    val n1 = new java.io.File(dir, "_stream/drops/n1.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft_tkdstage")
    spark.read.parquet(n1.getPath).filter(col("user_id") =!= 2)
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    java.nio.file.Files.move(
      stage.toFile.listFiles().filter(_.getName.endsWith(".parquet"))
        .head.toPath,
      n1.toPath, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val td = new java.io.File(dir, "_stream/takedowns"); td.mkdirs()
    java.nio.file.Files.createFile(new java.io.File(td, "r1.pending").toPath)
    assert(step1Users == 2L) // the flip never happened
    // the redelivered request finds nothing left to purge — the pending
    // marker alone forces the rebuild
    val r = Maintained.takedownUsers(spark, dir, Seq(2L).toDF("user_id"), "r1")
    assert(r.committed && r.removed == 0L, r.toString)
    assert(step1Users == 1L)
    // the committed marker now closes the tag: a redelivery is a no-op
    assert(!Maintained.takedownUsers(spark, dir,
      Seq(2L).toDF("user_id"), "r1").committed)
  }

  test("takedownUsers rebuilds through the store's own pinned config — " +
      "a retention store's purge re-derives the cohort matrix as if " +
      "the user never existed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tkdret")
      .resolve("report").toFile
    val cfg = Maintained.configOf("retention", period = Some("day"))
    def ev(u: Long, t: String, id: Long, typ: String) =
      (u, java.sql.Timestamp.valueOf(t), id, typ)
    val cols = Seq("user_id", "ts", "event_id", "event_type")
    // u1 cohort day1 active day1+day3; u2 cohort day1 active day1+day2;
    // u3 cohort day2 active day2 — u2's purge must shrink BOTH its
    // cells, not just a count somewhere
    val events = Seq(
      ev(1, "2024-01-01 08:00:00.0", 1, "view"),
      ev(2, "2024-01-01 09:00:00.0", 2, "view"),
      ev(2, "2024-01-02 09:30:00.0", 3, "click"),
      ev(3, "2024-01-02 10:00:00.0", 4, "view"),
      ev(1, "2024-01-03 11:00:00.0", 5, "purchase"))
    Maintained.ingestDrop(spark, dir, cfg, "n1", events.toDF(cols: _*))
    Maintained.ingestDrop(spark, dir, cfg, "s1",
      Seq(ev(-1, "2024-01-09 00:00:00.0", 0, "_watermark")).toDF(cols: _*))
    def served = graft.sources.PointStore.open(spark, dir.getPath)
      .snapshot.select(graft.Tables.tstr(col("cohort")).as("cohort"),
        col("offset").cast("int").as("offset"), col("users"))
      .orderBy("cohort", "offset").toJSON.collect().mkString(",")
    def batch(rows: Seq[(Long, java.sql.Timestamp, Long, String)]) =
      graft.operators.Windows.retentionOf(rows.toDF(cols: _*), "day")
        .select(col("cohort"), col("offset").cast("int").as("offset"),
          col("users"))
        .orderBy("cohort", "offset").toJSON.collect().mkString(",")
    assert(served == batch(events))
    val r = Maintained.takedownUsers(spark, dir, Seq(2L).toDF("user_id"), "r1")
    assert(r.committed && r.removed == 2L, r.toString)
    assert(served == batch(events.filter(_._1 != 2L)))
  }

  test("takedownUsers purges through a SKETCH-measure store — the " +
      "latency distributions re-derive from the surviving users alone") {
    import spark.implicits._
    import graft.functions.SketchOps
    val dir = java.nio.file.Files.createTempDirectory("graft_tkdlat")
      .resolve("report").toFile
    val cfg = Maintained.configOf("latency")
    def ev(u: Long, t: String, id: Long, typ: String) =
      (u, java.sql.Timestamp.valueOf(t), id, typ)
    val cols = Seq("user_id", "ts", "event_id", "event_type")
    // u1 converts in 60 s then 120 s; u2 in 30 s then 300 s — after
    // u2's purge every hop's distribution must be exactly u1's values
    val events = Seq(
      ev(1, "2024-01-01 10:00:00.0", 1, "view"),
      ev(1, "2024-01-01 10:01:00.0", 2, "click"),
      ev(1, "2024-01-01 10:03:00.0", 3, "purchase"),
      ev(2, "2024-01-01 11:00:00.0", 4, "view"),
      ev(2, "2024-01-01 11:00:30.0", 5, "click"),
      ev(2, "2024-01-01 11:05:30.0", 6, "purchase"))
    Maintained.ingestDrop(spark, dir, cfg, "n1", events.toDF(cols: _*))
    Maintained.ingestDrop(spark, dir, cfg, "s1",
      Seq(ev(-1, "2024-01-05 00:00:00.0", 0, "_watermark")).toDF(cols: _*))
    def report: Map[String, (Long, Long)] = graft.sources.PointStore
      .open(spark, dir.getPath).snapshot
      .select(org.apache.spark.sql.functions.col("hop"),
        org.apache.spark.sql.functions.col("n_users"),
        SketchOps.quantileAt(org.apache.spark.sql.functions.col("sk"), 0.5)
          .as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(report("view->click") == (2L, 30000000L) ||
      report("view->click") == (2L, 60000000L)) // exact-regime median pick
    val r = Maintained.takedownUsers(spark, dir, Seq(2L).toDF("user_id"), "r1")
    assert(r.committed && r.removed == 3L, r.toString)
    assert(report == Map(
      "view->click" -> (1L, 60000000L),
      "click->purchase" -> (1L, 120000000L)))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

/** The profiler's two regimes: the exact path carries the DuckDB oracle
  * (check.py / Verify), so this spec owns what the oracle cannot see —
  * the approximate path's accuracy bound and its SCALE-defining plan
  * shape (no Expand: the multi-distinct rewrite's row amplification is
  * exactly what `exact = false` exists to avoid at 100 TB). */
class ProfileSpec extends SparkSpec {

  test("approx profile: cardinalities within HLL tolerance of exact; " +
      "every non-distinct measure identical; no Expand in the plan") {
    val docs = Tables.documents(spark, sf)
    val exact = Profile.profileOf(docs, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    val approxDf = Profile.profileOf(docs, exact = false, rsd = 0.02)
    val approx = approxDf.collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)

    exact.keys.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      // HLL++ rsd=0.02: allow 5 sigma-ish slack, never off for small n
      val (ed, ad) = (e.getLong(3), a.getLong(3))
      assert(math.abs(ad - ed) <= math.max(2, 0.10 * ed),
        s"$c: approx distinct $ad vs exact $ed")
      // everything that is not the distinct sketch must be BIT-equal
      Seq(1, 2, 4, 5, 6, 7, 8).foreach { i =>
        assert(e.get(i) == a.get(i), s"$c column $i diverged")
      }
    }

    // the plan contract: approx mode must NOT pay the multi-distinct
    // Expand (that row amplification is the exact regime's price)
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "approx profile plan contains Expand — the single-pass contract broke")
    val exactPlan = Profile.profileOf(docs, exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact profile lost its multi-distinct rewrite — check assumptions")
  }

  test("checkRules: a red gate names its rule and magnitude (the oracle " +
      "only ever sees the all-green testdata)") {
    import spark.implicits._
    import graft.operators.Profile.{NoViolation, Unique}
    val bad = Seq(
      (1L, "ok", "en"), (1L, "ok", "en"),      // duplicate key
      (2L, "", "en"),                          // empty text
      (3L, "ok", "xx"), (4L, "ok", "de")       // unknown lang
    ).toDF("doc_id", "text", "lang")
    val got = Profile.checkRules(bad, Seq(
        Unique("pk", Seq("doc_id")),
        NoViolation("text_nonempty", length(col("text")) === 0),
        NoViolation("lang_known",
          !col("lang").isin("en", "de") || col("lang").isNull)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got("pk") == ((1L, false)))
    assert(got("text_nonempty") == ((1L, false)))
    assert(got("lang_known") == ((1L, false)))
    // NULL-keyed rows are NOT duplicates: they leave both sides of the
    // Unique count (a missing key is the null rule's finding, and SQL's
    // count(DISTINCT) would ignore them anyway — the r13 ADVICE cross-
    // engine divergence). Three null-keyed rows + one real dup = 1.
    val withNulls = Seq(
      (Option(1L), "a"), (Option(1L), "a"),
      (Option.empty[Long], "b"), (Option.empty[Long], "c"),
      (Option.empty[Long], "d")).toDF("doc_id", "text")
    val nu = Profile.checkRules(withNulls, Seq(
        Unique("pk", Seq("doc_id")),
        NoViolation("key_present", col("doc_id").isNull)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(nu("pk") == ((1L, false)),
      "null keys must not count as duplicates")
    assert(nu("key_present") == ((3L, false)))
    // an empty frame gates green (no rows = no violations), not null
    val empty = Profile.checkRules(
      spark.emptyDataset[(Long, String, String)]
        .toDF("doc_id", "text", "lang"),
      Seq(Unique("pk", Seq("doc_id")),
        NoViolation("text_nonempty", length(col("text")) === 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(empty.values.forall(_ == ((0L, true))))
  }

  test("checkDrift: each drift rule fires on its own failure mode and " +
      "NULL avg endpoints (numeric columns) never false-trigger") {
    import spark.implicits._
    // one drift row per column, three failure modes injected: text's
    // mean length halved (extraction regressed), doc_id's cardinality
    // stalled, lang's nulls outgrew its rows
    val drift = Seq(
      ("doc_id", 50L, 0L, 0L, Option.empty[Double], Option.empty[Double]),
      ("text", 50L, 0L, 50L, Some(600.0), Some(250.0)),
      ("lang", 50L, 60L, 1L, Some(2.0), Some(2.0)),
      ("n_chars", 50L, 0L, 3L, Option.empty[Double], Option.empty[Double])
    ).toDF("column", "n_rows_delta", "n_null_delta", "n_distinct_delta",
      "avg_len_from", "avg_len_to")
    val got = Profile.checkDrift(drift)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got("rows_grew") == ((0L, true)))          // all deltas positive
    assert(got("null_surge") == ((1L, false)))        // lang only
    assert(got("cardinality_stalled") == ((1L, false))) // doc_id only
    assert(got("len_collapse") == ((1L, false)))      // text only — the
    // NULL avgs on doc_id/n_chars compared NULL, which is no violation
    // a healthy night reads all-green with the magnitudes at zero
    val healthy = drift
      .withColumn("n_null_delta", lit(0L))
      .withColumn("n_distinct_delta",
        when(col("column") === "doc_id", 50L).otherwise(col("n_distinct_delta")))
      .withColumn("avg_len_to", col("avg_len_from"))
    assert(Profile.checkDrift(healthy).collect()
      .forall(r => r.getLong(1) == 0L && r.getBoolean(2)))
  }

  test("streaming profiler: profilePartial batches folded through " +
      "StreamingPointStore equal the one-shot profile — the profiler's " +
      "streaming twin is pure composition") {
    import spark.implicits._
    import graft.sources.PointStore
    import graft.streaming.StreamingPointStore
    import graft.functions.SketchOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_streamprof").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_streamprof_ck").toString
    def build() = new PointStore(spark, dir, keys = Seq("column"),
      sums = Seq("n_rows", "n_null", "sum_len"),
      maxes = Seq("max_num", "max_str"), sketches = Seq("dsk"),
      mins = Seq("min_num", "min_str"))

    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val rows = docs.as[(Long, String, String, String, Long)].collect()
    val src = MemoryStream[(Long, String, String, String, Long)]
    rows.grouped(math.max(1, rows.length / 3)).foreach(g => src.addData(g.toSeq))
    StreamingPointStore.run(build(),
      src.toDF.toDF("doc_id", "text", "lang", "source", "n_chars"),
      Profile.profilePartial(_), ckpt).awaitTermination()

    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val got = key(build().snapshot
      .select(col("column"), col("n_rows"), col("n_null"),
        SketchOps.sketchEst(col("dsk")).as("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"),
        (col("sum_len") / (col("n_rows") - col("n_null"))).as("avg_len")))
    val want = key(Profile.profileOf(docs, exact = true))
    assert(got == want,
      "streamed profile diverged from the one-shot profile")
  }

  test("checkRef: orphans counted, NULL child keys are not orphans, " +
      "both join policies agree") {
    import spark.implicits._
    val child = Seq(
      (1L, Some(10L)), (2L, Some(10L)), (3L, Some(99L)),  // 99 orphaned
      (4L, None)                                          // NULL: not an orphan
    ).toDF("id", "fk")
    val parent = Seq((10L, "a"), (20L, "b")).toDF("pk", "v")
    Seq(false, true).foreach { bc =>
      val r = Profile.checkRef("edge", child, Seq("fk"),
          parent, Seq("pk"), broadcastParent = bc)
        .collect().head
      assert((r.getString(0), r.getLong(1), r.getBoolean(2))
        == (("edge", 1L, false)), s"broadcastParent=$bc")
    }
    // compound keys: both columns must match
    val c2 = Seq((1L, "x"), (1L, "y")).toDF("a", "b")
    val p2 = Seq((1L, "x")).toDF("a", "b")
    val r2 = Profile.checkRef("pair", c2, Seq("a", "b"), p2, Seq("a", "b"))
      .collect().head
    assert(r2.getLong(1) == 1L && !r2.getBoolean(2))
  }

  test("column subset and unknown-column refusal") {
    val docs = Tables.documents(spark, sf)
    val sub = Profile.profileOf(docs, cols = Seq("lang", "n_chars")).collect()
    assert(sub.map(_.getString(0)).toSet == Set("lang", "n_chars"))
    val err = intercept[IllegalArgumentException] {
      Profile.profileOf(docs, cols = Seq("nope"))
    }
    assert(err.getMessage.contains("nope"))
  }
}

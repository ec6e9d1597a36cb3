package graft

import graft.api._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The fluent API must work over arbitrary schemas — every call here
  * uses RENAMED columns so nothing depends on the testdata names. */
class ApiSpec extends SparkSpec {

  private lazy val corpus = Tables.documents(spark, sf)
    .select(col("doc_id").as("my_id"), col("text").as("body"))

  test("minhashDedupPairs finds the corpus near-dups under renamed columns") {
    val pairs = corpus.minhashDedupPairs("my_id", "body")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reference = Dedup.dedupMinhash(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == reference && pairs.nonEmpty)
  }

  test("buildDedupIndex round-trips the incremental dedup surface under renamed columns") {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_test_api_dedupindex")
    graft.sources.PointStore.deleteRec(dir)
    val idx = corpus.filter(col("my_id") % 5 =!= 0)
      .buildDedupIndex("my_id", "body", dir.getPath)
    idx.appendTagged("delta", corpus.filter(col("my_id") % 5 === 0)
      .select(col("my_id").as("doc_id"), col("body").as("text")))
    // the maintained index answers exactly like the one-shot operator
    val got = idx.allPairs(0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = corpus.minhashDedupPairs("my_id", "body")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("buildCurateStore round-trips the incremental curation surface " +
    "under renamed columns") {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_test_api_curatestore")
    graft.sources.PointStore.deleteRec(dir)
    val docs3 = Tables.documents(spark, sf).select(col("doc_id").as("my_id"),
      col("text").as("body"), col("lang").as("tongue"))
    val store = docs3.filter(col("my_id") <= 399)
      .buildCurateStore("my_id", "body", "tongue", dir.getPath)
    store.curateNight("delta", docs3.filter(col("my_id") > 399)
      .select(col("my_id").as("doc_id"), col("body").as("text"),
        col("tongue").as("lang")))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("content_hash"),
        r.getAs[Long]("cluster_id"), r.getAs[String]("cleaned"))).toSet
    assert(rows(store.snapshot()) ==
      rows(graft.operators.Pipeline.pipelineCurate(spark, sf)))
  }

  test("exactDedupGroups counts every distinct body once") {
    val groups = corpus.exactDedupGroups("my_id", "body")
    assert(groups.count() == corpus.select("body").distinct().count())
  }

  test("duplicateClusters matches the registered cluster operator under renamed columns") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(rows(corpus.duplicateClusters("my_id", "body"))
      == rows(Dedup.dedupClusters(spark, sf)))
  }

  test("chunked matches the registered chunk operator under renamed columns") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(rows(corpus.chunked("my_id", "body"))
      == rows(graft.operators.TextOps.chunkDocuments(spark, sf)))
  }

  test("topKPerGroup bounds group size and orders deterministically") {
    val top = Tables.orders(spark, sf)
      .topKPerGroup(2, Seq("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    assert(top.groupBy("o_custkey").count().filter(col("count") > 2).count() == 0)
  }

  test("sessionized matches the registered sessionize operator") {
    val sess = Tables.events(spark, sf)
      .select(col("user_id").as("who"), col("ts").as("at"), col("event_id"))
      .sessionized("who", "at")
      .groupBy("who", "session_id").count()
    val reference = graft.operators.Windows.eventsSessionize(spark, sf)
      .select(col("user_id"), col("session_id"), col("n_events"))
    val a = sess.collect().map(_.mkString("|")).toSet
    val b = reference.collect().map(r =>
      s"${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}").toSet
    assert(a == b)
  }

  test("funnelBy matches the registered funnel operator under renamed " +
      "columns") {
    val got = Tables.events(spark, sf)
      .select(col("user_id").as("who"), col("ts").as("at"),
        col("event_type").as("kind"))
      .funnelBy("who", "at", "kind", graft.operators.Windows.FunnelSteps)
      .groupBy("step", "step_name").count()
      .collect().map(_.mkString("|")).toSet
    val reference = graft.operators.Windows.eventsFunnel(spark, sf)
      .collect().map(r => s"${r.getInt(0)}|${r.getString(1)}|${r.getLong(2)}")
      .toSet
    assert(got == reference)
    // with the compact-duration horizon → the registered windowed twin
    val gotW = Tables.events(spark, sf)
      .select(col("user_id").as("who"), col("ts").as("at"),
        col("event_type").as("kind"))
      .funnelBy("who", "at", "kind", graft.operators.Windows.FunnelSteps,
        horizon = Some(graft.operators.Windows.FunnelHorizon))
      .groupBy("step", "step_name").count()
      .collect().map(_.mkString("|")).toSet
    val refW = graft.operators.Windows.eventsFunnelWindowed(spark, sf)
      .collect().map(r => s"${r.getInt(0)}|${r.getString(1)}|${r.getLong(2)}")
      .toSet
    assert(gotW == refW && gotW != reference)
  }

  test("perplexityBy and perplexityTrigramBy match the registered LM " +
      "scorers under renamed columns") {
    val docs = Tables.documents(spark, sf).limit(120)
      .select(col("doc_id").as("which"), col("text").as("body"))
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val ref = Tables.documents(spark, sf).limit(120)
      .select(col("doc_id"), col("text"))
    assert(m(docs.perplexityBy("which", "body")) ==
      m(graft.operators.TextOps.perplexityOf(ref)))
    assert(m(docs.perplexityTrigramBy("which", "body")) ==
      m(graft.operators.TextOps.perplexityTrigramOf(ref)))
    assert(docs.perplexityBy("which", "body").columns.head == "which")
  }

  test("pathsBy matches the registered transition matrix under renamed " +
      "columns, and the matrix total is rows minus users") {
    val ev = Tables.events(spark, sf)
    val got = ev.select(col("user_id").as("who"), col("ts").as("at"),
        col("event_id").as("seq"), col("event_type").as("kind"))
      .pathsBy("who", "at", "kind", "seq")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val reg = graft.operators.Windows.eventsPaths(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == reg)
    // each user contributes (events - 1) adjacent pairs
    val n = ev.count(); val users = ev.select("user_id").distinct().count()
    assert(got.values.sum == n - users)
    // the session-bounded reading ≡ the registered sessionized query,
    // and drops exactly the pairs spanning a >30 min silence
    val gotSess = ev.select(col("user_id").as("who"), col("ts").as("at"),
        col("event_id").as("seq"), col("event_type").as("kind"))
      .pathsBy("who", "at", "kind", "seq", withinGap = Some("30m"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val regSess = graft.operators.Windows.eventsPathsSessionized(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(gotSess == regSess)
    assert(gotSess.values.sum < got.values.sum,
      "the session bound must actually drop cross-session pairs")
  }

  test("funnelDeepestBy matches the registered deepest-chain report " +
      "under renamed columns") {
    val got = Tables.events(spark, sf)
      .select(col("user_id").as("who"), col("ts").as("at"),
        col("event_type").as("kind"))
      .funnelDeepestBy("who", "at", "kind",
        graft.operators.Windows.FunnelSteps,
        graft.operators.Windows.FunnelHorizon)
      .groupBy("step", "step_name").count()
      .collect().map(_.mkString("|")).toSet
    val reference = graft.operators.Windows.eventsFunnelDeepest(spark, sf)
      .collect().map(r => s"${r.getInt(0)}|${r.getString(1)}|${r.getLong(2)}")
      .toSet
    assert(got == reference)
  }

  test("retentionBy matches a hand-rolled cohort matrix on renamed " +
      "columns (weekly cohorts, distinct active users per cell)") {
    val ev = Tables.events(spark, sf)
    val got = ev.select(col("user_id").as("who"), col("ts").as("at"))
      .retentionBy("who", "at", "week")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    // reference: per-user distinct week set in memory (sf-bounded)
    val weeks = ev.select(col("user_id"),
        graft.Tables.tstr(date_trunc("week", col("ts"))).as("w"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val exp = weeks.groupBy(_._1).toSeq.flatMap { case (_, ws) =>
      val sorted = ws.map(_._2).sorted
      val cohort = sorted.head
      def days(s: String) = java.time.LocalDateTime
        .parse(s.replace(" ", "T")).toLocalDate.toEpochDay
      sorted.map(w => (cohort, ((days(w) - days(cohort)) / 7).toInt))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == exp)
    // the matrix diagonal: every cohort retains 100% of itself at 0
    val users = weeks.map(_._1).distinct.size.toLong
    assert(got.filter(_._1._2 == 0).values.sum == users)
    intercept[IllegalArgumentException] {
      ev.retentionBy("user_id", "ts", "fortnight") }

    // rolling vs classic on a SPARSE crafted frame (the testdata is
    // too dense to tell them apart): a user active in weeks 0 and 3
    // fills the gap under rolling (came back at 3 ⇒ retained at 1, 2)
    // but leaves holes under classic
    import spark.implicits._
    def w(week: Int) = new java.sql.Timestamp(
      (4 + week * 7) * 86400000L) // 1970-01-05 = the first Monday
    val sparse = Seq((1L, w(0)), (1L, w(3)), (2L, w(0)))
      .toDF("user_id", "ts")
    def cellsOf(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(cellsOf(sparse.retentionBy("user_id", "ts", "week")) ==
      Map(0 -> 2L, 3 -> 1L))
    assert(cellsOf(sparse.retentionBy("user_id", "ts", "week",
        rolling = true)) ==
      Map(0 -> 2L, 1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("distinctCountBy is exact in the sparse regime on any schema") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (s"g${i % 3}", (i % 97).toLong))
    val got = rows.toDF("bucket", "item")
      .distinctCountBy(Seq("bucket"), "item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    assert(got == exact)
  }

  test("withTextStats appends the quality columns to any frame") {
    val stats = corpus.withTextStats("body")
    assert(stats.columns.toSet.contains("quality_score"))
    assert(stats.filter(col("quality_score") < 0 || col("quality_score") > 1.0001)
      .count() == 0)
    assert(stats.count() == corpus.count())
  }

  test("cosineTopK matches the registered brute-force operator") {
    import graft.api._
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = emb.cosineTopK(queries, "vec_id", "embedding", "qid", "qv",
        k = graft.operators.Ann.K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val reg = graft.operators.Ann.annTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == reg && got.nonEmpty)
  }

  test("updateWith overwrites matched rows and preserves the rest") {
    import spark.implicits._
    import graft.api._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "fame")
    val updates = Seq((2L, 99.0), (4L, 77.0)).toDF("id", "fame")
    val got = target.updateWith(updates, "id", Seq("fame"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // row 2 updated, rows 1/3 untouched, update for absent id 4 ignored
    assert(got == Set((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)))
    assert(target.updateWith(updates, "id", Seq("fame")).columns.toSeq
      == Seq("id", "name", "fame"))
  }

  test("asofJoinTo works on renamed keys") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
    val ord = Tables.orders(spark, sf)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"), col("o_orderkey"))
    val j = ev.asofJoinTo(ord, "k", "t", "o_orderkey", Seq("o_orderkey"))
    assert(j.count() == ev.count())
    assert(j.filter(col("o_orderkey").isNotNull).count() > 0)
  }

  test("zOrdered clusters any frame and preserves its content") {
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val out = src.zOrdered("o_custkey", "o_orderkey", "/tmp/graft_api_z", files = 4)
    assert(out.columns.contains("zkey"))
    assert(out.count() == src.count())
    assert(out.drop("zkey").collect().map(_.mkString("|")).toSet
      == src.collect().map(_.mkString("|")).toSet)
    intercept[IllegalArgumentException](
      src.limit(0).zOrdered("o_custkey", "o_orderkey", "/tmp/graft_api_z2"))
  }

  test("mix/budget/shuffle fluent faces match the registered operators " +
    "under renamed columns") {
    import spark.implicits._
    import graft.api._
    val rows = (0L until 300L).map(i =>
      (i, if (i % 2 == 0) "x" else "y", (i % 40) + 1, (i % 7).toDouble))
    val frame = rows.toDF("rid", "bucket", "toks", "score")

    val mixed = frame.mixedByEpochs("rid", "bucket", Seq("x" -> 1.5, "y" -> 0.5))
      .select("rid", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mixedDirect = graft.operators.Mix.mixOf(frame, "rid", "bucket",
      Seq("x" -> 1.5, "y" -> 0.5), 0.0)
      .select("rid", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mixed == mixedDirect && mixed.nonEmpty)

    val budget = frame.tokenBudget("rid", "bucket", "toks", "score", 200L)
    assert(budget.columns.contains("sel_rank") &&
      budget.agg(max(col("start_offset"))).head().getLong(0) < 200L)

    val shuffled = frame.shuffledBy("rid", "seed-a")
    assert(shuffled.select("shuffle_rank").collect().map(_.getLong(0)).sorted
      .toSeq == (0L until 300L))
  }
}

package graft

import graft.operators.Mix
import org.apache.spark.sql.functions._

/** Training-mix assembly properties the DuckDB oracles can't state:
  * reproducibility under repartitioning, the nesting law on fractional
  * epochs, the shuffle's permutation contract, and budget-fill edges. */
class MixSpec extends SparkSpec {

  test("mixOf: epoch counts honor floor+fraction; fractional keeps NEST " +
    "across weights; partitioning never changes the schedule") {
    import spark.implicits._
    val docs = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "hi" else "lo")).toDF("doc_id", "lang")
    def mix(w: Double, parts: Int) = Mix.mixOf(
        docs.repartition(parts), "doc_id", "lang",
        Seq("hi" -> 2.5, "lo" -> w), 0.0)
      .select("doc_id", "lang", "copy")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val m = mix(0.3, 4)
    // whole epochs: every hi doc appears at least twice, copies 0 and 1
    val hiCopies = m.filter(_._2 == "hi").groupBy(_._1).map(_._2.size)
    assert(hiCopies.forall(c => c == 2 || c == 3))
    // the fractional share is the hash-selected subset, copy index = 2
    assert(m.filter(t => t._2 == "hi" && t._3 == 2L).nonEmpty)
    // weight < 1 degenerates to sampling at copy 0
    val lo3 = m.filter(_._2 == "lo")
    assert(lo3.nonEmpty && lo3.forall(_._3 == 0L))
    assert(lo3.size < 200, "fractional weight must actually subsample")
    // NESTING: the docs scheduled at frac 0.3 are a subset of frac 0.6
    val lo6 = mix(0.6, 4).filter(_._2 == "lo")
    assert(lo3.map(_._1).subsetOf(lo6.map(_._1)))
    // determinism: a different partitioning yields the identical schedule
    assert(mix(0.3, 13) == m)
  }

  test("shuffleOf: a true permutation, seeded, stable under partitioning, " +
    "different under a different seed") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => Tuple1(i)).toDF("doc_id")
    def ranks(seed: String, parts: Int): Seq[(Long, Long)] =
      Mix.shuffleOf(docs.repartition(parts), "doc_id", seed)
        .select("doc_id", "shuffle_rank")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val a = ranks("s1", 4)
    // every rank 0..n-1 exactly once (the hierarchical stitch is a
    // permutation, no gap and no collision at shard boundaries)
    assert(a.map(_._2).sorted == (0L until 500L))
    // seeded + deterministic: same seed reproduces, new seed permutes anew
    assert(ranks("s1", 11) == a)
    val b = ranks("s2", 4)
    assert(b.map(_._2).sorted == (0L until 500L) && b != a)
    // and the order really is the md5 order (spot-check adjacency)
    val byRank = Mix.shuffleOf(docs, "doc_id", "s1")
      .orderBy("shuffle_rank").select("shuffle_key")
      .collect().map(_.getString(0)).toSeq
    assert(byRank == byRank.sorted, "rank order must equal key order")
  }

  test("shuffleOf evaluates its input once: both consumers read the " +
    "staged keyed frame, never the upstream pipeline twice") {
    import spark.implicits._
    val docs = (0L until 300L).map(Tuple1(_)).toDF("doc_id")
    val out = Mix.shuffleOf(docs, "doc_id", "s1")
    assert(out.select("shuffle_rank").collect().map(_.getLong(0)).sorted
      .toSeq == (0L until 300L))
    // the keyed frame is staged (Dedup.stagedScope — its release
    // lifecycle is StagedScopeSpec's subject), so the executed plan
    // reads the CACHE on both the window branch and the count branch,
    // and the upstream pipeline (tokenize + mix in assemble_epochs)
    // appears in neither
    // (the plan PRINTER nests the cached relation's own build plan under
    // each scan site, so the upstream may appear in the STRING twice —
    // the cache scans are what prove it executes once)
    val plan = out.queryExecution.executedPlan.toString
    val cacheReads =
      "InMemoryTableScan|TableCacheQueryStage".r.findAllIn(plan).size
    assert(cacheReads >= 2,
      s"expected both consumers to read the staged cache, found " +
        s"$cacheReads cache scans:\n$plan")
  }

  test("budgetOf: straddling doc kept whole, ranking is quality-first, " +
    "over-budget tail dropped, small stratum survives whole") {
    import spark.implicits._
    val docs = Seq(
      // stratum a: scores order c3 > c1 > c2; budget 100 cuts inside c1
      (1L, "a", 60L, 0.8), (2L, "a", 60L, 0.5), (3L, "a", 50L, 0.9),
      // stratum b: fits entirely
      (4L, "b", 10L, 0.1))
      .toDF("doc_id", "lang", "n_tokens", "q")
    val got = Mix.budgetOf(docs, "doc_id", "lang", "n_tokens", "q", 100L)
      .select("doc_id", "sel_rank", "start_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // c3 (rank 0, start 0), c1 (rank 1, start 50 < 100: kept WHOLE even
    // though it ends at 110), c2 (start 110 ≥ 100: dropped), d4 kept
    assert(got == Set((3L, 0L, 0L), (1L, 1L, 50L), (4L, 0L, 0L)), got)
  }

  test("budgetOfSharded equals the serial reference across bucket counts " +
    "— null scores, a null stratum, score ties, clamped outliers") {
    import spark.implicits._
    // adversarial frame: duplicate scores (tie-break by id must not
    // split across the stitch), null scores (one-past-the-end bucket),
    // a null stratum (null-safe base join), scores outside [0,1]
    // (edge-bucket clamp), and enough rows that small bucket counts
    // genuinely multi-shard
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map { i =>
      val lang = if (i % 11 == 0) null else s"l${i % 3}"
      val score: java.lang.Double =
        if (i % 13 == 0) null
        else if (i % 17 == 0) 1.7 - (i % 5)  // outliers both sides
        else math.rint(rnd.nextDouble() * 20) / 20.0 // many exact ties
      (i, lang, 1L + i % 7, score)
    }
    val docs = rows.toDF("doc_id", "lang", "n_tokens", "q")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "sel_rank", "start_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val serial = key(Mix.budgetOf(docs, "doc_id", "lang", "n_tokens", "q", 300L))
    for (buckets <- Seq(1, 2, 8, 1024))
      assert(key(Mix.budgetOfSharded(docs, "doc_id", "lang", "n_tokens",
        "q", 300L, buckets)) == serial, s"buckets=$buckets diverged")
  }

  test("no stratum-wide window over doc-grain data in the sharded " +
    "assembly plans (the 100 TB dominant-language guard)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    // every window partitioned by FEWER than two expressions must sit
    // over an aggregate (the per-shard count/total base frames —
    // metadata-sized by construction); a doc-grain frame reaching a
    // stratum-only window is exactly the serialization the sharded
    // paths exist to rule out
    def hasAgg(p: SparkPlan): Boolean = p.collectFirst {
      case _: BaseAggregateExec => true }.nonEmpty
    def offenders(p: SparkPlan): Seq[WindowExec] = (p.collect {
      case a: AdaptiveSparkPlanExec => offenders(a.executedPlan)
      case w: WindowExec if w.partitionSpec.size < 2 && !hasAgg(w.child) =>
        Seq(w)
    }).flatten
    for (q <- Seq("token_budget_select", "assemble_epochs")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // AQE finalizes the plan on execution
      val bad = offenders(df.queryExecution.executedPlan)
      assert(bad.isEmpty,
        s"$q has ${bad.size} stratum-wide doc-grain window(s):\n" +
          bad.mkString("\n"))
    }
  }

  test("assembleWith composes over the CURATED corpus: the funnel's kept " +
      "docs flow into a deterministic, complete batch layout") {
    import graft.operators.Dedup
    // the two pipeline halves end-to-end: curation's stripped keepers
    // become the assembly's corpus (cleaned text is what trains)
    val curated = graft.operators.Pipeline.pipelineCurate(spark, sf)
      .select(col("doc_id"), col("lang"), col("cleaned").as("text"))
    def run(c: org.apache.spark.sql.DataFrame) =
      Mix.assembleWith(c, Seq("en" -> 1.5), 1.0, "seed-x", 256L,
        packShardSize = 64L)
    val a = run(curated).collect()
    assert(a.nonEmpty)
    // reproducible from the recipe on ANY partitioning (the resumed-run
    // property), and every scheduled (doc, copy) appearance lands in
    // exactly one batch slot
    assert(run(curated.repartition(7)).collect().toSet == a.toSet)
    val apps = a.map(r => (r.getLong(0), r.getLong(1)))
    assert(apps.distinct.length == apps.length)
    // token counts are measured on the CURATED text, not the raw corpus
    val toks = curated.select(col("doc_id"),
        size(Dedup.tokens(col("text"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.forall(r => toks(r.getLong(0)) == r.getAs[Long]("n_tokens")))
  }
}

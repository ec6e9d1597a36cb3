package graft

/** Physical-plan regression net: the scale properties the whole registry
  * is designed around, asserted on every registered query so a future
  * edit can't silently reintroduce a plan that dies at 100 TB. */
class PlanAuditSpec extends SparkSpec {

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no registered query plans a CartesianProduct") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("fact-scale joins never fall back to a nested loop") {
    // BroadcastNestedLoopJoin is legitimate ONLY where a bounded
    // broadcast side meets a non-equi condition: range tiers/series/
    // phase-window dims, regex builds, team_fame's 1-row anchor-date
    // frame, ann_topk's deliberate brute-force baseline (small query
    // set broadcast with qid ≠ neighbor), and since r11 the embedding
    // dedups' Cells-row cover-metadata self-join (the cell-pair list is
    // born distributed; AnnSpec pins that the corpus join beside it
    // stays equi). These queries join data-sized sides and must stay
    // equi-join only:
    val equiOnly = Seq(
      "dedup_exact", "dedup_minhash", "dedup_ngram", "dedup_simhash",
      "ann_ivf", "ann_pq", "hero_vs_hero",
      "crunch_global", "crunch_player",
      "filter_semijoin", "asof_join", "upsert_merge", "pipeline_clean",
      // the segmented family: the dim attach and every chain stage are
      // equi-joins (user_id) — a BNLJ here would be the OR-join shape
      // the rollup design exists to avoid
      "events_funnel_segmented", "events_funnel_windowed_segmented",
      "events_funnel_sessions_segmented", "events_retention_segmented",
      "events_paths_segmented")
    for (name <- equiOnly) {
      val plan = physical(name)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name fell back to a nested-loop join:\n$plan")
    }
  }

  test("rollup Expand operates on pre-aggregated partials, not fact rows") {
    // two-phase shape: the Expand that CUBE/GROUPING SETS needs must sit
    // ABOVE a HashAggregate (the finest-grain partials), so it multiplies
    // hundreds of partial rows instead of the joined fact/pair fan-out
    for (name <- Seq("crunch_global_full", "dim_rollup_all", "hero_vs_hero_full")) {
      val plan = physical(name)
      val expandAt = plan.indexOf("Expand")
      assert(expandAt >= 0, s"$name lost its rollup Expand")
      // in the printed tree, children appear BELOW their parent — a
      // HashAggregate must occur after (deeper than) the Expand
      assert(plan.indexOf("HashAggregate", expandAt) >= 0,
        s"$name: Expand has no aggregate beneath it (cubing raw rows?):\n$plan")
    }
  }

  test("no query broadcasts a raw fact-table scan") {
    // lineitem (participants) and orders (matches) grow with the corpus:
    // a BroadcastExchange whose subtree scans either WITHOUT an
    // intervening aggregation is a plan that OOMs at 100 TB even if it
    // wins at sf0.1 (caught live in r7: the memb-joined order side lost
    // its size estimate and the planner broadcast lineitem instead).
    // Aggregated order-derived frames (team_fame's anchor row, dim
    // discovery) stay legal — they are metadata-grain by construction.
    // `boundedBroadcast` allowlists queries whose broadcast side is a
    // WORKLOAD-bounded slice of a corpus table (a query batch), not a
    // corpus-growing frame — each entry is a deliberate design decision.
    val boundedBroadcast = Set(
      // the ANN query batch (vec_id % 100): sized by the caller's
      // workload; brute-force/IVF scoring broadcasts queries BY DESIGN
      // (ann_pq_refine additionally broadcasts its Q × KRefine
      // candidate list — workload-sized by construction)
      // ann_filtered's broadcast side is the same query batch, label-
      // joined instead of all-pairs
      "ann_topk", "ann_filtered", "ann_ivf", "ann_pq", "ann_pq_refine")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toVector
      def opCol(l: String): Int = {
        val m = "[A-Za-z(]".r.findFirstMatchIn(l.replace(":", " ").replace("+-", "  ").replace("*", " "))
        m.map(_.start).getOrElse(Int.MaxValue)
      }
      lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach {
        case (bLine, i) =>
          val c = opCol(bLine)
          val subtree = lines.drop(i + 1).takeWhile(opCol(_) > c)
          // InMemoryTableScan counts as a fact scan: every persisted
          // frame in this repo is corpus-derived scratch (postings, cell
          // assignments, candidate pairs) — all of it grows with the data
          val scansFact = subtree.exists(l =>
            l.contains("lineitem.parquet") || l.contains("orders.parquet") ||
            l.contains("documents.parquet") || l.contains("embeddings.parquet") ||
            l.contains("events.parquet") || l.contains("InMemoryTableScan"))
          val aggregated = subtree.exists(_.contains("Aggregate"))
          assert(!scansFact || aggregated || boundedBroadcast.contains(name),
            s"$name broadcasts a raw fact scan:\n${(bLine +: subtree).mkString("\n")}")
      }
    }
  }

  test("top-k windows compile to WindowGroupLimit") {
    assert(physical("window_topn").contains("WindowGroupLimit"))
    assert(physical("ann_topk").contains("WindowGroupLimit"))
  }
}

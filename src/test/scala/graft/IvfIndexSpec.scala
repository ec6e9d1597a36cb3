package graft

import graft.functions.VectorOps._
import graft.operators.{Ann, IvfIndex}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Build-once/search-many IVF: full-probe search over the persisted
  * index equals brute force, and a partial probe's scan is partition-
  * pruned to the probed cells. */
class IvfIndexSpec extends SparkSpec {

  private lazy val indexDir = {
    val d = Files.createTempDirectory("graft_ivf").toString
    IvfIndex.build(spark, sf, d)
    d
  }

  private def queries = Tables.embeddings(spark, sf)
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("qid"), normalize(toDouble(col("embedding"))).as("qv"))

  test("full-probe search over the persisted index equals brute force") {
    val idx = IvfIndex.load(spark, indexDir)
    val got = idx.search(queries, Ann.K, nprobe = Ann.Cells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Ann.annTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact)
  }

  test("recallProbe: storage-only recall self-audit — full probe reads " +
      "1.0, the operating point sits in its spec band, deterministic") {
    val idx = IvfIndex.load(spark, indexDir)
    def row(k: Int, np: Int) = {
      val r = idx.recallProbe(k, np).collect().head
      (r.getLong(0), r.getDouble(3), r.getDouble(4))
    }
    // full probe, k small enough that ADC's candidate set covers truth?
    // No — PQ ranking at full probe still reorders; only avg is bounded.
    // The exact bound: searchPq at FULL probe ≡ the global PQ ranking,
    // so recall here is the PQ recall itself — assert the spec band.
    val (nq, avgFull, minFull) = row(10, Ann.Cells)
    assert(nq > 0)
    assert(avgFull >= 0.6, s"full-probe PQ recall@10 $avgFull below band")
    assert(minFull >= 0.0 && avgFull <= 1.0)
    // operating point (partial probe) cannot beat full probe on average
    val (_, avgOp, _) = row(10, Ann.NProbe)
    assert(avgOp <= avgFull + 1e-9)
    // deterministic: the audit is a pure function of the stored index
    assert(row(10, Ann.NProbe) == row(10, Ann.NProbe))
  }

  test("attribute-filtered search: full-probe allowed-set search equals " +
      "the exact filtered ranking; PQ+refine agrees; partial probe never " +
      "leaks a disallowed id") {
    val idx = IvfIndex.load(spark, indexDir)
    val emb = Tables.embeddings(spark, sf)
    // the predicate: neighbors within each query's OWN label. A filtered-
    // search caller holds one predicate per request, so the per-label id
    // frame + that label's queries is the request shape; the union over
    // labels must equal ann_filtered's exact oracle ranking.
    val labels = emb.select(col("label")).distinct()
      .collect().map(_.getInt(0)).sorted
    def reqOf(l: Int) = (
      emb.filter(col("vec_id") % 100 === 0 && col("label") === l)
        .select(col("vec_id").as("qid"),
          normalize(toDouble(col("embedding"))).as("qv")),
      emb.filter(col("label") === l).select(col("vec_id")))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = rows(Ann.annFiltered(spark, sf))
    val got = labels.flatMap { l =>
      val (qs, allowed) = reqOf(l)
      rows(idx.search(qs, Ann.K, nprobe = Ann.Cells,
        allowedIds = Some(allowed)))
    }.toSet
    assert(got == exact)
    // PQ + exact refine at full probe/full refine lands on the same
    // filtered ranking (refine re-ranks by true cosine)
    val l0 = labels.head
    val (qs0, allowed0) = reqOf(l0)
    val q0ids = qs0.collect().map(_.getLong(0)).toSet
    val refined = rows(idx.searchPqRefine(qs0, Ann.K, nprobe = Ann.Cells,
      kRefine = 1000000, allowedIds = Some(allowed0)))
    assert(refined == exact.filter(t => q0ids.contains(t._1)))
    // a partial probe may lose recall but must NEVER leak outside the
    // allowed set
    val partial = rows(idx.search(qs0, Ann.K, nprobe = 2,
      allowedIds = Some(allowed0)))
    val allowedSet = allowed0.collect().map(_.getLong(0)).toSet
    assert(partial.forall(t => allowedSet.contains(t._3)))
  }

  test("incremental append: build on half the corpus, append the rest, search sees all") {
    val d = Files.createTempDirectory("graft_ivf_inc").toString
    val emb = Tables.embeddings(spark, sf)
    val idx = IvfIndex.buildFrom(emb.filter(col("vec_id") % 2 === 0), d)
    idx.append(emb.filter(col("vec_id") % 2 =!= 0))
    val got = idx.search(queries, Ann.K, nprobe = Ann.Cells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // full probe over the appended index ≡ brute force over the WHOLE corpus
    val exact = Ann.annTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact)
  }

  test("rebalance retrains in place: one member, exact search preserved, ledger survives") {
    val d = Files.createTempDirectory("graft_ivf_reb").toString
    val emb = Tables.embeddings(spark, sf)
    val idx0 = IvfIndex.buildFrom(emb.filter(col("vec_id") % 2 === 0), d)
    idx0.appendTagged("b1", emb.filter(col("vec_id") % 2 =!= 0))
    val before = IvfIndex.load(spark, d)
    assert(before.members.size == 2)

    val idx = before.rebalance()
    // one fresh member dir; quantizers republished under the same flip
    assert(idx.members == Seq("rebase-000"))
    assert(idx.centroids.nonEmpty && idx.codebooks.nonEmpty)
    // full-probe search over the rebalanced index still ≡ brute force
    val got = idx.search(queries, Ann.K, nprobe = Ann.Cells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Ann.annTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact)
    // the consumed-tag ledger survived: a late retry of b1 stays a no-op
    val rows = idx.index.count()
    idx.appendTagged("b1", emb.filter(col("vec_id") % 2 =!= 0))
    assert(IvfIndex.load(spark, d).index.count() == rows)
    // and searchPq still works against the retrained codebooks
    assert(idx.searchPq(queries, Ann.K, nprobe = Ann.Cells).count() > 0)
    // a tagged append AFTER the rebalance must preserve the #quant
    // manifest line — losing it would silently revert every future read
    // to the build-time quantizers while the rows carry retrained codes
    idx.appendTagged("b3", emb.limit(5))
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$d/_MEMBERS")))
    assert(manifest.contains("#quant:rebase-000"), manifest)
    assert(manifest.contains("#tag:b1") && manifest.contains("#tag:b3"), manifest)
    // and an UNtagged append lands in a live member (not the orphaned
    // pre-rebalance "index" dir), so its rows stay visible
    val fresh = IvfIndex.load(spark, d)
    val preAppend = fresh.index.count()
    fresh.append(emb.limit(5))
    assert(IvfIndex.load(spark, d).index.count() == preAppend + 5)

    // a STALE handle must not append with the pre-rebalance quantizers —
    // its rows would land in the wrong cell partitions, unreachable by
    // pruned probes; the NEW-tag write fails loudly instead
    val ex = intercept[IllegalArgumentException] {
      before.appendTagged("b2", emb.limit(10))
    }
    assert(ex.getMessage.contains("rebalanced"), ex.getMessage)
    // (the b1 retry above succeeded as a no-op BEFORE the staleness
    // check — consumed tags short-circuit first, by design)
  }

  test("storage-fed near-dup cover equals the one-shot operator; incremental split is exact") {
    val d = Files.createTempDirectory("graft_ivf_neardup").toString
    val emb = Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = pairs(Ann.dedupEmbedding(spark, sf))
    // full-corpus index: stored-vector cover == the one-shot operator,
    // even though THIS index's centroids differ from the operator's
    // (the cover's exactness is centroid-agnostic)
    val full = IvfIndex.buildFrom(emb, d)
    assert(pairs(full.nearDupPairs(Ann.DupThreshold)) == oneShot)
    // incremental: corpus-internal (pre-append snapshot) ∪ delta-
    // involving partitions the one-shot set — no overlap, no gap
    val d2 = Files.createTempDirectory("graft_ivf_neardup2").toString
    val idx = IvfIndex.buildFrom(emb.filter(col("vec_id") % 5 =!= 0), d2)
    val hist = pairs(idx.nearDupPairs(Ann.DupThreshold))
    idx.appendTagged("n1", emb.filter(col("vec_id") % 5 === 0))
    val fresh = pairs(idx.nearDupPairsInvolving("append-n1", Ann.DupThreshold))
    assert(hist.intersect(fresh).isEmpty)
    assert(hist.union(fresh) == oneShot)
    assert(fresh.nonEmpty, "split produced no delta-involving pairs to check")
  }

  test("occupancy alarm fires on distribution drift; recall holds through the cycle") {
    val d = Files.createTempDirectory("graft_ivf_drift").toString
    val emb = Tables.embeddings(spark, sf)
    val idx = IvfIndex.buildFrom(emb.filter(col("vec_id") % 2 === 0), d)

    /** recall@10 of a PARTIAL probe against in-suite brute force over
      * the index's current stored contents (exact scoring, so recall
      * loss is purely probe misses — the quantity appends degrade). */
    def recallAt10(ix: IvfIndex): Double = {
      val stored = ix.index.select(col("neighbor_id"), col("nv"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      val qs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      val got = ix.search(queries, Ann.K, nprobe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
      val hits = qs.map { case (qid, qv) =>
        val exact = stored.filter(_._1 != qid)
          .map { case (id, nv) =>
            (id, nv.zip(qv).map { case (a, b) => a * b }.sum) }
          .sortBy { case (id, c) => (-c, id) }.take(Ann.K).map(_._1).toSet
        (got.getOrElse(qid, Set.empty[Long]) & exact).size.toDouble / exact.size
      }
      hits.sum / hits.length
    }

    val o0 = idx.occupancy
    val r0 = recallAt10(idx)
    // healthy append: the other half of the SAME distribution — balance
    // and partial-probe recall both hold
    idx.appendTagged("same-dist", emb.filter(col("vec_id") % 2 =!= 0))
    val o1 = idx.occupancy
    val r1 = recallAt10(idx)
    assert(o1.total == emb.count(), "append lost rows")
    assert(o1.imbalance <= o0.imbalance * 1.5 + 0.5,
      s"same-distribution append skewed occupancy: ${o0.imbalance} -> ${o1.imbalance}")
    assert(r1 >= r0 - 0.1,
      s"same-distribution append broke partial-probe recall: $r0 -> $r1")

    // drift: an equally-sized batch from a NEW mode — a wide cone
    // around the all-ones direction (internal cosine ~0.14, so the
    // mode has real angular spread) that the build-time quantizer
    // allocated no cells to, so it funnels into the few centroids
    // that happen to align and the alarm must fire
    val drifted = emb.filter(col("vec_id") % 2 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.4f)).as("embedding"))
    idx.appendTagged("drifted", drifted)
    val o2 = idx.occupancy
    val r2 = recallAt10(idx)
    assert(o2.imbalance >= o1.imbalance * 2,
      s"drift metric missed a shifted batch: ${o1.imbalance} -> ${o2.imbalance}")
    // the verdict bound: recall@10 post-append stays within band even
    // with a drifted mode crowding the index (exact scoring; only
    // probe selection can lose neighbors)
    assert(r2 >= r0 - 0.1,
      s"post-drift recall left the band: $r0 -> $r2")

    // rebalance retrains quantizer + codebooks on the CURRENT contents
    // and must hold recall. Occupancy is asserted to stay an HONEST
    // metric, not to flatten: the drifted mode is a genuinely
    // concentrated direction cluster, and spherical k-means cannot
    // (and should not pretend to) spread one direction across cells —
    // imbalance that PERSISTS after a rebalance is the signal that the
    // data itself became modal (raise Cells or shard the hot cell),
    // exactly what the occupancy scaladoc tells an operator
    val idx2 = idx.rebalance()
    val o3 = idx2.occupancy
    val r3 = recallAt10(idx2)
    assert(o3.total == o2.total, "rebalance lost rows")
    assert(o3.populated == o0.cells, "rebalance left dead cells")
    assert(r3 >= r0 - 0.1,
      s"rebalance broke partial-probe recall: $r0 -> $r3")
    System.err.println(f"[ivf-drift] imbalance ${o0.imbalance}%.2f -> ${o1.imbalance}%.2f -> ${o2.imbalance}%.2f -> ${o3.imbalance}%.2f; recall@10 $r0%.3f -> $r1%.3f -> $r2%.3f -> $r3%.3f; populated ${o0.populated}/${o1.populated}/${o2.populated}/${o3.populated}")
  }

  test("partial probe prunes the index scan to the probed cell partitions") {
    val idx = IvfIndex.load(spark, indexDir)
    val search = idx.search(queries, Ann.K, nprobe = 2)
    val plan = search.queryExecution.executedPlan.toString
    // the index scan must carry a partition filter on cell (pruned read),
    // not a post-scan filter over all partitions
    assert(plan.contains("PartitionFilters: [cell#") ||
           plan.matches("(?s).*PartitionFilters: \\[.*cell.*IN.*"),
      plan.split("\n").filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(search.count() > 0)
  }

  test("composed IVF-PQ: full-probe ADC search equals the global PQ ranking") {
    val idx = IvfIndex.load(spark, indexDir)
    val got = idx.searchPq(queries, Ann.K, nprobe = Ann.Cells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // with every cell probed, cell pruning is a no-op and the composed
    // path must reproduce the standalone PQ ranking over the same codes
    val pq = graft.operators.Pq.annPq(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == pq)
  }

  test("IVF-PQ probe reads codes, never the vector column, from pruned partitions") {
    val idx = IvfIndex.load(spark, indexDir)
    val search = idx.searchPq(queries, Ann.K, nprobe = 2)
    val plan = search.queryExecution.executedPlan.toString
    val scanLines = plan.split("\n").filter(_.contains("ReadSchema"))
    val indexScan = scanLines.find(_.contains("codes"))
    assert(indexScan.isDefined, s"no index scan with codes:\n${scanLines.mkString("\n")}")
    // column pruning: the 512-byte vector column stays unread — the scan
    // touches the 16-byte codes (this is PQ's entire point at 100 TB)
    assert(!indexScan.get.contains("nv"), indexScan.get)
    assert(plan.contains("PartitionFilters: [cell#") ||
           plan.matches("(?s).*PartitionFilters: \\[.*cell.*IN.*"),
      plan.split("\n").filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(search.count() > 0)
  }

  test("searchPqRefine: full-candidate refine == exact search; partial refine " +
    "lifts ADC recall; vectors read only in the refine fetch") {
    val idx = IvfIndex.load(spark, indexDir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exactFull = idx.search(queries, Ann.K, nprobe = Ann.Cells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // kRefine covering the whole index: every stored vector is a
    // candidate, so the exact re-rank IS exact search — rank-for-rank
    val refFull = idx.searchPqRefine(queries, Ann.K, nprobe = Ann.Cells,
        kRefine = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(refFull == exactFull)
    // recall@10 vs exact, both full-probe: the re-rank can only help —
    // ADC now only has to LAND the true neighbors in its top kRefine,
    // not rank them (plain ADC recall@10 is ~0.74, the PqSpec number)
    val truth = exactFull.map(t => (t._1, t._3))
    def recallOf(got: Set[(Long, Long)]): Double =
      got.count(truth.contains).toDouble / truth.size
    val rAdc = recallOf(pairs(idx.searchPq(queries, Ann.K, nprobe = Ann.Cells)))
    val rRef = recallOf(pairs(
      idx.searchPqRefine(queries, Ann.K, nprobe = Ann.Cells, kRefine = 50)))
    assert(rRef >= rAdc, s"refine $rRef < plain ADC $rAdc")
    assert(rRef >= 0.9, s"refine recall@10 $rRef")
    // plan: the candidate stage stays codes-only (PQ's entire point);
    // the vector column appears ONLY in the pruned, semi-joined refine
    // fetch — both scans partition-pruned at a partial probe
    val plan = idx.searchPqRefine(queries, Ann.K, nprobe = 2, kRefine = 50)
      .queryExecution.executedPlan.toString
    val scans = plan.split("\n").filter(_.contains("ReadSchema"))
    assert(scans.exists(s => s.contains("codes") && !s.contains("nv")),
      scans.mkString("\n"))
    assert(scans.exists(s => s.contains("nv") && !s.contains("codes")),
      scans.mkString("\n"))
    assert(plan.contains("PartitionFilters: [cell#") ||
           plan.matches("(?s).*PartitionFilters: \\[.*cell.*IN.*"),
      plan.split("\n").filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("a reader handle is ONE quantizer generation across a concurrent rebalance") {
    val d = Files.createTempDirectory("graft_ivf_snap").toString
    val emb = Tables.embeddings(spark, sf)
    IvfIndex.buildFrom(emb.filter(col("vec_id") % 2 === 0), d)
      .appendTagged("b1", emb.filter(col("vec_id") % 2 =!= 0))
    val reader = IvfIndex.load(spark, d)
    // a PRUNED probe is the adversarial case: mixing new members with old
    // centroids would silently search re-assigned cells with the wrong
    // quantizers — force the memoized quantizers, take an answer
    val before = reader.search(queries, Ann.K, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    IvfIndex.load(spark, d).rebalance()

    // the in-flight reader still reads ITS snapshot — same members, same
    // centroids, byte-identical answer (the old dirs stay on disk)
    assert(reader.members == Seq("index", "append-b1"))
    val after = reader.search(queries, Ann.K, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before)
    // stepping onto the new generation is the EXPLICIT reload
    assert(reader.reload().members == Seq("rebase-000"))
  }

  test("rebalance folds members committed AFTER this handle loaded (live manifest, not snapshot)") {
    val d = Files.createTempDirectory("graft_ivf_reb_live").toString
    val emb = Tables.embeddings(spark, sf)
    val idx0 = IvfIndex.buildFrom(emb.filter(col("vec_id") % 2 === 0), d)
    val rebalancer = IvfIndex.load(spark, d) // snapshot: build member only
    // a sequential writer commits a member + ledger tag afterwards —
    // same quantizer generation, so the freshness check alone passes
    idx0.appendTagged("late", emb.filter(col("vec_id") % 2 =!= 0))
    val total = emb.count()

    val idx = rebalancer.rebalance()
    // the rebuild folded the late member's rows and kept its tag: a
    // snapshot-based rebuild would have dropped both silently
    assert(idx.index.count() == total)
    assert(idx.consumedTags == Set("late"))
    // and the retried tag stays a no-op on the rebalanced index
    idx.appendTagged("late", emb.limit(7))
    assert(IvfIndex.load(spark, d).index.count() == total)
  }

  test("append encodes with the persisted codebooks — searchPq sees old and new") {
    val d = Files.createTempDirectory("graft_ivfpq_inc").toString
    val emb = Tables.embeddings(spark, sf)
    val idx = IvfIndex.buildFrom(emb.filter(col("vec_id") % 2 === 0), d)
    idx.append(emb.filter(col("vec_id") % 2 =!= 0))
    val ids = idx.searchPq(queries, Ann.K, nprobe = Ann.Cells)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    assert(ids.exists(_ % 2 == 0) && ids.exists(_ % 2 != 0),
      s"appended half missing from PQ search: $ids")
  }

  test("delete(vecIds): every search face equals an index never holding " +
    "them; redelivery no-op; rebalance reclaims physically") {
    val d = Files.createTempDirectory("graft_ivf_del").toString
    val dRef = Files.createTempDirectory("graft_ivf_del_ref").toString
    val emb = Tables.embeddings(spark, sf)
    val gone = emb.filter(col("vec_id") % 9 === 1)
    val kept = emb.filter(col("vec_id") % 9 =!= 1)
    val idx = IvfIndex.buildFrom(emb, d)
    // the reference shares the SAME quantizers (deletion must not change
    // them — only a rebalance retrains), so exact search results compare
    val ref = IvfIndex.buildFrom(kept, dRef, idx.centroids, idx.codebooks)

    assert(idx.delete("takedown-1", gone.select(col("vec_id"))))
    assert(!idx.delete("takedown-1", gone.select(col("vec_id"))),
      "redelivered takedown must no-op")
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rs(idx.search(queries, Ann.K, nprobe = Ann.Cells)) ==
      rs(ref.search(queries, Ann.K, nprobe = Ann.Cells)),
      "exact search after delete must equal the never-indexed reference")
    assert(rs(idx.searchPq(queries, Ann.K, nprobe = Ann.Cells)) ==
      rs(ref.searchPq(queries, Ann.K, nprobe = Ann.Cells)))
    assert(idx.index.join(gone.select(col("vec_id").as("neighbor_id")),
      Seq("neighbor_id"), "left_semi").count() == 0)
    assert(idx.occupancy.total == kept.count())

    // rebalance applies the deletion physically and retires the tombs
    val reb = idx.rebalance()
    val rebased = spark.read.parquet(
      new java.io.File(d, new java.io.File(d).list()
        .filter(_.startsWith("rebase-")).head).getPath)
    assert(rebased.join(gone.select(col("vec_id").as("neighbor_id")),
      Seq("neighbor_id"), "left_semi").count() == 0,
      "rebalanced member must physically exclude deleted rows")
    assert(reb.index.count() == kept.count())
    // the ledger survived the rebalance: the takedown stays consumed
    assert(!reb.delete("takedown-1", gone.select(col("vec_id"))))
  }
}

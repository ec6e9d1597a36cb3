package graft.operators

import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index: build once, search many — the production shape of
  * `ann_ivf` (which rebuilds per query for the oracle contract).
  *
  * The index parquet is PARTITIONED BY cell, so a probe of `nprobe` cells
  * scans only those partitions — at 100 TB the search cost is
  * nprobe/Cells of the corpus, enforced by partition pruning in the scan
  * (IvfIndexSpec pins the PartitionFilters in the plan). Centroids
  * persist alongside as a Cells-row parquet; search collects the probed
  * cell ids (bounded by Cells, metadata-sized) so the index filter is a
  * literal IN that the datasource prunes on.
  *
  * Every row also carries its PQ codes (encoded at build time against
  * codebooks persisted with the index), so [[searchPq]] composes the two
  * scale levers the way FAISS IVF-PQ does: partition pruning picks WHICH
  * rows are read, column pruning + PQ picks WHAT is read per row — the
  * probed scan touches 16 one-byte codes instead of 64 float64 dims, and
  * candidates are ADC-scored against the whole query batch in one kernel
  * ([[graft.functions.PqAdcAll]]). IvfIndexSpec pins both prunings in
  * the physical plan and equates the full-probe PQ search with the
  * global PQ ranking.
  *
  * SCHEMA EVOLUTION: the embedding DIMENSION is pinned by the build's
  * quantizers — centroids and PQ codebooks are `dim`-length vectors,
  * and every stored `nv`/`codes` row was normalized, assigned, and
  * encoded against them, so a dimension change has no in-place
  * migration that isn't silently wrong (appending a drifted-dim vector
  * fails loudly in cell scoring — AdviceFixSpec pins it). Changing the
  * embedding model (dim OR distribution) means re-embedding upstream
  * and [[IvfIndex.buildFrom]] into a fresh directory. QUANTIZER
  * evolution at a fixed dim, by contrast, is first-class:
  * [[rebalance]] retrains centroids + codebooks on the current
  * contents and re-encodes in place behind one atomic flip — drift in
  * cell balance or codebook fit is an [[occupancy]]-alarmed rebalance,
  * never a rebuild.
  */
final class IvfIndex private (spark: SparkSession, dir: String) {

  // manifest/member path handling via the Hadoop FileSystem API: the
  // index lives on any Hadoop filesystem (file://, hdfs://, s3a://) —
  // atomic-flip semantics per backend on graft.sources.StoreFs
  private val sfs = graft.sources.StoreFs(spark, dir)

  /** The manifest on disk RIGHT NOW — what the write paths check their
    * staleness against. Reads never call this; they use [[manifest]]. */
  private def readManifest(): Seq[String] = sfs.linesIfExists("_MEMBERS")

  /** Manifest SNAPSHOT this handle reads against, taken at construction:
    * one handle = one quantizer generation. `members`/`index` and the
    * memoized `centroids`/`codebooks` all derive from this one snapshot,
    * so a concurrent [[rebalance]] can never make a reader search the
    * NEW rebase member's re-assigned cells with the OLD centroids — the
    * old member/quantizer dirs stay on disk for exactly this handle, and
    * [[reload]] is the explicit step onto the new generation. Only this
    * handle's own tagged commits advance the snapshot (same quantizer
    * generation, so the reads stay consistent). */
  @volatile private var manifest: Seq[String] = readManifest()

  /** Quantizer-directory suffix from the manifest: a [[rebalance]] writes
    * retrained quantizers next to its member dir and names them here, so
    * the flip to (data, centroids, codebooks) is ONE atomic manifest
    * write. Absent → the build-time `centroids`/`pq` dirs. */
  private def quantDir(base: String): String =
    manifest.collectFirst { case l if l.startsWith("#quant:") =>
      sfs.pathOf(s"$base-${l.stripPrefix("#quant:")}") }
      .getOrElse(sfs.pathOf(base))

  lazy val centroids: Array[(Int, Array[Double])] =
    spark.read.parquet(quantDir("centroids")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

  /** PQ codebooks persisted with the index (M × Ks × sub). */
  lazy val codebooks: Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(quantDir("pq")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val ks = rows.map(_._2).max + 1
    val cb = Array.ofDim[Array[Double]](m, ks)
    rows.foreach { case (mi, k, v) => cb(mi)(k) = v }
    cb.map(_.toArray)
  }

  /** THE manifest grammar, in one place — every reader (snapshot) and
    * writer (live-read) path parses through these two, so a format
    * change cannot silently diverge between them. */
  private def membersOf(lines: Seq[String]): Seq[String] = {
    val m = lines.filterNot(_.startsWith("#"))
    if (m.isEmpty) Seq("index") else m
  }

  private def tagsOf(lines: Seq[String]): Set[String] =
    lines.collect { case l if l.startsWith("#tag:") =>
      l.stripPrefix("#tag:") }.toSet

  private def tombsOf(lines: Seq[String]): Seq[String] =
    lines.collect { case l if l.startsWith("#tomb:") =>
      l.stripPrefix("#tomb:") }

  /** Member data directories of the index (relative to `dir`): the
    * initial build plus one per tagged append. An index written before
    * the manifest existed is just its build dir. Snapshot-consistent
    * with `centroids`/`codebooks` (see [[manifest]]). */
  def members: Seq[String] = membersOf(manifest)

  /** Tags whose append already committed (the exactly-once ledger), as
    * of this handle's snapshot. The write path re-reads the live
    * manifest, so a tag committed by ANOTHER handle still no-ops. */
  def consumedTags: Set[String] = tagsOf(manifest)

  /** The full index frame: every member shares the cell=N layout, read
    * separately and unioned (Spark's partition discovery refuses sibling
    * roots in one read). A cell predicate pushes through the Union into
    * EACH member's scan as a PartitionFilter, so pruning after appends
    * is identical to the single-root case (StreamingIndexSpec pins
    * it). */
  def index: DataFrame = {
    val rows =
      members.map(m => spark.read.parquet(sfs.pathOf(m))).reduce(_ unionByName _)
    applyTombs(rows, tombsOf(manifest))
  }

  /** Subtract tombstoned vectors ([[delete]]) — one anti-join whose
    * build side is the takedown list, small by nature, so AQE
    * broadcasts it under the cell-pruned scan and the (nv, codes)
    * payload streams untouched. */
  private def applyTombs(rows: DataFrame, ts: Seq[String]): DataFrame =
    if (ts.isEmpty) rows
    else rows.join(
      ts.map(t => spark.read.parquet(sfs.pathOf(t))).reduce(_ unionByName _)
        .select(col("neighbor_id")),
      Seq("neighbor_id"), "left_anti")

  /** Doc-grain deletion — the takedown verb ([[DedupIndex.delete]]'s
    * pattern on the vector index): the id list lands in a tombstone dir
    * published by a `#tomb:` manifest line; every read face (`index`,
    * and with it search / searchPq(/Refine) / nearDupPairs / cellStats
    * / occupancy) subtracts it as if the vectors were never indexed.
    * [[rebalance]] applies the deletion PHYSICALLY — the retrained
    * member excludes the rows and the `#tomb:` lines retire with its
    * flip, the moment the bytes stop being scanned. Exactly-once per
    * `tag` via the shared consumed-tag ledger; deleted ids are RETIRED
    * (re-appending one is a contract violation — before the rebalance
    * the tombstone would silently filter it, after it would resurface).
    * Input: a `vec_id` column. Returns whether THIS call committed. */
  def delete(tag: String, vecIds: DataFrame,
             leaseWaitMs: Long = 0L): Boolean =
      sfs.withWriterLease(waitMs = leaseWaitMs) {
    val lines = readManifest()
    if (tagsOf(lines)(tag)) return false
    val seen = sfs.names() ++ tombsOf(lines)
    val k = seen.collect {
      case s if s.startsWith("tombs-") => s.stripPrefix("tombs-").toInt
    }.foldLeft(-1)(math.max) + 1
    val name = f"tombs-$k%03d"
    vecIds.select(col("vec_id").as("neighbor_id")).distinct()
      .write.mode(SaveMode.Overwrite).parquet(sfs.pathOf(name))
    val meta = lines.filter(l => l.startsWith("#") && !l.startsWith("#tag:"))
    val newLines = (membersOf(lines) ++ meta ++ Seq(s"#tomb:$name") ++
      (tagsOf(lines) + tag).toSeq.sorted.map("#tag:" + _))
    sfs.atomicWrite("_MEMBERS", newLines.mkString("\n").getBytes)
    manifest = newLines
    true
  }

  /** Incremental maintenance: assign NEW vectors with the EXISTING
    * quantizer (cells AND PQ codebooks) and append their rows to the
    * cell partitions. The centroids — and therefore partition pruning —
    * are unchanged, so searches immediately see old ∪ new; standard IVF
    * practice retrains the quantizer only on a full rebuild (cell
    * balance drifts as the distribution does, recall does not break). */
  /** Fresh handle on the same directory (re-reads manifest + quantizers) —
    * what a writer calls after a staleness rejection. */
  def reload(): IvfIndex = IvfIndex.load(spark, dir)

  /** The quantizer generation this handle was loaded against, re-checked
    * on every write: an append that assigned vectors with STALE
    * quantizers after a concurrent [[rebalance]] would scatter rows into
    * the wrong cell partitions — silently unreachable by pruned probes.
    * Fail loudly instead (the PointStore retention-horizon pattern);
    * the caller reloads the handle and retries. */
  private val loadedQuant: Option[String] =
    manifest.collectFirst { case l if l.startsWith("#quant:") =>
      l.stripPrefix("#quant:") }

  private def requireFreshQuantizers(lines: Seq[String]): Unit = {
    val now = lines.collectFirst { case l if l.startsWith("#quant:") =>
      l.stripPrefix("#quant:") }
    require(now == loadedQuant,
      s"index at $dir was rebalanced (quantizers $loadedQuant -> $now) " +
        "after this handle loaded; reload the index and retry the append")
  }

  def append(newEmb: DataFrame): Unit = {
    // ONE manifest snapshot feeds both the staleness check and the
    // target-member choice: two separate reads would let a rebalance
    // land in between and this handle's stale-quantizer rows would go
    // INTO the live rebase member — silent wrong-cell corruption, worse
    // than an orphaned dir. (Writes remain single-writer-at-a-time by
    // contract; the snapshot closes the check-vs-target window, not the
    // write-vs-write race.)
    val lines = readManifest()
    requireFreshQuantizers(lines)
    // into the CURRENT first member — after a rebalance "index" is no
    // longer a manifest member, and rows written there would be silently
    // invisible to every union read
    val head = membersOf(lines).head
    IvfIndex.writeAssignments(newEmb, centroids, codebooks,
      sfs.pathOf(head), org.apache.spark.sql.SaveMode.Append)
  }

  /** Tagged exactly-once append — the streaming-maintenance commit
    * (PointStore's appendTagged contract applied to the index): the
    * batch writes into its OWN member directory (Overwrite, so a
    * half-written dir from a crashed attempt is clobbered on retry,
    * never read — only the manifest makes it visible), and one atomic
    * manifest flip publishes the member and consumes the tag. A retry
    * of a consumed tag is a no-op, so foreachBatch's at-least-once
    * redeliveries index each batch exactly once. Returns whether THIS
    * call committed (false = the tag was already consumed) — the
    * committed-status source a server face reports from, like
    * [[CurateStore.curateNight]]. */
  def appendTagged(tag: String, newEmb: DataFrame,
                   leaseWaitMs: Long = 0L): Boolean =
      sfs.withWriterLease(waitMs = leaseWaitMs) {
    // one LIVE manifest read for the whole commit (see append's note)
    val lines = readManifest()
    val tags = tagsOf(lines)
    if (tags(tag)) return false
    requireFreshQuantizers(lines)
    val name = s"append-$tag"
    IvfIndex.writeAssignments(newEmb, centroids, codebooks, sfs.pathOf(name),
      org.apache.spark.sql.SaveMode.Overwrite)
    // preserve every non-tag metadata line (the #quant: pointer a
    // rebalance published!) — rebuilding the manifest from members+tags
    // alone would silently revert reads to the build-time quantizers
    val meta = lines.filter(l => l.startsWith("#") && !l.startsWith("#tag:"))
    val mem = membersOf(lines)
    val newLines =
      (mem :+ name) ++ meta ++ (tags + tag).toSeq.sorted.map("#tag:" + _)
    sfs.atomicWrite("_MEMBERS", newLines.mkString("\n").getBytes)
    // the commit this handle just made is the SAME quantizer generation
    // (requireFreshQuantizers above), so advancing the read snapshot to
    // it keeps the one-handle-one-generation invariant while letting the
    // writer search its own appended rows
    manifest = newLines
    true
  }

  /** Rebuild-in-place — the LSM-compaction analog for the index. Appends
    * keep the BUILD-time quantizer (correct but drift-prone: cell balance
    * and codebook fit degrade as the ingested distribution shifts, and
    * every tagged append adds one member dir to the union). `rebalance()`
    * retrains BOTH quantizer levels on the index's CURRENT contents,
    * re-assigns + re-encodes every stored vector into ONE fresh member
    * directory, and publishes data + quantizers with a single atomic
    * manifest flip. The consumed-tag ledger SURVIVES the flip
    * (PointStore's compaction lesson: a late foreachBatch retry of an
    * already-indexed streaming batch must stay a no-op), and the previous
    * member/quantizer dirs stay on disk for in-flight readers — the
    * manifest is the one commit point. Returns a fresh handle; this
    * instance's memoized quantizers are stale after the flip. */
  def rebalance(): IvfIndex = sfs.withWriterLease() {
    // LIVE manifest for the whole rebuild — members, tags, AND the
    // freshness check. Rebuilding from this handle's read snapshot would
    // silently drop any member another handle committed since this
    // handle loaded (same quantizer generation, so the staleness check
    // alone cannot catch it) and erase its ledger tag with the flip.
    val lines = readManifest()
    requireFreshQuantizers(lines) // same single-writer contract as the appends
    val mem = membersOf(lines)
    val tags = tagsOf(lines)
    // tombstones applied through the rebuild read: the retrained member
    // physically excludes deleted rows, and the flip below retires the
    // #tomb lines with them
    val all = applyTombs(
        mem.map(m => spark.read.parquet(sfs.pathOf(m))).reduce(_ unionByName _),
        tombsOf(lines))
      .select(col("neighbor_id").as("vec_id"), col("nv").as("embedding"))
    val cents = Ann.trainCentroids(all)
    val cb = Pq.trainCodebooks(all)
    val n = sfs.names().count(_.startsWith("rebase-"))
    val name = f"rebase-$n%03d"
    IvfIndex.writeAssignments(all, cents, cb, sfs.pathOf(name),
      SaveMode.Overwrite)
    IvfIndex.writeQuantizers(spark, cents, cb,
      sfs.pathOf(s"centroids-$name"), sfs.pathOf(s"pq-$name"))
    sfs.atomicWrite("_MEMBERS",
      ((Seq(name, s"#quant:$name")) ++
        tags.toSeq.sorted.map("#tag:" + _)).mkString("\n").getBytes)
    IvfIndex.load(spark, dir)
  }

  /** Candidate restriction for filtered search: semi-join the pruned
    * index scan against the caller's allowed-id frame (its single
    * column is taken as the id). Runs BEFORE any distance computation;
    * broadcast-vs-shuffle is left to the planner/AQE — the allowed set
    * may be ten ids (a tenant) or most of the corpus (a license
    * class). */
  private def allow(pruned: DataFrame, allowedIds: Option[DataFrame]): DataFrame =
    allowedIds match {
      case None => pruned
      case Some(ids) =>
        val idCol = ids.columns.head
        pruned.join(ids.select(col(idCol).as("neighbor_id")).distinct(),
          Seq("neighbor_id"), "left_semi")
    }

  /** Top-k neighbors for (qid, qv double-array) queries over the probed
    * cells only, scored EXACTLY on the stored vectors.
    *
    * `allowedIds` (one `neighbor_id`-compatible id column) restricts
    * candidates to that set — ATTRIBUTE-FILTERED search. Any predicate
    * over any metadata table reduces to an id frame, so the index never
    * stores attributes; the semi-join lands on the cell-pruned codes
    * scan, before a single distance is computed. At full probe the
    * filtered ranking is EXACT over the allowed set (AnnSpec pins it
    * against `ann_filtered`'s oracle ranking); at partial probe the
    * usual IVF recall trade applies per allowed-set density — when the
    * filter is highly selective, raise nprobe (the standard filtered-
    * IVF discipline). */
  def search(queries: DataFrame, k: Int, nprobe: Int,
             allowedIds: Option[DataFrame] = None): DataFrame = {
    val probed = probedOf(queries, nprobe)
    val cells = probedCells(probed)
    val pruned = allow(index.filter(col("cell").isin(cells: _*)), allowedIds)
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("neighbor_id"))
    broadcast(probed)
      .join(pruned, Seq("cell"))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("c", dot(col("qv"), col("nv")))
      .select(col("qid"), col("neighbor_id"), col("c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  /** Top-k neighbors over the probed cells, ADC-scored on the stored PQ
    * codes — the composed IVF-PQ read path: the pruned scan reads
    * (neighbor_id, codes, cell) and never touches the 512-byte vector
    * column (column pruning, pinned in IvfIndexSpec). Scores for the
    * whole query batch come from one [[graft.functions.PqAdcAll]] kernel
    * pass; the probed (qid, cell) pairs then keep each candidate only
    * for the queries that actually probe its cell. */
  def searchPq(queries: DataFrame, k: Int, nprobe: Int,
               allowedIds: Option[DataFrame] = None): DataFrame =
    adcRanked(queries, k, nprobe, allowedIds) match {
      case None => IvfIndex.emptyTopk(spark)
      case Some((ranked, _)) =>
        ranked.select(col("qid").as("query_id"),
          col("rank").cast("long").as("rank"), col("neighbor_id"))
    }

  /** ADC top-k per query over the probed cells — (qid, neighbor_id, rank,
    * c) plus the probed cell list — or None for an empty workload.
    * Shared by [[searchPq]] (rename and done) and [[searchPqRefine]]
    * (candidate stage). */
  private def adcRanked(queries: DataFrame, k: Int, nprobe: Int,
                        allowedIds: Option[DataFrame] = None)
      : Option[(DataFrame, Seq[Int])] = {
    val cb = codebooks
    val probed = probedOf(queries, nprobe)
    val cells = probedCells(probed)
    val qluts = probed.select(col("qid"), col("qv")).distinct()
      .select(col("qid"), Pq.lutCol(col("qv"), cb).as("lut"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    if (qluts.isEmpty) return None
    val qids = qluts.map(_._1)
    val pruned = allow(index.filter(col("cell").isin(cells: _*)), allowedIds)
      .select(col("neighbor_id"), col("codes"), col("cell"))
    val scored = pruned
      .select(col("neighbor_id"), col("cell"),
        posexplode(Pq.adcAllCol(col("codes"), qluts.map(_._2))).as(Seq("pos", "c")))
      .withColumn("qid", element_at(typedLit(qids), col("pos") + 1))
      .join(broadcast(probed.select(col("qid"), col("cell"))), Seq("qid", "cell"),
        "left_semi")
      .filter(col("qid") =!= col("neighbor_id"))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("neighbor_id"))
    Some((scored
      .select(col("qid"), col("neighbor_id"), col("c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k), cells))
  }

  /** IVF-PQ with exact re-ranking (the FAISS refine stage): ADC retrieves
    * `kRefine ≥ k` candidates per query from the probed cells — 16-byte
    * code rows, never the vector — then ONLY the candidate rows' full
    * vectors are read back and the final top-k is ranked by EXACT cosine.
    * Cost at 100 TB: the scan-heavy stage stays pure PQ (32× less IO);
    * the refine reads Q × kRefine vectors through a partition-pruned
    * (probed cells only), broadcast-semi-joined fetch — workload-sized,
    * not corpus-sized. Buys back most of the quantization recall loss:
    * ADC only has to land the true neighbors anywhere in its top
    * kRefine, not rank them correctly (IvfIndexSpec measures the
    * recall@10 lift and pins the codes-only candidate scan). Ties rank
    * like [[search]] (cosine desc, neighbor_id asc). */
  def searchPqRefine(queries: DataFrame, k: Int, nprobe: Int,
                     kRefine: Int,
                     allowedIds: Option[DataFrame] = None): DataFrame = {
    require(kRefine >= k,
      s"searchPqRefine: kRefine ($kRefine) must be >= k ($k)")
    adcRanked(queries, kRefine, nprobe, allowedIds) match {
      case None => IvfIndex.emptyTopk(spark)
      case Some((cand, cells)) =>
        val candIds = cand.select(col("qid"), col("neighbor_id"))
        // candidate ids are workload-bounded (Q × kRefine) → broadcast;
        // the cell filter keeps file-level pruning on the vector fetch
        val vecs = index.filter(col("cell").isin(cells: _*))
          .select(col("neighbor_id"), col("nv"))
          .join(broadcast(candIds.select(col("neighbor_id")).distinct()),
            Seq("neighbor_id"), "left_semi")
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("c").desc, col("neighbor_id"))
        broadcast(candIds)
          .join(vecs, Seq("neighbor_id"))
          .join(broadcast(queries.select(col("qid"), col("qv")).distinct()),
            Seq("qid"))
          .withColumn("c", dot(col("qv"), col("nv")))
          .select(col("qid"), col("neighbor_id"), col("c"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("qid").as("query_id"),
            col("rank").cast("long").as("rank"), col("neighbor_id"))
    }
  }

  /** Exact cosine near-dup pairs (dot ≥ threshold) over the STORED
    * vectors — [[Ann.dedupEmbedding]]'s triangle-pruned cell-pair cover
    * executed from storage with THIS index's cells: no re-assignment,
    * no all-pairs, and the cover stays provably exact for any centroid
    * set (the spherical triangle inequality never references centroid
    * quality — worse centroids only admit more candidate cell pairs).
    * The backfill face of incremental embedding dedup. */
  def nearDupPairs(threshold: Double): DataFrame =
    nearDupBetween(index, threshold, memberSide = None)

  /** The incremental face: exact near-dup pairs with at least one
    * endpoint in `member` (typically the delta [[appendTagged]] just
    * committed) — delta cells against the whole index, O(delta)-sided
    * assignment work (the delta was assigned once, at append). Pairs
    * are (id_a < id_b) like the one-shot operator; member-vs-member
    * collisions arrive in both orientations and are normalized. */
  def nearDupPairsInvolving(member: String, threshold: Double): DataFrame = {
    require(members.contains(member), s"unknown member $member (have $members)")
    nearDupBetween(index, threshold,
      memberSide = Some(spark.read.parquet(sfs.pathOf(member))))
  }

  /** Shared cover: per-cell angular radii over the WHOLE index (every
    * stored vector, appended members included, must be inside its
    * cell's radius or the cover is no longer a proof), candidate cell
    * pairs by the spherical triangle inequality — generated as a
    * DISTRIBUTED self-join over the (cell, cv, r) metadata frame
    * ([[Ann.candCellPairs]]: the Cells² filter runs on executors, not
    * in a driver loop) — then broadcast-equi-joins: the corpus side
    * shuffles on the cell key, the surviving cell-pair list is
    * locality-bounded metadata. */
  private def nearDupBetween(all: DataFrame, threshold: Double,
      memberSide: Option[DataFrame]): DataFrame = {
    import spark.implicits._
    val cents = centroids
    val centsDf = broadcast(
      cents.toSeq.toDF("cell", "cv"))
    // radii: one columnar pass over (nv, cell) — at nightly scale these
    // are persistable cell metadata; recomputing keeps them trivially
    // consistent with the current contents
    val thetaThr = math.acos(threshold)
    val candPairs = Ann.candCellPairs(
      Ann.coverMeta(all.join(centsDf, Seq("cell"))
        .select(col("cell"), dot(col("nv"), col("cv")).as("cdot")), centsDf),
      thetaThr)
    val aSide = memberSide.getOrElse(all)
    val a = aSide.select(col("neighbor_id").as("id_a"), col("nv").as("na"),
      col("cell").as("cell_a"))
    val b = all.select(col("neighbor_id").as("id_b"), col("nv").as("nb"),
      col("cell").as("cell_b"))
    val scored = a
      .join(broadcast(candPairs), Seq("cell_a"))
      .join(b.hint("shuffle_hash"), Seq("cell_b"))
      .filter(col("id_a") =!= col("id_b") &&
        dot(col("na"), col("nb")) >= threshold)
    memberSide match {
      // self-cover: both orientations per unordered cell pair, so
      // id_a < id_b keeps exactly one copy of every vector pair
      case None => scored.filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      // member-vs-all: member-member pairs arrive both ways, member-vs-
      // older once — least/greatest + distinct normalizes both
      case Some(_) => scored
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
        .distinct()
    }
  }

  /** Per-cell occupancy of the index's CURRENT contents (cell, n) —
    * row counts over every member, cheap against the cell-partitioned
    * layout (a columnless count per partition). */
  def cellStats: DataFrame =
    index.groupBy(col("cell")).agg(count(lit(1)).as("n"))

  /** Recall self-audit — [[occupancy]]'s companion alarm, measuring
    * the OTHER way an index degrades. Occupancy sees cell imbalance;
    * what it cannot see is codebook misfit: appended vectors are
    * ADC-scored against build-time codebooks, so as the distribution
    * shifts, PQ candidate ranking quality decays even while cells stay
    * balanced. This probe measures it from storage alone, no external
    * ground truth: a deterministic sample of STORED vectors
    * (`neighbor_id % sampleMod == 0`) queries the index both ways —
    * full-probe exact [[search]] over stored vectors is the truth set,
    * [[searchPq]] at the OPERATING (k, nprobe) is the observed — and
    * recall@k is their per-query overlap. Output: one row
    * `(n_queries, k, nprobe, recall_avg, recall_min)`. Cost: one
    * workload-sized probe pass (the sample is the workload), so it
    * prices like a batch of user queries, not a rebuild — run it on
    * the ops cadence, [[rebalance]] when recall_avg sinks below the
    * build-time spec bound. IvfIndexSpec pins: refine-mode recall 1.0
    * at full probe/full refine, searchPq recall within its spec band,
    * and the probe's determinism. */
  def recallProbe(k: Int, nprobe: Int, sampleMod: Long = 100L): DataFrame = {
    val queries = index
      .filter(col("neighbor_id") % sampleMod === 0)
      .select(col("neighbor_id").as("qid"), col("nv").as("qv"))
    val truth = search(queries, k, centroids.length)
      .select(col("query_id"), col("neighbor_id"))
    val got = searchPq(queries, k, nprobe)
      .select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(got.hint("shuffle_hash"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("n_hit"), lit(0L)) / col("n_true")).as("recall"))
      .agg(count(lit(1)).as("n_queries"),
        lit(k).as("k"), lit(nprobe).as("nprobe"),
        avg(col("recall")).as("recall_avg"),
        min(col("recall")).as("recall_min"))
  }

  /** Occupancy summary — the probe-side DRIFT signal. Appends assign
    * new vectors with the BUILD-time centroids (correct but
    * drift-prone): as the ingested distribution shifts, mass
    * concentrates into the few cells that happen to align, probed-cell
    * candidate lists balloon, and partial-probe cost/recall drifts —
    * none of which a build-time recall spec can see. `imbalance` (max
    * cell count over the mean across ALL trained cells) is the
    * one-number alarm: near the build-time value ⇒ healthy; a multiple
    * of it ⇒ the ingested distribution has left the quantizer behind —
    * [[rebalance]] to re-fit quantizer and codebooks to the current
    * contents. Read post-rebalance imbalance honestly: if it FALLS the
    * drift was quantizer misfit, now repaired; if it PERSISTS the data
    * itself has become modal (a genuinely concentrated direction
    * cluster, which spherical cells cannot and should not pretend to
    * spread) — raise the cell count or shard the hot cell. IvfIndexSpec
    * pins the cycle: alarm fires on a drifted batch, partial-probe
    * recall@10 holds through append and rebalance. Driver cost: one
    * ≤[[Ann.Cells]]-row collect — metadata, like the centroids. */
  def occupancy: IvfIndex.Occupancy = {
    val rows = cellStats.collect().map(r => (r.getInt(0), r.getLong(1)))
    val total = rows.map(_._2).sum
    val mx = if (rows.isEmpty) 0L else rows.map(_._2).max
    val mean = if (centroids.isEmpty) 0.0 else total.toDouble / centroids.length
    IvfIndex.Occupancy(centroids.length, rows.length, total, mx,
      if (mean > 0) mx / mean else 0.0)
  }

  private def probedOf(queries: DataFrame, nprobe: Int): DataFrame =
    queries
      .select(col("qid"), col("qv"),
        explode(IvfIndex.probeCellsExpr(col("qv"), centroids, nprobe)).as("cell"))
      .localCheckpoint() // evaluated by the cells collect AND the join — once

  // bounded by Cells — metadata, like the centroids themselves
  private def probedCells(probed: DataFrame): Seq[Int] =
    probed.select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq
}

object IvfIndex {

  /** [[IvfIndex.occupancy]]'s summary row: `cells` trained, `populated`
    * non-empty, `total` stored vectors, `max` the fullest cell,
    * `imbalance` = max / (total / cells). */
  final case class Occupancy(cells: Int, populated: Int, total: Long,
                             max: Long, imbalance: Double)

  private[operators] def probeCellsExpr(
      v: org.apache.spark.sql.Column,
      cents: Array[(Int, Array[Double])], nprobe: Int) =
    Ann.probeCells(v, cents, nprobe)

  /** Normalize + assign a (vec_id, embedding) frame, PQ-encode it, and
    * write the rows into the cell-partitioned parquet at `dataDir`. */
  private[graft] def writeAssignments(
      emb: DataFrame, cents: Array[(Int, Array[Double])],
      cb: Array[Array[Array[Double]]],
      dataDir: String, mode: SaveMode): Unit =
    emb
      .select(col("vec_id"), normalize(toDouble(col("embedding"))).as("nv"))
      .repartition(col("vec_id"))
      .select(col("vec_id").as("neighbor_id"), col("nv"),
        Pq.encodeCol(col("nv"), cb).as("codes"),
        Ann.assignCell(col("nv"), cents).as("cell"))
      .write.mode(mode).partitionBy("cell").parquet(dataDir)

  /** Build the index from the testdata embeddings table. */
  def build(s: SparkSession, sfDir: String, indexDir: String): IvfIndex =
    buildFrom(graft.Tables.embeddings(s, sfDir), indexDir,
      Ann.cachedCentroids(s, sfDir), Pq.cachedCodebooks(s, sfDir))

  /** Build from an ARBITRARY (vec_id, embedding) frame: train the
    * quantizers (bounded strided subsample), assign + encode every
    * vector, write the assignment partitioned by cell + the centroid
    * and codebook tables. */
  def buildFrom(emb: DataFrame, indexDir: String): IvfIndex =
    buildFrom(emb, indexDir, Ann.trainCentroids(emb), Pq.trainCodebooks(emb))

  def buildFrom(emb: DataFrame, indexDir: String,
                cents: Array[(Int, Array[Double])],
                cb: Array[Array[Array[Double]]]): IvfIndex = {
    val s = emb.sparkSession
    writeAssignments(emb, cents, cb, s"$indexDir/index", SaveMode.Overwrite)
    writeQuantizers(s, cents, cb, s"$indexDir/centroids", s"$indexDir/pq")
    load(s, indexDir)
  }

  /** Persist both quantizer levels (metadata-sized frames). */
  private[operators] def writeQuantizers(
      s: SparkSession, cents: Array[(Int, Array[Double])],
      cb: Array[Array[Array[Double]]],
      centDir: String, pqDir: String): Unit = {
    import s.implicits._
    cents.map { case (c, v) => (c, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .write.mode(SaveMode.Overwrite).parquet(centDir)
    cb.zipWithIndex.flatMap { case (sub, mi) =>
      sub.zipWithIndex.map { case (v, k) => (mi, k, v.toSeq) }
    }.toSeq.toDF("m", "k", "centroid")
      .write.mode(SaveMode.Overwrite).parquet(pqDir)
  }

  def load(s: SparkSession, indexDir: String): IvfIndex = new IvfIndex(s, indexDir)

  /** Empty top-k frame in the search result schema — the short-circuit
    * for an empty query workload (PqAdcAll requires ≥ 1 lut). */
  private[operators] def emptyTopk(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(Long, Long, Long)].toDF("query_id", "rank", "neighbor_id")
  }
}

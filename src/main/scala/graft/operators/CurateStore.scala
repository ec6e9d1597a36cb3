package graft.operators

import graft.sources.{PointStore, StoreFs}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted curation state — the nightly [[Pipeline.pipelineCurate]]
  * funnel as an INCREMENTAL fold over a crawl delta, instead of a
  * corpus-wide recompute every night.
  *
  * The one-shot funnel's cost at 100 TB is its text passes: every night
  * it re-tokenizes, re-shingles, and re-strips the WHOLE corpus to
  * re-derive verdicts that mostly did not change. This store persists
  * everything those passes produce, so a night touches document text
  * exactly once — the delta's — and every corpus-side read is a columnar
  * scan of stored state (the reference's incremental-fold philosophy:
  * cruncher crunch_global.sql:58-75 ON DUPLICATE KEY merge,
  * worker.js:119-165 delta batches — applied to the whole curation DAG,
  * not just one aggregate). Composition of the repo's persisted-index
  * family:
  *
  *  - a nested [[DedupIndex]] (`sigindex/`) holds per-doc MinHash
  *    signatures + distinct hashed-shingle sets: near-dup candidates and
  *    verify run from storage ([[DedupIndex.pairsInvolving]]), and the
  *    same stored shingle sets feed the boilerplate / decontamination
  *    screens — one kernel pass per document EVER, shared by every
  *    cross-document screen (they are all [[Curation.DecontamN]]-grain);
  *  - a [[PointStore]] (`df/`) holds the shingle document-frequency
  *    table: the boilerplate screen's corpus-RELATIVE threshold needs
  *    corpus-wide df, and the store's additive merge folds a night's
  *    delta df in O(delta) write / one merge-on-read scan;
  *  - a [[PointStore]] (`bench/`) holds the benchmark shingle set for
  *    decontamination — contamination is MONOTONE (the set only grows),
  *    so a night only probes the corpus against NEWLY-benchmark shingles;
  *  - manifest-listed parquet members hold per-doc stats (quality /
  *    repetition / verdict flags / content hash — latest-wins
  *    merge-on-read, so a night commits O(changed) override rows), the
  *    verified near-dup pair set (append-only), the positional window
  *    arrays ([[Curation.windowsOf]] — the forward index that lets a
  *    later night re-strip a doc against a changed common set without
  *    touching text), and the stripped `cleaned` output text
  *    (latest-wins).
  *
  * Per-night work, for a delta of D docs against a corpus of C docs:
  * text kernels O(D) (stats, repetition, window, signature passes over
  * DELTA text only); candidate generation = delta bands ⋈ stored bands
  * (equi-join, never corpus × corpus); verdict maintenance = the stored
  * shingle-set column probed by two delta-derived sets (the
  * common-membership FLIPS and the newly-benchmark shingles — each a
  * columnar scan streaming against a delta-sized build side, never a
  * corpus shuffle); re-strips run over AFFECTED docs only (those
  * holding a flipped shingle), from stored windows. Every WRITE is
  * O(D + affected): the corpus is never rewritten.
  *
  * Verdict-stability argument the incremental fold leans on (and
  * CurateStoreSpec pins): quality/repetition/content-hash are doc-local
  * (never change); contamination is monotone in the growing bench set;
  * boilerplate verdicts and stripped text change ONLY for docs holding
  * a shingle whose common-set membership flipped — both the df side and
  * the threshold side of a flip are captured by diffing the old/new
  * common sets, which the stored df table reproduces for BOTH nights
  * (old = pre-fold, new = folded + the delta's own df). Exact-keeper
  * election stays a stored-hash groupBy because identical text implies
  * identical screen verdicts — an exact-dup group survives or dies as a
  * unit, so keepers never migrate within the stored corpus.
  *
  * Durability contract (single writer, like the sibling stores): the
  * `_CURATE` manifest flip is the ONE commit point of a night. Member
  * dirs land before it (a crashed night's half-written dirs are
  * invisible and clobbered by the retry's Overwrite); the nested
  * sub-stores commit EARLIER but idempotently under the night's tag,
  * and the night's read phase reconstructs their pre-night state when a
  * crashed attempt already folded them (the additive merge makes the
  * delta's contribution subtractable — [[minusTag]]), so a re-run of a
  * half-committed night converges on the identical store state. A
  * redelivered tag whose manifest flip committed is a no-op.
  */
final class CurateStore private (spark: SparkSession, dir: String) {

  import CurateStore._

  private val sfs = StoreFs(spark, dir)

  // lazy: [[CurateStore.load]]'s missing-store refusal (the #count
  // check) must fire before the nested index's own loader — a caller
  // probing a nonexistent store should hear "no curate store", not a
  // sigindex internals error
  private[operators] lazy val sigindex: DedupIndex =
    DedupIndex.load(spark, sfs.pathOf("sigindex"))
  // lazy like the sigindex: PointStore's constructor mkdirs its root,
  // so an eager field would make load() on a NONEXISTENT store create
  // df/ and bench/ directory litter before the #count check throws
  // (every bogus /probe/curate request would mint one tree)
  private lazy val dfStore =
    new PointStore(spark, sfs.pathOf("df"), Seq("shingle"), Seq("df"), Nil)
  private lazy val benchStore =
    new PointStore(spark, sfs.pathOf("bench"), Seq("shingle"), Seq("n_docs"), Nil)
  private lazy val healthStore = CurateStore.healthStoreAt(spark, sfs)

  private def manifestLines: Seq[String] = sfs.linesIfExists(ManifestName)

  /** Nights whose manifest flip committed. */
  def consumedTags: Set[String] =
    manifestLines.collect { case l if l.startsWith("#tag:") =>
      l.stripPrefix("#tag:") }.toSet

  /** Nights removed by [[rollbackNight]] — RETIRED tags: their data is
    * gone and the tag name is burned (a fixed batch re-ingests under a
    * fresh tag; reusing the name would collide with the sub-stores'
    * consumed-tag ledgers, which cannot forget). */
  def rolledBackTags: Set[String] =
    manifestLines.collect { case l if l.startsWith("#rolledback:") =>
      l.stripPrefix("#rolledback:") }.toSet

  /** Total documents ever ingested (corpus + committed deltas) — the
    * denominator of the boilerplate screen's corpus-relative threshold. */
  def docCount: Long =
    manifestLines.collectFirst { case l if l.startsWith("#count:") =>
      l.stripPrefix("#count:").toLong }
      .getOrElse(sys.error(s"no curate store at $dir (missing #count)"))

  private def tableMembers(t: String): Seq[String] =
    manifestLines.collect { case l if l.startsWith(t + ":") =>
      l.stripPrefix(t + ":") }

  /** Members of one logical table unioned with their commit generation —
    * the raw merge-on-read input ([[latestWins]] resolves overrides).
    * `allowMissingColumns`: a [[rollbackNight]] member carries the
    * `_deleted` tombstone column older members predate — they read it
    * as null (= alive). */
  private def readTableOf(ms: Seq[String]): DataFrame = {
    require(ms.nonEmpty, s"curate store at $dir has no members in $ms")
    ms.zipWithIndex.map { case (m, g) =>
        spark.read.parquet(sfs.pathOf(m)).withColumn("_gen", lit(g)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  private def readTable(t: String): DataFrame = {
    val ms = tableMembers(t)
    require(ms.nonEmpty, s"curate store at $dir has no $t members")
    readTableOf(ms)
  }

  /** Drop tombstoned rows (and the marker column) after a latest-wins
    * resolve — [[rollbackNight]] removes a night's docs by out-
    * generationing them with `_deleted = true` rows, the only mechanism
    * that still works after a compaction folded the night's member. */
  private def alive(df: DataFrame): DataFrame =
    if (!df.columns.contains("_deleted")) df
    else df.filter(!coalesce(col("_deleted"), lit(false))).drop("_deleted")

  /** Latest-wins merge-on-read: one key-grain shuffle, newest member's
    * row wins (a night's override member out-ranks the base). */
  private def latestWins(df: DataFrame, key: String): DataFrame = {
    val others = df.columns.filterNot(c => c == key || c == "_gen")
    df.groupBy(col(key))
      .agg(max_by(struct(others.map(col): _*), col("_gen")).as("_st"))
      .select(col(key) +: others.map(c => col(s"_st.$c").as(c)): _*)
  }

  private def writeMember(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(sfs.pathOf(name))

  /** Near-dup cluster labels over the CURRENT keepers, from a pair
    * frame covering all stored pairs: restricting both endpoints to the
    * keeper set reproduces exactly the pair set a one-shot minhash over
    * the keeper frame would find (band collisions and Jaccard are
    * pairwise properties, indifferent to the rest), and
    * [[Dedup.connectedComponents]] is O(pairs), not O(corpus). Runs at
    * WRITE time — [[build]]/[[curateNight]] persist the labels as the
    * single-member `clusters` table, so the read path never iterates. */
  private def clusterLabels(keeperIds: DataFrame, pairs: DataFrame): DataFrame = {
    val kp = pairs
      .join(keeperIds.withColumnRenamed("doc_id", "a").hint("shuffle_hash"),
        Seq("a"), "left_semi")
      .join(keeperIds.withColumnRenamed("doc_id", "b").hint("shuffle_hash"),
        Seq("b"), "left_semi")
    Dedup.connectedComponents(kp).withColumnRenamed("node", "doc_id")
  }

  /** The current curated corpus, assembled purely from stored state —
    * identical columns and rows to [[Pipeline.pipelineCurate]] run
    * one-shot over everything ever ingested (the registered
    * `pipeline_curate_delta` proves this against the UNSPLIT oracle).
    * Pure merge-on-read: survivors and exact keepers from the stats
    * table (one hash-grain shuffle for the election), cluster labels
    * from the `clusters` table the last commit MATERIALIZED (no
    * iterative work on the read path), `cleaned` from the strips
    * table. No text, no kernels, no loops. */
  def snapshot(): DataFrame =
    snapshotFrom(tableMembers("stats"), tableMembers("strips"),
      tableMembers("clusters").last)

  /** [[snapshot]] over explicit member lists — shared by the live read
    * and [[snapshotAt]]'s historical one. */
  private def snapshotFrom(statsMs: Seq[String], stripsMs: Seq[String],
      clustersM: String): DataFrame = Dedup.stagedScope { scratch =>
    val stats = scratch.pin(alive(latestWins(readTableOf(statsMs), "doc_id")))
    val surv = stats.filter(
      col("quality_score") >= Pipeline.QualityThreshold &&
        !col("repetitive") && !col("contaminated") && !col("boilerplate") &&
        col("doc_id") % Curation.BenchMod =!= 0)
    // exact-keeper election over stored content hashes — one shuffle
    val keep = surv.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val kdocs = scratch.pin(
      surv.join(keep.hint("shuffle_hash"), Seq("doc_id"), "left_semi"))
    val comp = spark.read.parquet(sfs.pathOf(clustersM))
    val strips = latestWins(readTableOf(stripsMs), "doc_id")
    kdocs
      .join(comp.hint("shuffle_hash"), Seq("doc_id"), "left")
      .join(strips.hint("shuffle_hash"), Seq("doc_id"))
      .select(col("doc_id"), col("content_hash"), col("lang"),
        col("n_tokens"), col("quality_score"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"),
        (col("doc_id") === coalesce(col("lbl"), col("doc_id")))
          .as("near_dup_keeper"),
        col("cleaned"))
  }

  /** Committed nights in LEDGER order (`base` first) — the time axis
    * [[snapshotAt]] travels. */
  def nightsInOrder: Seq[String] =
    "base" +: manifestLines.collect { case l if l.startsWith("#tag:") =>
      l.stripPrefix("#tag:") }

  /** Time travel: the curated corpus AS OF night `night` — the member
    * lists each table held when that night's manifest flip committed,
    * read through the same merge-on-read as [[snapshot]] (member names
    * embed their night tag and commits only append, so the prefix up to
    * `<table>-<night>` IS the historical list; the PointStore
    * `snapshotAt` idea without needing a version log). Loudly bounded
    * by the maintenance horizon: a [[compact]] folds per-night members
    * away and [[vacuum]] reclaims superseded `clusters-*` dirs, so
    * history older than the last compaction (or a vacuumed clusters
    * member) refuses with the cause named — time travel is a debugging
    * window, not an archive; snapshot early nights before compacting if
    * you need them. A rolled-back night is not a valid target (its tag
    * left the ledger); nights AFTER a rollback show the rolled-back
    * docs as they stood then — historically accurate. */
  def snapshotAt(night: String): DataFrame = {
    val order = nightsInOrder
    require(order.contains(night),
      s"night '$night' is not in the ledger of the store at $dir " +
        s"(have: ${order.mkString(", ")}) — rolled-back nights are " +
        "retired and cannot be time-traveled to")
    def upTo(t: String): Seq[String] = {
      val ms = tableMembers(t)
      val target = s"$t-$night"
      val i = ms.indexOf(target)
      require(i >= 0,
        s"$target is no longer a live member of the store at $dir — a " +
          "compaction folded history up to it; snapshotAt is bounded " +
          "by the last compact()")
      ms.take(i + 1)
    }
    val clustersM = s"clusters-$night"
    require(sfs.exists(clustersM),
      s"$clustersM was vacuumed from the store at $dir — snapshotAt is " +
        "bounded by the last vacuum()")
    snapshotFrom(upTo("stats"), upTo("strips"), clustersM)
  }

  /** Fold every table's member list into one member per table, and
    * compact the nested sub-stores — the LSM norm, bounding plan width
    * after many nightly appends (each night adds one member per table =
    * one union branch in every merge-on-read plan). Latest-wins tables
    * (stats, strips) fold through [[latestWins]], so override history
    * collapses to its outcome; append-only tables (windows, pairs) fold
    * verbatim. ONE manifest flip publishes all four folds together
    * (count, tag ledger, and results unchanged — CurateStoreSpec);
    * superseded dirs stay for in-flight readers until [[vacuum]]. */
  def compact(): Unit = sfs.withWriterLease() {
    val lines = manifestLines
    val tables = Seq("stats", "strips", "windows", "pairs")
    if (tables.forall(t => tableMembers(t).size <= 1) &&
        tableMembers("deadids").isEmpty) ()
    else {
      val seen = sfs.names()
      val n = seen.collect {
        case s if s.matches("[a-z]+-compact-[0-9]+") =>
          s.split("-").last.toInt
      }.foldLeft(-1)(math.max) + 1
      // the fold is where [[rollbackNight]]'s removals become PHYSICAL:
      // stats resolves its `_deleted` tombstones away (history is
      // complete here, so the marker column retires with the fold), and
      // the append-only windows/pairs tables — which rollback leaves in
      // place because their dead rows are inert under the keeper/stats
      // restrictions every read applies — subtract the retained dead
      // rosters (`deadids:` members), reclaiming the bytes. Anti-join
      // build side = the rolled-back rosters, small by nature, so AQE
      // broadcasts it and the heavy (w, whs) array rows never cross an
      // exchange even here.
      val deadMs = tableMembers("deadids")
      def minusDead(df: DataFrame, key: String): DataFrame =
        if (deadMs.isEmpty) df
        else df.join(readTableOf(deadMs).select(col("doc_id").as(key)),
          Seq(key), "left_anti")
      val folded = tables.map { t =>
        val name = f"$t-compact-$n%03d"
        val df = readTable(t)
        val out = t match {
          case "stats" => alive(latestWins(df, "doc_id"))
          case "strips" => latestWins(df, "doc_id")
          case "windows" => minusDead(df.drop("_gen"), "doc_id")
          case "pairs" => minusDead(minusDead(df.drop("_gen"), "a"), "b")
          case _ => df.drop("_gen")
        }
        writeMember(name, out)
        s"$t:$name"
      }
      // the clusters table is already single-member (replaced per
      // commit) — carried through the fold verbatim, as are the
      // per-night id lists (rollback's durable record; tiny, never
      // read by snapshot/probe, one manifest line per night)
      val carried = lines.filter(l =>
        l.startsWith("clusters:") || l.startsWith("ids:"))
      val meta = lines.filter(_.startsWith("#"))
      sfs.atomicWrite(ManifestName,
        (folded ++ carried ++ meta).mkString("\n").getBytes)
    }
    sigindex.compact()
    dfStore.compact()
    benchStore.compact()
    healthStore.compact()
  }

  /** Reclaim member directories the manifest no longer references (the
    * space half [[compact]] defers; sub-stores vacuum themselves). Run
    * once no reader holds a pre-compaction plan — the single-writer
    * contract shared with the sibling stores. */
  def vacuum(): Unit = sfs.withWriterLease() {
    val live = manifestLines.filterNot(_.startsWith("#"))
      .map(_.split(":", 2)(1)).toSet ++ SubStoreDirs
    // The rbdf-/rbbench-/ids-del- scratch members of an IN-FLIGHT
    // rollback/takedown are written BEFORE the sub-store mutations and
    // the manifest flip. Once sigindex.delete has committed, they are
    // the ONLY record a crash-retry can re-derive the subtraction from
    // (the signatures are gone) — so a vacuum running inside the crash
    // window must not reclaim them. Once the operation's ledger line
    // lands they are ordinary garbage: ids-del- flips to a manifest
    // deadids: line (in `live` above), rbdf-/rbbench- are never read
    // again and reclaim here.
    def inFlightScratch(d: String): Boolean = Seq(
      "rbdf-del-", "rbbench-del-", "ids-del-").collectFirst {
        case p if d.startsWith(p) => !deleteTags(d.stripPrefix(p))
      }.orElse(Seq("rbdf-rb-", "rbbench-rb-").collectFirst {
        case p if d.startsWith(p) => !rolledBackTags(d.stripPrefix(p))
      }).getOrElse(false)
    sfs.dirNames().filterNot(live).filterNot(inFlightScratch)
      .foreach(sfs.deleteChild)
    sigindex.vacuum()
    dfStore.vacuum()
    benchStore.vacuum()
    healthStore.vacuum()
  }

  /** Corpus-health time series, from state alone: one row per
    * (night, lang) ever folded — document count, vocabulary size
    * (distinct shingles, [[graft.functions.DistinctSketch]] exact in
    * the driver regime), and token-count p50/p95
    * ([[graft.functions.QuantileSketch]]) — "how did the corpus's
    * composition evolve, drop by drop?", the question a curation
    * operator asks before touching mixture weights. The rows ride the
    * nightly fold as a nested sketch-measured [[PointStore]] keyed by
    * (night, lang): each night's metrics derive from frames the fold
    * already materialized (the stats member and the signature-index
    * member — ZERO extra text passes), land under the night's tag
    * (idempotent under crash-retry like every sub-store commit), and
    * need no subtraction path because a night only ever writes its own
    * (night, lang) keys. */
  def health(): DataFrame = {
    import spark.implicits._
    // a store written before the health series existed has no members —
    // an empty series, not an error (the one sub-store whose absence is
    // benign: it holds derived metrics, never curation state). Probed
    // via the manifest FILE, not the lazy healthStore: constructing the
    // PointStore mkdirs health/ — a GET must not mutate the store (and
    // must work on a read-only replica mount)
    if (!StoreFs(spark, sfs.pathOf("health")).exists("_MANIFEST"))
      return Seq.empty[(String, String, Long, Long, Long, Long)]
        .toDF("night", "lang", "n_docs", "n_shingles", "p50_tokens",
          "p95_tokens")
    // restrict to the LIVE ledger: a rolled-back night's rows stay in
    // the health sub-store (PointStore keys cannot be deleted) but its
    // tag left the manifest, so the series must not report it — the
    // filter is a broadcast of the tag set, O(nights)
    val liveNights = (consumedTags + "base").toSeq
    healthStore.snapshot
      .filter(col("night").isin(liveNights: _*))
      .select(col("night"), col("lang"), col("n_docs"),
        graft.functions.SketchOps.sketchEst(col("vocab")).as("n_shingles"),
        graft.functions.SketchOps.quantileAt(col("lens"), 0.5).as("p50_tokens"),
        graft.functions.SketchOps.quantileAt(col("lens"), 0.95).as("p95_tokens"))
      .orderBy(col("night"), col("lang"))
  }

  /** A sub-store's state BEFORE this night: normally its snapshot; if a
    * CRASHED attempt of the same tag already folded the delta, subtract
    * the (deterministic) delta contribution back out — additive sums
    * make the pre-image exact, which is what lets a night retry re-read
    * "old df / old bench" correctly after a partial commit. */
  private def minusTag(store: PointStore, tag: String,
      deltaPart: DataFrame, valueCol: String): DataFrame = {
    // the > 0 filter applies on BOTH branches: a rollback leaves
    // fully-subtracted keys behind as zero-value rows, which must read
    // as absent (a shingle with df 0 is not in the corpus)
    val snap = store.snapshot
    if (!store.consumedTags.contains(tag)) snap.filter(col(valueCol) > 0)
    else snap
      .join(deltaPart.select(col("shingle"), col(valueCol).as("_dsub")),
        Seq("shingle"), "left")
      .select(col("shingle"),
        (col(valueCol) - coalesce(col("_dsub"), lit(0L))).as(valueCol))
      .filter(col(valueCol) > 0)
  }

  /** Screen a candidate batch against the CURRENT store state WITHOUT
    * committing anything — [[DedupIndex.probe]]'s pre-ingest face for
    * the whole funnel ("would curation keep these documents, and what
    * do they duplicate?"). Doc-local scores (quality, repetition) come
    * from the batch's own text; the cross-document verdicts price the
    * batch against the corpus AS IT STANDS — boilerplate vs the stored
    * df table at the current threshold, contamination vs the stored
    * benchmark set, `n_near_dup` = stored documents with Jaccard ≥
    * [[NearDupThreshold]] (signature-index probe, no commit). One row
    * per batch doc; `keep` = the screens' composite (benchmark-slice
    * docs excluded, as the funnel excludes them). A later
    * [[curateNight]] of the same batch additionally folds the batch's
    * OWN df/bench contributions — the probe deliberately answers the
    * pre-ingest question, not the post-fold one. O(batch) text work;
    * corpus-side reads are the df/bench snapshots and the band table. */
  def probe(docs: DataFrame): DataFrame = Dedup.stagedScope { scratch =>
    val minDocs = Curation.boilerplateMinDocs(docCount)
    val common = dfStore.snapshot.filter(col("df") >= minDocs)
      .select(col("shingle"))
    // n_docs > 0: a rollback subtracts a night's bench contribution by
    // appending negatives, so a fully-removed shingle survives as a
    // zero-count row — it must not contaminate
    val bench = benchStore.snapshot.filter(col("n_docs") > 0)
      .select(col("shingle"))
    val q = TextOps.textStatsOf(docs, col("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality_score"))
    val rep = Curation.docRepetitionOf(docs)
      .select(col("doc_id"), col("repetitive"))
    // pinned: three consumers below (n_sh, bench semi-join, common
    // join) would each re-run the tokenize+shingle+hash kernel over the
    // batch text otherwise — the replay DedupIndex.probe pins against
    val sh = scratch.pin(Dedup.hashedShingles(docs, Curation.DecontamN))
    val nsh = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val ct = sh.join(bench.hint("shuffle_hash"), Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct().withColumn("_ct", lit(true))
    val bp = sh.join(common.hint("shuffle_hash"), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bp"))
    val nd = sigindex.probe(docs, NearDupThreshold)
      .groupBy(col("a")).agg(count(lit(1)).as("n_near_dup"))
      .withColumnRenamed("a", "doc_id")
    val contaminated = coalesce(col("_ct"), lit(false)) &&
      col("doc_id") % Curation.BenchMod =!= 0
    val boilerplate = when(coalesce(col("n_sh"), lit(0L)) === 0, lit(false))
      .otherwise(coalesce(col("n_bp"), lit(0L)).cast("double") / col("n_sh")
        > Curation.BoilerplateMaxFrac)
    q.join(rep.hint("shuffle_hash"), Seq("doc_id"))
      .join(nsh.hint("shuffle_hash"), Seq("doc_id"), "left")
      .join(ct.hint("shuffle_hash"), Seq("doc_id"), "left")
      .join(bp.hint("shuffle_hash"), Seq("doc_id"), "left")
      .join(nd.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality_score"), col("repetitive"),
        contaminated.as("contaminated"), boilerplate.as("boilerplate"),
        coalesce(col("n_near_dup"), lit(0L)).as("n_near_dup"),
        (col("quality_score") >= Pipeline.QualityThreshold &&
          !col("repetitive") && !contaminated && !boilerplate &&
          col("doc_id") % Curation.BenchMod =!= 0).as("keep"))
  }

  /** Fold one night's crawl delta into the store. Text work is O(delta);
    * corpus-side work is columnar scans of stored state; writes are
    * O(delta + affected docs). Delta doc_ids must be disjoint from the
    * stored corpus (the [[DedupIndex]] append contract — new crawl ids).
    * Single writer; see the class doc for crash/retry semantics.
    *
    * Returns whether THIS call committed the night: `false` means the
    * tag was already in the ledger (a redelivery no-op). The check runs
    * INSIDE the writer lease, so of two concurrent deliveries of one
    * tag exactly one observes `true` — callers reporting commit status
    * (the server's /ingest/curate face) must derive it from this return
    * value, never from their own pre-check (TOCTOU). */
  def curateNight(tag: String, delta: DataFrame,
                  autoCompactAt: Int = CurateStore.AutoCompactMembers,
                  leaseWaitMs: Long = 0L): Boolean =
      sfs.withWriterLease(waitMs = leaseWaitMs) {
    // member names are <table>-<tag>, so the tag must stay out of the
    // build/fold namespaces: tag "base" would Overwrite the LIVE
    // night-0 member dirs BEFORE any commit point, and "compact-N" a
    // folded base; path separators / ":" would break member paths and
    // the manifest grammar (the PointStore.appendTagged contract, made
    // loud here because this store's member names embed the tag)
    // idempotence check FIRST (the PointStore.appendTagged ordering): a
    // night that already committed — however its tag was named — must
    // stay a redelivery no-op, even one that predates the namespace
    // contract below
    if (consumedTags.contains(tag)) return false
    require(!rolledBackTags.contains(tag),
      s"night tag '$tag' was rolled back and is RETIRED — the nested " +
        "sub-store ledgers cannot forget a consumed tag, so re-ingesting " +
        "under it would silently no-op; ingest the corrected batch " +
        "under a fresh tag")
    require(tag.matches("[A-Za-z0-9._-]+") && tag != "base" &&
      !tag.matches("compact-[0-9]+") && !tag.forall(_.isDigit),
      s"night tag '$tag' must be filesystem-safe ([A-Za-z0-9._-]+), " +
        "non-numeric (the nested PointStore tag contract — a date like " +
        "20260814 would collide with the sequence-numbered delta " +
        "namespace and lose its ledger entry on compaction), and " +
        "outside the reserved 'base'/'compact-N' member namespaces")
    // fold-before-commit (the DedupIndex auto-compaction rule): past the
    // bound, fold the EXISTING members first so tonight's member always
    // survives the fold and a crash mid-fold loses no delta
    if (tableMembers("stats").size >= autoCompactAt) compact()
    val lines = manifestLines
    val nOld = docCount
    val nDelta = delta.count()
    val minDocsOld = Curation.boilerplateMinDocs(nOld)
    val minDocsNew = Curation.boilerplateMinDocs(nOld + nDelta)

    // every multi-consumer frame below is pinned here and released on
    // ANY exit — the night is a sequence of EAGER writes, so nothing
    // outlives the call (unlike the lazy lifecycle queries)
    val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def pin(df: DataFrame): DataFrame = {
      pinned += df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    }

    // pre-state snapshot: the plan pins the CURRENT member lists (member
    // dirs are immutable, so it stays valid after the appends below)
    val statsPre = pin(alive(latestWins(readTable("stats"), "doc_id")))

    try {
      // ---- the night's ONE text ingestion: signature-index append
      // (tokenize + shingle + 64-hash MinHash over DELTA text only;
      // exactly-once under the tag) ----
      sigindex.appendTagged(tag, delta)
      val member = s"append-$tag"
      // delta shingle sets re-read FROM the member just committed — the
      // screens below never re-run the kernel. Recovery corner: if an
      // offline compact() ran between a crashed attempt and this retry,
      // the member NAME is folded away (its rows live inside the fold) —
      // recover the same delta/corpus split by delta-id joins against
      // the folded index (the id list is delta-sized and broadcasts;
      // the plain member-list split stays the zero-join common path)
      val (deltaRows, corpusRows0) =
        if (sigindex.members.contains(member))
          (sigindex.memberRows(member), sigindex.rowsExcept(member))
        else {
          val ids = delta.select(col("doc_id"))
          (sigindex.index.join(ids, Seq("doc_id"), "left_semi"),
            sigindex.index.join(ids, Seq("doc_id"), "left_anti"))
        }
      val deltaSh = deltaRows
        .select(col("doc_id"), explode(col("sh")).as("shingle"))

      // ---- document-frequency fold: old/new common sets, their diff.
      // ONE shuffle computes the night's df AND its benchmark-slice df
      // (a conditional count beside the total — two grouped scans of
      // the delta postings, pre-r13); the bench slice splits off as a
      // filter over the pinned frame ----
      val deltaDfBoth = pin(deltaSh.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df"),
          count(when(col("doc_id") % Curation.BenchMod === 0, 1))
            .as("n_docs")))
      val deltaDf = deltaDfBoth.select(col("shingle"), col("df"))
      val oldDf = minusTag(dfStore, tag, deltaDf, "df")
      // ONE full-join frame carries both nights' df per shingle, so the
      // new common set AND the membership flips — from df growth AND
      // the threshold move alike — are single-pass filters over it: the
      // old/new sets are unique by shingle, so the flip set is exactly
      // the rows whose two membership flags disagree (two except jobs +
      // a union/distinct, pre-r13, shuffled the vocabulary three times
      // for the same answer)
      val dfBoth = pin(oldDf.select(col("shingle"), col("df").as("_do"))
        .join(deltaDf.select(col("shingle"), col("df").as("_dn")),
          Seq("shingle"), "full")
        .select(col("shingle"), coalesce(col("_do"), lit(0L)).as("_do"),
          (coalesce(col("_do"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
            .as("df")))
      val newCommon = pin(
        dfBoth.filter(col("df") >= minDocsNew).select(col("shingle")))
      // only docs holding a flipped shingle can change boilerplate
      // verdict or stripped text
      val flipped = pin(dfBoth
        .filter((col("_do") >= minDocsOld) =!= (col("df") >= minDocsNew))
        .select(col("shingle")))

      // ---- benchmark-set fold: contamination is monotone, so only
      // NEWLY-benchmark shingles need to probe the corpus ----
      val deltaBenchDf = deltaDfBoth.filter(col("n_docs") > 0)
        .select(col("shingle"), col("n_docs"))
      val oldBench = minusTag(benchStore, tag, deltaBenchDf, "n_docs")
        .select(col("shingle"))
      // anti-join, not except: both sides are already unique by shingle,
      // so the set difference needs no re-distinct. fullBench feeds only
      // semi-joins, where build-side duplicates (a shingle benchmark in
      // both nights) are harmless — no distinct pass either.
      val newBenchSh = deltaBenchDf.select(col("shingle"))
        .join(oldBench, Seq("shingle"), "left_anti")
      val fullBench = oldBench.union(deltaBenchDf.select(col("shingle")))

      // ---- ONE probe of the stored corpus shingle sets by both
      // delta-derived sets. "Stored corpus" = the index minus tonight's
      // member — the member-list split from above, NO restriction join
      // (a doc_id semi-join would shuffle the whole stored payload).
      // The probe join carries NO shuffle hint deliberately: its build
      // side is delta-derived (flips + newly-benchmark shingles), so
      // AQE broadcasts it and the corpus posting explode STREAMS at
      // scan speed — hinting shuffle here would exchange corpus-
      // postings-grain rows every night. ----
      val corpusRows = corpusRows0.select(col("doc_id"), col("sh"))
      val probeSh = flipped
        .select(col("shingle"), lit(true).as("bp_probe"), lit(false).as("ct_probe"))
        .unionByName(newBenchSh
          .select(col("shingle"), lit(false).as("bp_probe"), lit(true).as("ct_probe")))
      val hits = corpusRows
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(probeSh, Seq("shingle"))
        .groupBy(col("doc_id"))
        .agg(max(col("bp_probe")).as("bp_hit"), max(col("ct_probe")).as("ct_hit"))

      // ---- O(affected) verdict maintenance: re-derive boilerplate for
      // flip-affected docs from their STORED shingle sets (restricted at
      // doc grain before the explode); contamination only ever turns on ----
      val affected = statsPre.join(hits.hint("shuffle_hash"), Seq("doc_id"))
      val bpIds = pin(affected.filter(col("bp_hit")).select(col("doc_id")))
      // unhinted restriction again: bpIds is O(affected), AQE broadcasts
      // it, the stored sh arrays stream instead of shuffling
      val nbp = corpusRows
        .join(bpIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(newCommon.hint("shuffle_hash"), Seq("shingle"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bp"))
      val overrides = affected
        .join(nbp.hint("shuffle_hash"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("quality_score"), col("repetitive"),
          (col("contaminated") ||
            (col("ct_hit") && col("doc_id") % Curation.BenchMod =!= 0))
            .as("contaminated"),
          when(col("bp_hit"),
            coalesce(col("n_bp"), lit(0L)).cast("double") / col("n_sh")
              > Curation.BoilerplateMaxFrac)
            .otherwise(col("boilerplate")).as("boilerplate"),
          col("content_hash"), col("n_sh"))

      // ---- delta doc stats: the remaining O(delta) text passes ----
      val q = TextOps.textStatsOf(delta, col("lang"),
          md5(col("text")).as("content_hash"))
        .select(col("doc_id"), col("lang"), col("content_hash"),
          col("n_tokens"), col("quality_score"))
      val rep = Curation.docRepetitionOf(delta)
        .select(col("doc_id"), col("repetitive"))
      val nshD = deltaRows
        .select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
      val ctD = deltaSh
        .join(fullBench.hint("shuffle_hash"), Seq("shingle"), "left_semi")
        .select(col("doc_id")).distinct().withColumn("_ct", lit(true))
      val bpD = deltaSh
        .join(newCommon.hint("shuffle_hash"), Seq("shingle"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bp"))
      val deltaStats = q
        .join(rep.hint("shuffle_hash"), Seq("doc_id"))
        .join(nshD.hint("shuffle_hash"), Seq("doc_id"), "left")
        .join(ctD.hint("shuffle_hash"), Seq("doc_id"), "left")
        .join(bpD.hint("shuffle_hash"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("quality_score"), col("repetitive"),
          (coalesce(col("_ct"), lit(false)) &&
            col("doc_id") % Curation.BenchMod =!= 0).as("contaminated"),
          when(coalesce(col("n_sh"), lit(0L)) === 0, lit(false))
            .otherwise(coalesce(col("n_bp"), lit(0L)).cast("double")
              / col("n_sh") > Curation.BoilerplateMaxFrac).as("boilerplate"),
          col("content_hash"),
          coalesce(col("n_sh"), lit(0L)).as("n_sh"))

      // ---- member writes (invisible until the manifest flip) ----
      // The night's eager writes are ~20 SMALL jobs whose per-job
      // constants (driver planning + scheduling) dominate at bench SF
      // (PERF.md's decomposition) — so independent writes are SUBMITTED
      // CONCURRENTLY and the wall clock pays max(), not sum(). Two
      // parallel stages, split exactly at the data dependency: stage 1
      // is everything derivable without the committed stats member
      // (stats itself, pairs, windows, ids, and the df/bench sub-store
      // folds — six jobs), stage 2 is the stats-dependent trio (strips,
      // clusters, health). Concurrent actions on one SparkSession are
      // the engine's native multi-tenancy; shared pinned frames
      // materialize once (the cache manager's per-partition locks), and
      // a failure in any job aborts the night BEFORE the manifest flip —
      // the crash/retry contract is unchanged.
      CurateStore.awaitAll(
        () => writeMember(s"stats-$tag", overrides.unionByName(deltaStats)),
        () => writeMember(s"pairs-$tag",
          sigindex.pairsInvolvingRows(deltaRows, NearDupThreshold)
            .select(col("a"), col("b"))),
        () => writeMember(s"windows-$tag", Curation.windowsOf(delta)),
        // the night's doc-id roster — [[rollbackNight]]'s durable record
        // of WHICH docs this tag brought (per-night stats/windows members
        // encode it only until a compaction folds them): 8 bytes per delta
        // doc, never read by snapshot/probe, never folded
        () => writeMember(s"ids-$tag", delta.select(col("doc_id"))),
        // sub-store folds (idempotent under the tag; O(delta) writes;
        // each store's writer lease is its OWN root — no contention
        // with the night's lease on this store)
        () => dfStore.appendTagged(tag, deltaDf),
        () => benchStore.appendTagged(tag, deltaBenchDf))

      // ---- strips for tonight's NEW/CHANGED keepers, from stored
      // windows — never a text re-read. Keeper set: the committed stats
      // member (storage-fed) overrides the pre-state; only delta docs
      // and flip-affected docs can need a fresh `cleaned`. ----
      val statsMember = spark.read.parquet(sfs.pathOf(s"stats-$tag"))
      val statsNow = statsPre
        .join(statsMember.select(col("doc_id")).hint("shuffle_hash"),
          Seq("doc_id"), "left_anti")
        .unionByName(statsMember)
      val surv = statsNow.filter(
        col("quality_score") >= Pipeline.QualityThreshold &&
          !col("repetitive") && !col("contaminated") && !col("boilerplate") &&
          col("doc_id") % Curation.BenchMod =!= 0)
      // tonight's keeper ids feed the strip restriction AND the cluster
      // materialization — pinned so the stats-merge + election chain
      // runs once
      val keep = pin(surv.groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id")))
      val stripIds = keep.join(
        bpIds.union(delta.select(col("doc_id"))).distinct()
          .hint("shuffle_hash"),
        Seq("doc_id"), "left_semi")
      // no hint on the window restriction either: stripIds is O(delta +
      // affected), so AQE broadcasts it and the stored (w, whs) arrays —
      // the heaviest rows the store holds — never cross an exchange
      val winAll = readTable("windows")
        .select(col("doc_id"), col("w"), col("whs"))
        .unionByName(spark.read.parquet(sfs.pathOf(s"windows-$tag")))
      val strips = Curation.stripFromWindows(
          winAll.join(stripIds, Seq("doc_id"), "left_semi"),
          newCommon)
        .select(col("doc_id"), col("cleaned"))

      // ---- cluster labels MATERIALIZED at write time (tonight's
      // keepers over all stored pairs) — the one iterative computation
      // the store runs, paid once per commit so every snapshot() read
      // is loop-free. `clusters` is a REPLACE table: one member, fully
      // rewritten per commit (it is O(pair-touched docs), not corpus). ----
      val pairsAll = readTable("pairs").select(col("a"), col("b"))
        .unionByName(spark.read.parquet(sfs.pathOf(s"pairs-$tag")))

      // stage 2 of the concurrent submission: the stats-dependent trio
      // (clusterLabels runs its loop inside its thunk — iterative, but
      // driver-coordinated per round like the other two's single jobs)
      CurateStore.awaitAll(
        () => writeMember(s"strips-$tag", strips),
        () => writeMember(s"clusters-$tag", clusterLabels(keep, pairsAll)),
        // health metrics for THE DELTA alone: the stats member holds
        // override rows for flip-affected corpus docs too, so restrict to
        // tonight's ids (O(delta), AQE broadcasts it); shingles come from
        // the committed signature member — zero extra text passes
        () => healthStore.appendTagged(tag, CurateStore.healthPartial(lit(tag),
          statsMember.join(delta.select(col("doc_id")), Seq("doc_id"), "left_semi"),
          deltaSh)))

      // ---- the ONE commit point ----
      val meta = lines.filter(_.startsWith("#"))
        .filterNot(_.startsWith("#count:"))
      val memberLines = lines.filterNot(_.startsWith("#"))
        .filterNot(_.startsWith("clusters:")) ++ Seq(
        s"stats:stats-$tag", s"pairs:pairs-$tag",
        s"windows:windows-$tag", s"strips:strips-$tag",
        s"ids:ids-$tag", s"clusters:clusters-$tag")
      sfs.atomicWrite(ManifestName,
        (memberLines ++ Seq(s"#count:${nOld + nDelta}") ++ meta ++
          Seq(s"#tag:$tag")).mkString("\n").getBytes)
      true
    } finally {
      pinned.foreach(_.unpersist(false))
    }
  }

  /** Remove a committed night — the "bad crawl drop" undo (mislabeled
    * batch, poisoned source): after `rollbackNight(tag)` the store's
    * every read face (snapshot, health, probe) equals a store that
    * NEVER ingested that night, without rebuilding from the other
    * nights. Works across compaction: the night's doc roster rides its
    * `ids-<tag>` member (written by every night, never folded), so
    * nothing here depends on per-night member boundaries surviving.
    *
    * Mechanics, per state class (reference analog: the failed-batch
    * routing half of worker.js:119-165 — a production nightly needs the
    * undo, not just the fold):
    *
    *  - **additive sub-stores** (df, bench): the night's contributions
    *    are re-derived from the STORED shingle sets (persisted as
    *    `rbdf-`/`rbbench-` scratch members first, so a crash-retry
    *    converges even after the signature rows are gone) and
    *    subtracted by appending their negation under the idempotent
    *    `rollback-<tag>` tag — [[minusTag]]'s trick, committed instead
    *    of read-side;
    *  - **signature index**: [[DedupIndex.delete]] (doc-grain takedown,
    *    exactly-once under the same rollback tag);
    *  - **latest-wins tables** (stats, strips): the night's docs are
    *    out-generationed by `_deleted` tombstone rows — the only undo
    *    that still works after a compaction folded the night's member —
    *    and surviving docs whose cross-document verdicts depended on
    *    the night (common-set flips from the df removal, bench shingles
    *    that vanished with it) get recomputed override rows, O(affected)
    *    exactly like [[curateNight]]'s forward maintenance;
    *  - **clusters**: re-materialized over the post-rollback keepers;
    *  - **ledger**: `#tag:<tag>` leaves the manifest (health() keys off
    *    it) and `#rolledback:<tag>` RETIRES the name — the sub-store
    *    ledgers cannot forget a consumed tag, so re-ingesting under it
    *    is refused; a fixed batch ships under a fresh tag.
    *
    * The night's DOC IDS are retired with it ([[DedupIndex.delete]]'s
    * contract: tombstones would silently filter a re-append before the
    * next compaction and resurface it after): the corrected batch
    * re-ingests under fresh crawl ids, which the nightly pipeline mints
    * per drop anyway. The roster member flips to a `deadids:` line so
    * the next [[compact]] can physically subtract the dead rows from
    * the append-only windows/pairs tables before retiring it.
    *
    * One manifest flip commits all of it; member writes land before and
    * are invisible until then; every sub-store mutation is tag-
    * idempotent, so a crashed rollback retried converges (the
    * [[curateNight]] durability argument). Returns whether THIS call
    * rolled back — `false` = the tag is not in the ledger (already
    * rolled back, or never committed): the redelivery no-op. */
  def rollbackNight(tag: String): Boolean = sfs.withWriterLease() {
    require(tag != "base",
      "night-0 cannot be rolled back — it is the store's foundation; " +
        "rebuild from a corrected corpus instead")
    val lines = manifestLines
    if (!consumedTags.contains(tag)) return false
    require(tableMembers("ids").contains(s"ids-$tag"),
      s"night '$tag' predates rollback support (no ids-$tag roster " +
        "member) — rebuild from the surviving nights instead")
    val nOld = docCount
    val idsT = spark.read.parquet(sfs.pathOf(s"ids-$tag"))
    val nRemoved = removeDocsCore(s"rollback-$tag", s"rb-$tag", idsT, nOld)
    // ---- the ONE commit point ----
    // the night's roster flips from `ids:` (a live night's rollback
    // record) to `deadids:` (the retained dead set the next compact()
    // subtracts from windows/pairs before retiring it)
    val memberLines = lines.filterNot(_.startsWith("#"))
      .filterNot(_.startsWith("clusters:"))
      .map(l => if (l == s"ids:ids-$tag") s"deadids:ids-$tag" else l) ++ Seq(
      s"stats:stats-rb-$tag", s"strips:strips-rb-$tag",
      s"clusters:clusters-rb-$tag")
    val meta = lines.filter(_.startsWith("#"))
      .filterNot(_.startsWith("#count:"))
      .filterNot(_ == s"#tag:$tag")
    sfs.atomicWrite(ManifestName,
      (memberLines ++ Seq(s"#count:${nOld - nRemoved}") ++ meta ++
        Seq(s"#rolledback:$tag")).mkString("\n").getBytes)
    true
  }

  /** Takedown requests already committed ([[deleteDocs]]' ledger). */
  def deleteTags: Set[String] =
    manifestLines.collect { case l if l.startsWith("#deltag:") =>
      l.stripPrefix("#deltag:") }.toSet

  /** Doc-grain takedown — remove individual documents (copyright
    * removal, user opt-out, PII discovery) from every read face, night
    * membership notwithstanding: [[rollbackNight]]'s machinery pointed
    * at an arbitrary id set instead of a night's roster. Ids not in the
    * living corpus are ignored (the effective set is intersected with
    * the live stats table, so re-deleting or deleting never-ingested
    * ids is harmless); affected survivors' cross-document verdicts and
    * strips are recomputed O(affected); the request roster lands as a
    * `deadids:` member the next [[compact]] subtracts from windows /
    * pairs before retiring it. Exactly-once per `tag` (the `#deltag:`
    * ledger — separate from the night ledger, so a request id can never
    * collide with a night or appear on the [[snapshotAt]] time axis).
    * Deleted ids are RETIRED ([[DedupIndex.delete]]'s contract).
    * health() keeps the nights' INGEST history unchanged — the series
    * records what each drop brought, not the living corpus. Returns
    * whether THIS call committed. */
  def deleteDocs(tag: String, docIds: DataFrame,
                 leaseWaitMs: Long = 0L): Boolean =
      sfs.withWriterLease(waitMs = leaseWaitMs) {
    val lines = manifestLines
    if (deleteTags.contains(tag)) return false
    require(tag.matches("[A-Za-z0-9._-]+"),
      s"takedown tag '$tag' must be filesystem-safe ([A-Za-z0-9._-]+)")
    val nOld = docCount
    // the request roster, made durable first (the deadids member the
    // compact-time reclaim reads; Overwrite — a crashed attempt's
    // half-written dir is invisible until the flip)
    writeMember(s"ids-del-$tag", docIds.select(col("doc_id")).distinct())
    val idsT = spark.read.parquet(sfs.pathOf(s"ids-del-$tag"))
    val nRemoved = removeDocsCore(s"delete-$tag", s"del-$tag", idsT, nOld)
    val memberLines = lines.filterNot(_.startsWith("#"))
      .filterNot(_.startsWith("clusters:")) ++ Seq(
      s"deadids:ids-del-$tag",
      s"stats:stats-del-$tag", s"strips:strips-del-$tag",
      s"clusters:clusters-del-$tag")
    val meta = lines.filter(_.startsWith("#"))
      .filterNot(_.startsWith("#count:"))
    sfs.atomicWrite(ManifestName,
      (memberLines ++ Seq(s"#count:${nOld - nRemoved}") ++ meta ++
        Seq(s"#deltag:$tag")).mkString("\n").getBytes)
    true
  }

  /** The shared removal core of [[rollbackNight]] and [[deleteDocs]]:
    * subtract the doc set's df/bench contributions, forget its
    * signatures, tombstone its stats rows, recompute affected
    * survivors' verdicts/strips/clusters — everything EXCEPT the
    * manifest flip, which each caller owns (their ledger lines differ).
    * `opTag` keys the idempotent sub-store mutations (a crashed
    * operation retried converges); `suffix` namespaces the member
    * writes (`stats-<suffix>` etc). Returns the number of LIVING docs
    * removed (the #count delta) — the requested set is intersected with
    * the live stats table, so dead/absent ids never double-decrement. */
  private def removeDocsCore(opTag: String, suffix: String,
      idsReq: DataFrame, nOld: Long): Long = {
    val keepCond = col("quality_score") >= Pipeline.QualityThreshold &&
      !col("repetitive") && !col("contaminated") && !col("boilerplate") &&
      col("doc_id") % Curation.BenchMod =!= 0

    val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def pin(df: DataFrame): DataFrame = {
      pinned += df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    }
    try {
      val statsAll = pin(alive(latestWins(readTable("stats"), "doc_id")))
      // the EFFECTIVE set: living docs only — deterministic across a
      // crash-retry because the stats members only change at the flip
      val idsT = pin(statsAll
        .join(idsReq.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
        .select(col("doc_id")))
      val nRemoved = idsT.count()
      val minOld = Curation.boilerplateMinDocs(nOld)
      val minNew = Curation.boilerplateMinDocs(nOld - nRemoved)

      // the doc set's df/bench contributions, from the stored sets —
      // made DURABLE before any mutation: once sigindex.delete commits,
      // the signatures are gone and a crash-retry could no longer
      // re-derive them (the guard is the delete's own ledger)
      if (!sigindex.consumedTags.contains(opTag)) {
        val setSh = sigindex.index
          .join(idsT.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), explode(col("sh")).as("shingle"))
        writeMember(s"rbdf-$suffix",
          setSh.groupBy(col("shingle")).agg(count(lit(1)).as("df")))
        writeMember(s"rbbench-$suffix",
          setSh.filter(col("doc_id") % Curation.BenchMod === 0)
            .groupBy(col("shingle")).agg(count(lit(1)).as("n_docs")))
      }
      val dfT = spark.read.parquet(sfs.pathOf(s"rbdf-$suffix"))
      val benchT = spark.read.parquet(sfs.pathOf(s"rbbench-$suffix"))

      // ---- subtract the additive stores; forget the signatures ----
      dfStore.appendTagged(opTag,
        dfT.select(col("shingle"), (-col("df")).as("df")))
      benchStore.appendTagged(opTag,
        benchT.select(col("shingle"), (-col("n_docs")).as("n_docs")))
      sigindex.delete(opTag, idsT)

      // ---- common-set flips, both directions (df only shrinks, but
      // the threshold moves with the count, so shingles can ENTER) —
      // single-pass over one full-join frame, the curateNight shape ----
      val dfNow = dfStore.snapshot
      val dfBoth = pin(dfNow.select(col("shingle"), col("df").as("_dn"))
        .join(dfT.select(col("shingle"), col("df").as("_dt")),
          Seq("shingle"), "full")
        .select(col("shingle"), coalesce(col("_dn"), lit(0L)).as("_dn"),
          (coalesce(col("_dn"), lit(0L)) + coalesce(col("_dt"), lit(0L)))
            .as("_dold")))
      val newCommon = pin(
        dfBoth.filter(col("_dn") >= minNew).select(col("shingle")))
      val flipped = dfBoth
        .filter((col("_dold") >= minOld) =!= (col("_dn") >= minNew))
        .select(col("shingle"))
      val benchNow = pin(benchStore.snapshot.filter(col("n_docs") > 0)
        .select(col("shingle")))
      val removedBench = benchT.select(col("shingle"))
        .join(benchNow, Seq("shingle"), "left_anti")

      // ---- O(affected) verdict maintenance over the SURVIVORS,
      // probing their stored shingle sets by both change sets (the
      // curateNight probe shape, unhinted so AQE broadcasts the
      // delta-derived build sides and stored arrays never shuffle) ----
      val statsPre = statsAll
        .join(idsT.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
      val corpusRows = sigindex.index.select(col("doc_id"), col("sh"))
      val probeSh = flipped
        .select(col("shingle"), lit(true).as("bp_probe"),
          lit(false).as("ct_probe"))
        .unionByName(removedBench
          .select(col("shingle"), lit(false).as("bp_probe"),
            lit(true).as("ct_probe")))
      val hits = corpusRows
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(probeSh, Seq("shingle"))
        .groupBy(col("doc_id"))
        .agg(max(col("bp_probe")).as("bp_hit"), max(col("ct_probe")).as("ct_hit"))
      val affected = pin(statsPre.join(hits.hint("shuffle_hash"), Seq("doc_id")))
      val bpIds = pin(affected.filter(col("bp_hit")).select(col("doc_id")))
      val nbp = corpusRows
        .join(bpIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(newCommon.hint("shuffle_hash"), Seq("shingle"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bp"))
      // un-contamination: a doc contaminated ONLY via bench shingles
      // that left with the night re-probes the remaining bench set
      val ctIds = affected.filter(col("ct_hit") && col("contaminated"))
        .select(col("doc_id"))
      val ctStill = corpusRows
        .join(ctIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(benchNow.hint("shuffle_hash"), Seq("shingle"), "left_semi")
        .select(col("doc_id")).distinct().withColumn("_cts", lit(true))
      val overrides = affected
        .join(nbp.hint("shuffle_hash"), Seq("doc_id"), "left")
        .join(ctStill.hint("shuffle_hash"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("quality_score"), col("repetitive"),
          when(col("ct_hit"), coalesce(col("_cts"), lit(false)) &&
              col("doc_id") % Curation.BenchMod =!= 0)
            .otherwise(col("contaminated")).as("contaminated"),
          when(col("bp_hit"),
            when(col("n_sh") === 0, lit(false))
              .otherwise(coalesce(col("n_bp"), lit(0L)).cast("double")
                / col("n_sh") > Curation.BoilerplateMaxFrac))
            .otherwise(col("boilerplate")).as("boilerplate"),
          col("content_hash"), col("n_sh"), lit(false).as("_deleted"))

      // ---- member writes (invisible until the flip): overrides +
      // tombstones for the removed docs in one stats member ----
      writeMember(s"stats-$suffix", overrides.unionByName(
        idsT.select(col("doc_id"), lit(true).as("_deleted")),
        allowMissingColumns = true))

      // ---- strips for keepers whose text changed (common-set flips)
      // or who were JUST elected (their exact-dup keeper left with the
      // removed set and had the only cleaned row) — storage-fed like
      // the night's forward path ----
      val statsRb = spark.read.parquet(sfs.pathOf(s"stats-$suffix"))
      val statsNew = statsPre
        .join(statsRb.select(col("doc_id")).hint("shuffle_hash"),
          Seq("doc_id"), "left_anti")
        .unionByName(statsRb
          .filter(!coalesce(col("_deleted"), lit(false))).drop("_deleted"))
      val keepersAfter = pin(statsNew.filter(keepCond)
        .groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id")))
      val keepersBefore = statsAll.filter(keepCond)
        .groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val newlyElected = keepersAfter
        .join(keepersBefore.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
      val stripIds = keepersAfter.join(
        bpIds.union(newlyElected).distinct().hint("shuffle_hash"),
        Seq("doc_id"), "left_semi")
      val winAll = readTable("windows")
        .select(col("doc_id"), col("w"), col("whs"))
      writeMember(s"strips-$suffix", Curation.stripFromWindows(
          winAll.join(stripIds, Seq("doc_id"), "left_semi"), newCommon)
        .select(col("doc_id"), col("cleaned")))

      // ---- clusters re-materialized over the post-removal keepers
      // (pairs with a removed endpoint are inert under the keeper
      // restriction; the rows themselves retire at the next compact) ----
      writeMember(s"clusters-$suffix",
        clusterLabels(keepersAfter, readTable("pairs").select(col("a"), col("b"))))

      nRemoved
    } finally {
      pinned.foreach(_.unpersist(false))
    }
  }
}

object CurateStore {

  private val ManifestName = "_CURATE"

  /** Run independent eager actions as CONCURRENTLY SUBMITTED Spark jobs
    * and wait for all of them — the night's fixed-overhead batching
    * (driver planning and scheduling overlap; the cluster interleaves
    * tasks under the session's scheduler). Fails with the FIRST
    * failure after every thunk has settled, so a partial stage never
    * leaves threads racing a thrown caller: nothing commits unless all
    * succeed, preserving the eager-writes-then-one-manifest-flip
    * contract. */
  private[operators] def awaitAll(thunks: (() => Unit)*): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map(t => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = t()
      }))
      val errs = futs.flatMap { f =>
        try { f.get(); None }
        catch { case e: java.util.concurrent.ExecutionException =>
          Some(e.getCause) }
      }
      errs.headOption.foreach(throw _)
    } finally pool.shutdown()
  }

  /** Directories that belong to the nested sub-stores, never to the
    * member namespace — [[CurateStore.vacuum]] must not touch them. */
  private val SubStoreDirs = Set("sigindex", "df", "bench", "health")

  /** The nested health store: (night, lang)-keyed doc counts plus
    * vocabulary (distinct sketch) and token-length (quantile sketch)
    * measures. */
  private def healthStoreAt(spark: SparkSession, sfs: StoreFs): PointStore =
    new PointStore(spark, sfs.pathOf("health"),
      keys = Seq("night", "lang"), sums = Seq("n_docs"), maxes = Nil,
      sketches = Seq("vocab"), quantiles = Seq("lens"))

  /** One night's (night, lang) health partial, computed purely from
    * frames the fold already materialized: `stats` (doc_id, lang,
    * n_tokens — the night's stats member restricted to its own docs)
    * and `postings` (doc_id, shingle — the caller's ALREADY-EXPLODED
    * posting view: build reuses its pinned corpus postings, a night
    * its delta postings, so the health fold never re-reads or
    * re-explodes the stored sets). Joining at posting grain also
    * keeps the night's plan contract — stored arrays never cross an
    * exchange (CurateStorePlanSpec pins it); the posting rows are
    * 16 bytes each where the array rows are kilobytes. */
  private def healthPartial(night: org.apache.spark.sql.Column,
      stats: DataFrame, postings: DataFrame): DataFrame = {
    import graft.functions.SketchOps
    // ONE lang-keyed aggregation computes all three measures (r11 ran
    // two — vocab via the posting join, counts+quantiles directly — plus
    // a lang-grain stitch join): posting rows carry (lang, shingle) with
    // a null token count, doc rows carry (lang, n_tokens) with a null
    // shingle, and each sketch update skips its branch's nulls, so the
    // union needs no marker resolution beyond the doc-row counter. A
    // lang whose docs carry no shingles (every doc shorter than the
    // shingle width) keeps its (night, lang) row through the doc branch,
    // its vocab the genuinely empty sketch — the series never silently
    // under-reports an ingested lang.
    val shingleType = postings.schema("shingle").dataType
    val postRows = postings
      .select(col("doc_id"), col("shingle"))
      .join(stats.select(col("doc_id"), col("lang")).hint("shuffle_hash"),
        Seq("doc_id"))
      .select(col("lang"), col("shingle"),
        lit(null).cast("long").as("n_tokens"), lit(0L).as("is_doc"))
    val docRows = stats.select(col("lang"),
      lit(null).cast(shingleType).as("shingle"),
      col("n_tokens").cast("long").as("n_tokens"), lit(1L).as("is_doc"))
    postRows.unionByName(docRows)
      .groupBy(col("lang"))
      .agg(sum(col("is_doc")).as("n_docs"),
        SketchOps.distinctSketch(col("shingle"),
          TextOps.DistinctP, TextOps.DistinctSparseCap).as("vocab"),
        SketchOps.quantileSketch(col("n_tokens"), TextOps.QuantileK).as("lens"))
      .select(night.as("night"), col("lang"), col("n_docs"),
        col("vocab"), col("lens"))
  }

  /** Member-count bound per table before [[curateNight]] folds the
    * store (16 = two weeks of nightly appends between folds — the
    * [[DedupIndex.AutoCompactMembers]] rationale). */
  val AutoCompactMembers = 16

  /** Near-dup Jaccard bar — must match the one-shot funnel's
    * ([[Pipeline.pipelineCurate]] clusters at width
    * [[Curation.DecontamN]], threshold 0.5). */
  val NearDupThreshold = 0.5

  /** Night-0 build: run the full funnel over the initial corpus ONCE and
    * persist every reusable byproduct. This is the one corpus-scale
    * text pass the store ever pays; the per-table writes mirror what
    * [[curateNight]] maintains incrementally. Refuses an existing store
    * (the [[DedupIndex.build]] in-place-rebuild rule). */
  def build(corpus: DataFrame, dir: String): CurateStore = {
    val spark = corpus.sparkSession
    val sfs = StoreFs(spark, dir)
    require(!sfs.exists(ManifestName),
      s"a curate store already exists at $dir — curateNight() into it, " +
        "or build into a fresh directory")
    sfs.mkdirs()
    val n = corpus.count()
    val minDocs0 = Curation.boilerplateMinDocs(n)

    // the corpus kernel pass lands in the signature index; everything
    // shingle-shaped below reads the STORED sets back, not the text
    val idx = DedupIndex.build(corpus, sfs.pathOf("sigindex"),
      Curation.DecontamN)
    val rows = idx.index
    // the posting view feeds FOUR consumers below (df fold, bench fold,
    // contamination, boilerplate hits) — pin it once instead of paying
    // four parquet re-reads + explodes of the stored sets
    val post = rows.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    val dfStore = new PointStore(spark, sfs.pathOf("df"),
      Seq("shingle"), Seq("df"), Nil)
    val benchStore = new PointStore(spark, sfs.pathOf("bench"),
      Seq("shingle"), Seq("n_docs"), Nil)
    // independent corpus-scale writes submitted concurrently (the
    // curateNight fixed-overhead batching, applied to night 0): the two
    // df-grain folds and the two text-independent members share the
    // wall clock
    awaitAll(
      () => dfStore.appendTagged("base",
        post.groupBy(col("shingle")).agg(count(lit(1)).as("df"))),
      () => benchStore.appendTagged("base",
        post.filter(col("doc_id") % Curation.BenchMod === 0)
          .groupBy(col("shingle")).agg(count(lit(1)).as("n_docs"))),
      () => idx.allPairs(NearDupThreshold).select(col("a"), col("b"))
        .write.mode(SaveMode.Overwrite).parquet(sfs.pathOf("pairs-base")),
      () => Curation.windowsOf(corpus)
        .write.mode(SaveMode.Overwrite).parquet(sfs.pathOf("windows-base")))
    val common0 = dfStore.snapshot.filter(col("df") >= minDocs0)
      .select(col("shingle"))
    val bench0 = benchStore.snapshot.select(col("shingle"))

    // per-doc stats: quality + content hash in one text pass, repetition
    // in its keyed-agg pass, screen verdicts from stored postings
    val q = TextOps.textStatsOf(corpus, col("lang"),
        md5(col("text")).as("content_hash"))
      .select(col("doc_id"), col("lang"), col("content_hash"),
        col("n_tokens"), col("quality_score"))
    val rep = Curation.docRepetitionOf(corpus)
      .select(col("doc_id"), col("repetitive"))
    val nsh = rows.select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
    val ct = post.filter(col("doc_id") % Curation.BenchMod =!= 0)
      .join(bench0.hint("shuffle_hash"), Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct().withColumn("_ct", lit(true))
    val bp = post.join(common0.hint("shuffle_hash"), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bp"))
    val stats0 = q
      .join(rep.hint("shuffle_hash"), Seq("doc_id"))
      .join(nsh.hint("shuffle_hash"), Seq("doc_id"), "left")
      .join(ct.hint("shuffle_hash"), Seq("doc_id"), "left")
      .join(bp.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality_score"), col("repetitive"),
        coalesce(col("_ct"), lit(false)).as("contaminated"),
        when(coalesce(col("n_sh"), lit(0L)) === 0, lit(false))
          .otherwise(coalesce(col("n_bp"), lit(0L)).cast("double")
            / col("n_sh") > Curation.BoilerplateMaxFrac).as("boilerplate"),
        col("content_hash"),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"))
    stats0.write.mode(SaveMode.Overwrite).parquet(sfs.pathOf("stats-base"))

    // strips for the night-0 keepers, storage-fed (stats + windows read
    // back from the members just written)
    val statsR = spark.read.parquet(sfs.pathOf("stats-base"))
    val surv = statsR.filter(
      col("quality_score") >= Pipeline.QualityThreshold &&
        !col("repetitive") && !col("contaminated") && !col("boilerplate") &&
        col("doc_id") % Curation.BenchMod =!= 0)
    // keep feeds TWO concurrent consumers below (strips + clusters) —
    // pinned so the stats scan + election agg runs once
    val keep = surv.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val winR = spark.read.parquet(sfs.pathOf("windows-base"))
    val pairsR = spark.read.parquet(sfs.pathOf("pairs-base"))
      .select(col("a"), col("b"))
    val kp = pairsR
      .join(keep.withColumnRenamed("doc_id", "a").hint("shuffle_hash"),
        Seq("a"), "left_semi")
      .join(keep.withColumnRenamed("doc_id", "b").hint("shuffle_hash"),
        Seq("b"), "left_semi")
    // the stats-dependent trio, concurrently like curateNight's stage 2
    try awaitAll(
      () => Curation.stripFromWindows(
          winR.join(keep.hint("shuffle_hash"), Seq("doc_id"), "left_semi"),
          common0)
        .select(col("doc_id"), col("cleaned"))
        .write.mode(SaveMode.Overwrite).parquet(sfs.pathOf("strips-base")),
      // night-0 health row per lang, storage-fed like the strips (stats +
      // signature rows read back from what was just written)
      () => healthStoreAt(spark, sfs).appendTagged("base",
        healthPartial(lit("base"), statsR, post)),
      // cluster labels materialized like every later commit does (the
      // handle's clusterLabels needs a loaded store, so inline the same
      // two-semi-join + components shape over the written pairs member)
      () => Dedup.connectedComponents(kp).withColumnRenamed("node", "doc_id")
        .write.mode(SaveMode.Overwrite).parquet(sfs.pathOf("clusters-base")))
    finally keep.unpersist(false)

    sfs.atomicWrite(ManifestName, Seq(
      "stats:stats-base", "pairs:pairs-base",
      "windows:windows-base", "strips:strips-base",
      "clusters:clusters-base",
      s"#count:$n").mkString("\n").getBytes)
    load(spark, dir)
    } finally post.unpersist(false)
  }

  /** Load fails loudly on a directory with no committed store
    * ([[DedupIndex.load]]'s refusal style). */
  def load(spark: SparkSession, dir: String): CurateStore = {
    val store = new CurateStore(spark, dir)
    store.docCount // throws with the directory named if absent
    store
  }

  /** The lifecycle queries' shared night-0 FIXTURE: the historical
    * corpus (doc_id ≤ 80% of the id range) built ONCE per (JVM, sf dir)
    * and then CLONED — never mutated — by each lifecycle query below.
    * In production the store the nightly fold runs against EXISTS; a
    * bench entry that rebuilds it per query measures the night-0 build
    * (already priced by `pipeline_curate`'s one-shot funnel) instead of
    * the incremental verb the row claims. [[StoreFs.cloneTo]] under the
    * fixture's lease hands every caller its own mutation-safe copy for
    * a raw file copy, so what a lifecycle query times is clone + its
    * own verb + merge-on-read — the O(delta)/O(affected) work. Cached
    * under a [[DedupIndex.freshRunDir]] scratch root (JVM-token reaped);
    * `computeIfAbsent` makes concurrent first callers block on the one
    * build. Returns (fixture root, cut). */
  private val baseCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  private def historicalBase(s: SparkSession, d: String): (String, Long) =
    baseCache.computeIfAbsent(d, _ => {
      val docs = graft.Tables.documents(s, d)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut = maxId * 4 / 5
      val dir = DedupIndex.freshRunDir("graft_curatebase_", d)
      build(docs.filter(col("doc_id") <= cut), dir.getPath)
      (dir.getPath, cut)
    })

  /** Warm the shared fixture outside a timed region (Bench calls this
    * beside its plan-compile warmup, so neither lifecycle entry below
    * absorbs the night-0 build that is not the verb it measures). */
  def warmLifecycleFixture(s: SparkSession, d: String): Unit =
    historicalBase(s, d)

  /** Clone the shared fixture into a fresh scratch dir — each lifecycle
    * query mutates its OWN copy. */
  private def cloneBase(s: SparkSession, d: String, prefix: String)
      : (CurateStore, Long) = {
    val (base, cut) = historicalBase(s, d)
    val dir = DedupIndex.freshRunDir(prefix, d)
    StoreFs.cloneTo(s, base, dir.getPath)
    (load(s, dir.getPath), cut)
  }

  /** `pipeline_curate_delta`: the nightly lifecycle against a store on
    * disk — clone the historical store (doc_id ≤ 80% of the id range,
    * the shared [[historicalBase]] fixture), fold the crawl delta (the
    * newest 20%) in as one night with an at-least-once redelivery (must
    * commit nothing), and read the assembled result. The oracle is the
    * ONE-SHOT [[Pipeline.pipelineCurateOracle]] over the UNSPLIT table,
    * so a hash match proves build + clone + night-fold + merge-on-read
    * reproduce the full recompute exactly — quality, repetition,
    * decontamination, corpus-relative boilerplate (verdicts AND
    * stripped text), exact keepers, and near-dup clusters — while
    * having touched each document's text exactly once across the
    * fixture + fold pair. */
  def pipelineCurateDelta(s: SparkSession, d: String): DataFrame = {
    val (store, cut) = cloneBase(s, d, "graft_curatestore_")
    val delta = graft.Tables.documents(s, d).filter(col("doc_id") > cut)
    store.curateNight("nightly", delta)
    store.curateNight("nightly", delta) // redelivered night: no-op
    store.snapshot()
  }

  /** Same result as the one-shot funnel — the whole point. */
  def pipelineCurateDeltaOracle: String = Pipeline.pipelineCurateOracle

  /** `curate_takedown`: the doc-grain deletion lifecycle against a store
    * on disk — clone the same historical store [[pipelineCurateDelta]]
    * folds into (one shared night-0 build per session; deletion ACROSS
    * nights is CurateStoreSpec's reference-store pin), then
    * [[CurateStore.deleteDocs]] a takedown set with one redelivery
    * (must commit nothing), and read the assembled result. The oracle
    * is the one-shot funnel over the SURVIVING docs — the 80% cut
    * recomputed in SQL ((max*4)//5, both floors on positives) — so a
    * hash match proves deletion re-derives every corpus-relative
    * verdict (df threshold at the shrunken count, un-contamination,
    * re-elections, re-strips) exactly as a pipeline that never ingested
    * them. */
  def curateTakedown(s: SparkSession, d: String): DataFrame = {
    val (store, cut) = cloneBase(s, d, "graft_curatetd_")
    val gone = graft.Tables.documents(s, d)
      .filter(col("doc_id") <= cut && col("doc_id") % 7 === 3)
      .select(col("doc_id"))
    store.deleteDocs("takedown-1", gone)
    store.deleteDocs("takedown-1", gone) // redelivered request: no-op
    store.snapshot()
  }

  def curateTakedownOracle: String = {
    // the cut scalar stays a placeholder until AFTER the table
    // rewrites: its own "FROM documents" spelled out here would get
    // rewritten by the bare replace below, nesting the survivor filter
    // into the max() and silently shrinking the cut
    val sub = "(SELECT * FROM documents " +
      "WHERE doc_id <= @CUT@ AND doc_id % 7 <> 3)"
    // the funnel oracle references the table both bare and as `d` —
    // rewrite the aliased site first so the bare rewrite cannot
    // double-alias it
    Pipeline.pipelineCurateOracle
      .replace("FROM documents d", s"FROM $sub d")
      .replace("FROM documents", s"FROM $sub documents")
      .replace("@CUT@", "(SELECT (max(doc_id)*4)//5 FROM documents)")
  }
}

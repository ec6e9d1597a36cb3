package graft

import graft.operators.{Ann, AsOf, Dedup, Skew, TextOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-facing fluent API: the engine's operators over ARBITRARY
  * DataFrames and column names — the surface a user migrating off the
  * reference programs against (`import graft.api._`). Each method
  * delegates to the same plans the registered queries run, so everything
  * the oracle gate proves transfers to user data. */
package object api {

  implicit class GraftDataFrameOps(private val df: DataFrame) {

    /** As-of join: latest `right` row per `key` at-or-before this frame's
      * `time`; `carry` columns are appended (null when no match). */
    def asofJoinTo(right: DataFrame, key: String, time: String,
                   tieBreak: String, carry: Seq[String]): DataFrame =
      AsOf.join(df, right, key, time, tieBreak, carry)

    /** Salted two-phase aggregation for skewed group keys. */
    def saltedAgg(key: Column, salt: Column, sums: Seq[(String, Column)],
                  buckets: Int = Skew.Buckets): DataFrame =
      Skew.saltedAgg(df, key, salt, sums, buckets)

    /** Exact dedup groups: one row per distinct value of `textCol`, with
      * the keeper id (min of `idCol`) and the duplicate count. */
    def exactDedupGroups(idCol: String, textCol: String): DataFrame =
      df.groupBy(md5(col(textCol)).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))

    /** MinHash-LSH near-duplicate pairs with exact Jaccard verification
      * (word `n`-shingles, banded LSH candidates — never all-pairs). */
    def minhashDedupPairs(idCol: String, textCol: String,
                          n: Int = 3, threshold: Double = 0.5): DataFrame =
      Dedup.minhashDedup(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")), n, threshold)

    /** Duplicate-cluster formation + keeper election: one row per input
      * doc with its near-dup cluster id (smallest member id; singletons
      * their own cluster) and the keep/drop verdict — MinHash pair
      * discovery composed with distributed connected components. */
    def duplicateClusters(idCol: String, textCol: String,
                          n: Int = 3, threshold: Double = 0.5): DataFrame =
      Dedup.dedupClustersOf(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")), n, threshold)

    /** Build a persisted near-dup signature index over this frame's
      * documents at `indexDir` — the state an incremental (nightly /
      * streaming) dedup maintains. Append later crawl deltas with
      * [[graft.operators.DedupIndex.appendTagged]] (exactly-once under
      * redelivery), probe batches before ingest with `probe`, and take
      * the delta's verified pairs with `pairsInvolving` — O(delta)
      * kernel work, never a corpus re-shingle.
      *
      * Contract: ids appended or probed later must be DISJOINT from the
      * ids already indexed — the same document under two tags would
      * double its postings and silently corrupt Jaccard intersection
      * counts (redelivery of the SAME tag is the covered, no-op case).
      * When disjointness isn't structural (fresh crawl ids), pass
      * `verifyDisjoint = true` to `appendTagged`, or check
      * `overlapCount` explicitly, to fail loudly instead. */
    def buildDedupIndex(idCol: String, textCol: String, indexDir: String,
                        n: Int = 3): graft.operators.DedupIndex =
      graft.operators.DedupIndex.build(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
        indexDir, n)

    /** Build a persisted CURATION store over this frame's documents at
      * `storeDir` — the full cleaning funnel (quality, repetition,
      * decontamination, corpus-relative boilerplate screen + strip,
      * exact keepers, near-dup clusters) run once and persisted, so
      * later crawl deltas fold in with
      * [[graft.operators.CurateStore.curateNight]] (O(delta) text work,
      * exactly-once under redelivery) and
      * [[graft.operators.CurateStore.snapshot]] reassembles the curated
      * corpus from state alone. Delta ids must be disjoint from the
      * ingested corpus (the [[buildDedupIndex]] contract — the store
      * appends into its nested signature index). */
    def buildCurateStore(idCol: String, textCol: String, langCol: String,
                         storeDir: String): graft.operators.CurateStore =
      graft.operators.CurateStore.build(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
          col(langCol).as("lang")),
        storeDir)

    /** Overlapping context-window chunks of a text column: one row per
      * (doc, chunk) with id, token count, text — scan-speed row
      * expansion, no joins or aggregation. */
    def chunked(idCol: String, textCol: String): DataFrame =
      TextOps.chunkDocumentsOf(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")))

    /** Top-k rows per group, deterministic tie-break on `tieBreak`. */
    def topKPerGroup(k: Int, partitionBy: Seq[String], order: Column,
                     tieBreak: Column): DataFrame = {
      val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(order, tieBreak)
      df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }

    /** Ordered conversion funnel over (`userCol`, `timeCol`, `typeCol`):
      * one row per (step, user) reached, with the reach time. Order
      * matters and ties are strict — a step event at or before the
      * previous step's reach time never converts
      * ([[graft.operators.Windows.funnelOf]]'s chained first-occurrence
      * law; the same filter→join→agg chain shuffling on the user key
      * alone). `horizon` bounds each hop to within a compact duration
      * (`"30m"`, `"1d"` — [[graft.operators.Windows.parseHorizon]]) of
      * the previous reach, boundary inclusive. */
    def funnelBy(userCol: String, timeCol: String, typeCol: String,
                 steps: Seq[String], horizon: Option[String] = None): DataFrame = {
      val ev = df.select(col(userCol).as("user_id"),
        col(timeCol).as("ts"), col(typeCol).as("event_type"))
      operators.Windows.funnelOf(ev, steps,
          horizon.map(operators.Windows.parseHorizon)).zip(steps).zipWithIndex
        .map { case ((st, name), i) =>
          st.select(lit(i + 1).cast("int").as("step"),
            lit(name).as("step_name"), col("user_id").as(userCol),
            col("t").as("reached_at")) }
        .reduce(_ unionByName _)
    }

    /** The deepest-chain windowed funnel over the same columns
      * ([[graft.operators.Windows.funnelDeepestOf]] — ClickHouse
      * windowFunnel semantics: depth maximized over every step-1
      * anchor, all steps within the anchor's horizon): one row per
      * (step, user) reachable at that depth. `funnelBy` answers "did
      * the first journey convert"; this answers "is the user
      * convertible at all". */
    def funnelDeepestBy(userCol: String, timeCol: String, typeCol: String,
                        steps: Seq[String], horizon: String): DataFrame = {
      val ev = df.select(col(userCol).as("user_id"),
        col(timeCol).as("ts"), col(typeCol).as("event_type"))
      operators.Windows.funnelDeepestOf(ev, steps,
          operators.Windows.parseHorizon(horizon)).zip(steps).zipWithIndex
        .map { case ((st, name), i) =>
          st.select(col("user_id")).distinct()
            .select(lit(i + 1).cast("int").as("step"),
              lit(name).as("step_name"), col("user_id").as(userCol)) }
        .reduce(_ unionByName _)
    }

    /** Path-transition matrix over (`userCol`, `timeCol`, `typeCol`):
      * counts of adjacent event pairs per user in time order (the
      * sankey input — [[graft.operators.Windows.pathTransitionsOf]]).
      * `tieBreak` makes ordering deterministic under duplicate
      * timestamps, the sessionizer convention. `withinGap` (compact
      * duration, e.g. `"30m"`) bounds adjacency to the gap-session
      * grain — a pair spanning a longer silence is two visits. */
    def pathsBy(userCol: String, timeCol: String, typeCol: String,
                tieBreak: String,
                withinGap: Option[String] = None): DataFrame =
      operators.Windows.pathTransitionsOf(
        df.select(col(userCol).as("user_id"), col(timeCol).as("ts"),
          col(tieBreak).as("event_id"), col(typeCol).as("event_type")),
        withinGap.map(operators.Windows.parseHorizon))

    /** Cohort retention matrix over (`userCol`, `timeCol`): users
      * cohorted by the calendar `period` (day|week|month) of their
      * first event; cell (cohort, offset) = distinct users active
      * `offset` periods after their cohort
      * ([[graft.operators.Windows.retentionOf]] — one user-grain agg
      * whose state is the user's bounded period SET, then one matrix
      * agg). `rolling = true` swaps in the unbounded reading (active
      * at offset k OR LATER —
      * [[graft.operators.Windows.retentionRollingOf]]). */
    def retentionBy(userCol: String, timeCol: String,
                    period: String = "week",
                    rolling: Boolean = false): DataFrame = {
      val ev = df.select(col(userCol).as("user_id"), col(timeCol).as("ts"))
      if (rolling) operators.Windows.retentionRollingOf(ev, period)
      else operators.Windows.retentionOf(ev, period)
    }

    /** Self-scored bigram-LM quality signal over (`idCol`, `textCol`):
      * per doc, the mean add-one-smoothed bigram log-prob against the
      * frame's OWN corpus counts ([[graft.operators.TextOps
      * .perplexityOf]] — gibberish, boilerplate soup and wrong-language
      * text score low; perplexity = exp(−avg_logprob) if wanted).
      * Docs with fewer than 2 tokens are absent. */
    def perplexityBy(idCol: String, textCol: String): DataFrame =
      TextOps.perplexityOf(
          df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
        .withColumnRenamed("doc_id", idCol)

    /** The trigram/stupid-backoff upgrade of [[perplexityBy]]
      * ([[graft.operators.TextOps.perplexityTrigramOf]]): sharper on
      * short-range scrambles a bigram model scores as fluent. Docs
      * with fewer than 3 tokens are absent. */
    def perplexityTrigramBy(idCol: String, textCol: String): DataFrame =
      TextOps.perplexityTrigramOf(
          df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
        .withColumnRenamed("doc_id", idCol)

    /** Gap-based sessionization over (`key`, `time`): adds session_id.
      * `tieBreak` columns make ordering deterministic under duplicate
      * timestamps (same reason the registered operator orders by
      * (ts, event_id)).
      *
      * Timezone-independent: TIMESTAMP_NTZ (naive parquet timestamps)
      * gaps are computed by NTZ−NTZ interval subtraction on the naive
      * VALUES — no cast through the session timezone — so the result is
      * identical under UTC, a fixed offset, or a DST zone (a gap
      * spanning a DST transition neither stretches nor collapses, and
      * ambiguous local times don't fold; AdviceFixSpec pins the DST-zone
      * invariance). Other input types (LTZ, date, string) are cast to
      * TIMESTAMP first, as before, and subtract as instants. */
    def sessionized(key: String, time: String, gapMinutes: Int = 30,
                    tieBreak: Seq[String] = Nil): DataFrame = {
      val byKey = Window.partitionBy(col(key))
        .orderBy((col(time) +: tieBreak.map(col)): _*)
      // resolve through the ANALYZER, not StructType.apply: a direct
      // df.schema(time) lookup is case-sensitive and rejects nested
      // field paths, where every col(time) below resolves under the
      // session's resolver — the type check must see the same column
      val ntz = df.select(col(time)).schema.head.dataType ==
        org.apache.spark.sql.types.TimestampNTZType
      def asTime(c: Column): Column = if (ntz) c else c.cast("timestamp")
      df.withColumn("_prev", lag(col(time), 1).over(byKey))
        .withColumn("_gap",
          when(col("_prev").isNull ||
            asTime(col(time)) - asTime(col("_prev")) >
              expr(s"INTERVAL '$gapMinutes' MINUTE"), 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("_gap")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .drop("_prev", "_gap")
    }

    /** Exact cosine top-k of `queries` (qid, vector) against this frame's
      * (`idCol`, `vecCol`) corpus. Vectors may be float or double arrays;
      * both sides are cast and L2-normalized once (native expressions),
      * the query set broadcasts, and ranking prunes per-partition via
      * WindowGroupLimit — the brute-force baseline shape; build an
      * [[graft.operators.IvfIndex]] for the probed scale path.
      * `excludeSelf` (default true) drops the corpus row whose id equals
      * the query's — correct when queries are drawn from this corpus;
      * pass false when the two id spaces are unrelated. */
    def cosineTopK(queries: DataFrame, idCol: String, vecCol: String,
                   qidCol: String, qvecCol: String, k: Int = 10,
                   excludeSelf: Boolean = true): DataFrame =
      Ann.topkOf(
        df.select(col(idCol), graft.functions.VectorOps.toDouble(col(vecCol))),
        queries.select(col(qidCol),
          graft.functions.VectorOps.toDouble(col(qvecCol))), k, excludeSelf)

    /** Distributed UPDATE-join (the reference's `UPDATE ... JOIN ... SET`
      * write-back shape, crunch_team.sql:1-2,50): rows of `updates`
      * overwrite `setCols` on matching `key`; unmatched rows keep their
      * current values. One equi-join on the key — the upsert plan a
      * sorted/bucketed target table executes shuffle-free. */
    def updateWith(updates: DataFrame, key: String,
                   setCols: Seq[String]): DataFrame = {
      val renamed = setCols.foldLeft(
        updates.select((key +: setCols).map(col): _*)) {
        (u, c) => u.withColumnRenamed(c, s"_new_$c")
      }.withColumnRenamed(key, "_upd_key")
      val joined = df.join(renamed, col(key) === col("_upd_key"), "left")
      setCols.foldLeft(joined) { (d, c) =>
        d.withColumn(c, coalesce(col(s"_new_$c"), col(c)))
      }.drop("_upd_key" +: setCols.map(c => s"_new_$c"): _*)
    }

    /** Deterministic stratified sample: keep `rates(stratum)` (default
      * `defaultRate`) of rows per stratum, decided by a multiplicative
      * hash of `idCol` — reproducible, repartition-stable, and nested
      * (a 0.2 sample is a subset of a 0.5 sample of the same frame). */
    def stratifiedSample(idCol: String, strataCol: String,
                         rates: Seq[(String, Double)],
                         defaultRate: Double = 0.0): DataFrame =
      graft.operators.Sampling.stratifiedOf(df, idCol, strataCol, rates, defaultRate)

    /** Sequence packing for training batches: appends `start_offset`,
      * `bin`, `bin_offset` from the running sum of `tokensCol` per
      * `strataCol` stream ordered by `idCol` — concatenation layout,
      * contexts of `budget` tokens. */
    def packedSequences(idCol: String, strataCol: String, tokensCol: String,
                        budget: Long = graft.operators.Sampling.Budget): DataFrame =
      graft.operators.Sampling.packOf(df, idCol, strataCol, tokensCol, budget)

    /** Epoch-weighted corpus mixing (the data-mix recipe: "2.3 epochs of
      * en, 0.5 of es"): each row emitted floor(w) times per its stratum's
      * weight plus an id-hash-selected fractional copy; adds `copy` (the
      * 0-based epoch index). Deterministic on any partitioning. */
    def mixedByEpochs(idCol: String, strataCol: String,
                      epochs: Seq[(String, Double)],
                      defaultEpochs: Double = 0.0): DataFrame =
      graft.operators.Mix.mixOf(df, idCol, strataCol, epochs, defaultEpochs)

    /** Quality-ranked token-budget fill per stratum ("the best docs until
      * N tokens per language"): adds `sel_rank` and `start_offset`, keeps
      * every row starting inside the budget (the straddling row whole).
      * Runs the score-bucket-sharded path — no stratum-wide window at
      * any scale (identical output to the serial reference). */
    def tokenBudget(idCol: String, strataCol: String, tokensCol: String,
                    scoreCol: String, budget: Long): DataFrame =
      graft.operators.Mix.budgetOfSharded(df, idCol, strataCol, tokensCol,
        scoreCol, budget)

    /** Seeded deterministic global shuffle: adds `shuffle_key`
      * (md5(seed:id)) and `shuffle_rank` (the 0-based global permutation
      * rank), computed hierarchically — no single-partition window. */
    def shuffledBy(idCol: String, seed: String): DataFrame =
      graft.operators.Mix.shuffleOf(df, idCol, seed)

    /** Text quality statistics for a `textCol` (adds token/stopword/punct
      * counts and the composite quality score). */
    def withTextStats(textCol: String): DataFrame =
      df.withColumn("_stats", TextOps.textStatsExpr(col(textCol)))
        .select((df.columns.map(col) :+ col("_stats.*")).toIndexedSeq: _*)

    /** Per-group distinct-count estimate of `valueCol` via the mergeable
      * [[graft.functions.DistinctSketch]]: adds `<valueCol>_distinct`.
      * EXACT below `sparseCap` distinct values per group; past it, dense
      * HLL at 2^p bytes of state per group with ~1.04/√2^p relative
      * error. For the persisted night-over-night shape, aggregate with
      * `SketchOps.distinctSketch` instead, store the binary column
      * (PointStore accepts it as a `sketches` measure), and fold with
      * `SketchOps.sketchMerge`. */
    def distinctCountBy(groupCols: Seq[String], valueCol: String,
                        p: Int = 14, sparseCap: Int = 1 << 16): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg(graft.functions.SketchOps.distinctSketch(col(valueCol), p, sparseCap)
          .as("_sk"))
        .select((groupCols.map(col) :+
          graft.functions.SketchOps.sketchEst(org.apache.spark.sql.functions
            .col("_sk")).as(s"${valueCol}_distinct")).toIndexedSeq: _*)

    /** Rewrite this frame to `outPath` clustered on the Z-order of two
      * numeric columns (min/max collected here — two rows of metadata),
      * so file-level statistics prune scans on EITHER column; returns
      * the read-back clustered frame including its `zkey`. */
    def zOrdered(colA: String, colB: String, outPath: String,
                 files: Int = 16): DataFrame = {
      val r = df.agg(
        min(col(colA)).cast("long"), max(col(colA)).cast("long"),
        min(col(colB)).cast("long"), max(col(colB)).cast("long")).collect()(0)
      require(!r.isNullAt(0) && !r.isNullAt(2),
        s"cannot z-order an empty frame or all-null $colA/$colB")
      graft.operators.Layout.clusterZOrder(df, colA, r.getLong(0), r.getLong(1),
        colB, r.getLong(2), r.getLong(3), outPath, files)
    }
  }
}

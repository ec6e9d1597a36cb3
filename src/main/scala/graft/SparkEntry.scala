package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory; every
  * key here is one §2 row, and every oracleSql entry is the DuckDB twin
  * the driver hash-compares against at sf0.01. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full-fidelity global crunch: range joins + regex builds + 5-dim
    * CUBE "all" expansion + 18 measures (crunch_global.sql:1-75). */
  def entry(spark: SparkSession): DataFrame =
    Crunch.globalFull(spark, "/root/testdata/sf0.001")

  type Q = (SparkSession, String) => DataFrame

  /** Queries that DRIVE a full on-disk or multi-operator lifecycle per
    * execution — store append/compact/poll chains, iterative cluster
    * loops, the composed curation funnel. They are lifecycle drives,
    * not plans: re-running them per bench repetition multiplies real
    * I/O work and the host-drift exposure window without re-measuring
    * anything, so Bench runs them once (visibly flagged in the rep
    * log; artifact schema unchanged). */
  val lifecycleQueries: Set[String] = Set(
    "point_store_roundtrip", "point_store_changes", "point_store_follower",
    "dedup_clusters", "pipeline_curate", "dedup_incremental",
    "dedup_embedding_delta", "pipeline_curate_delta", "jsonl_roundtrip",
    "point_store_sketch", "source_reputation_incremental",
    "curate_takedown", "profile_incremental", "profile_drift",
    "drift_gate", "drift_follower", "assemble_from_recipe",
    "perplexity_incremental", "perplexity_trigram_incremental",
    "funnel_maintained", "retention_maintained", "paths_maintained",
    "latency_maintained", "latency_segmented_maintained",
    "funnel_deepest_maintained",
    "funnel_deepest_segmented_maintained",
    "retention_rolling_maintained", "paths_sessionized_maintained",
    "funnel_sessions_maintained", "funnel_segmented_maintained",
    "funnel_segmented2_maintained", "retention_segmented2_maintained",
    "paths_segmented2_maintained", "latency_segmented2_maintained",
    "retention_segmented_maintained", "paths_segmented_maintained",
    "report_takedown")

  def queries: Map[String, Q] = Map(
    // reference surface (SURVEY §2 #1-14)
    "crunch_global"      -> (Crunch.global _),
    "crunch_global_full" -> (Crunch.globalFull _),
    "crunch_player"    -> (Crunch.player _),
    "dim_rollup_all"   -> (Dimensions.rollupAll _),
    "range_join_tiers" -> (Dimensions.rangeJoinTiers _),
    "filter_semijoin"  -> (Dimensions.filterSemijoin _),
    "build_regex"      -> (Dimensions.buildRegex _),
    "build_regex_full" -> (Dimensions.buildRegexFull _),
    "crunch_global_gated" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Crunch.globalGated(s, d)),
    "item_pivot"       -> (Dimensions.itemPivot _),
    "upsert_merge"     -> (Merge.upsertMerge _),
    "hero_vs_hero"      -> (Joins.heroVsHero _),
    "hero_vs_hero_full" -> (Joins.heroVsHeroFull _),
    "crunch_phases"    -> (Crunch.phases _),
    "crunch_bans"      -> (Crunch.bans _),
    "team_fame"        -> (TeamFame.teamFame _),
    "team_fame_update" -> (TeamFame.teamFameUpdate _),
    "scalar_exprs"     -> (Scalars.scalarExprs _),
    "batch_driver"     -> (Merge.batchDriver _),
    // windowing surface (#15-18)
    "events_window"      -> (Windows.eventsWindow _),
    "events_sessionize"  -> (Windows.eventsSessionize _),
    "window_topn"        -> (Windows.windowTopN _),
    // ordered conversion funnel (the windowFunnel shape)
    "events_funnel"      -> (Windows.eventsFunnel _),
    "events_funnel_windowed" -> (Windows.eventsFunnelWindowed _),
    "events_funnel_deepest" -> (Windows.eventsFunnelDeepest _),
    "events_funnel_sessions" -> (Windows.eventsFunnelSessions _),
    // segmented product analytics: the reports broken down by a user
    // attribute with "all" rollup members (the reference's
    // crunch_global dimension expansion applied to the funnel family)
    "events_funnel_segmented" -> (Windows.eventsFunnelSegmented _),
    "events_funnel_windowed_segmented" -> (Windows.eventsFunnelWindowedSegmented _),
    "events_funnel_sessions_segmented" -> (Windows.eventsFunnelSessionsSegmented _),
    "events_funnel_deepest_segmented" -> (Windows.eventsFunnelDeepestSegmented _),
    // two dimensions expanded at once (2^2 grouping sets, the
    // crunch_global_full discipline on the funnel family) — r20 carries
    // the same composition to retention, paths and hop latency
    "events_funnel_segmented2" -> (Windows.eventsFunnelSegmented2 _),
    "events_retention_segmented2" -> (Windows.eventsRetentionSegmented2 _),
    "events_paths_segmented2" -> (Windows.eventsPathsSegmented2 _),
    "funnel_latency_segmented2" -> (Windows.funnelLatencySegmented2 _),
    "events_funnel_sessions_segmented2" -> (Windows.eventsFunnelSessionsSegmented2 _),
    "events_funnel_deepest_segmented2" -> (Windows.eventsFunnelDeepestSegmented2 _),
    // hop voided by an intervening excluded event
    "events_funnel_excluded" -> (Windows.eventsFunnelExcluded _),
    // ...per anchor on the deepest search (r20 — the r19 refusal decided)
    "events_funnel_deepest_excluded" -> (Windows.eventsFunnelDeepestExcluded _),
    // per-step property predicates (the funnel-builder's per-step WHERE)
    "events_funnel_filtered" -> (Windows.eventsFunnelFiltered _),
    // ...and the per-visit reading (same-visit errors void)
    "events_funnel_sessions_excluded" -> (Windows.eventsFunnelSessionsExcluded _),
    "events_retention_segmented" -> (Windows.eventsRetentionSegmented _),
    "events_paths_segmented" -> (Windows.eventsPathsSegmented _),
    "events_paths"       -> (Windows.eventsPaths _),
    "events_paths_sessionized" -> (Windows.eventsPathsSessionized _),
    "funnel_latency"     -> (Windows.funnelLatency _),
    "funnel_latency_segmented" -> (Windows.funnelLatencySegmented _),
    "events_retention"   -> (Windows.eventsRetention _),
    "events_retention_rolling" -> (Windows.eventsRetentionRolling _),
    // daily cohorts on a non-UTC market's calendar
    "events_retention_tz" -> (Windows.eventsRetentionTz _),
    // ...and the tumbling daily series on the same calendar (r20)
    "events_window_tz" -> (Windows.eventsWindowTz _),
    "asof_join"          -> (Joins.asofJoin _),
    "asof_join_native"   -> (Joins.asofJoinNative _),
    // LLM-data-pipeline surface (#19-30); ann_ivf is the one
    // non-SQL-expressible query left (approximate recall has no DuckDB
    // twin) → no oracle there (rows-only check + AnnSpec)
    "dedup_exact"     -> (Dedup.dedupExact _),
    "dedup_minhash"   -> (Dedup.dedupMinhash _),
    "dedup_ngram"     -> (Dedup.dedupNgram _),
    "dedup_simhash"   -> (Dedup.dedupSimhash _),
    "dedup_embedding" -> (Ann.dedupEmbedding _),
    // #49b: incremental embedding-delta dedup against the persisted IVF index
    "dedup_embedding_delta" -> (Ann.dedupEmbeddingDelta _),
    "ann_topk"        -> (Ann.annTopk _),
    // attribute-filtered exact search (neighbors within the query's label)
    "ann_filtered"    -> (Ann.annFiltered _),
    "ann_ivf"         -> (Ann.annIvf _),
    "ann_pq"          -> (Pq.annPq _),
    "ann_pq_refine"   -> (Pq.annPqRefine _),
    "text_stats"      -> (TextOps.textStats _),
    // one-pass generic column profiling (exact-distinct oracle regime)
    "profile_documents" -> (Profile.profileDocuments _),
    // declarative data-contract gate (PK, required fields, whitelist)
    "quality_gate"    -> (Profile.qualityGate _),
    // cross-table referential-integrity contract (FK spine)
    "fk_gate"         -> (Profile.fkGate _),
    // the profile as a persisted nightly fold (4 measure classes)
    "profile_incremental" -> (Profile.profileIncremental _),
    // night-over-night drift from the store's own version axis
    "profile_drift"   -> (Profile.profileDrift _),
    // the drift thresholded into the gates' go/no-go report
    "drift_gate"      -> (Profile.driftGate _),
    "drift_follower"  -> (Profile.driftFollowerQuery _),
    "token_count"     -> (TextOps.tokenCount _),
    "lang_id"         -> (TextOps.langId _),
    "doc_fingerprint" -> (TextOps.docFingerprint _),
    "doc_perplexity"  -> (TextOps.docPerplexity _),
    "perplexity_incremental" -> (TextOps.perplexityIncremental _),
    "doc_perplexity_trigram" -> (TextOps.docPerplexityTrigram _),
    "funnel_maintained" -> (graft.streaming.Maintained.funnelMaintained _),
    "retention_maintained" -> (graft.streaming.Maintained.retentionMaintained _),
    "paths_maintained" -> (graft.streaming.Maintained.pathsMaintained _),
    "latency_maintained" -> (graft.streaming.Maintained.latencyMaintained _),
    "latency_segmented_maintained" -> (graft.streaming.Maintained.latencySegmentedMaintained _),
    "funnel_deepest_maintained" -> (graft.streaming.Maintained.funnelDeepestMaintained _),
    "funnel_deepest_segmented_maintained" -> (graft.streaming.Maintained.funnelDeepestSegmentedMaintained _),
    "retention_rolling_maintained" -> (graft.streaming.Maintained.retentionRollingMaintained _),
    "paths_sessionized_maintained" -> (graft.streaming.Maintained.pathsSessionizedMaintained _),
    "funnel_sessions_maintained" -> (graft.streaming.Maintained.funnelSessionsMaintained _),
    "funnel_segmented_maintained" -> (graft.streaming.Maintained.funnelSegmentedMaintained _),
    "funnel_segmented2_maintained" -> (graft.streaming.Maintained.funnelSegmented2Maintained _),
    "retention_segmented2_maintained" -> (graft.streaming.Maintained.retentionSegmented2Maintained _),
    "paths_segmented2_maintained" -> (graft.streaming.Maintained.pathsSegmented2Maintained _),
    "latency_segmented2_maintained" -> (graft.streaming.Maintained.latencySegmented2Maintained _),
    "retention_segmented_maintained" -> (graft.streaming.Maintained.retentionSegmentedMaintained _),
    "paths_segmented_maintained" -> (graft.streaming.Maintained.pathsSegmentedMaintained _),
    "report_takedown" -> (graft.streaming.Maintained.reportTakedown _),
    "perplexity_trigram_incremental" -> (TextOps.perplexityTrigramIncremental _),
    "freq_tokens"     -> (TextOps.freqTokens _),
    "trending_by_lang" -> (TextOps.trendingByLang _),
    // heavy hitters as a persisted PointStore `topks` measure (#43c)
    "trending_incremental" -> (TextOps.trendingIncremental _),
    // mergeable distinct-count sketches (exact sparse regime at bench SFs)
    "distinct_by_lang"     -> (TextOps.distinctByLang _),
    "distinct_incremental" -> (TextOps.distinctIncremental _),
    // mergeable quantile sketches (exact regime at bench SFs)
    "quantiles_by_lang"      -> (TextOps.quantilesByLang _),
    "quantiles_incremental"  -> (TextOps.quantilesIncremental _),
    "chunk_documents" -> (TextOps.chunkDocuments _),
    "dedup_clusters"  -> (Dedup.dedupClusters _),
    // #49: incremental corpus-delta dedup against a persisted LSH index
    "dedup_incremental" -> (DedupIndex.dedupIncremental _),
    "decontaminate"   -> (Curation.decontaminate _),
    "decontaminate_bloom" -> (Curation.decontaminateBloom _),
    "decontaminate_fuzzy" -> (Curation.decontaminateFuzzy _),
    "doc_repetition"  -> (Curation.docRepetition _),
    "source_reputation" -> (Curation.sourceReputation _),
    // #54b: the reputation table as a nightly LSM fold (SUM/MIN/MAX)
    "source_reputation_incremental" -> (Curation.sourceReputationIncremental _),
    "boilerplate_screen" -> (Curation.boilerplateScreen _),
    "boilerplate_strip" -> (Curation.boilerplateStrip _),
    "pii_scrub"       -> (Curation.piiScrub _),
    "multimodal_meta"   -> (Multimodal.multimodalMeta _),
    "multimodal_frames" -> (Multimodal.multimodalFrames _),
    "multimodal_dedup"  -> (Multimodal.multimodalDedup _),
    "sample_stratified" -> (Sampling.sampleStratified _),
    "pack_sequences"    -> (Sampling.packSequences _),
    "pack_sequences_sharded" -> (Sampling.packSequencesSharded _),
    // training-mix assembly (#30g-i): epochs, budget fill, global shuffle
    "corpus_mix"          -> (Mix.corpusMix _),
    "token_budget_select" -> (Mix.tokenBudgetSelect _),
    "shuffle_deterministic" -> (Mix.shuffleDeterministic _),
    "assemble_epochs"     -> (Mix.assembleEpochs _),
    // the assembly replayed from a persisted, versioned recipe store
    "assemble_from_recipe" -> (Mix.assembleFromRecipe _),
    // batch lineage: per-(lang, bin) source distribution of the layout
    "batch_provenance"    -> (Mix.batchProvenance _),
    // scale patterns + composition (#36-37, #39)
    "skew_salted_agg" -> (Skew.skewSaltedAgg _),
    "pipeline_clean"  -> (Pipeline.pipelineClean _),
    "pipeline_curate" -> (Pipeline.pipelineCurate _),
    // #50: the nightly funnel folded incrementally against persisted state
    "pipeline_curate_delta" -> (CurateStore.pipelineCurateDelta _),
    "curate_takedown" -> (CurateStore.curateTakedown _),
    "cluster_zorder"  -> (Layout.clusterZorderQuery _),
    // sinks (#38): LSM point-table store — append/compact/merge-on-read
    "point_store_roundtrip" -> (graft.sources.PointStore.roundtrip _),
    // #38b: the changefeed read path — O(changes) since a checkpoint
    "point_store_changes"   -> (graft.sources.PointStore.changefeed _),
    // #38c: the changefeed CONSUMER — a chained derived store
    "point_store_follower"  -> (graft.sources.ChangefeedFollower.follower _),
    // #51: JSONL crawl ingest — schema'd read, corrupt-line quarantine
    "jsonl_roundtrip"       -> (graft.sources.JsonlCorpus.roundtrip _),
    // #51b: the CSV twin — same explicit-schema + quarantine discipline
    "csv_roundtrip"         -> (graft.sources.CsvCorpus.roundtrip _),
    // #52c: sketch-measured point table (distinct counts through the LSM)
    "point_store_sketch"    -> (graft.sources.PointStore.sketchStore _),
  )

  def oracleSql: Map[String, String] = Map(
    "crunch_global"      -> Crunch.globalOracle,
    "crunch_global_full" -> Crunch.globalFullOracle,
    "crunch_player"    -> Crunch.playerOracle,
    "dim_rollup_all"   -> Dimensions.rollupAllOracle,
    "range_join_tiers" -> Dimensions.rangeJoinTiersOracle,
    "filter_semijoin"  -> Dimensions.filterSemijoinOracle,
    "build_regex"      -> Dimensions.buildRegexOracle,
    "build_regex_full" -> Dimensions.buildRegexFullOracle,
    "crunch_global_gated" -> Crunch.globalGatedOracle,
    "item_pivot"       -> Dimensions.itemPivotOracle,
    "upsert_merge"     -> Merge.upsertMergeOracle,
    "hero_vs_hero"      -> Joins.heroVsHeroOracle,
    "hero_vs_hero_full" -> Joins.heroVsHeroFullOracle,
    "crunch_phases"    -> Crunch.phasesOracle,
    "crunch_bans"      -> Crunch.bansOracle,
    "team_fame"        -> TeamFame.teamFameOracle,
    "team_fame_update" -> TeamFame.teamFameUpdateOracle,
    "scalar_exprs"     -> Scalars.scalarExprsOracle,
    "batch_driver"     -> Merge.batchDriverOracle,
    "events_window"      -> Windows.eventsWindowOracle,
    "events_sessionize"  -> Windows.eventsSessionizeOracle,
    "window_topn"        -> Windows.windowTopNOracle,
    "events_funnel"      -> Windows.eventsFunnelOracle,
    "events_funnel_windowed" -> Windows.eventsFunnelWindowedOracle,
    "events_funnel_deepest" -> Windows.eventsFunnelDeepestOracle,
    "events_funnel_sessions" -> Windows.eventsFunnelSessionsOracle,
    "events_funnel_segmented" -> Windows.eventsFunnelSegmentedOracle,
    "events_funnel_windowed_segmented" -> Windows.eventsFunnelWindowedSegmentedOracle,
    "events_funnel_sessions_segmented" -> Windows.eventsFunnelSessionsSegmentedOracle,
    "events_funnel_deepest_segmented" -> Windows.eventsFunnelDeepestSegmentedOracle,
    "events_funnel_segmented2" -> Windows.eventsFunnelSegmented2Oracle,
    "events_retention_segmented2" -> Windows.eventsRetentionSegmented2Oracle,
    "events_paths_segmented2" -> Windows.eventsPathsSegmented2Oracle,
    "funnel_latency_segmented2" -> Windows.funnelLatencySegmented2Oracle,
    "events_funnel_sessions_segmented2" -> Windows.eventsFunnelSessionsSegmented2Oracle,
    "events_funnel_deepest_segmented2" -> Windows.eventsFunnelDeepestSegmented2Oracle,
    "events_funnel_deepest_excluded" -> Windows.eventsFunnelDeepestExcludedOracle,
    "events_funnel_filtered" -> Windows.eventsFunnelFilteredOracle,
    "events_window_tz" -> Windows.eventsWindowTzOracle,
    "events_funnel_excluded" -> Windows.eventsFunnelExcludedOracle,
    "events_funnel_sessions_excluded" -> Windows.eventsFunnelSessionsExcludedOracle,
    "events_retention_segmented" -> Windows.eventsRetentionSegmentedOracle,
    "events_paths_segmented" -> Windows.eventsPathsSegmentedOracle,
    "events_paths"       -> Windows.eventsPathsOracle,
    "events_paths_sessionized" -> Windows.eventsPathsSessionizedOracle,
    "funnel_latency"     -> Windows.funnelLatencyOracle,
    "funnel_latency_segmented" -> Windows.funnelLatencySegmentedOracle,
    "events_retention"   -> Windows.eventsRetentionOracle,
    "events_retention_rolling" -> Windows.eventsRetentionRollingOracle,
    "events_retention_tz" -> Windows.eventsRetentionTzOracle,
    "asof_join"          -> Joins.asofJoinOracle,
    "asof_join_native"   -> Joins.asofJoinNativeOracle,
    "dedup_exact"     -> Dedup.dedupExactOracle,
    "dedup_minhash"   -> Dedup.dedupMinhashOracle,
    "dedup_ngram"     -> Dedup.dedupNgramOracle,
    "dedup_simhash"   -> Dedup.dedupSimhashOracle,
    "dedup_embedding" -> Ann.dedupEmbeddingOracle,
    // incremental build/append/probe must land on the one-shot pairs
    "dedup_embedding_delta" -> Ann.dedupEmbeddingOracle,
    "ann_topk"        -> Ann.annTopkOracle,
    "ann_filtered"    -> Ann.annFilteredOracle,
    // PQ candidates + exact re-rank restore the brute-force answer
    // (KRefine carries a measured 2.3-3× margin over the deepest true
    // top-10 position in the ADC ranking — the exact-regime pattern)
    "ann_pq_refine"   -> Pq.annPqRefineOracle,
    "text_stats"      -> TextOps.textStatsOracle,
    "profile_documents" -> Profile.profileDocumentsOracle,
    "quality_gate"    -> Profile.qualityGateOracle,
    "fk_gate"         -> Profile.fkGateOracle,
    "profile_incremental" -> Profile.profileIncrementalOracle,
    "profile_drift"   -> Profile.profileDriftOracle,
    "drift_gate"      -> Profile.driftGateOracle,
    "drift_follower"  -> Profile.profileDriftOracle,
    "token_count"     -> TextOps.tokenCountOracle,
    "lang_id"         -> TextOps.langIdOracle,
    "doc_fingerprint" -> TextOps.docFingerprintOracle,
    "doc_perplexity"  -> TextOps.docPerplexityOracle,
    "perplexity_incremental" -> TextOps.perplexityIncrementalOracle,
    "doc_perplexity_trigram" -> TextOps.docPerplexityTrigramOracle,
    "funnel_maintained" -> Windows.eventsFunnelOracle,
    "retention_maintained" -> Windows.eventsRetentionOracle,
    "paths_maintained" -> Windows.eventsPathsOracle,
    "latency_maintained" -> Windows.funnelLatencyOracle,
    "latency_segmented_maintained" -> Windows.funnelLatencySegmentedOracle,
    "funnel_deepest_maintained" -> Windows.eventsFunnelDeepestOracle,
    "funnel_deepest_segmented_maintained" -> Windows.eventsFunnelDeepestSegmentedOracle,
    "retention_rolling_maintained" -> Windows.eventsRetentionRollingOracle,
    "paths_sessionized_maintained" -> Windows.eventsPathsSessionizedOracle,
    "funnel_sessions_maintained" -> Windows.eventsFunnelSessionsOracle,
    "funnel_segmented_maintained" -> Windows.eventsFunnelSegmentedOracle,
    "funnel_segmented2_maintained" -> Windows.eventsFunnelSegmented2Oracle,
    "retention_segmented2_maintained" -> Windows.eventsRetentionSegmented2Oracle,
    "paths_segmented2_maintained" -> Windows.eventsPathsSegmented2Oracle,
    "latency_segmented2_maintained" -> Windows.funnelLatencySegmented2Oracle,
    "retention_segmented_maintained" -> Windows.eventsRetentionSegmentedOracle,
    "paths_segmented_maintained" -> Windows.eventsPathsSegmentedOracle,
    "report_takedown" -> graft.streaming.Maintained.reportTakedownOracle,
    "perplexity_trigram_incremental" -> TextOps.perplexityTrigramIncrementalOracle,
    "freq_tokens"     -> TextOps.freqTokensOracle,
    "trending_by_lang" -> TextOps.trendingByLangOracle,
    "trending_incremental" -> TextOps.trendingIncrementalOracle,
    "distinct_by_lang"     -> TextOps.distinctByLangOracle,
    // the per-night fold must land on the same one-shot distinct counts
    "distinct_incremental" -> TextOps.distinctIncrementalOracle,
    "quantiles_by_lang"      -> TextOps.quantilesByLangOracle,
    // the per-night fold must land on the same one-shot quantiles
    "quantiles_incremental"  -> TextOps.quantilesIncrementalOracle,
    "chunk_documents" -> TextOps.chunkDocumentsOracle,
    "dedup_clusters"  -> Dedup.dedupClustersOracle,
    // incremental build/append/probe must land on the one-shot pairs
    "dedup_incremental" -> DedupIndex.dedupIncrementalOracle,
    "decontaminate"   -> Curation.decontaminateOracle,
    // the bloom-pruned screen must land on the identical verdicts
    "decontaminate_bloom" -> Curation.decontaminateOracle,
    "decontaminate_fuzzy" -> Curation.decontaminateFuzzyOracle,
    "doc_repetition"  -> Curation.docRepetitionOracle,
    "source_reputation" -> Curation.sourceReputationOracle,
    // the nightly fold must land on the one-shot reputation table
    "source_reputation_incremental" -> Curation.sourceReputationOracle,
    "boilerplate_screen" -> Curation.boilerplateScreenOracle,
    "boilerplate_strip" -> Curation.boilerplateStripOracle,
    "pii_scrub"       -> Curation.piiScrubOracle,
    "multimodal_meta"   -> Multimodal.multimodalMetaOracle,
    "multimodal_frames" -> Multimodal.multimodalFramesOracle,
    "multimodal_dedup"  -> Multimodal.multimodalDedupOracle,
    "sample_stratified" -> Sampling.sampleStratifiedOracle,
    "pack_sequences"    -> Sampling.packSequencesOracle,
    // the sharded scale path must land on the identical layout
    "pack_sequences_sharded" -> Sampling.packSequencesOracle,
    "corpus_mix"          -> Mix.corpusMixOracle,
    "token_budget_select" -> Mix.tokenBudgetSelectOracle,
    "shuffle_deterministic" -> Mix.shuffleDeterministicOracle,
    "assemble_epochs"     -> Mix.assembleEpochsOracle,
    "assemble_from_recipe" -> Mix.assembleFromRecipeOracle,
    "batch_provenance"    -> Mix.batchProvenanceOracle,
    "skew_salted_agg" -> Skew.skewSaltedAggOracle,
    "pipeline_clean"  -> Pipeline.pipelineCleanOracle,
    "pipeline_curate" -> Pipeline.pipelineCurateOracle,
    // build + night-fold + merge-on-read must land on the one-shot funnel
    "pipeline_curate_delta" -> CurateStore.pipelineCurateDeltaOracle,
    "curate_takedown" -> CurateStore.curateTakedownOracle,
    "cluster_zorder"  -> Layout.clusterZorderOracle,
    "point_store_roundtrip" -> graft.sources.PointStore.roundtripOracle,
    "point_store_changes"   -> graft.sources.PointStore.changefeedOracle,
    "point_store_follower"  -> graft.sources.ChangefeedFollower.followerOracle,
    // write → parse → quarantine-route must byte-preserve every field
    "jsonl_roundtrip"       -> graft.sources.JsonlCorpus.roundtripOracle,
    "csv_roundtrip"         -> graft.sources.CsvCorpus.roundtripOracle,
    // the LSM lifecycle must land on the one-shot distinct counts
    "point_store_sketch"    -> graft.sources.PointStore.sketchStoreOracle,
  )
}

package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LLM-training-data cleaning pipeline as ONE composed query:
  * quality-score every document (TextOps), drop low-quality ones, keep
  * one representative per exact-duplicate group (Dedup's content key),
  * and emit the cleaned corpus with its stats. Demonstrates that the
  * pipeline operators compose into a single declarative plan — one scan,
  * one projection, one shuffle (the dedup group-by) — rather than N
  * materialized passes. */
object Pipeline {

  val QualityThreshold = 0.5

  def pipelineClean(s: SparkSession, d: String): DataFrame = {
    // stats + text/lang from ONE corpus scan (the old frame re-joined
    // documents onto textStats — a corpus-grain self-join the planner
    // then broadcast at bench SF)
    val scored = TextOps
      .textStatsOf(documents(s, d), col("text"), col("lang"))
      .filter(col("quality_score") >= QualityThreshold)
    // keeper = lowest doc_id per content hash, resolved in one group-by
    val keepers = scored
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    // keepers is one row per distinct content — corpus-scale: shuffle
    keepers.hint("shuffle_hash").join(scored, "doc_id")
      .select(col("doc_id"), col("content_hash"), col("lang"),
        col("n_tokens"), col("quality_score"))
  }

  /** The FULL curation funnel as one declarative DAG: quality scoring,
    * Gopher repetition rules, cross-document boilerplate screening,
    * benchmark decontamination, exact-dup keeper selection, and
    * near-dup CLUSTER keeper election composed over the documents
    * table — every screen the engine ships, in the one nightly run a
    * user actually schedules (the reference's worker loop runs ALL its
    * scripts in one consume→crunch pass). Each verdict stage is a
    * single corpus pass keyed by doc_id and its join shuffles on doc_id
    * (every side is doc-grain); the benchmark slice is excluded from
    * training output by construction; one content-hash shuffle resolves
    * exact keepers; and the near-dup stage (MinHash LSH → exact verify
    * → connected components) runs over the exact-dedup SURVIVORS only —
    * the funnel order that avoids clustering rows the earlier screens
    * already dropped. Output: one row per kept doc with its duplicate
    * cluster, the final keep verdict, and the boilerplate-STRIPPED
    * `cleaned` text (the screen's remediation half, r9 verdict item:
    * survivors below the drop threshold still shed their residual
    * corpus-common windows before training — string-exact against the
    * oracle like the standalone boilerplate_strip). */
  def pipelineCurate(s: SparkSession, d: String): DataFrame =
    pipelineCurateOf(documents(s, d))

  /** The funnel over an arbitrary (doc_id, text, lang) frame — also the
    * in-suite equivalence target for [[CurateStore]]'s incremental
    * night: curate-the-delta must land on exactly this result computed
    * one-shot over corpus ∪ delta. */
  private[graft] def pipelineCurateOf(docs: DataFrame): DataFrame = {
    val scored = TextOps.textStatsOf(docs, col("text"), col("lang"))
      .filter(col("doc_id") % Curation.BenchMod =!= 0)
    val rep = Curation.docRepetitionOf(docs).select(col("doc_id"), col("repetitive"))
    // boilerplate sizing: a parquet-footer metadata action
    val minDocs = Curation.boilerplateMinDocs(docs.count())
    // every persisted frame below is SCRATCH here, not the output —
    // the scope tracks them all, releasing on success and on ANY exit
    // (including eager AnalysisExceptions while the later plans are
    // still being constructed)
    Dedup.stagedScope { scratch =>
      // ONE corpus shingle pass feeds BOTH cross-document screens —
      // boilerplate df + decontamination — instead of each operator
      // paying its own full text scan (at 100 TB every extra pass is a
      // corpus read; the oracle has always modeled this shared shape:
      // its single sh CTE feeds common, bench, and hits alike)
      val sh = scratch.pin(Dedup.hashedShingles(docs, Curation.DecontamN))
      val con = Curation
        .decontamVerdicts(docs.filter(col("doc_id") % Curation.BenchMod =!= 0), sh)
        .select(col("doc_id"), col("contaminated"))
      val bp = Curation.boilerplateVerdicts(docs, sh, minDocs)
        .select(col("doc_id"), col("boilerplate"))
      val kept = scored
        .join(rep.hint("shuffle_hash"), "doc_id")
        .join(con.hint("shuffle_hash"), "doc_id")
        .join(bp.hint("shuffle_hash"), "doc_id")
        .filter(col("quality_score") >= QualityThreshold &&
          !col("repetitive") && !col("contaminated") && !col("boilerplate"))
      // exact keeper election as ONE window pass (row_number over the
      // content hash, doc_id order) — the groupBy-then-self-join form
      // executes the whole five-way funnel TWICE (once under the agg, once
      // as the join side; the subtrees differ, so exchange reuse can't
      // merge them) where this runs it once with one shuffle
      val rn = row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("content_hash")).orderBy(col("doc_id")))
      // the exact-keeper frame feeds the near-dup stage several times
      // (shingles, signatures, node universe) — without the pin, the
      // funnel would re-execute per consumer
      val kdocs = scratch.pin(kept
        .withColumn("content_hash", md5(col("text")))
        .withColumn("rn", rn)
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("content_hash"), col("lang"),
          col("n_tokens"), col("quality_score"), col("text")))
      // direct (ungated) path: kdocs is already one keeper per content
      // hash, so the gate's full-text measurement pass could only ever
      // observe maxGroup = 1. The stage's two kernel passes re-read
      // kdocs' CACHED text deliberately: deriving signatures + verify
      // postings from the pinned `sh` frame instead was A/B-measured
      // and REJECTED (r10, PERF.md) — the posting route costs a
      // corpus-grain semi-join shuffle plus a posting-grain signature
      // groupBy (the typed kernel erased sh's doc_id partitioning, so
      // both re-shuffle every posting) where the kernel passes shuffle
      // nothing, and it measured ~25% slower warm at sf0.1
      // the strip rides the SAME pinned posting pass: its common set is
      // the screen's document-frequency threshold over `sh`, so folding
      // the remediation in costs one windows pass over the KEPT docs'
      // cached text, never a corpus re-scan or a second df aggregation
      val stripped = scratch.pin(Curation.stripWith(
          kdocs.select(col("doc_id"), col("text")),
          Curation.commonShingles(sh, minDocs))
        .select(col("doc_id"), col("cleaned")))
      // clusters (an eager iterative CC drive whose between-round gaps
      // leave the cluster idle) and the strip (one windows pass) are
      // independent consumers of the two pinned frames — submit them
      // CONCURRENTLY, the night-fold's awaitAll treatment applied to
      // the one-shot funnel. kdocs materializes FIRST so the two
      // threads read one cache instead of racing to compute the whole
      // upstream funnel per consumer; scratch bookkeeping stays on
      // this thread (Scratch is not thread-safe by design)
      kdocs.count()
      var clustersV: DataFrame = null
      CurateStore.awaitAll(
        () => { clustersV = Dedup.dedupClustersDirect(
          kdocs.select(col("doc_id"), col("text")), 3, 0.5) },
        () => stripped.count()) // materialize: the last consumer of `sh`
      val clusters = scratch.track(clustersV)
      // footprint handoff: clusters' staging materialized kdocs (and
      // through it both screens) and the strip is pinned above, so the
      // corpus-scale posting cache can drop before the final doc-grain
      // assembly
      scratch.release(sh)
      kdocs
        .join(clusters.hint("shuffle_hash"), "doc_id")
        .join(stripped.hint("shuffle_hash"), "doc_id")
        .select(col("doc_id"), col("content_hash"), col("lang"),
          col("n_tokens"), col("quality_score"),
          col("cluster_id"), col("is_keeper").as("near_dup_keeper"),
          col("cleaned"))
    }
  }

  def pipelineCurateOracle: String = s"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, text, lang,
        string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w,
        ${Dedup.shingleSplitSql} AS wsh,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9${Dedup.WsChars}]', '', 'g')) AS BIGINT) AS n_punct
      FROM documents),
    q AS (
      SELECT doc_id, text, lang,
        CAST(len(w) AS BIGINT) AS n_tokens,
        least(CAST(len(w) AS DOUBLE) / 64.0, 1.0) * 0.5
          + (CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) / len(w)) * 0.3
          + (1.0 - CAST(n_punct AS DOUBLE) / n_chars) * 0.2 AS quality_score
      FROM toks),
    sh AS (
      SELECT doc_id, unnest(list_distinct(
        list_transform(range(1, greatest(len(wsh) - 1, 1)),
          i -> wsh[i] || ' ' || wsh[i+1] || ' ' || wsh[i+2]))) AS shingle
      FROM toks),
    common AS (
      SELECT shingle FROM sh GROUP BY 1
      HAVING count(*) >= greatest(${Curation.BoilerplateMinDocsFloor},
        (SELECT (count(*) + ${Curation.BoilerplateDocDivisor - 1})
                  // ${Curation.BoilerplateDocDivisor}
         FROM documents))),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
    hitbp AS (
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_bp
      FROM sh s JOIN common USING (shingle) GROUP BY 1),
    bp AS (
      SELECT d.doc_id,
        CASE WHEN COALESCE(t.n_sh, 0) = 0 THEN FALSE
             ELSE CAST(COALESCE(h.n_bp, 0) AS DOUBLE) / t.n_sh
                    > ${Curation.BoilerplateMaxFrac}
        END AS boilerplate
      FROM documents d
      LEFT JOIN tot t USING (doc_id)
      LEFT JOIN hitbp h USING (doc_id)),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % ${Curation.BenchMod} = 0),
    hits AS (
      SELECT s.doc_id FROM sh s JOIN bench USING (shingle)
      WHERE s.doc_id % ${Curation.BenchMod} <> 0 GROUP BY 1),
    u AS (SELECT doc_id, unnest(w) AS tok FROM toks),
    uc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
    uni AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(max(c) AS BIGINT) AS top_c
      FROM uc GROUP BY 1),
    bg0 AS (
      SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        ELSE [] END) AS bg
      FROM toks),
    bc AS (SELECT doc_id, bg, count(*) AS c FROM bg0 GROUP BY 1, 2),
    bi AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(count(*) AS BIGINT) AS nd_bg
      FROM bc GROUP BY 1),
    rep AS (
      SELECT uni.doc_id,
        (CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN CAST(0 AS DOUBLE)
              ELSE CAST(1 AS DOUBLE) - CAST(nd_bg AS DOUBLE) / n_bigrams
         END > ${Curation.DupBigramMax}
         OR CAST(top_c AS DOUBLE) / uni.n_tokens > ${Curation.TopTokenMax})
          AS repetitive
      FROM uni LEFT JOIN bi ON uni.doc_id = bi.doc_id),
    kept AS (
      SELECT q.doc_id, q.text, q.lang, q.n_tokens, q.quality_score
      FROM q JOIN rep ON q.doc_id = rep.doc_id
      JOIN bp ON q.doc_id = bp.doc_id
      LEFT JOIN hits h ON q.doc_id = h.doc_id
      WHERE q.doc_id % ${Curation.BenchMod} <> 0
        AND q.quality_score >= $QualityThreshold
        AND NOT repetitive AND NOT boilerplate AND h.doc_id IS NULL),
    keepers AS (
      SELECT md5(text) AS content_hash, min(doc_id) AS doc_id
      FROM kept GROUP BY 1),
    kdocs AS (
      SELECT k.doc_id, k.content_hash, s.lang, s.n_tokens, s.quality_score
      FROM keepers k JOIN kept s ON k.doc_id = s.doc_id),
    ksh AS (SELECT sh.doc_id, shingle FROM sh JOIN kdocs USING (doc_id)),
    ksz AS (SELECT doc_id, count(*) AS sz FROM ksh GROUP BY 1),
    kinter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      FROM ksh x JOIN ksh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT a, b FROM kinter
      JOIN ksz sa ON a = sa.doc_id
      JOIN ksz sb ON b = sb.doc_id
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5),
    edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
    reach(node, r) AS (
      SELECT u, v FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node),
    comp AS (
      SELECT node AS doc_id, LEAST(node, min(r)) AS cluster_id
      FROM reach GROUP BY node),
    winK AS (
      SELECT t.doc_id, i, wsh[i] || ' ' || wsh[i+1] || ' ' || wsh[i+2] AS shingle
      FROM toks t JOIN kdocs USING (doc_id),
      UNNEST(range(1, greatest(len(wsh) - 1, 1))) AS tt(i)),
    covK AS (
      SELECT doc_id, list(DISTINCT p) AS cov
      FROM (SELECT w.doc_id, u.p
            FROM winK w JOIN common USING (shingle),
            UNNEST([w.i, w.i + 1, w.i + 2]) AS u(p)) hits
      GROUP BY 1)
    SELECT d.doc_id, d.content_hash, d.lang, d.n_tokens, d.quality_score,
           COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           d.doc_id = COALESCE(c.cluster_id, d.doc_id) AS near_dup_keeper,
           COALESCE(array_to_string(list_transform(
             list_filter(range(1, len(t.wsh) + 1),
               i -> NOT list_contains(COALESCE(cov, []), i)),
             i -> t.wsh[i]), ' '), '') AS cleaned
    FROM kdocs d LEFT JOIN comp c USING (doc_id)
    JOIN toks t USING (doc_id)
    LEFT JOIN covK USING (doc_id)"""

  def pipelineCleanOracle: String = s"""
    WITH t AS (
      SELECT doc_id, text, lang,
        string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9${Dedup.WsChars}]', '', 'g')) AS BIGINT) AS n_punct
      FROM documents),
    c AS (
      SELECT doc_id, text, lang,
        CAST(len(w) AS BIGINT) AS n_tokens,
        least(CAST(len(w) AS DOUBLE) / 64.0, 1.0) * 0.5
          + (CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) / len(w)) * 0.3
          + (1.0 - CAST(n_punct AS DOUBLE) / n_chars) * 0.2 AS quality_score
      FROM t),
    scored AS (SELECT * FROM c WHERE quality_score >= $QualityThreshold),
    keepers AS (
      SELECT md5(text) AS content_hash, min(doc_id) AS doc_id
      FROM scored GROUP BY 1)
    SELECT s.doc_id, k.content_hash, s.lang, s.n_tokens, s.quality_score
    FROM keepers k JOIN scored s ON k.doc_id = s.doc_id"""
}

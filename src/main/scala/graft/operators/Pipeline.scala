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
    * Gopher repetition rules, benchmark decontamination, and exact-dup
    * keeper selection composed over the documents table — what a user
    * runs nightly over the whole corpus. Each stage is a single corpus
    * pass keyed by doc_id; the verdict joins shuffle on doc_id (every
    * side is doc-grain), the benchmark slice is excluded from training
    * output by construction, and the one content-hash shuffle resolves
    * keepers. */
  def pipelineCurate(s: SparkSession, d: String): DataFrame = {
    val scored = TextOps.textStatsOf(documents(s, d), col("text"), col("lang"))
      .filter(col("doc_id") % Curation.BenchMod =!= 0)
    val rep = Curation.docRepetition(s, d).select(col("doc_id"), col("repetitive"))
    val con = Curation.decontaminate(s, d).select(col("doc_id"), col("contaminated"))
    val kept = scored
      .join(rep.hint("shuffle_hash"), "doc_id")
      .join(con.hint("shuffle_hash"), "doc_id")
      .filter(col("quality_score") >= QualityThreshold &&
        !col("repetitive") && !col("contaminated"))
    val keepers = kept.groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    keepers.hint("shuffle_hash").join(kept, "doc_id")
      .select(col("doc_id"), col("content_hash"), col("lang"),
        col("n_tokens"), col("quality_score"))
  }

  def pipelineCurateOracle: String = s"""
    WITH toks AS (
      SELECT doc_id, text, lang,
        string_split_regex(lower(trim(text)), '\\s+') AS w,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct
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
        list_transform(range(1, greatest(len(w) - 1, 1)),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
      FROM toks),
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
      LEFT JOIN hits h ON q.doc_id = h.doc_id
      WHERE q.doc_id % ${Curation.BenchMod} <> 0
        AND q.quality_score >= $QualityThreshold
        AND NOT repetitive AND h.doc_id IS NULL),
    keepers AS (
      SELECT md5(text) AS content_hash, min(doc_id) AS doc_id
      FROM kept GROUP BY 1)
    SELECT k.doc_id, k.content_hash, s.lang, s.n_tokens, s.quality_score
    FROM keepers k JOIN kept s ON k.doc_id = s.doc_id"""

  def pipelineCleanOracle: String = s"""
    WITH t AS (
      SELECT doc_id, text, lang,
        string_split_regex(lower(trim(text)), '\\s+') AS w,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct
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

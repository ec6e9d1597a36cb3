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

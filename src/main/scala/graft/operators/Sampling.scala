package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data corpus assembly: deterministic stratified sampling and
  * sequence packing — the two operations between "cleaned corpus" and
  * "training batches" in an LLM data pipeline.
  *
  * Both are pure narrow/one-shuffle plans. Sampling is a projection-level
  * filter (no shuffle, no rand()): the keep decision is a multiplicative
  * hash of the document id, so the sample is reproducible run-to-run,
  * stable under repartitioning, and pushes down to the scan. Packing is
  * one window (shuffle+sort per stratum).
  */
object Sampling {

  /** Per-language sampling rates as (lang, threshold) where threshold =
    * floor(rate · 2³²) — an integral compare, no float drift between
    * engines. Languages outside the list fall back to DefaultRate (the
    * long-tail languages of a crawl corpus). */
  val Rates: Seq[(String, Double)] =
    Seq("en" -> 0.5, "de" -> 0.35, "fr" -> 0.25, "es" -> 0.2)
  val DefaultRate = 0.1

  private val M32 = 4294967296L // 2^32
  private def thr(rate: Double): Long = (rate * M32).toLong

  /** Knuth multiplicative hash of the doc id, folded into [0, 2³²).
    * The id is reduced into [0, 2³¹) FIRST — pmod, so NEGATIVE ids hash
    * into the same non-negative range instead of sailing under every
    * threshold — and the product stays within Long (ANSI mode throws on
    * overflow, and silent wraparound would change the sample); ids
    * outside [0, 2³¹) alias, which shifts WHICH rows are sampled but
    * not the statistics. */
  private def hash32(id: org.apache.spark.sql.Column) =
    pmod(id, lit(2147483648L)) * lit(2654435761L) % lit(M32)

  /** `sample_stratified`: keep a per-language fraction of the corpus,
    * deterministically. The rate table is a broadcast dim (left join +
    * coalesce covers the default-rate tail); the keep test is
    * hash32(doc_id) < floor(rate·2³²). At 100 TB this is a scan-speed
    * filter: no shuffle, no state, and downsampling a stratum never
    * changes which of its surviving docs are kept (nested samples —
    * rate 0.2 ⊂ rate 0.5 — because the hash, not the rate, orders docs). */
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    stratifiedOf(documents(s, d), "doc_id", "lang", Rates, DefaultRate)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  /** Frame-based stratified sampler (the fluent-API face): keeps all of
    * `df`'s columns, filtering on hash32(`idCol`) against the stratum's
    * rate. Rates outside [0,1] are rejected; strata missing from `rates`
    * fall back to `defaultRate`. */
  def stratifiedOf(df: DataFrame, idCol: String, strataCol: String,
                   rates: Seq[(String, Double)],
                   defaultRate: Double): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      s"sampling rates must be in [0,1]: $rates default=$defaultRate")
    require(rates.map(_._1).distinct.size == rates.size,
      s"duplicate stratum in rates (the join would fan rows out): " +
        rates.map(_._1).mkString(","))
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = rates.map { case (l, r) => (l, thr(r)) }
      .toDF("_s_stratum", "_s_thr")
    df.join(broadcast(ratesDf), col(strataCol) === col("_s_stratum"), "left")
      .filter(hash32(col(idCol)) < coalesce(col("_s_thr"), lit(thr(defaultRate))))
      .drop("_s_stratum", "_s_thr")
  }

  def sampleStratifiedOracle: String = {
    // The oracle mirrors Spark's pmod exactly (DuckDB's % is
    // sign-preserving), so the comparison stays valid for negative ids
    // too. Intermediate max is (2³¹-1 + 2³¹) before the second %, and
    // the kept residue (< 2³¹) times the Knuth constant stays < 2⁶² —
    // both inside BIGINT.
    val ratesSql = Rates.map { case (l, r) => s"('$l', ${thr(r)})" }.mkString(", ")
    s"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    LEFT JOIN (VALUES $ratesSql) AS rates(r_lang, thr) ON lang = r_lang
    WHERE ((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761 % $M32
          < coalesce(thr, ${thr(DefaultRate)})"""
  }

  /** Context-window token budget for packing. */
  val Budget = 2048L

  /** `pack_sequences`: concatenation packing — documents are laid out in
    * a deterministic order (doc_id) per language stream, each document
    * starts at the running token offset, and training context `bin` =
    * offset div budget (a document crossing a bin boundary is split
    * across contexts, the standard pretraining layout). Token counts are
    * the whitespace tokenization `token_count` already oracle-proves.
    *
    * One window per stratum: shuffle on lang, sort by doc_id, running
    * sum — O(n log n) per stratum and nothing driver-side. A single
    * mega-stratum at 100 TB would serialize its prefix sum through one
    * partition; [[packOfSharded]] is the scale path — hierarchical
    * offsets over range shards, SAME result (it shares this query's
    * oracle). */
  def packSequences(s: SparkSession, d: String): DataFrame = {
    val tokens = size(Dedup.tokens(col("text"))).cast("long")
    packOf(documents(s, d).select(col("doc_id"), col("lang"),
      tokens.as("n_tokens")), "doc_id", "lang", "n_tokens", Budget)
  }

  /** Frame-based packer (the fluent-API face): appends `start_offset`,
    * `bin`, `bin_offset` from the running sum of `tokensCol` per
    * `strataCol` stream, ordered by `idCol`. */
  def packOf(df: DataFrame, idCol: String, strataCol: String,
             tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("start_offset",
        sum(col(tokensCol).cast("long")).over(w) - col(tokensCol).cast("long"))
      .withColumn("bin", call_function("div", col("start_offset"), lit(budget)))
      .withColumn("bin_offset", col("start_offset") % lit(budget))
  }

  /** `pack_sequences_sharded`: [[packOf]]'s scale path — the same
    * globally-ordered layout WITHOUT a single serialized prefix sum per
    * stratum. Documents are RANGE-sharded on the id (shard = id div
    * shardSize, so shard order ≡ id order), the running sum is computed
    * within each shard in parallel, and each shard's global base is the
    * running sum of the per-shard TOTALS — a #shards-row frame computed
    * in one tiny window and broadcast back. Global offset = shard base +
    * local offset, exactly [[packOf]]'s answer (the spec equates them
    * across shard sizes; the registered query shares `pack_sequences`'
    * oracle), but the critical path per stratum is one shard, not the
    * stratum.
    *
    * `bases` has #strata × (id range / shardSize) rows — metadata at the
    * default shardSize (2²⁰ ids/shard ⇒ one row per million ids), so the
    * join stays cheap; no broadcast hint is forced, because with a SMALL
    * shardSize `bases` is O(corpus) and must be allowed to shuffle-join
    * (the registered query passes 128 precisely so the sf dirs exercise
    * real multi-shard merges). */
  def packOfSharded(df: DataFrame, idCol: String, strataCol: String,
                    tokensCol: String, budget: Long,
                    shardSize: Long = 1L << 20): DataFrame = {
    require(budget > 0 && shardSize > 0, "budget and shardSize must be positive")
    val toks = col(tokensCol).cast("long")
    val withShard = df.withColumn("_shard",
      call_function("div", col(idCol), lit(shardSize)))
    val wLocal = Window.partitionBy(col(strataCol), col("_shard"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-shard totals are shard-count-sized metadata; their running sum
    // per stratum is the shard's global base offset
    val wBase = Window.partitionBy(col(strataCol)).orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = withShard
      .groupBy(col(strataCol), col("_shard"))
      .agg(sum(toks).as("_shard_total"))
      .withColumn("_shard_base",
        coalesce(sum(col("_shard_total")).over(wBase), lit(0L)))
      .select(col(strataCol), col("_shard"), col("_shard_base"))
    // Null-safe join: packOf's window keeps a null stratum as its own
    // partition, so the base join must match it too (a plain equi-join
    // would silently drop every null-stratum row). <=> is still an
    // equi-join predicate — the plan stays a hash join, never a BNLJ.
    val basesR = bases
      .withColumnRenamed(strataCol, "_b_stratum")
      .withColumnRenamed("_shard", "_b_shard")
    withShard
      .withColumn("_local", sum(toks).over(wLocal) - toks)
      .join(basesR, col(strataCol) <=> col("_b_stratum") &&
        col("_shard") <=> col("_b_shard"))
      .withColumn("start_offset", col("_shard_base") + col("_local"))
      .withColumn("bin", call_function("div", col("start_offset"), lit(budget)))
      .withColumn("bin_offset", col("start_offset") % lit(budget))
      .drop("_shard", "_b_stratum", "_b_shard", "_shard_base", "_local")
  }

  def packSequencesSharded(s: SparkSession, d: String): DataFrame = {
    val tokens = size(Dedup.tokens(col("text"))).cast("long")
    packOfSharded(documents(s, d).select(col("doc_id"), col("lang"),
      tokens.as("n_tokens")), "doc_id", "lang", "n_tokens", Budget,
      shardSize = 128L) // small on purpose: sf dirs must multi-shard
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("start_offset"), col("bin"), col("bin_offset"))
  }

  def packSequencesOracle: String = s"""
    WITH t AS (
      SELECT doc_id, lang,
        CAST(len(string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+')) AS BIGINT) AS n_tokens
      FROM documents),
    o AS (
      SELECT doc_id, lang, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start_offset
      FROM t)
    SELECT doc_id, lang, n_tokens, start_offset,
      start_offset // $Budget AS bin,
      start_offset % $Budget AS bin_offset
    FROM o"""
}

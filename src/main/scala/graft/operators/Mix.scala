package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix assembly: the three operations between "curated corpus"
  * and [[Sampling.packOf]]'s packed contexts in a pretraining data
  * pipeline — epoch-weighted mixing, token-budget selection, and the
  * deterministic global shuffle. Together with stratified sampling and
  * packing they close the loop: select → mix → shuffle → pack.
  *
  * All three are deterministic (seeded hashes, never `rand()`), so a
  * training run is REPRODUCIBLE from the corpus + the recipe — rerunning
  * the pipeline, on any partitioning, yields byte-identical batches (the
  * property every data-ablation study and every resumed run depends on).
  *
  *  - [[mixOf]] — per-stratum EPOCH weights (the Dolma/data-mix recipe:
  *    "2.3 epochs of en, 0.5 of es"): each doc is emitted floor(w) times
  *    plus one more for the id-hash fraction that lands under frac(w).
  *    Generalizes stratified sampling to weights ≥ 1; scan-speed
  *    (broadcast weight dim + one explode, no shuffle).
  *  - [[budgetOf]] / [[budgetOfSharded]] — quality-ranked token-budget
  *    fill per stratum ("the best docs until N tokens per language"):
  *    rank by (score desc, id), running token sum, keep every doc that
  *    STARTS inside the budget. The sharded twin stitches both running
  *    quantities over score-bucket shards ([[Sampling.packOfSharded]]'s
  *    trick adapted to a score-ordered prefix) so no stratum-wide
  *    window exists at any scale; the registered query runs it against
  *    the single-window oracle.
  *  - [[shuffleOf]] — seeded global permutation: order by
  *    (md5(seed:id), id). The md5 family keeps the order engine-portable
  *    (the DuckDB oracle replays it verbatim). The RANK is computed
  *    hierarchically — intra-shard row_number plus a running base over
  *    per-shard counts, where the shard IS the key's first hex byte, so
  *    shard order ≡ key order and the stitched rank equals the global
  *    row_number (the oracle proves it) without any single-partition
  *    window; shards are uniform by construction (hash prefix).
  */
object Mix {

  // ------------------------------------------------------------ corpus_mix

  /** Epoch weights per language for the registered query: en upsampled
    * past two epochs, the long tail downsampled — both directions of the
    * mixing recipe in one table. */
  val Epochs: Seq[(String, Double)] =
    Seq("en" -> 2.3, "de" -> 1.5, "fr" -> 1.0, "es" -> 0.5)
  val DefaultEpochs = 0.25

  private val M32 = 4294967296L // 2^32
  private def thr(frac: Double): Long = (frac * M32).toLong

  /** Knuth multiplicative id hash into [0, 2³²) — shared with
    * [[Sampling]] (same constant, same pmod guard for negative ids), so
    * the fractional-epoch keep set NESTS across weights exactly like the
    * sampler's: the docs kept at frac 0.3 are a subset of frac 0.5. */
  private def hash32(id: Column) =
    pmod(id, lit(2147483648L)) * lit(2654435761L) % lit(M32)

  /** Emit each row `floor(w)` times plus one for the hash-selected
    * fraction, `copy` = 0-based repeat index (epoch number — a loader
    * that interleaves copies across epochs reads `copy` directly).
    * Weights < 1 degenerate to sampling; weight 0 drops the stratum. */
  def mixOf(df: DataFrame, idCol: String, strataCol: String,
            epochs: Seq[(String, Double)], defaultEpochs: Double): DataFrame = {
    require((defaultEpochs +: epochs.map(_._2)).forall(w => w >= 0 && w <= 64),
      s"epoch weights must be in [0, 64]: $epochs default=$defaultEpochs")
    require(epochs.map(_._1).distinct.size == epochs.size,
      s"duplicate stratum in epochs: ${epochs.map(_._1).mkString(",")}")
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = epochs.map { case (l, w) =>
      (l, math.floor(w).toLong, thr(w - math.floor(w))) }
      .toDF("_m_stratum", "_m_whole", "_m_frac")
    val whole = coalesce(col("_m_whole"),
      lit(math.floor(defaultEpochs).toLong))
    val frac = coalesce(col("_m_frac"),
      lit(thr(defaultEpochs - math.floor(defaultEpochs))))
    val copies = whole + when(hash32(col(idCol)) < frac, 1L).otherwise(0L)
    df.join(broadcast(wDf), col(strataCol) === col("_m_stratum"), "left")
      // sequence(0, -1) would DESCEND, not empty — guard the zero-copy
      // case to an empty array so explode drops the row
      .withColumn("copy", explode(when(copies > 0,
        sequence(lit(0L), copies - 1)).otherwise(array())))
      .drop("_m_stratum", "_m_whole", "_m_frac")
  }

  /** `corpus_mix`: the documents table under [[Epochs]] — (doc_id, lang,
    * copy) rows, one per scheduled epoch appearance. */
  def corpusMix(s: SparkSession, d: String): DataFrame =
    mixOf(documents(s, d).select(col("doc_id"), col("lang")),
      "doc_id", "lang", Epochs, DefaultEpochs)
      .select(col("doc_id"), col("lang"), col("copy"))

  def corpusMixOracle: String = {
    val wSql = Epochs.map { case (l, w) =>
      s"('$l', ${math.floor(w).toLong}, ${thr(w - math.floor(w))})" }
      .mkString(", ")
    val dWhole = math.floor(DefaultEpochs).toLong
    val dFrac = thr(DefaultEpochs - math.floor(DefaultEpochs))
    s"""
    WITH c AS (
      SELECT doc_id, lang,
        coalesce(whole, $dWhole)
          + CASE WHEN ((doc_id % 2147483648 + 2147483648) % 2147483648)
                      * 2654435761 % $M32 < coalesce(frac, $dFrac)
                 THEN 1 ELSE 0 END AS copies
      FROM documents
      LEFT JOIN (VALUES $wSql) AS w(w_lang, whole, frac) ON lang = w_lang)
    SELECT doc_id, lang,
      CAST(unnest(generate_series(0, copies - 1)) AS BIGINT) AS copy
    FROM c WHERE copies > 0"""
  }

  // ---------------------------------------------------- token_budget_select

  /** Per-language token budget for the registered query — small enough
    * that every driver SF genuinely cuts (the selection is the point). */
  val TokenBudget = 2048L

  /** Quality-ranked budget fill: order `df` by (`scoreCol` desc, `idCol`)
    * within each stratum, run the token prefix sum, and keep every doc
    * whose START offset is inside `budget` (so the budget-straddling doc
    * is kept whole — "take docs until the budget is reached"). Appends
    * `sel_rank` (0-based quality rank) and `start_offset`. ONE window
    * per stratum — the semantic reference; [[budgetOfSharded]] is the
    * scale path (identical output, no stratum-wide window). */
  def budgetOf(df: DataFrame, idCol: String, strataCol: String,
               tokensCol: String, scoreCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val order = Seq(col(scoreCol).desc_nulls_last, col(idCol))
    val w = Window.partitionBy(col(strataCol)).orderBy(order: _*)
    val toks = col(tokensCol).cast("long")
    df.withColumn("sel_rank", row_number().over(w).cast("long") - 1)
      .withColumn("start_offset",
        sum(toks).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) - toks)
      .filter(col("start_offset") < budget)
  }

  /** [[budgetOf]]'s scale path — the SAME selection without a
    * stratum-wide window: at 100 TB the dominant language is most of
    * the corpus, and one (score desc, id) window per stratum would
    * serialize it through a single partition. The
    * [[Sampling.packOfSharded]] trick, adapted to a SCORE-ordered
    * prefix: the shard is the score's bucket under `floor((1−score) ·
    * buckets)` — monotone in the descending order, so shard order ≡
    * score order and concatenated shard-local orders ARE the stratum
    * order (nulls take the one-past-the-end bucket, matching
    * `desc_nulls_last`; out-of-[0,1] scores clamp to the edge buckets,
    * preserving monotonicity). Both running quantities stitch
    * hierarchically: intra-shard row_number/prefix-sum windows, plus
    * per-shard count/token-total bases from ONE tiny aggregate —
    * (strata × ≤buckets+1) rows, a metadata frame. Ties in score land
    * in one shard (the bucket is a function of the score), so the
    * (score, id) tie-break never splits across the stitch. Score
    * buckets are value-ranges, not hashes, so a pathological
    * all-one-score stratum degenerates to one shard — the documented
    * trade for keeping the stitch deterministic and oracle-replayable;
    * real quality scores spread over [0,1] and `buckets` (default
    * 1024) bounds the worst window partition at ~1/buckets of the
    * stratum. Shares [[budgetOf]]'s semantics exactly — the registered
    * query carries the same single-window oracle, and MixSpec equates
    * the two across bucket counts. */
  def budgetOfSharded(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: String, scoreCol: String, budget: Long,
      buckets: Int = 1024): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    require(buckets > 0, s"bucket count must be positive: $buckets")
    // the sharded frame feeds TWO consumers (the base aggregate and the
    // local windows) — staged once, the shuffleOf discipline
    Dedup.stagedScope { scratch =>
      val toks = col(tokensCol).cast("long")
      val sc = col(scoreCol).cast("double")
      val shard = when(sc.isNull, lit(buckets.toLong))
        .otherwise(least(greatest(
          floor((lit(1.0) - sc) * buckets).cast("long"), lit(0L)),
          lit(buckets - 1L)))
      val withShard = scratch.pin(df.withColumn("_shard", shard)
        .repartition(col(strataCol), col("_shard")))
      val wLocal = Window.partitionBy(col(strataCol), col("_shard"))
        .orderBy(col(scoreCol).desc_nulls_last, col(idCol))
      val wBase = Window.partitionBy(col(strataCol)).orderBy(col("_shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bases = withShard.groupBy(col(strataCol), col("_shard"))
        .agg(count(lit(1)).as("_cnt"), sum(toks).as("_tok"))
        .withColumn("_rank_base", coalesce(sum(col("_cnt")).over(wBase), lit(0L)))
        .withColumn("_off_base", coalesce(sum(col("_tok")).over(wBase), lit(0L)))
        .select(col(strataCol).as("_b_stratum"), col("_shard").as("_b_shard"),
          col("_rank_base"), col("_off_base"))
      // null-safe equi-join: a null stratum is its own window partition
      // on the serial path, so the base must match it too (packOfSharded).
      // bases is EXPLICITLY broadcast — it is bounded by strata ×
      // (buckets+1) rows whatever the corpus size (unlike packOfSharded's
      // id-range bases, which grow with the corpus), and without the hint
      // a tiny-SF AQE may invert the choice and broadcast the doc-grain
      // side instead
      withShard
        .withColumn("_lrank", row_number().over(wLocal).cast("long"))
        .withColumn("_loff",
          sum(toks).over(wLocal.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)) - toks)
        .join(broadcast(bases), col(strataCol) <=> col("_b_stratum") &&
          col("_shard") <=> col("_b_shard"))
        .withColumn("sel_rank", col("_rank_base") + col("_lrank") - 1)
        .withColumn("start_offset", col("_off_base") + col("_loff"))
        .filter(col("start_offset") < budget)
        .drop("_shard", "_b_stratum", "_b_shard", "_rank_base", "_off_base",
          "_lrank", "_loff")
    }
  }

  /** `token_budget_select`: the highest-quality [[TokenBudget]] tokens
    * per language — [[graft.operators.TextOps.textStatsOf]]'s
    * quality_score ranks (the score the text_stats oracle already
    * proves engine-identical, which is what lets a double-ordered
    * selection hash-match), whitespace token counts fill the budget.
    * Runs the SHARDED path with deliberately few buckets so the driver
    * SFs exercise real multi-shard stitches (the packSequencesSharded
    * shardSize=128 rationale); the oracle is still ONE window per
    * stratum, so the hash match proves the stitch exact. */
  def tokenBudgetSelect(s: SparkSession, d: String): DataFrame =
    budgetOfSharded(
      TextOps.textStatsOf(documents(s, d), col("lang"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("quality_score")),
      "doc_id", "lang", "n_tokens", "quality_score", TokenBudget,
      buckets = 8)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("sel_rank"), col("start_offset"))

  def tokenBudgetSelectOracle: String = raw"""
    WITH t AS (
      SELECT doc_id, lang,
        string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9${Dedup.WsChars}]', '', 'g')) AS BIGINT) AS n_punct
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_chars, n_punct,
        CAST(len(w) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stopwords
      FROM t),
    q AS (
      SELECT doc_id, lang, n_tokens,
        least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.5
          + (CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.3
          + (1.0 - CAST(n_punct AS DOUBLE) / n_chars) * 0.2 AS quality_score
      FROM c),
    r AS (
      SELECT doc_id, lang, n_tokens,
        CAST(row_number() OVER win AS BIGINT) - 1 AS sel_rank,
        CAST(sum(n_tokens) OVER (win ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) - n_tokens AS start_offset
      FROM q
      WINDOW win AS (PARTITION BY lang
                     ORDER BY quality_score DESC NULLS LAST, doc_id))
    SELECT doc_id, lang, n_tokens, sel_rank, start_offset
    FROM r WHERE start_offset < $TokenBudget"""

  // -------------------------------------------------- shuffle_deterministic

  /** Seed for the registered query (any string; a run is identified by
    * its seed). */
  val ShuffleSeed = "graft-r12"

  /** Seeded deterministic global permutation: `shuffle_key` =
    * md5(seed:id), `shuffle_rank` = the 0-based global rank under
    * (key, id) order. The rank is stitched hierarchically: the shard is
    * the key's FIRST HEX BYTE (a prefix, so shard order ≡ key order and
    * the concatenated shard-local orders ARE the global order),
    * intra-shard ranks come from one row_number window each, and each
    * shard's base is the running sum of per-shard counts — a ≤256-row
    * broadcast frame. No single-partition window anywhere: at 100 TB
    * the 256 hash-prefix shards are uniform by construction, and a
    * deeper prefix (two bytes → 65536 shards) is the same plan. */
  def shuffleOf(df: DataFrame, idCol: String, seed: String): DataFrame =
    // the keyed frame feeds TWO consumers (the ranking window and the
    // per-shard count aggregate); without staging, each would re-run
    // the whole upstream pipeline — in assemble_epochs that is a second
    // tokenize + mix pass over the corpus (column pruning differentiates
    // the two subtrees, so exchange reuse cannot dedupe them). The
    // stagedScope combinator pins it once behind the _shard exchange
    // and releases the scratch after the result materializes — the
    // engine-wide multi-consumer discipline (Dedup.staged's doc).
    Dedup.stagedScope { scratch =>
      val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
      val withKey = scratch.pin(df.withColumn("shuffle_key", key)
        .withColumn("_shard",
          conv(substring(col("shuffle_key"), 1, 2), 16, 10).cast("long"))
        .repartition(col("_shard")))
      val wLocal = Window.partitionBy(col("_shard"))
        .orderBy(col("shuffle_key"), col(idCol))
      val wBase = Window.orderBy(col("_shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // per-shard counts: ≤256 rows — the base window is metadata-sized
      val bases = withKey.groupBy(col("_shard")).agg(count(lit(1)).as("_n"))
        .withColumn("_base", coalesce(sum(col("_n")).over(wBase), lit(0L)))
        .select(col("_shard").as("_b_shard"), col("_base"))
      withKey
        .withColumn("_local", row_number().over(wLocal).cast("long"))
        .join(broadcast(bases), col("_shard") === col("_b_shard"))
        .withColumn("shuffle_rank", col("_base") + col("_local") - 1)
        .drop("_shard", "_b_shard", "_base", "_local")
    }

  /** `shuffle_deterministic`: the documents table under [[ShuffleSeed]].
    * The oracle computes the rank as ONE global row_number over the same
    * md5 order, so the hash match proves the hierarchical stitch is
    * exactly the global permutation. */
  def shuffleDeterministic(s: SparkSession, d: String): DataFrame =
    shuffleOf(documents(s, d).select(col("doc_id"), col("lang")),
      "doc_id", ShuffleSeed)
      .select(col("doc_id"), col("lang"), col("shuffle_key"),
        col("shuffle_rank"))

  def shuffleDeterministicOracle: String = s"""
    WITH k AS (
      SELECT doc_id, lang,
        md5(concat('$ShuffleSeed', ':', CAST(doc_id AS VARCHAR))) AS shuffle_key
      FROM documents)
    SELECT doc_id, lang, shuffle_key,
      CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) - 1
        AS shuffle_rank
    FROM k"""

  // --------------------------------------------------------- assemble_epochs

  /** `assemble_epochs`: the WHOLE assembly composed — mix under
    * [[Epochs]], shuffle the emitted (doc, copy) appearances under
    * [[ShuffleSeed]], pack the shuffled stream per language into
    * [[Sampling.Budget]]-token training contexts — one declarative DAG
    * from curated corpus to batch layout (the composition face, like
    * `pipeline_clean`/`pipeline_curate` for cleaning). The per-doc
    * token count is computed ONCE, before the mix multiplies rows, so
    * a 2.3-epoch language never re-tokenizes; the shuffle id is the
    * (doc, copy) appearance — `doc_id · 128 + copy`, injective since the
    * mixer's weight-≤64 bound caps copies at 65 — so two copies of one doc land at
    * independent positions (copies clumping together would put near-
    * identical gradients in adjacent batches, the thing the shuffle
    * exists to prevent); packing then runs per language in shuffle
    * order. The DuckDB oracle replays the identical three stages, so
    * the hash match proves the composed layout end-to-end. */
  def assembleEpochs(s: SparkSession, d: String): DataFrame =
    assembleWith(documents(s, d), Epochs, DefaultEpochs, ShuffleSeed,
      Sampling.Budget, packShardSize = 512L)

  /** The assembly RECIPE, parameterized — the face a training-infra
    * caller holds (and the server's GET /assemble serves): any curated
    * corpus frame with (doc_id, lang, text), any epoch-weight table,
    * seed, and context budget. [[assembleEpochs]] is this under the
    * registered constants; the oracle there proves the composition, so
    * callers vary the recipe against a proven DAG. `packShardSize`
    * defaults to [[Sampling.packOfSharded]]'s 2^20 scale default; the
    * registered query passes 512 so driver SFs exercise real
    * multi-shard stitches. */
  def assembleWith(corpus: DataFrame, epochs: Seq[(String, Double)],
                   defaultEpochs: Double, seed: String, budget: Long,
                   packShardSize: Long = 1L << 20): DataFrame = {
    val withToks = corpus
      .select(col("doc_id"), col("lang"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
    val mixed = mixOf(withToks, "doc_id", "lang", epochs, defaultEpochs)
      .withColumn("_mix_id", col("doc_id") * 128L + col("copy"))
    val shuffled = shuffleOf(mixed, "_mix_id", seed)
    // packing runs the SHARDED path: shuffle_rank is a dense global
    // sequence, so rank-range shards are uniform by construction and
    // the dominant language never serializes through one window
    // partition (packOf's scale caveat).
    Sampling.packOfSharded(shuffled, "shuffle_rank", "lang", "n_tokens",
        budget, shardSize = packShardSize)
      .select(col("doc_id"), col("copy"), col("lang"), col("n_tokens"),
        col("shuffle_rank"), col("start_offset"), col("bin"),
        col("bin_offset"))
  }

  /** `assemble_from_recipe`: the assembly driven by a PERSISTED,
    * versioned recipe — the config half of training-run provenance
    * ([[graft.sources.RecipeStore]]). `batch_provenance` answers "what
    * fed batch 17"; this answers the prior question, "what exactly WAS
    * run N's recipe", by replaying the layout from the store's own
    * version axis. The lifecycle the query drives: commit a draft
    * recipe (v1), commit the registered recipe (v2) under a batch tag,
    * redeliver that tag (at-least-once: no-op — the version axis never
    * double-counts a double-fired scheduler), then `assembleAt(corpus,
    * v2)` through a real FS round-trip. Sharing [[assembleEpochs]]'
    * oracle is the proof that matters: hash-green means the recipe
    * survived serialization EXACTLY (weights are doubles feeding a
    * 2^32 hash threshold — one ulp of drift moves the keep set) and
    * that version addressing reads the version asked for, not the
    * latest. */
  def assembleFromRecipe(s: SparkSession, d: String): DataFrame = {
    import graft.sources.{Recipe, RecipeStore}
    val dir = DedupIndex.freshRunDir("graft_recipe_", d)
    val store = RecipeStore(s, dir.getPath)
    val run = Recipe(Epochs, DefaultEpochs, ShuffleSeed,
      Sampling.Budget, packShardSize = 512L)
    store.commit("draft",
      Recipe(Seq("en" -> 1.0), 0.5, "draft-seed", 1024L, 256L))
    store.commit("run-a", run)
    store.commit("run-a", run) // at-least-once redelivery: no-op
    store.assembleAt(documents(s, d), 2L)
  }

  /** The stored v2 recipe IS the registered recipe — same oracle. */
  def assembleFromRecipeOracle: String = assembleEpochsOracle

  /** `batch_provenance`: training-batch AUDITABILITY — for every packed
    * context (lang, bin) of [[assembleEpochs]], the distribution of
    * corpus `source`s feeding it (doc appearances and token mass per
    * source). The question a data auditor actually asks ("what fed
    * batch 17 of the en stream?"), answered by a doc_id join back to
    * the metadata table AFTER assembly — lineage never requires
    * threading every metadata column through the mix/shuffle/pack DAG,
    * because the batch layout keeps the doc_id grain end-to-end. Plan:
    * the assembled frame joins `documents` on doc_id (two corpus-grain
    * sides — a plain shuffled equi-join, 8-byte keys + a small source
    * string; the text column is never read, pinned by the scan's
    * ReadSchema) and folds to the (lang, bin, source) grain with
    * partial aggregation. The oracle replays assembly + join + fold,
    * so the hash match proves the lineage attribution exactly. */
  def batchProvenance(s: SparkSession, d: String): DataFrame =
    assembleEpochs(s, d)
      // corpus-grain × corpus-grain: pin the shuffle join — a broadcast
      // of the metadata scan would win at bench SF and OOM at 100 TB
      .join(documents(s, d).select(col("doc_id"), col("source"))
          .hint("shuffle_hash"),
        Seq("doc_id"))
      .groupBy(col("lang"), col("bin"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  def batchProvenanceOracle: String = s"""
    WITH asm AS (${assembleEpochsOracle})
    SELECT a.lang, a.bin, d.source,
           count(*) AS n_docs, CAST(sum(a.n_tokens) AS BIGINT) AS n_tokens
    FROM asm a JOIN documents d USING (doc_id)
    GROUP BY 1, 2, 3"""

  def assembleEpochsOracle: String = {
    val wSql = Epochs.map { case (l, w) =>
      s"('$l', ${math.floor(w).toLong}, ${thr(w - math.floor(w))})" }
      .mkString(", ")
    val dWhole = math.floor(DefaultEpochs).toLong
    val dFrac = thr(DefaultEpochs - math.floor(DefaultEpochs))
    raw"""
    WITH t AS (
      SELECT doc_id, lang,
        CAST(len(string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+')) AS BIGINT) AS n_tokens
      FROM documents),
    m AS (
      SELECT doc_id, lang, n_tokens,
        coalesce(whole, $dWhole)
          + CASE WHEN ((doc_id % 2147483648 + 2147483648) % 2147483648)
                      * 2654435761 % $M32 < coalesce(frac, $dFrac)
                 THEN 1 ELSE 0 END AS copies
      FROM t
      LEFT JOIN (VALUES $wSql) AS w(w_lang, whole, frac) ON lang = w_lang),
    e AS (
      SELECT doc_id, lang, n_tokens,
        CAST(unnest(generate_series(0, copies - 1)) AS BIGINT) AS copy
      FROM m WHERE copies > 0),
    k AS (
      SELECT *, md5(concat('$ShuffleSeed', ':',
        CAST(doc_id * 128 + copy AS VARCHAR))) AS skey
      FROM e),
    r AS (
      SELECT doc_id, copy, lang, n_tokens,
        CAST(row_number() OVER (ORDER BY skey, doc_id * 128 + copy) AS BIGINT) - 1
          AS shuffle_rank
      FROM k),
    o AS (
      SELECT doc_id, copy, lang, n_tokens, shuffle_rank,
        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY shuffle_rank
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          - n_tokens AS start_offset
      FROM r)
    SELECT doc_id, copy, lang, n_tokens, shuffle_rank, start_offset,
      start_offset // ${Sampling.Budget} AS bin,
      start_offset % ${Sampling.Budget} AS bin_offset
    FROM o"""
  }
}

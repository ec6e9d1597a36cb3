package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents.parquet`: quality scoring,
  * token counting, language ID, and winnowing fingerprints. Everything is
  * a pure per-row projection or one hash aggregation — `functions._` only,
  * fully inside whole-stage codegen, no UDFs — so a 100 TB scan runs at
  * parquet-read speed with the text column as the sole wide column read.
  */
object TextOps {

  // ----------------------------------------------------------- text_stats

  /** Quality scoring: length, token, punctuation and stopword statistics
    * plus a composite [0,1] quality score. All ratios are int/int double
    * divisions (exactly rounded IEEE ops → bit-stable across engines). */
  def textStats(s: SparkSession, d: String): DataFrame =
    textStatsOf(documents(s, d))

  /** Stats over any (doc_id, text) frame; `keep` columns ride along so a
    * composed pipeline (pipeline_clean) gets text/lang + stats from ONE
    * scan instead of a corpus-grain self-join. */
  def textStatsOf(docs: DataFrame, keep: Column*): DataFrame = {
    val w        = Dedup.tokens(col("text"))
    val nChars   = length(col("text")).cast("long")
    val nTokens  = size(w).cast("long")
    // chars removed by stripping non-alphanumeric-non-space = punctuation
    val nPunct   = (nChars - length(regexp_replace(col("text"), s"[^a-zA-Z0-9${Dedup.WsChars}]", "")))
      .cast("long")
    val stop     = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val nStop    = size(filter(w, t => t.isin(stop.map(lit): _*))).cast("long")
    val tokLen   = aggregate(transform(w, length(_).cast("long")), lit(0L), _ + _)
    val stopR    = nStop.cast("double") / nTokens
    val punctR   = nPunct.cast("double") / nChars
    val lenScore = least(nTokens.cast("double") / lit(64.0), lit(1.0))
    docs.select(col("doc_id") +: keep :+
      nChars.as("n_chars") :+
      nTokens.as("n_tokens") :+
      nPunct.as("n_punct") :+
      nStop.as("n_stopwords") :+
      (tokLen.cast("double") / nTokens).as("avg_token_len") :+
      stopR.as("stopword_ratio") :+
      punctR.as("punct_ratio") :+
      (lenScore * lit(0.5) + stopR * lit(0.3) + (lit(1.0) - punctR) * lit(0.2))
        .as("quality_score"): _*)
  }

  def textStatsOracle: String = raw"""
    WITH t AS (
      SELECT doc_id, text,
        string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9${Dedup.WsChars}]', '', 'g')) AS BIGINT) AS n_punct
      FROM documents),
    c AS (
      SELECT doc_id, n_chars, n_punct,
        CAST(len(w) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stopwords,
        CAST(list_sum(list_transform(w, x -> CAST(length(x) AS BIGINT))) AS BIGINT) AS tok_len
      FROM t)
    SELECT doc_id, n_chars, n_tokens, n_punct, n_stopwords,
      CAST(tok_len AS DOUBLE) / n_tokens AS avg_token_len,
      CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
      CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
      least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.5
        + (CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.3
        + (1.0 - CAST(n_punct AS DOUBLE) / n_chars) * 0.2 AS quality_score
    FROM c"""

  /** The same statistics as [[textStats]] as a single struct expression
    * over any text column — the fluent-API building block
    * (graft.api.withTextStats). */
  def textStatsExpr(text: Column): Column = {
    val w        = Dedup.tokens(text)
    val nChars   = length(text).cast("long")
    val nTokens  = size(w).cast("long")
    val nPunct   = (nChars - length(regexp_replace(text, s"[^a-zA-Z0-9${Dedup.WsChars}]", "")))
      .cast("long")
    val stop     = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val nStop    = size(filter(w, t => t.isin(stop.map(lit): _*))).cast("long")
    val stopR    = nStop.cast("double") / nTokens
    val punctR   = nPunct.cast("double") / nChars
    val lenScore = least(nTokens.cast("double") / lit(64.0), lit(1.0))
    struct(
      nChars.as("n_chars"), nTokens.as("n_tokens"), nPunct.as("n_punct"),
      nStop.as("n_stopwords"), stopR.as("stopword_ratio"), punctR.as("punct_ratio"),
      (lenScore * lit(0.5) + stopR * lit(0.3) + (lit(1.0) - punctR) * lit(0.2))
        .as("quality_score"))
  }

  // ---------------------------------------------------------- token_count

  /** Whitespace vs BPE-ish regex token counts. The regex splits runs of
    * letters, runs of digits, and single other non-space chars — the same
    * classes a byte-level BPE pre-tokenizer uses; identical semantics in
    * Java regex and DuckDB's RE2. */
  val BpeIsh = s"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9${Dedup.WsChars}]"

  def tokenCount(s: SparkSession, d: String): DataFrame = {
    val w = Dedup.tokens(col("text"))
    documents(s, d).select(
      col("doc_id"),
      size(w).cast("long").as("ws_tokens"),
      size(array_distinct(w)).cast("long").as("distinct_tokens"),
      size(regexp_extract_all(col("text"), lit(BpeIsh), lit(0))).cast("long")
        .as("bpe_tokens"))
  }

  def tokenCountOracle: String = s"""
    SELECT doc_id,
      CAST(len(string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+')) AS BIGINT) AS ws_tokens,
      CAST(len(list_distinct(string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+'))) AS BIGINT) AS distinct_tokens,
      CAST(len(regexp_extract_all(text, '$BpeIsh')) AS BIGINT) AS bpe_tokens
    FROM documents"""

  // -------------------------------------------------------------- lang_id

  /** n-gram-heuristic language ID: score each language by stopword hits
    * plus a script test (CJK codepoints for zh), argmax with deterministic
    * tie-break on language name. Profiles are broadcast literals inside the
    * expression — per-row work only, no join. No SQL oracle (the corpus
    * `lang` labels are synthetic); LangIdSpec checks real sentences. */
  val Profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "it", "you", "that", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "mit", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pas"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "en", "no"))

  def langScores(text: Column): Column = {
    val w = Dedup.tokens(text)
    val hits = Profiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      struct(
        size(filter(w, t => t.isin(stops.map(lit): _*))).cast("double").as("score"),
        lit(lang).as("lang"))
    }
    val zh = struct(
      (length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")).cast("double") * lit(2.0))
        .as("score"),
      lit("zh").as("lang"))
    array_max(array(hits :+ zh: _*))
  }

  def langId(s: SparkSession, d: String): DataFrame = {
    val best = langScores(col("text"))
    documents(s, d).select(
      col("doc_id"), col("lang").as("lang_label"),
      when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
        .as("lang_pred"),
      best.getField("score").as("score"))
  }

  /** DuckDB twin of [[langId]]. The scores are integer counts held in
    * doubles (exact), so cross-engine equality is bit-stable; the
    * `array_max`-over-structs argmax ties break to the LARGEST language
    * string, mirrored by testing the CASE arms in reverse-alphabetical
    * order. */
  def langIdOracle: String = {
    def inList(stops: Seq[String]) = stops.map(w => s"'$w'").mkString(", ")
    val scoreCols = Profiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      s"CAST(len(list_filter(w, x -> x IN (${inList(stops)}))) AS DOUBLE) AS s_$lang"
    }.mkString(",\n        ")
    raw"""
    WITH t AS (
      SELECT doc_id, lang, text,
        string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w
      FROM documents),
    s AS (
      SELECT doc_id, lang AS lang_label,
        """ + scoreCols + """,
        CAST(length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS DOUBLE) * 2.0 AS s_zh
      FROM t),
    b AS (
      SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS best FROM s)
    SELECT doc_id, lang_label,
      CASE WHEN best = 0 THEN 'und'
           WHEN s_zh = best THEN 'zh'
           WHEN s_fr = best THEN 'fr'
           WHEN s_es = best THEN 'es'
           WHEN s_en = best THEN 'en'
           ELSE 'de' END AS lang_pred,
      best AS score
    FROM b"""
  }

  // ------------------------------------------------------ doc_fingerprint

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    * style): hash every word 3-shingle in order, slide a window of 4
    * hashes, keep each window's minimum, dedup. Guarantee: any shared run
    * of ≥ 6 tokens between two docs yields a shared fingerprint. Pure
    * array expressions per row.
    *
    * Winnowing is hash-family-agnostic — [[winnow]] only needs an ordered
    * hash type. The registered query uses md5-hex-16 prints (a builtin in
    * BOTH engines, so the FULL pipeline — tokenize → shingle → window-min
    * → dedup — is replicated and hash-compared in DuckDB); the dedup
    * operators keep xxhash64 where no oracle needs to follow the hash. */
  val WinnowWindow = 4

  /** Ordered (non-distinct) 3-shingle md5-hex prints (first 16 hex chars
    * — 64 bits; ASCII-hex lexicographic order ≡ numeric order, so
    * window-min agrees across engines) from a MATERIALIZED token column
    * (see Dedup.shinglesOfTokens for why w must not be inline). */
  def shingleHashesOfTokens(w: Column): Column =
    when(size(w) >= 3,
      transform(sequence(lit(0), size(w) - 3), i =>
        substring(md5(concat_ws(" ", element_at(w, i + lit(1)),
          element_at(w, i + lit(2)), element_at(w, i + lit(3)))), 1, 16)))
      .otherwise(array().cast("array<string>"))

  /** Inline convenience for small inputs (tests) — quadratic form. */
  def shingleHashes(text: Column): Column =
    shingleHashesOfTokens(Dedup.tokens(text))

  /** Winnow a MATERIALIZED hash-array column. `hs` must be a plain column
    * reference: inlining the shingle-hash expression here would re-evaluate
    * it inside every window's `slice` (Catalyst does not CSE through
    * higher-order lambdas), turning O(len·w) into O(len²·w) per row. */
  def winnow(hs: Column): Column =
    when(size(hs) >= WinnowWindow,
      array_distinct(transform(sequence(lit(0), size(hs) - WinnowWindow), i =>
        array_min(slice(hs, i + lit(1), lit(WinnowWindow))))))
      .otherwise(array_distinct(hs))

  /** Test/demo convenience on small inputs — quadratic inline form. */
  def fingerprintArr(text: Column): Column = winnow(shingleHashes(text))

  def docFingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      // each exchange is a parallelism source (compute-bound stage,
      // possibly single-split input) and a projection barrier pinning the
      // previous stage's array materialized (CollapseProject cannot
      // re-inline across it)
      .repartition(col("doc_id"))
      .select(col("doc_id"), shingleHashesOfTokens(col("w")).as("hs"))
      .select(col("doc_id"), explode(winnow(col("hs"))).as("fingerprint"))

  /** DuckDB twin of the FULL winnowing pipeline. unnest over an empty
    * list emits no rows, matching Spark's non-outer explode for docs
    * shorter than one shingle. */
  def docFingerprintOracle: String = raw"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w
      FROM documents),
    h AS (
      SELECT doc_id,
        CASE WHEN len(w) >= 3 THEN
          list_transform(generate_series(1, len(w)-2), i ->
            substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 16))
        ELSE CAST([] AS VARCHAR[]) END AS hs
      FROM t),
    f AS (
      SELECT doc_id,
        CASE WHEN len(hs) >= $WinnowWindow THEN
          list_distinct(list_transform(generate_series(1, len(hs)-${WinnowWindow - 1}),
            i -> list_min(hs[i:i+${WinnowWindow - 1}])))
        ELSE list_distinct(hs) END AS fps
      FROM h)
    SELECT doc_id, unnest(fps) AS fingerprint FROM f"""

  // --------------------------------------------------------- doc_perplexity

  /** Self-scored bigram language-model surprisal — the
    * perplexity-proxy quality signal pretraining pipelines filter on
    * (gibberish, boilerplate soup, and wrong-language text all score
    * low-probability against the corpus's OWN n-gram statistics,
    * without shipping an external model): per document, the mean
    * add-one-smoothed bigram log-probability
    * `avg ln((c(w1,w2)+1) / (c(w1·)+V))` over the corpus-wide counts;
    * perplexity = `exp(-avg_logprob)` (left to the caller — one more
    * libm call would cost the oracle's bit-exactness for zero
    * information). Tokens are the engine-wide whitespace convention
    * ([[Dedup.tokens]]); `c(w1·)` counts bigram FIRSTS (so unigram
    * and bigram totals share a denominator universe) and V is the
    * first-position vocabulary.
    *
    * Scale shape — the LM-count join ordered to dodge the hub-word
    * skew (the dedup_ngram distinct-grain trick): the skewed
    * `w1`-keyed join (every bigram starting with "the") runs at
    * DISTINCT-BIGRAM grain, where a hub costs its distinct
    * continuations, not its token instances; the instance-grain join
    * then keys on the much-flatter `(w1, w2)` pair against the
    * scored-bigram table. Three token-grain shuffles total (bigram
    * counts, first counts, per-doc re-agg) — inherent to counting an
    * LM. Per-bigram log-probs round to DECIMAL(18,6) BEFORE the
    * per-doc sum: the decimal sum is exact and order-independent (the
    * dsum doctrine), and the rounding absorbs the ≤1-ulp libm
    * disagreement between engines that would otherwise make an
    * averaged double non-reproducible. V rides as a driver-collected
    * scalar (one long — the plan-time-discovery precedent). */
  def docPerplexity(s: SparkSession, d: String): DataFrame =
    perplexityOf(documents(s, d))

  /** Instance-grain bigrams of a (doc_id, text) frame — the shared
    * kernel of the one-shot scorer and the persisted-count faces. */
  private def bigramsOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
    val n1 = greatest(size(col("w")) - 1, lit(0))
    toks
      .withColumn("w1s", slice(col("w"), lit(1), n1))
      .withColumn("w2s", slice(col("w"), lit(2), n1))
      .select(col("doc_id"),
        explode(arrays_zip(col("w1s"), col("w2s"))).as("p"))
      .select(col("doc_id"), col("p.w1s").as("w1"), col("p.w2s").as("w2"))
  }

  /** Corpus bigram counts at (w1, w2) grain — the additive partial a
    * [[graft.sources.PointStore]] keyed (w1, w2) with one `c2` sum
    * folds nightly (counts re-sum; the unigram table and the
    * vocabulary both DERIVE from this one store, so the LM state is a
    * single point table maintained at O(delta) per night). */
  def bigramCountsOf(docs: DataFrame): DataFrame =
    bigramsOf(docs).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))

  /** The reusable core over any (doc_id, text) frame.
    *
    * The unigram table and the vocabulary both DERIVE from the
    * aggregated bigram frame (`c1 = Σ c2 group by w1`; `V` = its
    * distinct-w1 count) — the same derivation [[perplexityProbeAgainst]]
    * uses against a stored count table — so the corpus tokenizes
    * exactly twice (once into `big`, once into the instance-grain
    * scoring join) and the only w1-keyed shuffle runs at
    * DISTINCT-BIGRAM grain where hub words cost their continuations,
    * not their instances. `big` is pinned behind its exchange
    * (localCheckpoint, the materialize-behind-exchange doctrine of
    * SURVEY §4): the driver-side V count evaluates it once and the
    * uni/scored joins replay the checkpoint, never the token scan. */
  def perplexityOf(docs: DataFrame): DataFrame = {
    val bi = bigramsOf(docs)
    val big = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val uni = big.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val v = big.select(col("w1")).distinct().count()
    val scoredBigram = big
      .join(uni.hint("shuffle_hash"), Seq("w1"))
      .select(col("w1"), col("w2"),
        log((col("c2") + 1).cast("double") /
            (col("c1") + lit(v)).cast("double"))
          .cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(18, 6)).as("lp"))
    bi.join(scoredBigram.hint("shuffle_hash"), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg((sum(col("lp")).cast("double") / count(lit(1))).as("avg_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Score a BATCH against stored corpus counts — the probe face of
    * the LM state ([[bigramCountsOf]]'s store): unseen bigrams smooth
    * to `ln(1/(c1+V))`, unseen first-words to `ln(1/V)` (c2 and c1
    * coalesce to 0 — the add-one estimator is total, so a delta batch
    * scores without ever touching corpus text). LEFT joins keep every
    * batch bigram; the count tables shuffle on their own keys; same
    * decimal-before-sum reproducibility discipline as the one-shot. */
  def perplexityProbeAgainst(counts: DataFrame, batch: DataFrame): DataFrame = {
    // pin the count frame ONCE (localCheckpoint, the one-shot faces'
    // materialize-behind-exchange doctrine): `counts` is typically a
    // store snapshot — a merge-on-read member scan + fold that would
    // otherwise re-execute for each of its three consumers here (the
    // uni marginal, the driver-side V count, and the scoring join)
    val cnt = counts.localCheckpoint()
    val uni = cnt.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val v = cnt.select(col("w1")).distinct().count()
    require(v > 0, "perplexity probe against an EMPTY count store — " +
      "fold at least one night of bigramCountsOf first")
    bigramsOf(batch)
      .join(cnt.hint("shuffle_hash"), Seq("w1", "w2"), "left")
      .join(uni.hint("shuffle_hash"), Seq("w1"), "left")
      .select(col("doc_id"),
        log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) + lit(v)).cast("double"))
          .cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(18, 6)).as("lp"))
      .groupBy(col("doc_id"))
      .agg((sum(col("lp")).cast("double") / count(lit(1))).as("avg_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  /** `perplexity_incremental`: the LM counts as a persisted nightly
    * fold — two tagged count drops land in a (w1, w2)-keyed
    * PointStore (sums re-sum, so night boundaries are invisible), and
    * the held-out batch scores against the MERGED store state via
    * [[perplexityProbeAgainst]]. The oracle recomputes the counts
    * one-shot from the same historical slice, so a hash match proves
    * the fold + probe land on the exact same smoothed scores. */
  def perplexityIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val dir = graft.operators.DedupIndex.freshRunDir("graft_ppl_", d)
    val store = new graft.sources.PointStore(s, dir.getPath,
      keys = Seq("w1", "w2"), sums = Seq("c2"), maxes = Nil)
    store.appendTagged("n1", bigramCountsOf(hist.filter(col("doc_id") % 2 === 1)))
    store.appendTagged("n2", bigramCountsOf(hist.filter(col("doc_id") % 2 =!= 1)))
    store.appendTagged("n2", bigramCountsOf(hist.filter(col("doc_id") % 2 =!= 1)))
    perplexityProbeAgainst(store.snapshot,
      docs.filter(col("doc_id") % 5 === 0))
  }

  def perplexityIncrementalOracle: String = s"""
    WITH t AS (
      SELECT doc_id,
        string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w
      FROM documents),
    i AS (SELECT doc_id, w, unnest(range(1, len(w))) AS k FROM t),
    b AS (SELECT doc_id, w[CAST(k AS INT)] AS w1,
                 w[CAST(k AS INT) + 1] AS w2 FROM i),
    hist AS (SELECT * FROM b WHERE doc_id % 5 <> 0),
    big AS (SELECT w1, w2, count(*) AS c2 FROM hist GROUP BY 1, 2),
    uni AS (SELECT w1, count(*) AS c1 FROM hist GROUP BY 1),
    vv AS (SELECT count(DISTINCT w1) AS v FROM hist),
    batch AS (SELECT * FROM b WHERE doc_id % 5 = 0)
    SELECT batch.doc_id,
      CAST(sum(CAST(ln((coalesce(c2, 0) + 1.0) / (coalesce(c1, 0) + v))
        AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_logprob,
      count(*) AS n_bigrams
    FROM batch
    LEFT JOIN big USING (w1, w2)
    LEFT JOIN uni USING (w1), vv
    GROUP BY 1"""

  def docPerplexityOracle: String = s"""
    WITH t AS (
      SELECT doc_id,
        string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w
      FROM documents),
    i AS (SELECT doc_id, w, unnest(range(1, len(w))) AS k FROM t),
    b AS (SELECT doc_id, w[CAST(k AS INT)] AS w1,
                 w[CAST(k AS INT) + 1] AS w2 FROM i),
    big AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
    uni AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
    vv AS (SELECT count(DISTINCT w1) AS v FROM b)
    SELECT b.doc_id,
      CAST(sum(CAST(ln((c2 + 1.0) / (c1 + v)) AS DECIMAL(18,6))) AS DOUBLE)
        / count(*) AS avg_logprob,
      count(*) AS n_bigrams
    FROM b JOIN big USING (w1, w2) JOIN uni USING (w1), vv
    GROUP BY 1"""

  // ------------------------------------------------------------ trigram LM

  /** The stupid-backoff context penalty (Brants et al. 2007, "Large
    * Language Models in Machine Translation": S(w|context) backs off
    * to 0.4·S(w|shorter context) when the longer context was never
    * seen). 0.4² is written as the literal 0.16 on BOTH engines — the
    * runtime product 0.4*0.4 is not the double closest to 0.16, and
    * the two engines must compute bit-identical ratios before the
    * decimal round. */
  val BackoffAlpha = 0.4
  private val BackoffAlpha2 = 0.16

  /** Instance-grain trigrams of a (doc_id, text) frame — the order-3
    * twin of [[bigramsOf]]. */
  private def trigramsOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
    val n2 = greatest(size(col("w")) - 2, lit(0))
    toks
      .withColumn("w1s", slice(col("w"), lit(1), n2))
      .withColumn("w2s", slice(col("w"), lit(2), n2))
      .withColumn("w3s", slice(col("w"), lit(3), n2))
      .select(col("doc_id"),
        explode(arrays_zip(col("w1s"), col("w2s"), col("w3s"))).as("p"))
      .select(col("doc_id"), col("p.w1s").as("w1"), col("p.w2s").as("w2"),
        col("p.w3s").as("w3"))
  }

  /** Corpus trigram counts at (w1, w2, w3) grain — the SINGLE additive
    * partial the trigram LM persists (a (w1,w2,w3)-keyed
    * [[graft.sources.PointStore]] with one `c3` sum). Every lower
    * order DERIVES from it by marginalizing: prefix counts
    * `c12 = Σ c3 by (w1,w2)`, the backoff bigram `c23 = Σ c3 by
    * (w2,w3)` over its context `c2 = Σ c3 by w2`, the unigram floor
    * `cu = Σ c3 by w3` over `N = Σ c3`, and the vocabulary
    * `V = |distinct w3|` — so the whole backoff chain is maintained at
    * O(delta) per night by one count fold, the bigram store's design
    * one order up. (Marginals are interior-position counts — a
    * document's first two and last two tokens weight differently than
    * raw n-gram counts would — uniformly on both engines and both
    * faces, so the estimator is self-consistent.) */
  def trigramCountsOf(docs: DataFrame): DataFrame =
    trigramsOf(docs).groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3"))

  /** Per-doc mean log-score of `tri` instances against the scored
    * distinct-trigram table — the flat (w1,w2,w3) equi-join + decimal
    * sum every trigram face ends with. */
  private def trigramDocMean(tri: DataFrame, scored: DataFrame): DataFrame =
    tri.join(scored.hint("shuffle_hash"), Seq("w1", "w2", "w3"))
      .groupBy(col("doc_id"))
      .agg((sum(col("lp")).cast("double") / count(lit(1))).as("avg_logprob"),
        count(lit(1)).as("n_trigrams"))

  /** One-shot self-scored trigram LM surprisal — [[perplexityOf]] one
    * order up: per doc, the mean add-one log-score
    * `ln((c3+1)/(c12+V))` of its trigrams against the corpus's OWN
    * counts. Self-scoring never meets an unseen context (every
    * instance trigram's prefix is in the table by construction), so
    * the backoff chain compiles to nothing here — the one-shot plan
    * derives ONLY the prefix marginal and skips the three backoff
    * marginals the probe face needs (the 100 TB reason the two faces
    * don't share one scorer). Why not pure stupid backoff for the
    * self-scored face: MLE c3/c12 scores every singleton trigram with
    * a singleton prefix at ln(1) = 0 — gibberish would outscore
    * common text. Add-one within the seen context keeps the
    * gibberish-scores-lower contract; the 0.4 penalty only ever
    * applies where a context is genuinely absent (the probe face).
    * Same discipline as the bigram family: the aggregated count frame
    * is pinned behind its exchange, V rides as one driver-collected
    * long, and per-trigram log-probs round to DECIMAL(18,6) BEFORE
    * the per-doc sum. */
  def perplexityTrigramOf(docs: DataFrame): DataFrame = {
    val tri = trigramsOf(docs)
    val trig = tri.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3"))
      .localCheckpoint()
    val v = trig.select(col("w3")).distinct().count()
    val c12 = trig.groupBy(col("w1"), col("w2")).agg(sum(col("c3")).as("c12"))
    val scored = trig
      .join(c12.hint("shuffle_hash"), Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"),
        log((col("c3") + 1).cast("double") /
            (col("c12") + lit(v)).cast("double"))
          .cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(18, 6)).as("lp"))
    trigramDocMean(tri, scored)
  }

  /** `doc_perplexity_trigram` over the documents table. */
  def docPerplexityTrigram(s: SparkSession, d: String): DataFrame =
    perplexityTrigramOf(documents(s, d))

  /** Score a BATCH against stored trigram counts with the FULL
    * backoff chain — the total estimator:
    *
    *   - context (w1,w2) seen:  `ln((c3+1) / (c12+V))`   (add-one)
    *   - else w2 seen:          `ln(0.4·(c23+1) / (c2+V))`
    *   - else:                  `ln(0.16·(cu+1) / (N+V))`
    *
    * Backoff triggers on an unseen CONTEXT (the stupid-backoff rule);
    * an unseen continuation within a seen context takes the add-one
    * mass instead, which keeps every level a proper total estimator
    * (pure stupid backoff assigns score 0 there and the chain would
    * need renormalizing). All marginals derive from the one count
    * store at distinct grain — hub middle-words cost their distinct
    * continuations, never their instances — and the scored table
    * joins instances on the flat (w1,w2,w3) key. */
  def perplexityTrigramProbeAgainst(counts: DataFrame,
                                    batch: DataFrame): DataFrame = {
    // pin the count frame ONCE (localCheckpoint): the store snapshot
    // behind `counts` is a merge-on-read member scan + fold that SIX
    // consumers would otherwise each re-execute (the N/V driver agg,
    // the four marginals, and the base scoring join) — at a
    // corpus-scale trigram store that is 5× avoidable scan+fold
    val cnt = counts.localCheckpoint()
    val r = cnt.agg(sum(col("c3")).as("n"),
      count_distinct(col("w3")).as("v")).head
    require(!r.isNullAt(0) && r.getLong(1) > 0,
      "trigram probe against an EMPTY count store — " +
        "fold at least one night of trigramCountsOf first")
    val (n, v) = (r.getLong(0), r.getLong(1))
    val c12 = cnt.groupBy(col("w1"), col("w2")).agg(sum(col("c3")).as("c12"))
    val c23 = cnt.groupBy(col("w2"), col("w3")).agg(sum(col("c3")).as("c23"))
    val c2 = cnt.groupBy(col("w2")).agg(sum(col("c3")).as("c2"))
    val cu = cnt.groupBy(col("w3")).agg(sum(col("c3")).as("cu"))
    val tri = trigramsOf(batch)
    val scored = tri.select(col("w1"), col("w2"), col("w3")).distinct()
      .join(cnt.hint("shuffle_hash"), Seq("w1", "w2", "w3"), "left")
      .join(c12.hint("shuffle_hash"), Seq("w1", "w2"), "left")
      .join(c23.hint("shuffle_hash"), Seq("w2", "w3"), "left")
      .join(c2.hint("shuffle_hash"), Seq("w2"), "left")
      .join(cu.hint("shuffle_hash"), Seq("w3"), "left")
      .select(col("w1"), col("w2"), col("w3"),
        when(col("c12").isNotNull,
          log((coalesce(col("c3"), lit(0L)) + 1).cast("double") /
              (col("c12") + lit(v)).cast("double")))
        .when(col("c2").isNotNull,
          log(lit(BackoffAlpha) *
              (coalesce(col("c23"), lit(0L)) + 1).cast("double") /
              (col("c2") + lit(v)).cast("double")))
        .otherwise(
          log(lit(BackoffAlpha2) *
              (coalesce(col("cu"), lit(0L)) + 1).cast("double") /
              lit((n + v).toDouble)))
          .cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(18, 6)).as("lp"))
    trigramDocMean(tri, scored)
  }

  /** `perplexity_trigram_incremental`: the trigram LM state as a
    * persisted nightly fold — [[perplexityIncremental]] one order up:
    * two tagged count drops (plus a redelivered no-op) land in the
    * (w1,w2,w3)-keyed PointStore and the held-out batch scores
    * against the merged state through the full backoff chain. The
    * oracle recomputes the counts one-shot from the same historical
    * slice with the same CASE chain, so a hash match proves fold +
    * derivation + backoff land on the exact smoothed scores. */
  def perplexityTrigramIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val dir = graft.operators.DedupIndex.freshRunDir("graft_ppl3_", d)
    val store = new graft.sources.PointStore(s, dir.getPath,
      keys = Seq("w1", "w2", "w3"), sums = Seq("c3"), maxes = Nil)
    store.appendTagged("n1", trigramCountsOf(hist.filter(col("doc_id") % 2 === 1)))
    store.appendTagged("n2", trigramCountsOf(hist.filter(col("doc_id") % 2 =!= 1)))
    store.appendTagged("n2", trigramCountsOf(hist.filter(col("doc_id") % 2 =!= 1)))
    perplexityTrigramProbeAgainst(store.snapshot,
      docs.filter(col("doc_id") % 5 === 0))
  }

  private def trigramSqlFrames: String = s"""
    WITH t AS (
      SELECT doc_id,
        string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w
      FROM documents),
    i AS (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS k FROM t),
    tr AS (SELECT doc_id, w[CAST(k AS INT)] AS w1,
                  w[CAST(k AS INT) + 1] AS w2,
                  w[CAST(k AS INT) + 2] AS w3 FROM i)"""

  def docPerplexityTrigramOracle: String = s"""$trigramSqlFrames,
    trig AS (SELECT w1, w2, w3, count(*) AS c3 FROM tr GROUP BY 1, 2, 3),
    p12 AS (SELECT w1, w2, sum(c3) AS c12 FROM trig GROUP BY 1, 2),
    vv AS (SELECT count(DISTINCT w3) AS v FROM trig)
    SELECT tr.doc_id,
      CAST(sum(CAST(ln((c3 + 1.0) / (c12 + v)) AS DECIMAL(18,6))) AS DOUBLE)
        / count(*) AS avg_logprob,
      count(*) AS n_trigrams
    FROM tr JOIN trig USING (w1, w2, w3) JOIN p12 USING (w1, w2), vv
    GROUP BY 1"""

  def perplexityTrigramIncrementalOracle: String = s"""$trigramSqlFrames,
    hist AS (SELECT * FROM tr WHERE doc_id % 5 <> 0),
    trig AS (SELECT w1, w2, w3, count(*) AS c3 FROM hist GROUP BY 1, 2, 3),
    p12 AS (SELECT w1, w2, sum(c3) AS c12 FROM trig GROUP BY 1, 2),
    p23 AS (SELECT w2, w3, sum(c3) AS c23 FROM trig GROUP BY 1, 2),
    p2 AS (SELECT w2, sum(c3) AS c2 FROM trig GROUP BY 1),
    pu AS (SELECT w3, sum(c3) AS cu FROM trig GROUP BY 1),
    nv AS (SELECT CAST(sum(c3) + count(DISTINCT w3) AS DOUBLE) AS nv,
                  count(DISTINCT w3) AS v FROM trig),
    batch AS (SELECT * FROM tr WHERE doc_id % 5 = 0)
    SELECT batch.doc_id,
      CAST(sum(CAST(CASE
        WHEN c12 IS NOT NULL
          THEN ln((coalesce(c3, 0) + 1.0) / (c12 + v))
        WHEN c2 IS NOT NULL
          THEN ln(${BackoffAlpha} * (coalesce(c23, 0) + 1.0) / (c2 + v))
        ELSE ln(${BackoffAlpha2} * (coalesce(cu, 0) + 1.0) / nv)
      END AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_logprob,
      count(*) AS n_trigrams
    FROM batch
    LEFT JOIN trig USING (w1, w2, w3)
    LEFT JOIN p12 USING (w1, w2)
    LEFT JOIN p23 USING (w2, w3)
    LEFT JOIN p2 USING (w2)
    LEFT JOIN pu USING (w3), nv
    GROUP BY 1"""

  // ------------------------------------------------------------ freq_tokens

  /** Sketch capacity for the registered query — far above the corpus's
    * distinct-token cardinality (31 at every SF), so the SpaceSaving
    * sketch runs in its EXACT regime and the plain GROUP BY oracle
    * hash-match proves the sketch machinery (update, partial buffers,
    * merge tree) is count-preserving. The approximate regime (k below
    * cardinality) is bound-checked in SketchSpec. */
  val SketchK = 256

  /** Corpus-wide top-20 token frequencies via the mergeable SpaceSaving
    * heavy-hitters aggregate ([[graft.functions.TopKFreq]]): partials cap
    * state at k counters, only k-entry buffers cross the exchange — the
    * 100 TB shape where an exact GROUP BY would shuffle the whole token
    * universe. Ties break on token, so LIMIT is deterministic. */
  def freqTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(Dedup.tokens(col("text"))).as("token"))
      .agg(graft.functions.SketchOps.topkFreq(col("token"), SketchK).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("token"), col("e.count").as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  def freqTokensOracle: String = raw"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+')) AS token
      FROM documents),
    c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1)
    SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 20"""

  // -------------------------------------------------------- trending_by_lang

  /** Top-5 tokens per language via the GROUPED sketch: one SpaceSaving
    * buffer per lang, and because the sketch's eval order IS
    * (count desc, token asc), `posexplode` yields the per-group ranking
    * directly — no count table, no window shuffle, no WindowGroupLimit
    * pass over the token universe. At 100 TB the only thing that crosses
    * the exchange is one k-entry buffer per language. Exact regime
    * (k ≫ per-lang cardinality), so the plain windowed GROUP BY oracle
    * hash-matches. */
  def trendingByLang(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy(col("lang"))
      .agg(graft.functions.SketchOps.topkFreq(col("token"), SketchK).as("tk"))
      .select(col("lang"), posexplode(col("tk")).as(Seq("pos", "e")))
      .filter(col("pos") < 5)
      .select(col("lang"), col("e.item").as("token"), col("e.count").as("cnt"),
        (col("pos") + 1).cast("long").as("rn"))

  def trendingByLangOracle: String = raw"""
    WITH toks AS (
      SELECT lang, unnest(string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+')) AS token
      FROM documents),
    c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
          FROM toks GROUP BY 1, 2),
    r AS (SELECT lang, token, cnt,
            row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rn
          FROM c)
    SELECT lang, token, cnt, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5"""

  // ---------------------------------------------------- trending_incremental

  /** "Top tokens per language, corpus-wide, updated nightly": the
    * heavy-hitters counterpart of `distinct_incremental` /
    * `quantiles_incremental`, through a PERSISTED [[PointStore]] `topks`
    * measure rather than an in-plan fold — the last sketch in the trio
    * to land in an LSM point table (reference analog: the ON DUPLICATE
    * KEY fold, crunch_global.sql:58-75, applied to a ranking). Three
    * tagged nightly batches upsert per-lang SpaceSaving sketches
    * (each night's partial is that night's O(delta) work), a compaction
    * folds the first two with `graft_topk_merge`, an at-least-once
    * redelivery must commit nothing, and the merge-on-read snapshot is
    * read back through `graft_topk_read` — whose (count desc, item asc)
    * eval order makes `posexplode` the per-group ranking. Exact regime
    * (k=[[SketchK]] ≫ per-lang token cardinality at every driver SF, so
    * no eviction happens in any night's partial and the mergeable-
    * summaries fold is plain count addition): sharing
    * [[trendingByLangOracle]] proves the nightly fold — through real
    * parquet round-trips, the compaction, and the redelivery — lands on
    * the identical ranking a one-shot windowed GROUP BY computes. At
    * 100 TB each night folds k-entry buffers per language, and the
    * corpus-wide ranking is maintained without ever re-tokenizing the
    * corpus. */
  def trendingIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchOps
    // per-JVM token + run counter + exit reaping: two concurrent
    // sessions on the same dataset never clobber each other's live store
    val dir = DedupIndex.freshRunDir("graft_pointstore_tk_", d)
    val store = new graft.sources.PointStore(s, dir.getPath,
      keys = Seq("lang"), sums = Nil, maxes = Nil,
      topks = Seq("toptok"))
    val docs = documents(s, d)
    // the exact-regime assumption (per-lang distinct token cardinality
    // < SketchK in EVERY night's partial — the premise of sharing the
    // windowed-GROUP-BY oracle) is asserted in-plan: past the threshold
    // SpaceSaving eviction starts and the folded ranking may lawfully
    // diverge from the one-shot oracle, so the failure must name the
    // cause, not surface as an opaque hash mismatch at a larger SF. The
    // countDistinct rides the same per-lang agg (an Expand, priced
    // O(night tokens) — the scan the sketch already pays).
    def batch(m: Int) =
      docs.filter(col("doc_id") % 3 === m)
        .select(col("lang"), explode(Dedup.tokens(col("text"))).as("token"))
        .groupBy(col("lang"))
        .agg(SketchOps.topkSketch(col("token"), SketchK).as("toptok"),
          countDistinct(col("token")).as("_card"))
        .select(col("lang"),
          when(col("_card") >= SketchK, raise_error(concat(
            lit("trending_incremental exact-regime assumption violated: "),
            lit("per-lang distinct token cardinality "), col("_card"),
            lit(s" >= SketchK=$SketchK for lang '"), col("lang"),
            lit("' — eviction would begin and the folded ranking may " +
              "diverge from the one-shot oracle; raise SketchK above " +
              "the per-lang vocabulary or accept approximate ranking"))))
            .otherwise(col("toptok")).as("toptok"))
    store.appendTagged("b0", batch(0))
    store.appendTagged("b1", batch(1))
    store.compact()
    store.appendTagged("b2", batch(2))
    store.appendTagged("b2", batch(2)) // at-least-once redelivery: no-op
    store.snapshot
      .select(col("lang"),
        posexplode(SketchOps.topkRead(col("toptok"))).as(Seq("pos", "e")))
      .filter(col("pos") < 5)
      .select(col("lang"), col("e.item").as("token"), col("e.count").as("cnt"),
        (col("pos") + 1).cast("long").as("rn"))
  }

  def trendingIncrementalOracle: String = trendingByLangOracle

  // --------------------------------------------------------- distinct_by_lang

  /** Sketch shape for the registered distinct-count queries: p=14 → the
    * dense regime caps state at 16 KiB registers per group, whatever the
    * corpus; sparseCap 2¹⁶ keeps BOTH registered queries in the sketch's
    * EXACT sparse regime at every driver SF (max per-lang distinct
    * 3-shingle cardinality measured 26.5k at sf0.1), so the
    * `count(DISTINCT …)` DuckDB oracle hash-match proves the machinery —
    * rehash, partial buffers, merge tree, serialization — is
    * count-preserving, the [[SketchK]] exact-regime trick. The dense
    * regime (accuracy ~1.04/√2¹⁴ ≈ 0.8%) is SketchSpec-bound. */
  val DistinctP = 14
  val DistinctSparseCap = 1 << 16

  /** (night, lang, shingle-hash) postings from ONE run of the engine's
    * shingle kernel, the group keys carried through the typed map — the
    * group-by below needs no posting-grain join back to documents. */
  private def nightLangShingles(docs: DataFrame, cut: Long): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_id"))
      .map { case (id, lang, text) =>
        (if (id <= cut) 0 else 1, lang,
          Dedup.hashShingleWindows(text, Curation.DecontamN)) }
      .toDF("night", "lang", "hs")
      .select(col("night"), col("lang"), explode(col("hs")).as("shingle"))
  }

  /** (lang, shingle-hash) postings — the [[nightLangShingles]] kernel
    * without the night split (shared with `point_store_sketch`'s batch
    * partials). */
  private[graft] def langShingles(docs: DataFrame): DataFrame =
    nightLangShingles(docs, Long.MaxValue).drop("night")

  /** Per-language distinct-shingle cardinality (vocabulary size — the
    * corpus-health metric a training mix is balanced against) via the
    * mergeable [[graft.functions.DistinctSketch]]: partials cap state at
    * one sketch per (partition, lang), so past the kernel's
    * parallelism-barrier exchange (the [[Dedup.kernelSource]]
    * discipline — the compute-bound shingle map must not serialize on a
    * single-split input; a many-split 100 TB scan wouldn't need it)
    * only sketch buffers move — an exact count(DISTINCT) would shuffle
    * the whole posting table (the shingle universe is
    * corpus-proportional: ~2.5M distinct at sf0.1, growing with every
    * crawl). */
  def distinctByLang(s: SparkSession, d: String): DataFrame =
    nightLangShingles(documents(s, d), Long.MaxValue)
      .groupBy(col("lang"))
      .agg(graft.functions.SketchOps.distinctSketch(col("shingle"),
        DistinctP, DistinctSparseCap).as("sk"))
      .select(col("lang"),
        graft.functions.SketchOps.sketchEst(col("sk")).as("n_shingles"))
      .orderBy(col("lang"))

  def distinctByLangOracle: String = s"""
    WITH ${Dedup.shingleSqlCte(Curation.DecontamN, carry = Seq("lang"))}
    SELECT lang, CAST(count(DISTINCT shingle) AS BIGINT) AS n_shingles
    FROM sh GROUP BY 1 ORDER BY 1"""

  // ----------------------------------------------------- distinct_incremental

  /** The persisted-fold shape for a NON-additive measure: per-night
    * per-lang sketches (the rows a nightly pipeline would land in
    * parquet next to its PointStore point tables), folded to the lang
    * grain with `graft_sketch_merge`. Landing on the same
    * count(DISTINCT) oracle as [[distinctByLang]] proves the
    * night-over-night merge is union-exact — "sketch night A, sketch
    * night B, merge" ≡ "sketch A∪B", the [[Merge.upsertMerge]] additive
    * contract extended to cardinality. At 100 TB the inner agg is what
    * each night computes over its delta alone; the outer fold moves
    * k-byte buffers, never postings. */
  def distinctIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    nightLangShingles(docs, cut)
      .groupBy(col("night"), col("lang"))
      .agg(graft.functions.SketchOps.distinctSketch(col("shingle"),
        DistinctP, DistinctSparseCap).as("sk"))
      .groupBy(col("lang"))
      .agg(graft.functions.SketchOps.sketchMerge(col("sk")).as("sk"))
      .select(col("lang"),
        graft.functions.SketchOps.sketchEst(col("sk")).as("n_shingles"))
      .orderBy(col("lang"))
  }

  def distinctIncrementalOracle: String = distinctByLangOracle

  // --------------------------------------------------------- quantiles_by_lang

  /** Capacity for the registered quantile queries: 4096 ≥ the largest
    * per-lang document count at any driver SF (en = 2059 at sf0.1), so
    * both queries run in the sketch's EXACT regime — the full sorted
    * multiset — and the `quantile_disc` DuckDB oracle hash-matches
    * (estimator rule matched to DuckDB's). The compacted regime is
    * QuantileSketchSpec-bound. */
  val QuantileK = 4096

  private[graft] val QuantilePoints =
    Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.95 -> "p95")

  private[operators] def quantileCols(sk: Column): Seq[Column] =
    QuantilePoints.map { case (q, n) =>
      graft.functions.SketchOps.quantileAt(sk, q).as(n) }

  /** Per-language token-count distribution (p25/p50/p75/p95 of document
    * length — the corpus-shape metric behind chunking and packing
    * budgets) via the mergeable [[graft.functions.QuantileSketch]]:
    * partials compact map-side, only k-scale buffers cross the
    * exchange — an exact percentile would sort the corpus per group. */
  def quantilesByLang(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), size(Dedup.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("lang"))
      .agg(graft.functions.SketchOps.quantileSketch(col("nt"), QuantileK).as("sk"))
      .select(col("lang") +: quantileCols(col("sk")): _*)
      .orderBy(col("lang"))

  def quantilesByLangOracle: String = s"""
    WITH t AS (
      SELECT lang,
        CAST(len(string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+')) AS BIGINT) AS nt
      FROM documents)
    SELECT lang,
      quantile_disc(nt, 0.25) AS p25, quantile_disc(nt, 0.5) AS p50,
      quantile_disc(nt, 0.75) AS p75, quantile_disc(nt, 0.95) AS p95
    FROM t GROUP BY 1 ORDER BY 1"""

  /** The persisted-fold shape for ORDER STATISTICS: per-night per-lang
    * quantile sketches folded to the lang grain with
    * `graft_quantile_merge` — landing on the same quantile_disc oracle
    * as [[quantilesByLang]] proves the night-over-night merge preserves
    * the full multiset in the exact regime (and stays bounded-error
    * past it). */
  def quantilesIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    docs
      .select(col("lang"),
        when(col("doc_id") <= cut, 0).otherwise(1).as("night"),
        size(Dedup.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("night"), col("lang"))
      .agg(graft.functions.SketchOps.quantileSketch(col("nt"), QuantileK).as("sk"))
      .groupBy(col("lang"))
      .agg(graft.functions.SketchOps.quantileMerge(col("sk")).as("sk"))
      .select(col("lang") +: quantileCols(col("sk")): _*)
      .orderBy(col("lang"))
  }

  def quantilesIncrementalOracle: String = quantilesByLangOracle

  // --------------------------------------------------------- chunk_documents

  /** Context-window chunking: [[ChunkTokens]]-token chunks every
    * [[ChunkStride]] tokens, so consecutive chunks share
    * ChunkTokens−ChunkStride tokens of overlap (the RAG / training-prep
    * shape — a fact straddling a boundary appears whole in the next
    * chunk). Sized so the driver corpus genuinely multi-chunks. */
  val ChunkTokens = 32
  val ChunkStride = 24

  /** One row per (doc, chunk): id, token count, text. A doc with
    * n ≤ ChunkTokens tokens is its own single chunk; otherwise
    * ceil((n−ChunkTokens)/ChunkStride)+1 chunks, the last one short but
    * never empty. Pure row expansion — tokenize once (materialized
    * behind the repartition barrier, the HOF-CSE discipline), explode a
    * sequence of chunk ids, slice the token array per chunk. No joins,
    * no aggregation: a 100 TB corpus chunks at scan speed with the only
    * shuffle being the parallelism barrier. */
  def chunkDocuments(s: SparkSession, d: String): DataFrame =
    chunkDocumentsOf(documents(s, d))

  /** The operator over an arbitrary (doc_id, text) frame — what the
    * registered query runs and what PropertySpec drives at arbitrary
    * lengths. */
  def chunkDocumentsOf(docs: DataFrame): DataFrame = {
    val nChunks = when(col("n") <= ChunkTokens, lit(1))
      .otherwise(((col("n") - ChunkTokens + ChunkStride - 1) / ChunkStride)
        .cast("int") + 1)
    docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .repartition(col("doc_id")) // token-array barrier (see Dedup.shingles)
      .select(col("doc_id"), col("w"), size(col("w")).as("n"))
      .select(col("doc_id"), col("w"), col("n"),
        explode(sequence(lit(0), nChunks - 1)).as("k"))
      .select(
        col("doc_id"),
        col("k").cast("long").as("chunk_id"),
        least(lit(ChunkTokens), col("n") - col("k") * ChunkStride)
          .cast("long").as("n_tokens"),
        array_join(slice(col("w"), col("k") * ChunkStride + 1, lit(ChunkTokens)), " ")
          .as("chunk_text"))
  }

  def chunkDocumentsOracle: String = raw"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w
      FROM documents),
    c AS (
      SELECT doc_id, w, len(w) AS n,
             CASE WHEN len(w) <= $ChunkTokens THEN 1
                  ELSE CAST(ceil((len(w) - $ChunkTokens) / $ChunkStride.0) AS BIGINT) + 1
             END AS nc
      FROM toks),
    k AS (SELECT doc_id, w, n, unnest(range(nc)) AS chunk_id FROM c)
    SELECT doc_id, chunk_id,
           CAST(LEAST($ChunkTokens, n - chunk_id * $ChunkStride) AS BIGINT) AS n_tokens,
           array_to_string(
             w[chunk_id*$ChunkStride + 1 : chunk_id*$ChunkStride + $ChunkTokens],
             ' ') AS chunk_text
    FROM k"""
}

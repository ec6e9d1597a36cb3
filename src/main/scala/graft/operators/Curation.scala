package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingest and packing: benchmark decontamination, repetition
  * filtering (the Gopher/MassiveText quality rules), and PII / blocklist
  * scrubbing. All three are scan-shaped — per-row projections plus at most
  * one doc-keyed aggregation — so a 100 TB corpus pass runs at parquet-read
  * speed:
  *
  *  - `decontaminate` joins the corpus's exploded n-grams against the
  *    benchmark n-gram set with a SHUFFLED hash join on the shingle key —
  *    the same rule the fuzzy screen states (nothing corpus-proportional
  *    is ever a broadcast side, test data included), because the stand-in
  *    benchmark slice here is a fixed fraction of the corpus. A REAL eval
  *    suite is metadata-sized and flips this to a broadcast (one hint),
  *    which un-shuffles the corpus side entirely.
  *  - `doc_repetition` needs per-(doc, gram) counts, which the in-row
  *    higher-order form can't express without O(len²) work; the
  *    explode → two-level hash agg shape keeps it O(len) with map-side
  *    combine, and both levels shuffle only (doc_id[, gram]) keyed rows.
  *  - `pii_scrub` is a pure projection (regexp_replace / regexp_extract_all
  *    inside whole-stage codegen), zero shuffles.
  */
object Curation {

  // --------------------------------------------------------- decontaminate

  /** Benchmark docs are the deterministic doc_id % [[BenchMod]] == 0 slice
    * (standing in for an external eval-suite upload); everything else is
    * the training corpus to be screened. */
  val BenchMod   = 97
  val DecontamN  = 3

  /** Benchmark n-gram decontamination (the GPT-3 appendix-C / PaLM
    * eval-overlap check): flag every corpus document sharing at least one
    * word [[DecontamN]]-gram with the benchmark set. Output is one row per
    * corpus doc — `n_hits` distinct contaminated shingles and the
    * keep/drop `contaminated` flag downstream sampling uses. */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs   = documents(s, d)
    val bench  = Dedup.shingles(docs.filter(col("doc_id") % BenchMod === 0), DecontamN)
      .select(col("shingle")).distinct()
    val corpus = docs.filter(col("doc_id") % BenchMod =!= 0)
    verdictsOf(corpus, Dedup.shingles(corpus, DecontamN), bench)
  }

  /** The shared tail of the exact screens: count each corpus doc's
    * shingle hits against the benchmark set, left-join the verdict back
    * onto the corpus. The bench join is shuffle, not broadcast: the
    * % BenchMod slice is corpus-proportional, so it falls under the
    * fuzzy screen's rule — a genuinely metadata-sized suite would
    * broadcast here instead. `hits` is DOC-grain (every contaminated
    * doc) — not metadata-sized in the adversarial case, so the verdict
    * join shuffles too; the corpus side there is 8-byte doc_id rows. */
  private def verdictsOf(corpus: DataFrame, corpusShingles: DataFrame,
                         bench: DataFrame): DataFrame = {
    val hits = corpusShingles
      .join(bench.hint("shuffle_hash"), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    corpus.select(col("doc_id"))
      .join(hits.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** [[decontaminate]]'s verdicts over a PREBUILT hashed posting table
    * covering ALL docs (bench slice included) — the shared-scan entry
    * for [[Pipeline.pipelineCurate]]. The standalone operator keeps its
    * string-shingle path (its oracle hash-compares exact n_hits);
    * here only the boolean matters downstream and hashed keys join
    * identically (collisions are the family's accepted ~k²/2⁶⁵). */
  private[graft] def decontamVerdicts(corpus: DataFrame,
      sh: DataFrame): DataFrame = {
    val bench = sh.filter(col("doc_id") % BenchMod === 0)
      .select(col("shingle")).distinct()
    verdictsOf(corpus, sh.filter(col("doc_id") % BenchMod =!= 0), bench)
  }

  def decontaminateOracle: String = s"""
    WITH ${Dedup.shingleSqlCte(DecontamN)},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % $BenchMod = 0),
    hits AS (
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM sh s JOIN bench b USING (shingle)
      WHERE s.doc_id % $BenchMod <> 0
      GROUP BY 1)
    SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.n_hits, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % $BenchMod <> 0"""

  /** Target false-positive rate for the bloom screen's filter, and the
    * hard cap on its collected size (64 MB of bits ≈ 60M suite shingles
    * at 1% FP — far beyond any real eval suite, far below corpus
    * scale). */
  val BloomFpp      = 0.01
  val MaxBloomBytes = 64L << 20

  /** The bloom-pruned exact screen — same verdicts as [[decontaminate]],
    * different place for the non-matches to die. The shuffled screen
    * ships EVERY corpus shingle through the exchange to learn that ~99%
    * of them hit nothing; here the benchmark set is summarized into a
    * fixed-budget bloom filter ([[graft.functions.BloomAgg]], sized for
    * [[BloomFpp]]) held as driver metadata, and each corpus shingle is
    * screened by a codegen'd [[graft.functions.BloomMightContain]] AT
    * SCAN SPEED — only bloom survivors (true hits + ~1% false
    * positives) reach the shuffle, where the exact equi-join against
    * the benchmark set kills the false positives. No false negatives,
    * so the result is EXACTLY [[decontaminate]]'s and shares its
    * oracle.
    *
    * Unlike the streaming screen's driver SET (whose size is the suite
    * cardinality), the bloom's budget is chosen, not inherited — but it
    * still summarizes the suite, so the same metadata-size contract is
    * ENFORCED: sizing for a corpus-scale set trips [[MaxBloomBytes]]
    * loudly, and that workload belongs on the shuffled screen. */
  def decontaminateBloom(s: SparkSession, d: String): DataFrame = {
    val docs   = documents(s, d)
    // the size-guard requires below are a DESIGNED exit (corpus-scale
    // suite → use the shuffled screen) — the scope releases the bench
    // cache on that throw, on any failed job, and on success
    Dedup.stagedScope { scratch =>
      // the bench pipeline feeds THREE consumers (sizing count, bloom
      // aggregate, exact-verify join) — stage it once, like the fuzzy
      // screen's posting scratch, instead of re-tokenizing per consumer
      val bench  = scratch.pin(
        Dedup.shingles(docs.filter(col("doc_id") % BenchMod === 0), DecontamN)
          .select(col("shingle")).distinct())
      val corpus = docs.filter(col("doc_id") % BenchMod =!= 0)
      // size the filter from the suite's distinct-shingle count (a
      // metadata result; this count also materializes the staged frame),
      // then build it in one aggregate: partial bit-arrays OR together,
      // one filter reaches the driver regardless of suite size
      val nBench = bench.count()
      val (words, hashes) = graft.functions.Bloom.optimal(nBench, BloomFpp)
      require(words.toLong * 8 <= MaxBloomBytes,
        s"bloom for $nBench suite shingles needs ${words.toLong * 8} bytes " +
          s"(max $MaxBloomBytes): a set this large is corpus-scale — screen " +
          "it with the shuffled decontaminate join instead")
      val bloom = bench
        .agg(graft.functions.BloomOps.bloomAgg(xxhash64(col("shingle")), words, hashes))
        .head().getAs[Array[Byte]](0)
      val screened = Dedup.shingles(corpus, DecontamN)
        .filter(graft.functions.BloomOps.mightContain(xxhash64(col("shingle")), bloom))
      // verdictsOf's bench join is the exact verify that kills the FPs
      verdictsOf(corpus, screened, bench)
    }
  }

  /** Jaccard bar for the fuzzy screen — a corpus doc this similar to a
    * benchmark doc is contamination even with zero exact n-gram hits
    * preserved verbatim. */
  val FuzzyThreshold = 0.5

  /** The fuzzy screen's benchmark slice (doc_id % 7): a larger eval
    * suite than [[BenchMod]]'s so near-duplicate cross-pairs actually
    * exist at the test SFs — the screen's work, not just its plumbing,
    * is oracle-checked. */
  val FuzzyBenchMod = 7

  /** Fuzzy decontamination: corpus docs that are NEAR-duplicates of a
    * benchmark doc (word-3-shingle Jaccard ≥ [[FuzzyThreshold]]) — the
    * screen that catches paraphrased/reformatted eval material the exact
    * n-gram overlap of [[decontaminate]] misses. Candidates come from the
    * corpus LSH band table equi-joined (shuffled on the band key) against
    * the benchmark band index, then exact Jaccard verifies candidates
    * only — the dedup_minhash discipline pointed across two tables
    * instead of self-joined. */
  def decontaminateFuzzy(s: SparkSession, d: String): DataFrame = {
    val docs   = documents(s, d)
    val isBench = col("doc_id") % FuzzyBenchMod === 0
    // signatures come from the in-row kernel (no posting re-shuffle —
    // see Dedup.minhashSignaturesInRow). The SIGNATURE frame is the
    // staged scratch now (65 longs/doc — far smaller than the posting
    // table the pre-in-row version pinned): it feeds the bench and
    // corpus band branches, which sit on differently-filtered plans the
    // exchange reuse can't dedup — unpersisted, each branch would
    // re-run the tokenize + 64-hash kernel over the whole corpus. The
    // postings are consumed once (verify semi-join pins its own pruned
    // copy), so they are not persisted at all.
    val sig = Dedup.minhashSignaturesInRow(docs, DecontamN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the cache must not outlive a failed candidate/verify job — release
    // on ANY exit, like the bloom and boilerplate screens
    try {
      val bBands = Dedup.bandTable(sig.filter(isBench))
        .withColumnRenamed("doc_id", "bench_doc")
      // shuffle, not broadcast: a REAL eval suite is metadata-sized, but
      // this stand-in slice is corpus-proportional (doc_id % 7) — and the
      // repo's rule is that nothing corpus-proportional is ever a
      // broadcast side, test data included
      val cands = Dedup.bandTable(sig.filter(!isBench))
        .join(bBands.hint("shuffle_hash"), Seq("band", "bv"))
        .select(col("doc_id").as("a"), col("bench_doc").as("b"))
        .distinct()
      // verifyJaccardOf materializes its result before returning, so the
      // signature scratch can drop immediately after
      Dedup.verifyJaccardOf(cands, Dedup.hashedShingles(docs, DecontamN),
          FuzzyThreshold)
        .select(col("a").as("doc_id"), col("b").as("bench_doc"),
          col("jaccard"))
    } finally sig.unpersist(false)
  }

  /** Oracle = the EXACT cross-pair answer (corpus × benchmark at the
    * threshold): hash-matching proves the banded candidate generation
    * lost no pair. */
  def decontaminateFuzzyOracle: String = s"""
    WITH ${Dedup.shingleSqlCte(DecontamN)},
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      FROM sh x JOIN sh y ON x.shingle = y.shingle
      WHERE x.doc_id % $FuzzyBenchMod <> 0 AND y.doc_id % $FuzzyBenchMod = 0
      GROUP BY 1, 2)
    SELECT a AS doc_id, b AS bench_doc,
           CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
    FROM inter
    JOIN sz sa ON a = sa.doc_id
    JOIN sz sb ON b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= $FuzzyThreshold"""

  // ---------------------------------------------------- boilerplate_screen

  /** A shingle is boilerplate when it appears in at least
    * max([[BoilerplateMinDocsFloor]], ⌈corpus / [[BoilerplateDocDivisor]]⌉)
    * distinct docs; a doc whose shingle set is more than
    * [[BoilerplateMaxFrac]] boilerplate gets flagged. The threshold is
    * corpus-RELATIVE with a small-corpus floor: an absolute cutoff
    * saturates as the corpus grows (at 10× the test corpus every doc
    * crossed it — template echoes, not boilerplate), while a fixed
    * fraction of the corpus is scale-stable: real headers/footers track
    * corpus size, statistical shingle collisions don't. Integer
    * arithmetic ((n + divisor-1) / divisor) so Spark and the oracle
    * compute the identical threshold — a 0.005 double multiply rounds
    * differently than DuckDB's decimal literal at some corpus sizes. */
  val BoilerplateMinDocsFloor = 3
  val BoilerplateDocDivisor   = 200
  val BoilerplateMaxFrac      = 0.5

  def boilerplateMinDocs(nDocs: Long): Long =
    math.max(BoilerplateMinDocsFloor.toLong,
      (nDocs + BoilerplateDocDivisor - 1) / BoilerplateDocDivisor)

  /** Cross-document boilerplate screen (the C4/RefinedWeb dedup-of-
    * lines idea at shingle grain): find n-grams shared by ≥
    * [[BoilerplateMinDocs]] distinct docs, then flag docs dominated by
    * them — headers, footers, templated text that repetition rules
    * (intra-doc) and near-dup pairs (whole-doc) both miss. Counts run
    * on 64-bit HASHED shingles (the codegen kernel; per-doc counts and
    * document frequency are unchanged up to the xxhash collision odds
    * the string-shingle oracle already tolerates across the dedup
    * family) and the plan is two keyed shuffles: shingle-grain document
    * frequency (per-doc shingles are already distinct, so count(*) IS
    * the doc count), and ONE per-doc rollup — the boilerplate hits
    * come from a marked left join (count skips nulls), not a second
    * aggregation. The common-shingle set is corpus-derived, so its
    * join shuffles per the broadcast rule. */
  def boilerplateScreen(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    // one metadata action (parquet footer counts) sizes the relative
    // threshold — same pattern as the bloom screen's sizing count
    val minDocs = boilerplateMinDocs(docs.count())
    // one kernel pass feeds both consumers (document frequency + the
    // rollup) — pinned, released on ANY exit like the bloom screen
    Dedup.stagedScope { scratch =>
      val sh = scratch.pin(Dedup.hashedShingles(docs, DecontamN))
      boilerplateVerdicts(docs, sh, minDocs)
    }
  }

  /** Corpus-common shingles of a hashed posting table: document
    * frequency ≥ `minDocs` (per-doc shingles are already distinct, so
    * count(*) IS the doc count). The one definition both the screen's
    * verdicts and the strip's covered-window join key on. */
  private[graft] def commonShingles(sh: DataFrame, minDocs: Long): DataFrame =
    sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("shingle"))

  /** [[boilerplateScreen]]'s verdict core over a PREBUILT hashed
    * posting table — the shared-scan entry [[Pipeline.pipelineCurate]]
    * uses so the nightly funnel shingles the corpus once for every
    * screen. `sh` must cover all of `docs` at [[DecontamN]] grain and
    * should be persisted by the caller (both consumers below re-read
    * it). */
  private[graft] def boilerplateVerdicts(docs: DataFrame, sh: DataFrame,
      minDocs: Long): DataFrame = {
    val common = commonShingles(sh, minDocs).withColumn("bp", lit(1))
    val perDoc = sh.join(common.hint("shuffle_hash"), Seq("shingle"), "left")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_shingles"),
        count(col("bp")).as("n_boilerplate"))
    val frac = when(coalesce(col("n_shingles"), lit(0L)) === 0, lit(0.0))
      .otherwise(
        coalesce(col("n_boilerplate"), lit(0L)).cast("double") / col("n_shingles"))
    docs.select(col("doc_id"))
      .join(perDoc.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_boilerplate"), lit(0L)).as("n_boilerplate"),
        frac.as("boilerplate_frac"),
        (frac > BoilerplateMaxFrac).as("boilerplate"))
  }

  def boilerplateScreenOracle: String = s"""
    WITH ${Dedup.shingleSqlCte(DecontamN)},
    common AS (
      SELECT shingle FROM sh GROUP BY 1
      HAVING count(*) >= greatest($BoilerplateMinDocsFloor,
        (SELECT (count(*) + ${BoilerplateDocDivisor - 1}) // $BoilerplateDocDivisor
         FROM documents))),
    tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM sh GROUP BY 1),
    hit AS (
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_boilerplate
      FROM sh s JOIN common USING (shingle) GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(t.n_shingles, 0) AS n_shingles,
           COALESCE(h.n_boilerplate, 0) AS n_boilerplate,
           CASE WHEN COALESCE(t.n_shingles, 0) = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(COALESCE(h.n_boilerplate, 0) AS DOUBLE) / t.n_shingles
           END AS boilerplate_frac,
           CASE WHEN COALESCE(t.n_shingles, 0) = 0 THEN FALSE
                ELSE CAST(COALESCE(h.n_boilerplate, 0) AS DOUBLE) / t.n_shingles
                       > $BoilerplateMaxFrac
           END AS boilerplate
    FROM documents d
    LEFT JOIN tot t USING (doc_id)
    LEFT JOIN hit h USING (doc_id)"""

  // ------------------------------------------------------ boilerplate_strip

  /** Boilerplate REMOVAL — the C4/RefinedWeb rule's remediation half:
    * where [[boilerplateScreen]] flags documents, this rewrites them. A
    * word is dropped when ANY corpus-common [[DecontamN]]-shingle window
    * (document frequency ≥ the screen's relative threshold) covers it;
    * the output is the cleaned text — in the shingle tokenization's
    * normal form (lowercased, whitespace-normalized), which is what a
    * training pipeline feeds the tokenizer anyway — plus drop
    * accounting, oracle-checked string-for-string like pii_scrub's
    * scrubbed column.
    *
    * Plan shape: positional windows at scan speed (the token-array
    * barrier, then posexplode), ONE shuffle into the common-shingle
    * join on 8-byte hashed keys (corpus-derived set → shuffle per the
    * broadcast rule), one doc-grain covered-set aggregation (bounded by
    * document length), and the rebuild is an index-filter projection.
    * Nothing is ever all-pairs and the text payload crosses no
    * shuffle — only (doc_id, position) pairs do. */
  def boilerplateStrip(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val minDocs = boilerplateMinDocs(docs.count())
    stripWith(docs, commonShingles(Dedup.hashedShingles(docs, DecontamN), minDocs))
  }

  /** [[boilerplateStrip]]'s rewrite core against a PREBUILT common-
    * shingle set — the shared-scan entry [[Pipeline.pipelineCurate]]
    * uses so the funnel's pinned posting pass prices `common` once for
    * the screen and the strip alike. One row per `docs` row:
    * (doc_id, n_tokens, n_dropped, cleaned). */
  private[graft] def stripWith(docs: DataFrame, common: DataFrame): DataFrame =
    stripFromWindows(windowsOf(docs), common)

  /** The positional-window frame the strip consumes — and the
    * [[CurateStore]] persists as its forward index: one row per doc with
    * the token array and the POSITIONAL window-hash array (`whs[i]` =
    * xxhash64 of the [[DecontamN]]-gram starting at 0-based token `i`;
    * duplicates kept, unlike the distinct-set kernel). Persisting this
    * frame is what lets a later night re-strip a document against a
    * CHANGED common-shingle set without re-reading or re-tokenizing its
    * text — the re-strip becomes a columnar read of (w, whs).
    *
    * shingleTokens, not tokens: the windows must line up with the
    * kernel-built `common` set and the oracle's rtrim'd toks.w — plain
    * SQL split would mint a phantom trailing token (and shingle) for
    * text ending in non-space whitespace. The string window hashes with
    * the same xxhash64(seed 42) the kernel uses, so join keys against
    * kernel-derived df tables line up bit-for-bit. */
  private[graft] def windowsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        Dedup.shingleTokens(col("text")).as("w"))
      .repartition(col("doc_id")) // token-array barrier (see Dedup.shingles)
      .select(col("doc_id"), col("w"),
        transform(Dedup.ngramsOfTokens(col("w"), DecontamN),
          g => xxhash64(g)).as("whs"))

  /** [[stripWith]]'s rewrite core over a PREBUILT (doc_id, w, whs)
    * window frame — either [[windowsOf]] inline (the one-shot path) or
    * a [[CurateStore]] member read back from storage (the incremental
    * re-strip path, where the text is never touched again). */
  private[graft] def stripFromWindows(base: DataFrame,
      common: DataFrame): DataFrame = {
    // positional windows: duplicates kept, 0-based window start
    val win = base.select(col("doc_id"),
      posexplode(col("whs")).as(Seq("i", "shingle")))
    val covered = win.join(common.hint("shuffle_hash"), "shingle")
      .select(col("doc_id"),
        explode(array((0 until DecontamN).map(k => col("i") + k): _*)).as("p"))
      .groupBy(col("doc_id")).agg(collect_set(col("p")).as("cov"))
    // kept positions via array_except (hash-set lookup — O(len + |cov|)
    // per row, where a per-token array_contains scan would be O(len²)
    // on a fully-covered doc); order of the first operand is preserved
    val noCov = array().cast("array<int>")
    val keptIdx = array_except(sequence(lit(0), size(col("w")) - 1),
      coalesce(col("cov"), noCov))
    base.join(covered.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_dropped"),
        concat_ws(" ", transform(keptIdx, i => element_at(col("w"), i + 1)))
          .as("cleaned"))
  }

  /** DuckDB twin: same windows (1-based there), same relative DF
    * threshold, same covered-position set, same index-filter rebuild —
    * all generated from [[DecontamN]] like the Spark side, so a shingle
    * arity change cannot leave the two computing different windows. */
  def boilerplateStripOracle: String = {
    val cat = (0 until DecontamN).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    val span = (0 until DecontamN).map(k => s"w.i + $k").mkString(", ")
    s"""
    WITH ${Dedup.shingleSqlCte(DecontamN)},
    common AS (
      SELECT shingle FROM sh GROUP BY 1
      HAVING count(*) >= greatest($BoilerplateMinDocsFloor,
        (SELECT (count(*) + ${BoilerplateDocDivisor - 1}) // $BoilerplateDocDivisor
         FROM documents))),
    win AS (
      SELECT doc_id, i, $cat AS shingle
      FROM toks, UNNEST(range(1, greatest(len(w) - ${DecontamN - 2}, 1))) AS t(i)),
    cov AS (
      SELECT doc_id, list(DISTINCT p) AS cov
      FROM (SELECT w.doc_id, u.p
            FROM win w JOIN common USING (shingle),
            UNNEST([$span]) AS u(p)) hits
      GROUP BY 1)
    SELECT t.doc_id,
      CAST(len(w) AS BIGINT) AS n_tokens,
      CAST(COALESCE(len(cov), 0) AS BIGINT) AS n_dropped,
      COALESCE(array_to_string(list_transform(list_filter(range(1, len(w) + 1),
        i -> NOT list_contains(COALESCE(cov, []), i)), i -> w[i]), ' '), '')
        AS cleaned
    FROM toks t LEFT JOIN cov USING (doc_id)"""
  }

  // -------------------------------------------------------- doc_repetition

  /** Gopher rule thresholds: flag a doc when its duplicate-bigram fraction
    * or its single-most-frequent-token share crosses these. */
  val DupBigramMax = 0.05
  val TopTokenMax  = 0.12

  /** Repetition quality filter (Gopher/MassiveText "repetitious text"
    * rules re-based on word n-grams — the corpus is single-line, so
    * line-level dup fractions are degenerate): per doc, the duplicate
    * token fraction, duplicate bigram fraction, and the share of the
    * single most frequent token, plus the keep/drop flag.
    *
    * All counts are exact integers and every ratio is one int/int double
    * division (exactly rounded IEEE), so the flag — a comparison on those
    * doubles — is bit-stable across engines. */
  def docRepetition(s: SparkSession, d: String): DataFrame =
    docRepetitionOf(documents(s, d))

  /** [[docRepetition]] over an arbitrary (doc_id, text) frame — the
    * entry [[CurateStore]] uses to score a nightly delta alone (the
    * rules are doc-local, so a stored verdict never changes). */
  private[graft] def docRepetitionOf(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .repartition(col("doc_id")) // parallelism + token-array barrier (see Dedup.shingles)
    val uni = base.select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_c"))
    val bi = base
      .select(col("doc_id"), explode(Dedup.ngramsOfTokens(col("w"), 2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"))
    val dupTok = lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")
    val dupBg = when(col("n_bigrams").isNull || col("n_bigrams") === 0, lit(0.0))
      .otherwise(lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"))
    val topFrac = col("top_c").cast("double") / col("n_tokens")
    // both branches are doc-grain AND already hash-partitioned on doc_id
    // by their repartition barrier, so the shuffle_hash join adds ZERO
    // exchanges — where the planner's broadcast would ship a corpus-grain
    // frame to every task at 100 TB
    uni.join(bi.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_distinct").cast("long").as("n_distinct"),
        dupTok.as("dup_token_frac"),
        coalesce(col("n_bigrams"), lit(0L)).cast("long").as("n_bigrams"),
        dupBg.as("dup_bigram_frac"),
        topFrac.as("top_token_frac"),
        (dupBg > DupBigramMax || topFrac > TopTokenMax).as("repetitive"))
  }

  def docRepetitionOracle: String = s"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w
      FROM documents),
    u AS (SELECT doc_id, unnest(w) AS tok FROM toks),
    uc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
    uni AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
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
             CAST(count(*) AS BIGINT) AS n_distinct_bigrams
      FROM bc GROUP BY 1),
    j AS (
      SELECT u.doc_id, n_tokens, n_distinct, top_c,
             COALESCE(n_bigrams, 0) AS n_bigrams, n_distinct_bigrams,
             CAST(1 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_frac,
             CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(1 AS DOUBLE) - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams
             END AS dup_bigram_frac,
             CAST(top_c AS DOUBLE) / n_tokens AS top_token_frac
      FROM uni u LEFT JOIN bi ON u.doc_id = bi.doc_id)
    SELECT doc_id, n_tokens, n_distinct, dup_token_frac, n_bigrams,
           dup_bigram_frac, top_token_frac,
           (dup_bigram_frac > $DupBigramMax OR top_token_frac > $TopTokenMax)
             AS repetitive
    FROM j"""

  // ------------------------------------------------------------- pii_scrub

  /** PII regexes (email, dotted-quad IP) plus a term blocklist. The
    * synthetic corpus contains no digits or @-signs, so the PII counters
    * verify the machinery at zero; the blocklist mask has real hits. All
    * three patterns are shared Java-regex/RE2 syntax so the oracle runs
    * them verbatim. */
  val EmailRe     = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re      = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val BlocklistRe = "\\b(customer|query|spark)\\b"

  /** PII / blocklist scrubbing: per-doc match counts for each category and
    * the redacted text. Pure projection — regexp_extract_all + chained
    * regexp_replace inside whole-stage codegen; nothing shuffles. */
  def piiScrub(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
        .cast("long").as("n_ipv4"),
      size(regexp_extract_all(col("text"), lit(BlocklistRe), lit(0)))
        .cast("long").as("n_blocked"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<email>"),
          Ipv4Re, "<ip>"),
        BlocklistRe, "<masked>").as("scrubbed"))

  /** DuckDB twin — NOTE the 'g' flag: DuckDB's regexp_replace is
    * first-match-only by default where Spark's replaces all. */
  def piiScrubOracle: String = s"""
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '$EmailRe', 0)) AS BIGINT) AS n_email,
      CAST(len(regexp_extract_all(text, '$Ipv4Re', 0)) AS BIGINT) AS n_ipv4,
      CAST(len(regexp_extract_all(text, '$BlocklistRe', 0)) AS BIGINT) AS n_blocked,
      regexp_replace(
        regexp_replace(
          regexp_replace(text, '$EmailRe', '<email>', 'g'),
          '$Ipv4Re', '<ip>', 'g'),
        '$BlocklistRe', '<masked>', 'g') AS scrubbed
    FROM documents"""

  // ----------------------------------------------------- source_reputation

  /** Keep-bar for a source's low-quality share: sources where more than
    * [[MaxLowQualityShare]] of documents fall under
    * [[Pipeline.QualityThreshold]] are dropped wholesale. 0.3 splits the
    * driver corpus (per-source shares span 0.12-0.48), so both verdicts
    * appear at every SF. */
  val MaxLowQualityShare = 0.3

  /** Source/domain reputation (the RefinedWeb/C4 URL-level idea at the
    * `source` grain): a domain whose sample is mostly junk is dropped
    * WHOLE, because per-document screens leak boilerplate-adjacent junk
    * a domain-level prior catches. One [[TextOps.textStatsOf]] scan,
    * one source-grain hash agg; every output is bit-stable by
    * construction — counts are exact integers, shares are single
    * int/int divisions, min/max of the per-doc score are selections
    * (never a double SUM, which is order-dependent and would break the
    * hash oracle at any partitioning). At 100 TB this is a scan +
    * one metadata-grain shuffle (domains are bounded). */
  def sourceReputation(s: SparkSession, d: String): DataFrame =
    sourceReputationFinish(sourceReputationPartial(documents(s, d)))

  /** The source-grain partial — every measure folds under the point-
    * store algebra (counts SUM, extremes MIN/MAX), which is what makes
    * the reputation table incrementally maintainable
    * ([[sourceReputationIncremental]]). */
  private[operators] def sourceReputationPartial(docs: DataFrame): DataFrame =
    TextOps.textStatsOf(docs, col("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        sum(when(col("quality_score") < Pipeline.QualityThreshold, 1L)
          .otherwise(0L)).as("n_low_quality"),
        min(col("quality_score")).as("min_quality"),
        max(col("quality_score")).as("max_quality"))

  /** Shares and the keep verdict derive from the folded integers at
    * read time — they are NOT stored (a ratio does not fold; its
    * numerator and denominator do, the reference's point-table rule). */
  private[operators] def sourceReputationFinish(partial: DataFrame): DataFrame =
    partial
      .select(col("source"), col("n_docs"), col("n_chars_total"),
        col("n_low_quality"),
        (col("n_low_quality").cast("double") / col("n_docs"))
          .as("low_quality_share"),
        col("min_quality"), col("max_quality"),
        (col("n_low_quality").cast("double") / col("n_docs")
          <= MaxLowQualityShare).as("keep"))
      .orderBy(col("source"))

  /** `source_reputation_incremental`: the reputation table maintained as
    * a nightly LSM fold — three batch upserts into a [[graft.sources
    * .PointStore]] (counts as SUM measures, quality extremes as MIN/MAX
    * measures) with a compaction between the second and third and an
    * at-least-once redelivery, then shares/verdicts derived from the
    * merge-on-read snapshot. Same oracle as the one-shot
    * [[sourceReputation]]: a hash match proves a domain's keep verdict
    * is maintainable at O(batch) nightly cost — each night folds only
    * its own delta's per-source integers, never re-scoring the corpus. */
  def sourceReputationIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.sources.PointStore
    // freshRunDir: per-JVM token + run counter + exit reaping (the
    // lifecycle-scratch idiom every on-disk registered query shares)
    val dir = DedupIndex.freshRunDir("graft_srcrep_store_", d)
    val store = new PointStore(s, dir.getPath,
      keys = Seq("source"),
      sums = Seq("n_docs", "n_chars_total", "n_low_quality"),
      maxes = Seq("max_quality"), mins = Seq("min_quality"))
    val docs = documents(s, d)
    def batch(m: Int) =
      sourceReputationPartial(docs.filter(col("doc_id") % 3 === m))
    store.appendTagged("b0", batch(0))
    store.appendTagged("b1", batch(1))
    store.compact()
    store.appendTagged("b2", batch(2))
    store.appendTagged("b2", batch(2)) // at-least-once redelivery: no-op
    sourceReputationFinish(store.snapshot)
  }

  def sourceReputationOracle: String = raw"""
    WITH t AS (
      SELECT source, text,
        string_split_regex(lower(trim(text)), '[${Dedup.WsChars}]+') AS w,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9${Dedup.WsChars}]', '', 'g')) AS BIGINT) AS n_punct
      FROM documents),
    c AS (
      SELECT source, n_chars,
        least(CAST(len(w) AS DOUBLE) / 64.0, 1.0) * 0.5
          + (CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) / len(w)) * 0.3
          + (1.0 - CAST(n_punct AS DOUBLE) / n_chars) * 0.2 AS quality_score
      FROM t),
    g AS (
      SELECT source,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
        CAST(sum(CASE WHEN quality_score < ${Pipeline.QualityThreshold} THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
        min(quality_score) AS min_quality,
        max(quality_score) AS max_quality
      FROM c GROUP BY 1)
    SELECT source, n_docs, n_chars_total, n_low_quality,
      CAST(n_low_quality AS DOUBLE) / n_docs AS low_quality_share,
      min_quality, max_quality,
      CAST(n_low_quality AS DOUBLE) / n_docs <= $MaxLowQualityShare AS keep
    FROM g ORDER BY 1"""
}

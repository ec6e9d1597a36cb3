package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication over `documents.parquet` — the LLM-pipeline
  * operators a 100 TB training-data engine needs.
  *
  * - `dedup_exact`: content-hash group-by, one shuffle.
  * - `dedup_minhash`: MinHash + banded LSH. Candidate generation is an
  *   equi-join on (band, band-hash) buckets — all-pairs NEVER materializes
  *   — followed by exact Jaccard verification of the candidates only. With
  *   r=2 rows × b=32 bands, a pair at the J=0.5 threshold is missed with
  *   probability (1-0.5²)^32 ≈ 1e-4 and the planted near-dups in this
  *   corpus sit at J≈0.99 (miss prob ≈ 1e-54), so the verified output
  *   equals the exact all-pairs answer the DuckDB oracle computes.
  * - `dedup_ngram`: exact n-gram Jaccard via an inverted shingle index
  *   (posting-list self-join) — the exact counterpart to the LSH path.
  * - `dedup_simhash`: 60-bit SimHash (md5-derived feature hashes — a hash
  *   family both engines share, so the whole pipeline is oracle-checked)
  *   with 4×15-bit band bucketing and Hamming≤3 verification; SimhashSpec
  *   additionally proves banding recall against brute force.
  *
  * Skew note (100 TB): hub shingles (stop-phrase posting lists) skew the
  * inverted-index join — IMPLEMENTED as the [[HubDfCutoff]] document-
  * frequency cap over the [[dfAnnotated]] posting table in
  * [[ngramDedup]], measured at DISTINCT-SET grain (set-identical docs
  * collapse to one representative first, so replication cannot
  * manufacture hubs): shingles above the cutoff are dropped from
  * candidate generation only, never from verification, so per-shingle
  * fanout is bounded at cutoff² while results stay exact (DedupSpec
  * plants a stop phrase in every doc, and separately a 30×-replicated
  * page with a near-dup variant, to prove both). The LSH
  * path is structurally immune to posting skew (signatures are in-row;
  * its band buckets only grow with genuinely identical band values,
  * which ARE near-dups); AQE skew-join handles the moderate residue.
  */
object Dedup {

  /** Whitespace tokens, lowercased — identical semantics to the
    * oracles' string_split_regex(lower(trim(text)), '[WsChars]+')
    * (Java's \s IS [[WsChars]]; the oracles spell the class out
    * because RE2's \s lacks U+000B). */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Tokens as the [[hashShingleWindows]] kernel counts them. Java's
    * `String.split` drops trailing empty tokens where SQL `split` keeps
    * them, so text ending in non-space whitespace ("hello world\n")
    * tokenizes as 2 words in the kernel but 3 in [[tokens]] — enough to
    * flip a `size >= n` window test or mint a phantom trailing shingle.
    * Stripping trailing whitespace before the SQL split restores
    * agreement; the ENTIRE shingle family shares these semantics (the
    * kernel, this SQL-expression path, the DuckDB twins via
    * [[shingleSqlCte]], and [[dedupClustersOf]]'s windowless gate),
    * while [[tokens]] keeps plain SQL-split semantics for the
    * text-stats/token-count family and their oracles. Sole residual
    * corner: whitespace-only text is zero kernel tokens but one empty
    * SQL token — the same side of every `>= n` test for n >= 2, and no
    * shingle either way. */
  def shingleTokens(c: Column): Column =
    // \z, not $: Java's $ also matches BEFORE a final line terminator,
    // and U+0085/U+2028/U+2029 are terminators outside \s -- with $,
    // text like "a b<LF><U+2029>" would lose its INTERIOR newline and
    // re-diverge from the kernel's split and the RE2 twin ($ = \z there)
    split(regexp_replace(lower(trim(c)), "\\s+\\z", ""), "\\s+")

  /** ALL word n-grams (duplicates kept, document order) from a
    * MATERIALIZED token-array column. `w` must be a plain column
    * reference: Catalyst does not CSE through higher-order lambdas, so
    * inlining `split()` here would re-run the split for every
    * element_at — O(len²) per row (measured 12 s for 5000 docs before
    * the fix, <1 s after). */
  def ngramsOfTokens(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k + 1))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-shingles (set semantics — the dedup family's unit). */
  def shinglesOfTokens(w: Column, n: Int): Column =
    array_distinct(ngramsOfTokens(w, n))

  /** Inline convenience for small inputs (tests) — quadratic form. */
  def shingleArr(c: Column, n: Int): Column =
    shinglesOfTokens(shingleTokens(c), n)

  /** Exploded (doc_id, shingle) posting table. The tokenization is
    * projected first and pinned by a repartition exchange: the exchange is
    * the parallelism source for this compute-bound stage (the input may be
    * a single file split) AND the barrier that keeps the token array
    * materialized (CollapseProject would otherwise re-inline the split
    * into every lambda element access). */
  def shingles(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), shingleTokens(col("text")).as("w"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(shinglesOfTokens(col("w"), n)).as("shingle"))

  /** Posting table with the shingle compressed to its 64-bit xxhash64:
    * 16-byte rows instead of multi-word strings, so every downstream
    * shuffle (signature agg, posting self-join, verify joins) moves ~5×
    * fewer bytes. Distinct shingles stay distinct except with probability
    * ~k²/2⁶⁵ for k distinct shingles (k≈2.5M at sf0.1 → ~1e-7), so set
    * sizes and intersections — and therefore exact Jaccard — are unchanged;
    * the DuckDB string-shingle oracle hash-matching is the proof.
    *
    * Implemented as a typed flatMap rather than the HOF-transform plan of
    * [[shingles]]: ArrayTransform/`element_at` lambdas are interpreted
    * (CodegenFallback), and this stage is the compute bottleneck of every
    * dedup operator. Plain JVM string walking with the same UTF8String
    * lower/trim and the same XXH64(seed=42) the SQL `lower`/`trim`/
    * `xxhash64` functions use keeps the output bit-identical to
    * `shingles(docs,n).select(xxhash64(shingle))` while running codegen-
    * speed. The repartition spreads single-file inputs across cores. */
  def hashedShingles(docs: DataFrame, n: Int): DataFrame = {
    import docs.sparkSession.implicits._
    kernelSource(docs)
      .map { case (id, text) => (id, hashShingleWindows(text, n)) }
      .toDF("doc_id", "hs")
      .select(col("doc_id"), explode(col("hs")).as("shingle"))
  }

  /** Typed (doc_id, text) source repartitioned for a kernel map stage.
    * Explicit partition count: the downstream map is compute-bound, so
    * it must keep full parallelism even when AQE (rightly) coalesces
    * the tiny downstream shuffles — a size-based coalesce would
    * serialize it. Shared by [[hashedShingles]] and [[ngramDedup]]'s
    * fingerprinting pass so the invariant lives in one place. */
  private[operators] def kernelSource(docs: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, String)] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_id"))
  }

  /** Distinct 64-bit hashes of the word n-windows of `text`: the same
    * lower/trim/`\s+`-split tokenization as [[tokens]], each window hashed
    * as XXH64(word ∥ ' ' ∥ … ∥ word, seed=42) over a reused byte buffer —
    * identical to `xxhash64(concat_ws(' ', …))` of the string shingle, with
    * ZERO allocation per window (the verify/bench hot loop was GC-bound
    * when each shingle built a StringBuilder + String + UTF8String).
    * Dedup is sort+unique on the primitive array, no per-element boxing. */
  private[graft] def hashShingleWindows(text: String, n: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val w = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      .trim().toLowerCase.toString.split("\\s+")
    if (w.length < n) return Array.emptyLongArray
    val wb = new Array[Array[Byte]](w.length)
    var maxLen = 0
    var i = 0
    while (i < w.length) {
      wb(i) = w(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      maxLen = math.max(maxLen, wb(i).length); i += 1
    }
    val buf = new Array[Byte](n * (maxLen + 1))
    val out = new Array[Long](w.length - n + 1)
    i = 0
    while (i <= w.length - n) {
      var pos = 0
      var k = i
      while (k < i + n) {
        if (k > i) { buf(pos) = ' '; pos += 1 }
        val b = wb(k)
        System.arraycopy(b, 0, buf, pos, b.length); pos += b.length
        k += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    if (uniq == out.length) out else java.util.Arrays.copyOf(out, uniq)
  }

  /** Java's \s character class written out: space, \t, \n, \x0b, \f,
    * \r. RE2 (DuckDB) EXCLUDES U+000B (vertical tab) from \s while
    * Java includes it, so any regex that must mean the same thing in
    * both engines spells the class with this constant — valid and
    * identical in Java regex and RE2. Java-ONLY regexes ([[tokens]],
    * [[shingleTokens]], the kernel's split) keep plain \s, which in
    * Java is exactly this class. */
  val WsChars: String = """ \t\n\x0b\f\r"""

  /** The DuckDB rendering of [[shingleTokens]] — ONE definition shared
    * by [[shingleSqlCte]] and the pipeline oracle's shingle array, so a
    * tokenization tweak cannot silently miss a twin. RE2's $ is plain
    * end-of-text (the Java side needed \z); the whitespace class is
    * explicit because RE2's \s lacks U+000B. */
  val shingleSplitSql: String =
    s"string_split_regex(regexp_replace(lower(trim(text)), '[$WsChars]+$$', ''), '[$WsChars]+')"

  /** The DuckDB twin of [[shingleArr]]: 1-based list indexing, same split.
    * `carry` columns ride from documents through both CTEs (the
    * distinct-sketch oracles group shingles by lang). */
  def shingleSqlCte(n: Int, carry: Seq[String] = Nil): String = {
    val cat = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    val cs = carry.map(c => s"$c, ").mkString
    s"""toks AS (SELECT doc_id, $cs$shingleSplitSql AS w
       |          FROM documents),
       |sh AS (SELECT doc_id, ${cs}unnest(list_distinct(
       |         list_transform(range(1, greatest(len(w) - ${n - 2}, 1)), i -> $cat)
       |       )) AS shingle FROM toks)""".stripMargin
  }

  // ---------------------------------------------------------------- exact

  def dedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("keeper_id"),
        sum(col("n_chars")).as("total_chars"))

  def dedupExactOracle: String = """
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS keeper_id,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1"""

  // ------------------------------------------------- exact Jaccard verify

  /** Persist-materialize-release: pin `stagedFrames`, eagerly compute
    * `result` into its own (bounded-size) cache, then drop the staged
    * blocks so one query's scratch never squeezes the storage/execution
    * pools of the next query in the same session — measured: leaked
    * posting caches inflated a later unrelated aggregation from 4.9 s to
    * 16 s under an 8 GiB heap. On a cluster the equivalent staging is a
    * scratch-parquet write (what IvfIndex does); in-session this is the
    * same lifecycle with the block manager as the scratch space. Self-
    * cleaning: a failed materialization releases the result's fresh
    * cache AND the staged frames before rethrowing, so no exit path
    * leaves blocks pinned (callers' own releases are then idempotent
    * no-ops). */
  private[operators] def staged(result: DataFrame, stagedFrames: DataFrame*): DataFrame = {
    // re-persist only if needed: a nested stagedScope returns a frame
    // that is already persisted (re-persisting logs a CacheManager
    // warning); the count stays unconditional — it is what guarantees
    // the result is materialized before its scratch lineage is
    // released, and is ~free on a warm cache
    val r =
      if (result.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else result
    try r.count()
    catch { case t: Throwable => quietRelease(r +: stagedFrames, t); throw t }
    stagedFrames.foreach(_.unpersist(false))
    r
  }

  /** Release caches on a failure path without masking the root cause: an
    * unpersist that itself throws (e.g. the context already stopped
    * because the failure WAS a shutdown) is attached as suppressed to
    * the original exception instead of replacing it, and the remaining
    * frames still get their release attempt. */
  private def quietRelease(frames: Seq[DataFrame], cause: Throwable): Unit =
    frames.foreach { f =>
      try f.unpersist(false)
      catch { case c: Throwable => cause.addSuppressed(c) }
    }

  /** Scratch-frame registry for [[stagedScope]]: an operator pins its
    * intermediate frames through this instead of hand-rolling the
    * track-and-release bookkeeping at each site. */
  private[operators] final class Scratch {
    private val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    /** Persist `df` (MEMORY_AND_DISK) as scratch, registered for
      * release on every exit of the enclosing scope. */
    def pin(df: DataFrame): DataFrame =
      track(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    /** Register an ALREADY-persisted frame (one a callee staged) for
      * release without re-persisting it. */
    def track(df: DataFrame): DataFrame = { pinned += df; df }
    /** Eagerly release a pinned frame MID-scope, once its last consumer
      * has materialized: the footprint-handoff idiom for scratch that
      * feeds only the early stages of a long plan — holding it to scope
      * end would stack its cache on top of everything derived from it. */
    def release(df: DataFrame): Unit = { pinned -= df; df.unpersist(false) }
    private[Dedup] def frames: Seq[DataFrame] = pinned.toSeq
    private[Dedup] def releaseAll(cause: Throwable): Unit =
      quietRelease(pinned.toSeq, cause)
  }

  /** The pin/track/release-on-ANY-exit discipline as one combinator:
    * `body` builds the result, pinning scratch via its [[Scratch]]; the
    * result is then [[staged]] (materialized into its own cache) and
    * every pinned frame released — on success AND on any throw,
    * including eager AnalysisExceptions raised while later plans are
    * still being constructed. Replaces the per-operator try/catch
    * variants that each re-implemented (and twice mis-implemented)
    * this lifecycle. */
  private[operators] def stagedScope(body: Scratch => DataFrame): DataFrame = {
    val scratch = new Scratch
    try {
      val result = body(scratch)
      // a body may return a frame it pinned (persisted for several
      // consumers AND the output) — that frame must not be in the
      // release list, or the combinator would silently drop the result's
      // own cache right after materializing it
      staged(result, scratch.frames.filterNot(f =>
        (f eq result) ||
          (f.queryExecution.logical eq result.queryExecution.logical)): _*)
    } catch { case t: Throwable => scratch.releaseAll(t); throw t }
  }

  /** Public face of [[verifyJaccard]] for the fluent API (graft.api). */
  def verifyJaccardOf(cand: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val (res, scratch) = verifyJaccard(cand, sh, threshold)
    staged(res, scratch: _*)
  }

  /** Exact Jaccard of candidate pairs via the shingle posting table.
    * The posting table is first semi-joined down to docs that appear in a
    * candidate pair — set sizes and intersections only matter for those —
    * so the expensive (doc, shingle) joins and the size aggregation run
    * over the candidate docs' postings only, not the full corpus (LSH
    * typically leaves ≲1% of docs as candidates; AQE picks a broadcast
    * for the id list when it is small). Returns the result plus the
    * scratch frames it pinned, for [[staged]] release by the caller. */
  private def verifyJaccard(cand0: DataFrame, sh: DataFrame,
                            threshold: Double): (DataFrame, Seq[DataFrame]) = {
    // cand appears four times below (directly + via the id semi-join);
    // without pinning it the whole candidate-generation DAG re-executes
    // per occurrence. Both pinned frames are small: pairs, and postings
    // of candidate docs only.
    // Every frame here scales with the corpus (pairs and candidate-doc
    // postings are proportionally small but grow with the data), so all
    // the joins below shuffle on their keys — no broadcast side.
    val cand = cand0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ids = cand.select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id"))).distinct()
    val shc = sh.join(ids.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cand.hint("shuffle_hash")
      .join(shc.as("sa"), col("a") === col("sa.doc_id"))
      .join(shc.as("sb").hint("shuffle_hash"), col("b") === col("sb.doc_id") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("intersection"))
    val j = col("intersection").cast("double") /
      (col("size_a") + col("size_b") - col("intersection"))
    val res = inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "size_a")
        .hint("shuffle_hash"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "size_b")
        .hint("shuffle_hash"), "b")
      .filter(j >= threshold)
      .select(col("a"), col("b"), col("intersection"),
        col("size_a"), col("size_b"), j.as("jaccard"))
    (res, Seq(cand, shc))
  }

  private def jaccardOracle(n: Int, threshold: Double): String = s"""
    WITH ${shingleSqlCte(n)},
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2)
    SELECT a, b, i AS intersection, sa.sz AS size_a, sb.sz AS size_b,
           CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
    FROM inter
    JOIN sz sa ON a = sa.doc_id
    JOIN sz sb ON b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= $threshold"""

  // -------------------------------------------------------------- minhash

  val NumHashes = 64
  val Bands     = 32 // r = NumHashes / Bands = 2 rows per band

  /** 64-column MinHash signature per doc — one hash agg, map-side combine.
    * Hash family i = xxhash64 seeded with i (a leading literal column):
    * independent 64-bit hashes with no arithmetic, so ANSI overflow
    * checking never fires (a multiplicative permutation family would wrap
    * mod 2^64, which Spark 4's ANSI mode rejects). */
  def minhashSignatures(docs: DataFrame, n: Int): DataFrame =
    minhashSignaturesOf(shingles(docs, n))

  /** Signatures from an existing posting table (string or hashed shingles
    * both work — xxhash64 re-seeds either). */
  def minhashSignaturesOf(sh: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-seed XXH64 seeds matching `xxhash64(lit(i), shingle)`: the
    * Catalyst expression folds children left-to-right with the previous
    * hash as seed, so the Int literal contributes hashInt(i, 42) and the
    * shingle then hashes against THAT — the same two calls the kernel
    * makes (bit-identity pinned in DedupSpec). */
  private val seedHashes: Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    (0 until NumHashes).map(i => XXH64.hashInt(i, 42L)).toArray
  }

  /** In-row 64-hash signature of one document: the running-min loop over
    * [[hashShingleWindows]]' distinct shingle hashes — no explode, no
    * per-posting expression eval, no aggregation state. Empty when the
    * doc has no n-window (the groupBy form emits no row there). */
  private[graft] def minhashSigArr(text: String, n: Int): Array[Long] =
    minhashSigOfHashes(hashShingleWindows(text, n))

  /** The running-min loop alone, over an already-hashed shingle set —
    * the seam [[graft.operators.DedupIndex]]'s kernel uses to derive
    * signature AND stored shingle set from ONE [[hashShingleWindows]]
    * pass instead of hashing the text twice. */
  private[graft] def minhashSigOfHashes(hs: Array[Long]): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    if (hs.isEmpty) return Array.emptyLongArray
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < NumHashes) {
        val v = XXH64.hashLong(h, seedHashes(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** The signature SCALE path: signatures computed IN-ROW from the text
    * (one typed-kernel pass, same shape as
    * [[graft.streaming.StreamingMinhash]]'s stream side) instead of
    * aggregating 64 mins over the exploded posting table. The typed map
    * that builds the posting table erases partitioning metadata, so the
    * groupBy form re-shuffles EVERY posting despite the postings being
    * doc-partitioned on disk — this form's only exchange is the
    * parallelism barrier on (doc_id, text), ~90× fewer rows. Values are
    * bit-identical to [[minhashSignaturesOf]] (same XXH64 call tree;
    * DedupSpec pins equality), so candidates, verify, and the oracle are
    * unchanged. */
  def minhashSignaturesInRow(docs: DataFrame, n: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val sigCols = (0 until NumHashes).map(i =>
      element_at(col("sig"), i + 1).as(s"m$i"))
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_id")) // compute-bound map stage: keep full parallelism
      .map { case (id, text) => (id, minhashSigArr(text, n)) }
      .toDF("doc_id", "sig")
      .filter(size(col("sig")) > 0)
      .select(col("doc_id") +: sigCols: _*)
  }

  /** (doc_id, band, bv) LSH bucket table of a signature frame — the
    * joinable index form (also the static side of
    * [[graft.streaming.StreamingMinhash]]). */
  def bandTable(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), posexplode(array(
      (0 until Bands).map(j =>
        xxhash64(lit(j), col(s"m${2 * j}"), col(s"m${2 * j + 1}"))): _*))
      .as(Seq("band", "bv")))

  /** Banded LSH candidates: explode signatures to (band, band_hash) keys,
    * equi-self-join the bucket table. */
  def minhashCandidates(sig: DataFrame): DataFrame = {
    val bands = bandTable(sig)
    // bucket SELF-join: corpus × Bands rows on each side — shuffle on the
    // (band, bv) key, never broadcast
    bands.as("x").join(bands.as("y").hint("shuffle_hash"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** End-to-end MinHash dedup over an arbitrary (doc_id, text) frame.
    * Signatures come from the in-row kernel (no posting shuffle — see
    * [[minhashSignaturesInRow]]); the posting table is consumed exactly
    * once, by verifyJaccard's candidate-doc semi-join (which pins ITS
    * pruned copy), so it is no longer persisted here — the r5-era
    * three-consumer staging became single-use when signatures moved
    * in-row. Never all-pairs. */
  def minhashDedup(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val sh = hashedShingles(docs, n)
    val (res, scratch) =
      verifyJaccard(minhashCandidates(minhashSignaturesInRow(docs, n)), sh, threshold)
    staged(res, scratch: _*)
  }

  /** [[minhashDedup]] restricted to pairs within a doc_id subset
    * (`keep`), shaped for scale: both kernel passes still run over the
    * RAW input at scan grain — the text payload never crosses a shuffle
    * (feeding a pre-filtered join plan instead would re-execute a
    * corpus-text exchange once per kernel consumer) — and the subset
    * filter lands on the COMPACT signature frame, so band candidates
    * only ever contain kept docs and verifyJaccard's own candidate
    * semi-join prunes the posting table to them automatically. */
  private[operators] def minhashDedupAmong(docs: DataFrame, keep: DataFrame,
      n: Int, threshold: Double): DataFrame = {
    val sig = minhashSignaturesInRow(docs, n)
      .join(keep.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
    val (res, scratch) =
      verifyJaccard(minhashCandidates(sig), hashedShingles(docs, n), threshold)
    staged(res, scratch: _*)
  }

  def dedupMinhash(s: SparkSession, d: String): DataFrame =
    minhashDedup(documents(s, d), 3, 0.5)

  // -------------------------------------------------- duplicate clusters

  /** Round budget for the min-label fast path before escalating to the
    * star rewrites: near-dup cluster graphs have single-digit diameters
    * (chains of serial edits), so the fast path nearly always converges
    * well inside it; past the budget, one-hop-per-round propagation
    * across an adversarial diameter would take O(diameter) rounds where
    * the rewrites take O(log). */
  val PropagationRoundBudget = 8

  /** Hard bound on alternating large-star/small-star rounds. The round
    * count is O(log² n) worst case (Kiveris et al.) and single digits in
    * practice, so tripping this is a malfunction, not a tuning knob. */
  val StarRoundBound = 50

  /** When set on the session, each round of an iterative loop spills to
    * parquet under this directory (stable storage — survives executor
    * loss) instead of localCheckpoint's executor-resident blocks. */
  val CcCheckpointDirKey = "spark.graft.cc.checkpointDir"

  /** Largest verbatim-copy group [[dedupClustersOf]]'s direct path
    * tolerates before pre-collapsing. At m copies a group contributes
    * C(m,2) J=1.0 pairs to the graph — harmless at 64 (~2k edges),
    * quadratic death at a million — and the collapse machinery costs a
    * signature semi-join plus the member expansion, pure overhead on
    * the typical mostly-distinct corpus. The gate itself costs one
    * doc-grain hash pass and a metadata aggregate (one Long to the
    * driver) — the collapsed path reuses that pass as its group
    * table. */
  val CollapseMaxGroup = 64

  /** Per-round lineage cut for driver-controlled iterative loops. The
    * default localCheckpoint is fast, but its blocks live on executors:
    * a mid-loop executor loss is fatal on a real cluster because the
    * lineage behind the blocks was truncated. With [[CcCheckpointDirKey]]
    * set, rounds spill to parquet under a per-run subdir instead — the
    * cluster-grade cut (the IvfIndex scratch idiom). Superseded rounds
    * are reclaimed as the loop advances (keeping the two newest: loops
    * compare round N against N-1), and [[detach]] + [[release]] leave
    * NOTHING behind: the result is re-pinned off the scratch files,
    * then the whole per-run subdir is deleted before the call returns —
    * a nightly job must not accumulate one orphaned directory per
    * run. */
  private final class LineageCutter(spark: SparkSession) {
    private val base = spark.conf.getOption(CcCheckpointDirKey)
      .map(d => s"$d/cc-${java.util.UUID.randomUUID()}")
    private var round = 0
    private val live = scala.collection.mutable.Queue.empty[org.apache.hadoop.fs.Path]

    private def delete(p: org.apache.hadoop.fs.Path): Unit =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    def cut(df: DataFrame): DataFrame = base match {
      case None => df.localCheckpoint()
      case Some(b) =>
        val p = new org.apache.hadoop.fs.Path(s"$b/round-$round")
        round += 1
        df.write.mode("overwrite").parquet(p.toString)
        live.enqueue(p)
        while (live.size > 2) delete(live.dequeue())
        spark.read.parquet(p.toString)
    }

    /** On the spill path, re-pin `df` off the scratch files (one
      * node-grain eager localCheckpoint) so [[release]] can delete
      * every round. The contract this sets: the spill dir makes the
      * LOOP — the O(rounds) expensive part — survive executor loss;
      * the returned value then carries the same executor-resident
      * exposure as the default path's (lineage-free cached blocks,
      * promptly re-materialized by every in-repo caller via staged()).
      * A caller that needs the RESULT durable writes it to a table, as
      * a nightly job does anyway — what it must not need is a scratch
      * dir that grows by one orphaned run-subdir per invocation.
      * Identity on the localCheckpoint path. */
    def detach(df: DataFrame): DataFrame =
      if (base.isEmpty) df else df.localCheckpoint()

    /** Delete the entire per-run scratch subdir (call after [[detach]]
      * has re-pinned anything still needed). No-op without a spill
      * dir. */
    def release(): Unit = {
      live.clear()
      base.foreach(b => delete(new org.apache.hadoop.fs.Path(b)))
    }
  }

  /** One large-star round (Kiveris et al. SoCC'14, Algorithm 3): for
    * every node u, connect each strictly-larger neighbor to the minimum
    * of u's closed neighborhood. Output edges are (larger, smaller). */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** One small-star round (Algorithm 4): key each edge by its larger
    * endpoint, then connect that node and all its (smaller) neighbors to
    * the neighborhood minimum. Canonical (u > v) in and out. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val mins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
    dir.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Alternate large-star/small-star until the edge set is a fixpoint —
    * at which point every component is a star rooted at its minimum
    * node (Kiveris et al. prove convergence in O(log² n) rounds; ~log
    * diameter in practice). Each round is ONE job: the two grouped
    * self-joins, a marker left-join against the previous (cut,
    * materialized) set, and the cut — with the fixpoint test riding
    * that job as an Observation (the fast path's idiom), not a
    * separate count() + except() pair. The test stays exact: both
    * sides are distinct canonical sets, so equal cardinality + no
    * edge outside the previous set ⇒ equal. Returns the star edges
    * (node, component-min). */
  private def starContract(edges0: DataFrame, cutter: LineageCutter): DataFrame = {
    var e = cutter.cut(edges0
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct())
    var n = e.count()
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      require(rounds <= StarRoundBound,
        s"starContract: no fixpoint in $StarRoundBound rounds — the " +
          "rewrites converge in O(log² n); this is a malfunction")
      val obs = org.apache.spark.sql.Observation(s"graft_star_round_$rounds")
      // `e` is the previous round's materialized cut and distinct on
      // (u, v), so the marker join duplicates nothing and reads blocks,
      // not lineage; `novel` edges are exactly next ∖ e
      val marked = smallStar(largeStar(e))
        .join(e.select(col("u"), col("v"), lit(1).as("old")),
          Seq("u", "v"), "left")
        .observe(obs,
          count(lit(1)).as("total"),
          count(when(col("old").isNull, true)).as("novel"))
      val next = cutter.cut(marked.select(col("u"), col("v")))
      // metrics land via an async listener right after the cut's job;
      // past the bounded wait, fall back to scanning the materialized
      // blocks (the pre-r10 two-action test)
      val (m, converged0) =
        try {
          val row = scala.concurrent.Await
            .result(obs.future, scala.concurrent.duration.Duration(5, "s"))
          (row.getAs[Long]("total"),
            row.getAs[Long]("total") == n && row.getAs[Long]("novel") == 0L)
        } catch { case _: java.util.concurrent.TimeoutException =>
          val c = next.count()
          (c, c == n && next.except(e).isEmpty)
        }
      converged = converged0
      e = next; n = m
    }
    e
  }

  /** Connected components of an (a, b) pair graph: every node's label
    * converges to the smallest doc id reachable from it.
    *
    * Fast path: min-label propagation — one shuffle on the edge key and
    * one on the node key per round, O(diameter) rounds, never an
    * all-pairs closure. Convergence ("no label improved") rides the
    * round's own materialization job as an observed metric
    * (CollectMetrics), not a second action. Past
    * [[PropagationRoundBudget]] rounds the loop escalates to the
    * large-star/small-star rewrites ([[starContract]]), seeded with the
    * partial labels already won (label pointers are within-component
    * edges, so the union preserves components exactly) — adversarial
    * diameters (a 200-link chain of serial template edits) converge in
    * O(log) further rounds instead of aborting.
    *
    * Lineage is cut per round — localCheckpoint by default, stable-
    * storage parquet when [[CcCheckpointDirKey]] is set (see
    * [[LineageCutter]]) — and the loop is driver-controlled. */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val cutter = new LineageCutter(spark)
    val edges = pairs.select(col("a").as("u"), col("b").as("v"))
      .union(pairs.select(col("b").as("u"), col("a").as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var lab = cutter.cut(edges.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")))
    var converged = false
    var rounds = 0
    // each round's cut blocks are node-grain (nodes touched by a pair,
    // not the corpus); localCheckpoint blocks become unreachable as
    // `lab` is reassigned (ContextCleaner reclaims them), spilled rounds
    // are reclaimed by the cutter, and the explicitly-persisted edge
    // frame is released on every exit path below
    try {
      while (!converged && rounds < PropagationRoundBudget) {
        rounds += 1
        val obs = org.apache.spark.sql.Observation(s"graft_cc_round_$rounds")
        val prop = edges
          .join(lab.select(col("node").as("vn"), col("lbl").as("vlbl")),
            col("v") === col("vn"))
          .groupBy(col("u")).agg(min(col("vlbl")).as("nbr"))
        // inner join: every labeled node is an edge endpoint by
        // construction, so it always has ≥ 1 neighbor row in prop
        val next = cutter.cut(lab
          .join(prop, col("node") === col("u"))
          .select(col("node"),
            least(col("lbl"), col("nbr")).as("lbl"),
            (col("nbr") < col("lbl")).as("improved"))
          .observe(obs, count(when(col("improved"), true)).as("n_improved")))
        // the metric arrives via an async listener shortly after the cut's
        // job; if it hasn't landed within the bounded wait, fall back to
        // one scan over the just-materialized blocks
        converged =
          try scala.concurrent.Await
            .result(obs.future, scala.concurrent.duration.Duration(5, "s"))
            .getAs[Long]("n_improved") == 0L
          catch { case _: java.util.concurrent.TimeoutException =>
            next.filter(col("improved")).isEmpty
          }
        lab = next.select(col("node"), col("lbl"))
      }
      if (!converged) {
        // seed with the partial labels already won — the seed is
        // materialized by starContract's first cut, after which the
        // fast path's `lab` round is never read again (the star loop's
        // keep-2 spill reclamation may delete it)
        val stars = starContract(
          edges.select(col("u"), col("v"))
            .union(lab.select(col("node").as("u"), col("lbl").as("v"))),
          cutter)
        // roots never appear as a star edge's larger endpoint → label
        // self. Node universe comes from the persisted edge frame, and
        // the final cut materializes the join NOW — while edges is still
        // cached — so the returned frame is self-contained on both cut
        // paths.
        lab = cutter.cut(edges.select(col("u").as("node")).distinct()
          .join(stars.select(col("u").as("node"), col("v").as("slbl"))
            .hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"), coalesce(col("slbl"), col("node")).as("lbl")))
      }
      cutter.detach(lab)
    } finally { edges.unpersist(false); cutter.release() }
  }

  /** Cluster formation + keeper election over the MinHash near-dup
    * pairs — the step a production dedup runs AFTER pair discovery:
    * one row per corpus doc with its duplicate-cluster id (smallest doc
    * id in its component; singletons are their own cluster) and the
    * keep/drop verdict. The component table is corpus-derived (worst
    * case every doc pairs), so its verdict join shuffles per the
    * broadcast rule. */
  def dedupClusters(s: SparkSession, d: String): DataFrame =
    dedupClustersOf(documents(s, d), 3, 0.5)

  /** The operator over an arbitrary (doc_id, text) frame — what the
    * registered query runs and what the fluent API exposes. The near-dup
    * pair frame minhashDedup persists is SCRATCH here, not the output —
    * the verdict frame is materialized and the pair cache released before
    * returning (on any exit), per the staged-release discipline.
    *
    * Exact PRE-COLLAPSE, gated (the replication defense at cluster
    * grain): verbatim copies of a page are pairwise J = 1.0, so a
    * corpus with a million-times-replicated page would feed the pair
    * graph O(copies²) edges before clustering even starts. One
    * doc-grain hash pass measures the LARGEST verbatim-copy group; at
    * or under [[CollapseMaxGroup]] the direct path runs (the tiny
    * C(m,2) edge groups are harmless, and the collapse machinery —
    * a signature semi-join and the member expansion — would be pure
    * overhead on the typical mostly-distinct corpus), past it docs
    * with identical text collapse to one representative (min doc_id;
    * groupBy + join back, not a window, per [[ngramDedup]]'s skew
    * note), the near-dup machinery runs over distinct texts only, and
    * members inherit their representative's component label through
    * one star join. Labels are identical on both paths: rep = min of
    * its text group and the CC label = min rep in the component, so
    * cluster_id is always the smallest member id of the whole
    * cluster. Windowless docs (fewer than n tokens) get singleton
    * keys rather than collapsing: they produce no shingles, so the
    * pair graph — and the oracle — keeps them as singleton clusters
    * even when their texts are identical. */
  def dedupClustersOf(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    // h is doc-grain metadata (id + 32-char hash) — persisted so the
    // corpus text is scanned ONCE for the gate + collapse; released as
    // soon as the path is chosen (direct) or members materializes
    // (collapsed): every later stage reads doc-grain frames, never the
    // text. The windowless test matches the KERNEL's token count
    // (shingleTokens, not tokens): the pair graph is kernel-built, so
    // a doc the kernel sees as windowless must key "solo" here even
    // when SQL split would count a trailing empty token.
    val h = docs.select(col("doc_id"),
      when(size(shingleTokens(col("text"))) >= n, md5(col("text")))
        .otherwise(concat(lit("solo:"), col("doc_id"))).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grp = h.groupBy(col("h"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("m"))
    // metadata gate: one Long reaches the driver (coalesce: max over
    // an empty corpus is one null row, not zero rows). The gate runs
    // OUTSIDE the staged scope so the common direct path can return
    // dedupClustersDirect's already-staged frame as-is — re-wrapping
    // it would re-count the verdict cache for nothing.
    val maxGroup =
      try grp.agg(coalesce(max(col("m")), lit(0L))).head().getLong(0)
      catch { case t: Throwable => quietRelease(Seq(h), t); throw t }
    if (maxGroup <= CollapseMaxGroup) {
      h.unpersist(false)
      dedupClustersDirect(docs, n, threshold)
    } else stagedScope { scratch =>
      scratch.track(h)
      val members = scratch.pin(h
        .join(grp.select(col("h"), col("rep")).hint("shuffle_hash"), Seq("h"))
        .select(col("doc_id"), col("rep")))
      members.count()
      scratch.release(h)
      val reps = members.filter(col("doc_id") === col("rep"))
        .select(col("doc_id"))
      val pairs = scratch.track(minhashDedupAmong(docs, reps, n, threshold))
      val comp = connectedComponents(pairs.select("a", "b"))
        .withColumnRenamed("node", "rep")
      clusterVerdict(members, comp, "rep")
    }
  }

  /** The ungated direct path: pair graph at doc grain, no collapse
    * machinery and no gate scan. Callers that already exact-deduplicated
    * the input use this directly — [[Pipeline.pipelineCurate]] elects one
    * keeper per content hash before clustering, so the gate's full-text
    * hash pass could only ever observe maxGroup = 1. */
  private[graft] def dedupClustersDirect(docs: DataFrame, n: Int,
      threshold: Double): DataFrame =
    stagedScope { scratch =>
      val pairs = scratch.track(minhashDedup(docs, n, threshold))
      val comp = connectedComponents(pairs.select("a", "b"))
        .withColumnRenamed("node", "doc_id")
      clusterVerdict(docs.select(col("doc_id")), comp, "doc_id")
    }

  /** Shared verdict shape of both cluster paths: left-join the universe
    * to the component labels on `key` (a no-label node is its own
    * cluster), emit (doc_id, cluster_id, is_keeper). Direct path:
    * universe = docs at doc grain, key = doc_id. Collapsed path:
    * universe = (doc_id, rep) members, key = rep — the coalesce falls
    * back to the representative, which IS the group min. */
  private def clusterVerdict(universe: DataFrame, comp: DataFrame,
      key: String): DataFrame =
    universe
      .join(comp.hint("shuffle_hash"), Seq(key), "left")
      .select(
        col("doc_id"),
        coalesce(col("lbl"), col(key)).as("cluster_id"),
        (col("doc_id") === coalesce(col("lbl"), col(key))).as("is_keeper"))

  /** Oracle: transitive closure of the exact-Jaccard pair graph via a
    * recursive CTE — min reachable id per node, singletons fall back to
    * their own id. Hash-matching proves the distributed label
    * propagation reaches the same fixpoint the closure defines. */
  def dedupClustersOracle: String = s"""
    WITH RECURSIVE ${shingleSqlCte(3)},
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT a, b FROM inter
      JOIN sz sa ON a = sa.doc_id
      JOIN sz sb ON b = sb.doc_id
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5),
    edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
    reach(node, r) AS (
      SELECT u, v FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node),
    comp AS (
      SELECT node AS doc_id, LEAST(node, min(r)) AS cluster_id
      FROM reach GROUP BY node)
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           d.doc_id = COALESCE(c.cluster_id, d.doc_id) AS is_keeper
    FROM documents d LEFT JOIN comp c USING (doc_id)"""

  /** Oracle is the EXACT all-pairs answer: a hash match proves the LSH
    * candidate set lost nothing at this threshold. */
  def dedupMinhashOracle: String = jaccardOracle(3, 0.5)

  // ---------------------------------------------------------------- ngram

  /** Hub-shingle document-frequency cutoff for candidate generation. A
    * shingle present in D posting rows fans out to D² in the candidate
    * self-join, so ONE stop-phrase shingle in every doc turns the join
    * all-pairs — the skew a 100 TB corpus is guaranteed to contain.
    * Shingles above the cutoff are dropped from CANDIDATE GENERATION
    * ONLY; verification always runs over the full posting table, so
    * reported intersections, sizes and Jaccard are exact.
    *
    * [[ngramDedup]] measures df at DISTINCT-SET grain (set-identical
    * docs collapse to one representative before candidate generation),
    * so REPLICATION cannot manufacture hubs: a page copied a million
    * times — plus its lightly-edited variants — contributes one
    * distinct set per variant, their shared shingles stay rare, and
    * both the J=1.0 copy pairs and the J<1.0 variant pairs come out
    * exact (DedupSpec pins both). The only missed pairs are docs with
    * DIFFERENT shingle sets sharing nothing but shingles present in
    * more than `cutoff` DISTINCT sets — text assembled almost entirely
    * from genuine stop phrases, which is boilerplate_screen's province,
    * not near-dup detection's. (The test corpus's max document
    * frequency is 6, so the cutoff provably changes nothing there —
    * the oracle stays the exact all-pairs answer.) */
  val HubDfCutoff = 128

  /** Postings annotated with their shingle's document frequency: one
    * skew-safe partial-combined aggregate + one equi-join that also
    * establishes the shingle partitioning downstream consumers reuse
    * (AQE skew-join can split a hub's partition here, where a
    * window-function form would pin it to one task). The shared
    * posting-annotation primitive behind the hub cutoff — df is
    * counted at whatever grain the caller's posting table carries:
    * [[ngramCandidates]] annotates the table it is given (doc grain),
    * while [[ngramDedup]] feeds it REPRESENTATIVE postings, so its
    * cutoff means distinct sets (see its scaladoc for why that grain
    * is the one that survives replication). */
  private[graft] def dfAnnotated(sh: DataFrame): DataFrame =
    sh.join(sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .hint("shuffle_hash"), Seq("shingle"))

  /** Candidate pairs from a posting table, hub shingles dropped: the
    * per-shingle fanout is bounded at maxDf², never corpus². df is
    * measured over the rows of `sh` AS GIVEN (doc grain for a raw
    * posting table) — a caller defending against replication-made hubs
    * should pass representative postings or use [[ngramDedup]], which
    * collapses set-identical docs before annotating. */
  def ngramCandidates(sh: DataFrame, maxDf: Int): DataFrame = {
    val rare = dfAnnotated(sh).filter(col("df") <= maxDf)
    rare.as("x").join(rare.as("y").hint("shuffle_hash"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index,
    * hub-capped. The sub-cutoff posting self-join over the
    * [[dfAnnotated]] table produces candidates AND their rare-shingle
    * intersections in ONE fused pass — its group count is the rare
    * intersection, its key set is the candidate set — and hub shingles
    * contribute their exact co-occurrence counts through joins
    * restricted to the candidate pairs, so reported intersections/
    * Jaccard are exact while no posting list ever fans out past
    * cutoff².
    *
    * DISTINCT-SET grain (the replication defense): the kernel pass
    * fingerprints each doc's shingle SET (size + two seeded xor
    * channels), set-identical docs collapse to one representative, and
    * the whole posting machinery — df annotation, candidate self-join,
    * hub completion, verification — runs over representatives only.
    * Replication therefore cannot create hubs: a page copied E times
    * is ONE distinct set, so a lightly-edited variant still shares
    * RARE shingles with it and is found by the normal path, where a
    * doc-grain df would have pushed every shared shingle past the
    * cutoff and silently dropped the variant pair (DedupSpec pins
    * exactly this corpus). Results expand back to document grain at
    * cost proportional to the TRUE OUTPUT: within-group pairs are
    * J = 1.0 by set equality (E copies genuinely have E(E-1)/2 pairs;
    * no algorithm returns the exact answer smaller), and a rep-pair's
    * exact Jaccard holds verbatim for every cross-group member pair.
    * The two expansions are disjoint (J = 1.0 ⟺ equal sets ⟺ same
    * group), so nothing is emitted twice.
    *
    * On a collapse-free corpus (every set distinct, no hubs — the test
    * data: max df 6) the plan degenerates to the classic fused
    * self-join over all docs plus the annotation shuffle, the doc-grain
    * fingerprint window, and two output-sized expansion joins. */
  /** ONE kernel pass emits each doc's shingle array AND its set
    * fingerprint: size + two independently-seeded xor channels —
    * commutative, constant-state, ~2^-128 pair-collision odds on
    * non-adversarial data. A collision would merge two distinct sets
    * into one group — the same accepted-risk class as the family's
    * 64-bit shingle hashing, and the reason there are TWO channels
    * (one 64-bit xor alone is birthday-weak at corpus scale). */
  private[graft] def fingerprintedKernel(docs: DataFrame, n: Int): DataFrame = {
    import docs.sparkSession.implicits._
    kernelSource(docs)
      .map { case (id, text) =>
        val hs = hashShingleWindows(text, n)
        var f1 = 0L; var f2 = 0L; var i = 0
        while (i < hs.length) {
          f1 ^= hs(i)
          f2 ^= org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(hs(i), 1L)
          i += 1
        }
        (id, hs, hs.length.toLong, f1, f2)
      }.toDF("doc_id", "hs", "sz", "fp1", "fp2")
  }

  def ngramDedup(docs: DataFrame, n: Int, threshold: Double, maxDf: Int): DataFrame =
    stagedScope { scratch =>
      val base = scratch.pin(fingerprintedKernel(docs, n))
      // DISTINCT-SET grain: set-identical docs collapse to one
      // representative (min doc_id) BEFORE candidate generation, so
      // replication cannot create hub shingles — a page copied a
      // million times contributes ONE distinct set to every document
      // frequency. groupBy + join back, NOT a fingerprint-partitioned
      // window: min() partial-aggregates map-side so a mega-group
      // shrinks to one row per input partition before the shuffle, and
      // the join back is AQE-skew-splittable, where a window would pin
      // the whole group's rows to a single task (the dfAnnotated design
      // note, applied to this stage). The sz > 0 filter keeps
      // windowless docs (empty array ⇒ the shared (0,0,0) fingerprint)
      // out of the groups: no window ⇒ no shingle ⇒ no pair, matching
      // the oracle.
      val fps = base.filter(col("sz") > 0)
        .select(col("doc_id"), col("sz"), col("fp1"), col("fp2"))
      val grp = fps.groupBy(col("sz"), col("fp1"), col("fp2"))
        .agg(min(col("doc_id")).as("rep"))
      val members = scratch.pin(fps
        .join(grp.hint("shuffle_hash"), Seq("sz", "fp1", "fp2"))
        .select(col("doc_id"), col("sz"), col("rep")))
      val rsizes = members.filter(col("doc_id") === col("rep"))
        .select(col("doc_id"), col("sz"))
      val reps = rsizes.select(col("doc_id"))
      // postings of REPRESENTATIVE docs only, DF-annotated at the
      // distinct-set grain the cutoff now means
      val ann = scratch.pin(dfAnnotated(base
        .join(reps.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), explode(col("hs")).as("shingle"))))
      // footprint handoff: the candidate/verify shuffles below never
      // read base, so materialize ann (and members, computed inside the
      // same job) now and drop the kernel arrays — holding both to
      // scope end would cache the corpus's shingle data twice on a
      // collapse-free corpus (reps == all docs)
      ann.count()
      scratch.release(base)
      val rare = ann.filter(col("df") <= maxDf)
      val interRare = rare.as("x").join(rare.as("y").hint("shuffle_hash"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("rare_i"))
      val hub = ann.filter(col("df") > maxDf).select(col("doc_id"), col("shingle"))
      // hub completion fans out candidate pairs × their docs' hub
      // shingles — bounded by the candidate set, never df²
      val hubInter = interRare.select(col("a"), col("b")).hint("shuffle_hash")
        .join(hub.as("ha"), col("a") === col("ha.doc_id"))
        .join(hub.as("hb").hint("shuffle_hash"),
          col("b") === col("hb.doc_id") && col("ha.shingle") === col("hb.shingle"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("hub_i"))
      val j = col("intersection").cast("double") /
        (col("size_a") + col("size_b") - col("intersection"))
      // exact pair results at the representative grain (a < b rep ids)
      val repPairs = interRare
        .join(hubInter.hint("shuffle_hash"), Seq("a", "b"), "left")
        .select(col("a"), col("b"),
          (col("rare_i") + coalesce(col("hub_i"), lit(0L))).as("intersection"))
        .join(rsizes.select(col("doc_id").as("a"), col("sz").as("size_a"))
          .hint("shuffle_hash"), "a")
        .join(rsizes.select(col("doc_id").as("b"), col("sz").as("size_b"))
          .hint("shuffle_hash"), "b")
        .filter(j >= threshold)
        .select(col("a"), col("b"), col("intersection"),
          col("size_a"), col("size_b"), j.as("jaccard"))
      // expansion back to document grain — both frames are sized by the
      // TRUE OUTPUT (every emitted pair genuinely has its Jaccard):
      // within a group every pair is J = 1.0 by definition of set
      // equality, and a rep-pair's Jaccard holds verbatim for every
      // cross-group member pair. The two frames are disjoint by
      // construction (J = 1.0 ⟺ equal sets ⟺ same group), so no
      // dedup/anti-join pass is needed.
      val within = members.as("m1").join(members.as("m2").hint("shuffle_hash"),
          col("m1.rep") === col("m2.rep") &&
            col("m1.doc_id") < col("m2.doc_id"))
        .select(col("m1.doc_id").as("a"), col("m2.doc_id").as("b"),
          col("m1.sz").as("intersection"), col("m1.sz").as("size_a"),
          col("m2.sz").as("size_b"), lit(1.0).as("jaccard"))
      val cross = repPairs
        .join(members.select(col("rep").as("a"), col("doc_id").as("da"))
          .hint("shuffle_hash"), "a")
        .join(members.select(col("rep").as("b"), col("doc_id").as("db"))
          .hint("shuffle_hash"), "b")
        .select(least(col("da"), col("db")).as("a"),
          greatest(col("da"), col("db")).as("b"),
          col("intersection"),
          when(col("da") < col("db"), col("size_a"))
            .otherwise(col("size_b")).as("size_a"),
          when(col("da") < col("db"), col("size_b"))
            .otherwise(col("size_a")).as("size_b"),
          col("jaccard"))
      cross.unionByName(within)
    }

  def dedupNgram(s: SparkSession, d: String): DataFrame =
    ngramDedup(documents(s, d), 4, 0.5, HubDfCutoff)

  def dedupNgramOracle: String = jaccardOracle(4, 0.5)

  // -------------------------------------------------------------- simhash

  /** SimHash signature width and banding. 60 bits = 4 bands × 15: a pair
    * within Hamming ≤ 3 agrees exactly on ≥ 1 band (pigeonhole), so
    * bucket candidates have guaranteed recall. */
  val SimhashBits  = 60
  val SimhashBands = 4
  private val BandBits = SimhashBits / SimhashBands // 15

  /** 60-bit feature hash of a shingle: the first 15 md5 hex chars parsed
    * as an integer. md5 is a builtin in BOTH engines (DuckDB:
    * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`), and 60 bits keeps the
    * value inside a signed BIGINT in both — which is what lets the whole
    * simhash pipeline be oracle-checked, unlike the xxhash64 family the
    * other dedup paths keep for raw speed. */
  def md5Hash60(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 15), 16, 10).cast("long")

  /** SimHash over distinct 3-shingles: bit k of the signature is the
    * sign of Σ_features (±1 by feature-hash bit k). Hamming verified via
    * bit_count(xor); the full signature+banding+verify pipeline is
    * DuckDB-oracle-checked, and SimhashSpec proves banding recall vs the
    * brute-force pair table. */
  def simhashSignatures(docs: DataFrame, n: Int): DataFrame = {
    val h = col("h")
    val bitSums = (0 until SimhashBits).map(k =>
      sum(when(shiftright(h, k).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"s$k"))
    val sums = shingles(docs, n)
      .select(col("doc_id"), md5Hash60(col("shingle")).as("h"))
      .groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until SimhashBits).map(k =>
      when(col(s"s$k") > 0, lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col("doc_id"), sim.as("simhash"))
  }

  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val sig = simhashSignatures(documents(s, d), 3)
    val bands = sig.select(col("doc_id"), col("simhash"), posexplode(array(
      (0 until SimhashBands).map(j =>
        shiftrightunsigned(col("simhash"), BandBits * j)
          .bitwiseAND(lit((1L << BandBits) - 1))): _*))
      .as(Seq("band", "bv")))
    // bucket SELF-join over corpus-grain signatures: shuffle on the
    // (band, bv) key like the minhash candidate join — never broadcast
    bands.as("x").join(bands.as("y").hint("shuffle_hash"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  /** DuckDB twin of the FULL simhash pipeline: same shingles, same md5
    * 60-bit feature hash, 60 bit-vote sums, signature assembly, 4×15-bit
    * banding, bucketed pair generation and Hamming verify. The bit sums
    * are generated columns (DuckDB sums to HUGEINT internally — only the
    * sign is consumed, so no cast drift reaches the output). */
  def dedupSimhashOracle: String = {
    val sums = (0 until SimhashBits).map(k =>
      s"sum(CASE WHEN (h >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS s$k")
      .mkString(",\n      ")
    val sig = (0 until SimhashBits).map(k =>
      s"(CASE WHEN s$k > 0 THEN ${1L << k} ELSE 0 END)").mkString(" + ")
    val js = (0 until SimhashBands).map(j => s"($j)").mkString(",")
    s"""
    WITH ${shingleSqlCte(3)},
    h AS (SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h
          FROM sh),
    bt AS (SELECT doc_id,
      $sums
      FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id, $sig AS simhash FROM bt),
    bands AS (
      SELECT doc_id, simhash, j, (simhash >> ($BandBits * j)) & ${(1L << BandBits) - 1} AS bv
      FROM sig, (VALUES $js) AS js(j)),
    pairs AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
      FROM bands x JOIN bands y
        ON x.j = y.j AND x.bv = y.bv AND x.doc_id < y.doc_id)
    SELECT a, b, hamming FROM pairs WHERE hamming <= 3"""
  }
}

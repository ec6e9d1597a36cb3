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
  * - `dedup_simhash`: 64-bit SimHash with 4×16-bit band bucketing and
  *   Hamming≤3 verification (no SQL oracle; SimhashSpec checks it against
  *   brute force).
  *
  * Skew note (100 TB): hub shingles (stop-phrase posting lists) skew the
  * inverted-index join. The standard mitigation — salt the hot shingle's
  * posting list into S sub-buckets and replicate the other side S× (or
  * drop shingles with document frequency above a cutoff from *candidate
  * generation only*, never from verification) — composes with both the
  * LSH and exact paths; AQE skew-join handles the moderate case.
  */
object Dedup {

  /** Whitespace tokens, lowercased — identical semantics to the oracle's
    * string_split_regex(lower(trim(text)), '\s+'). */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Distinct word n-shingles from a MATERIALIZED token-array column.
    * `w` must be a plain column reference: Catalyst does not CSE through
    * higher-order lambdas, so inlining `split()` here would re-run the
    * split for every element_at — O(len²) per row (measured 12 s for 5000
    * docs before the fix, <1 s after). */
  def shinglesOfTokens(w: Column, n: Int): Column =
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k + 1))): _*))))
      .otherwise(array().cast("array<string>"))

  /** Inline convenience for small inputs (tests) — quadratic form. */
  def shingleArr(c: Column, n: Int): Column = shinglesOfTokens(tokens(c), n)

  /** Exploded (doc_id, shingle) posting table. The tokenization is
    * projected first and pinned by a repartition exchange: the exchange is
    * the parallelism source for this compute-bound stage (the input may be
    * a single file split) AND the barrier that keeps the token array
    * materialized (CollapseProject would otherwise re-inline the split
    * into every lambda element access). */
  def shingles(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(shinglesOfTokens(col("w"), n)).as("shingle"))

  /** The DuckDB twin of [[shingleArr]]: 1-based list indexing, same split. */
  def shingleSqlCte(n: Int): String = {
    val cat = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |          FROM documents),
       |sh AS (SELECT doc_id, unnest(list_distinct(
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

  /** Public face of [[verifyJaccard]] for the fluent API (graft.api). */
  def verifyJaccardOf(cand: DataFrame, sh: DataFrame, threshold: Double): DataFrame =
    verifyJaccard(cand, sh, threshold)

  /** Exact Jaccard of candidate pairs via the shingle posting table: two
    * hash joins keyed on (doc, shingle) — never touches non-candidates. */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.as("sa"), col("a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("b") === col("sb.doc_id") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("intersection"))
    val j = col("intersection").cast("double") /
      (col("size_a") + col("size_b") - col("intersection"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "size_a"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "size_b"), "b")
      .filter(j >= threshold)
      .select(col("a"), col("b"), col("intersection"),
        col("size_a"), col("size_b"), j.as("jaccard"))
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
  def minhashSignatures(docs: DataFrame, n: Int): DataFrame = {
    val aggs = (0 until NumHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
    shingles(docs, n).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded LSH candidates: explode signatures to (band, band_hash) keys,
    * equi-self-join the bucket table. */
  def minhashCandidates(sig: DataFrame): DataFrame = {
    val bands = sig.select(col("doc_id"), posexplode(array(
      (0 until Bands).map(j =>
        xxhash64(lit(j), col(s"m${2 * j}"), col(s"m${2 * j + 1}"))): _*))
      .as(Seq("band", "bv")))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  def dedupMinhash(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val sh   = shingles(docs, 3)
    verifyJaccard(minhashCandidates(minhashSignatures(docs, 3)), sh, 0.5)
  }

  /** Oracle is the EXACT all-pairs answer: a hash match proves the LSH
    * candidate set lost nothing at this threshold. */
  def dedupMinhashOracle: String = jaccardOracle(3, 0.5)

  // ---------------------------------------------------------------- ngram

  /** Exact 4-gram Jaccard near-dup pairs via inverted index. The posting
    * self-join's (a,b) group count IS the intersection size — no separate
    * candidate/verify passes, one fanout, map-side combinable. */
  def dedupNgram(s: SparkSession, d: String): DataFrame = {
    val sh = shingles(documents(s, d), 4)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("intersection"))
    val j = col("intersection").cast("double") /
      (col("size_a") + col("size_b") - col("intersection"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "size_a"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "size_b"), "b")
      .filter(j >= 0.5)
      .select(col("a"), col("b"), col("intersection"),
        col("size_a"), col("size_b"), j.as("jaccard"))
  }

  def dedupNgramOracle: String = jaccardOracle(4, 0.5)

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over distinct 3-shingles: bit k of the signature is the
    * sign of Σ_features (±1 by feature-hash bit k). Banded into 4×16 bits —
    * a pair within Hamming ≤ 3 agrees exactly on ≥1 band (pigeonhole), so
    * bucket candidates have guaranteed recall; Hamming verified via
    * bit_count(xor). No SQL oracle (SimhashSpec vs brute force). */
  def simhashSignatures(docs: DataFrame, n: Int): DataFrame = {
    val h = xxhash64(col("shingle"))
    val bitSums = (0 until 64).map(k =>
      sum(when(shiftright(h, k).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"s$k"))
    val sums = shingles(docs, n).groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map(k =>
      when(col(s"s$k") > 0, lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col("doc_id"), sim.as("simhash"))
  }

  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val sig = simhashSignatures(documents(s, d), 3)
    val bands = sig.select(col("doc_id"), col("simhash"), posexplode(array(
      (0 until 4).map(j =>
        shiftrightunsigned(col("simhash"), 16 * j).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("band", "bv")))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }
}

package graft.streaming

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming benchmark decontamination: every ingested document is
  * screened against the benchmark n-gram set BEFORE it enters the corpus
  * — the ingest-side twin of [[Curation.decontaminate]], in front of the
  * batch screen the same way StreamingDedup fronts dedup_exact.
  *
  * The stream side is completely STATELESS and shuffle-free: the
  * benchmark n-gram set is metadata-sized (an eval suite, not a corpus),
  * so it ships to every task as one broadcast-style closure set of
  * 64-bit shingle hashes, and each document resolves its own verdict
  * in-row with the batch pipeline's zero-allocation shingle kernel
  * (same tokenize → n-gram → xxhash64(seed 42) → distinct semantics, so
  * stream hit counts equal the batch operator's string-shingle counts
  * up to xxhash collisions, ~1e-10 per corpus —
  * StreamingDecontamSpec proves equality on real docs). No join state,
  * no watermark, no aggregation: arrival order and batch boundaries
  * cannot change a verdict, and a restart re-screens only what the sink
  * hasn't committed. */
object StreamingDecontaminator {

  final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  /** Hard bound on the collected benchmark shingle set: ~40 MB of longs,
    * generous for any real eval suite, far below corpus scale. */
  val MaxBenchShingles = 5000000L

  /** The static side: distinct hashed n-grams of the benchmark docs,
    * collected to a driver set. The in-row screen REQUIRES a
    * metadata-sized suite — unlike the batch operator, which shuffles
    * its corpus-proportional stand-in slice, this path has no shuffled
    * fallback, so the boundedness assumption is ENFORCED (counted before
    * collect) rather than assumed: a corpus-scale frame fails loudly
    * here instead of OOMing the driver, and such a workload belongs on
    * [[Curation.decontaminate]]. */
  def benchSet(bench: DataFrame, n: Int = Curation.DecontamN,
               maxShingles: Long = MaxBenchShingles): Set[Long] = {
    // a driver-collected Set cannot exceed Int range anyway, and bounds
    // at or past it would make the limit-based check below vacuous (or,
    // at Long.MaxValue, overflow into an EMPTY collect) — refuse them
    require(maxShingles > 0 && maxShingles < Int.MaxValue,
      s"maxShingles must be in (0, ${Int.MaxValue}), got $maxShingles")
    // ONE bounded job: collecting max+1 rows proves the bound was blown
    // without a second pipeline pass (and without an unbounded collect)
    val arr = Dedup.hashedShingles(bench, n)
      .select(col("shingle")).distinct()
      .limit(maxShingles.toInt + 1)
      .collect()
    require(arr.length <= maxShingles,
      s"benchmark set has over $maxShingles distinct shingles: " +
        "the streaming screen needs a metadata-sized eval suite; screen a " +
        "corpus-scale set with the batch Curation.decontaminate join instead")
    arr.map(_.getLong(0)).toSet
  }

  /** (doc_id, ts, n_hits, contaminated) per arriving doc — append-mode
    * friendly (one output row per input row, no state). */
  def screen(docs: Dataset[Doc], bench: Set[Long],
             n: Int = Curation.DecontamN): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { d =>
      val hits = Dedup.hashShingleWindows(d.text, n).count(bench)
      (d.doc_id, d.ts, hits.toLong, hits > 0)
    }.toDF("doc_id", "ts", "n_hits", "contaminated")
  }
}

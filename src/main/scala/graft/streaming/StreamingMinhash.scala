package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming MinHash candidates: newly-ingested documents checked for
  * near-duplicates against a STATIC corpus LSH index — the production
  * shape of "does this incoming training document duplicate anything we
  * already hold?" at ingest time, in front of the batch dedup operators.
  *
  * The whole pipeline is STATELESS on the stream side except the final
  * within-watermark pair dedup:
  *  - each document's 64-hash MinHash signature is computed IN-ROW from
  *    its own shingle set (an array column produced by the same
  *    zero-allocation shingle kernel the batch posting table uses), so
  *    there is no per-doc groupBy, no shuffle, no signature state;
  *  - candidate generation is a stream-static equi-join on
  *    (band, band_hash) against [[Dedup.bandTable]] of the corpus —
  *    Spark keeps no join state for the static side;
  *  - the only state is dropDuplicatesWithinWatermark over the emitted
  *    (new_doc, corpus_doc) pairs (a pair can match in several bands),
  *    bounded by arrival rate × watermark horizon.
  *
  * Signature values are bit-identical to the batch
  * `min(xxhash64(seed, shingle))` aggregation — same shingle hashes, same
  * seed family, same band keys — so stream candidates equal the batch
  * candidate set restricted to (stream doc, corpus doc) pairs
  * (StreamingMinhashSpec proves the equality). */
object StreamingMinhash {

  final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  /** Static side: the corpus LSH bucket table, built once with the batch
    * pipeline (persist it or write it as the index parquet). */
  def corpusIndex(corpus: DataFrame, n: Int = 3): DataFrame =
    Dedup.bandTable(Dedup.minhashSignaturesInRow(corpus, n))

  /** Candidate pairs (new_doc, corpus_doc, ts) for a document stream
    * against a prepared [[corpusIndex]]. */
  def candidates(docs: Dataset[Doc], corpusBands: DataFrame, n: Int = 3,
                 watermarkDelay: String = "10 minutes"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // per-row signature via THE batch kernel (Dedup.minhashSigArr — one
    // running-min pass, no HOF lambdas): the hash family lives in one
    // place, so batch and stream cannot drift
    val sigCols = (0 until Dedup.NumHashes).map(i =>
      element_at(col("sig"), i + 1).as(s"m$i"))
    val sig = docs
      .map(d => (d.doc_id, d.ts, Dedup.minhashSigArr(d.text, n)))
      .toDF("doc_id", "ts", "sig")
      .filter(size(col("sig")) > 0) // batch drops shingle-less docs too
      .select(col("doc_id") +: col("ts") +: sigCols: _*)
    // band explode inline (not Dedup.bandTable) so ts rides along — a
    // re-join to recover it would be a stream-stream join
    sig.select(col("doc_id"), col("ts"), posexplode(array(
        (0 until Dedup.Bands).map(j =>
          xxhash64(lit(j), col(s"m${2 * j}"), col(s"m${2 * j + 1}"))): _*))
        .as(Seq("band", "bv")))
      .withWatermark("ts", watermarkDelay)
      .join(corpusBands.select(col("doc_id").as("corpus_doc"),
        col("band"), col("bv")), Seq("band", "bv"))
      .filter(col("doc_id") =!= col("corpus_doc"))
      .select(col("doc_id").as("new_doc"), col("corpus_doc"), col("ts"))
      .dropDuplicatesWithinWatermark("new_doc", "corpus_doc")
  }
}

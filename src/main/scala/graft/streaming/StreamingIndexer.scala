package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of a persisted IVF-PQ index: each micro-batch
  * of (vec_id, embedding) rows is assigned with the index's EXISTING
  * quantizers and committed through [[IvfIndex.appendTagged]] — the
  * tagged manifest flip gives exactly-once indexing under foreachBatch's
  * at-least-once redeliveries, the same two-layer contract as
  * [[IncrementalCruncher]] (ledger + atomic visibility flip; a
  * half-written member directory from a crashed attempt is overwritten
  * on retry and never read, because only the manifest makes it
  * visible). Searches see old ∪ new immediately after each commit with
  * unchanged partition pruning (StreamingIndexSpec equates the
  * post-stream [[IvfIndex.searchPq]] with a from-scratch rebuild's).
  *
  * At 100 TB this is the standard "index the firehose" shape: quantizer
  * state is frozen driver metadata, every batch is an O(batch)
  * cell-partitioned write, and nothing ever rewrites the existing
  * members (compaction/retraining is an explicit offline rebuild, as in
  * FAISS practice). */
final class StreamingIndexer(index: IvfIndex) {

  /** Fold one batch of (vec_id, embedding) rows into the index;
    * re-deliveries of a committed batch id are no-ops. */
  def indexBatch(batch: DataFrame, batchId: Long): Unit =
    index.appendTagged(s"b$batchId", batch)

  /** Attach to a streaming source of (vec_id, embedding) rows. */
  def run(stream: DataFrame, checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => indexBatch(batch, id))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

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
final class StreamingIndexer(index0: IvfIndex) {

  private var index = index0

  /** Fold one batch of (vec_id, embedding) rows into the index;
    * re-deliveries of a committed batch id are no-ops. An offline
    * [[IvfIndex.rebalance]] between batches makes this handle's
    * quantizers stale — the append fails loudly, and because the
    * consumed-tag ledger SURVIVES the rebalance flip, reloading and
    * retrying the same tag preserves exactly-once (already-committed
    * tags stay no-ops on the fresh handle). The stream heals instead of
    * dying. */
  def indexBatch(batch: DataFrame, batchId: Long): Unit =
    try index.appendTagged(s"b$batchId", batch)
    catch { case e: IllegalArgumentException
        if e.getMessage != null && e.getMessage.contains("rebalanced") =>
      index = index.reload()
      index.appendTagged(s"b$batchId", batch)
    }

  /** Attach to a streaming source of (vec_id, embedding) rows. */
  def run(stream: DataFrame, checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => indexBatch(batch, id))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

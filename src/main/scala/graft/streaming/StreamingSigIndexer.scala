package graft.streaming

import graft.operators.DedupIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of a persisted near-dup signature index: each
  * micro-batch of (doc_id, text) rows is shingled/signed once and
  * committed through [[DedupIndex.appendTagged]], so the nightly
  * `dedup_incremental` probe always runs against a corpus index that is
  * current to the last ingested batch — the ingest half of the
  * incremental-dedup story, next to [[StreamingMinhash]]'s query half
  * (which probes a static band table but maintains nothing).
  *
  * The tagged manifest flip gives exactly-once indexing under
  * foreachBatch's at-least-once redeliveries — the same ledger + atomic
  * visibility contract as [[StreamingIndexer]] and
  * [[IncrementalCruncher]]: a crashed attempt's half-written member dir
  * is invisible (only the manifest publishes it) and clobbered by the
  * retry's Overwrite. Unlike the IVF indexer there is no quantizer to
  * go stale — the shingle width is pinned in the manifest and every
  * append reads it — so an offline [[DedupIndex.compact]] between
  * batches needs no heal path: the ledger survives the compaction flip
  * and a late redelivery stays a no-op (StreamingSigIndexSpec pins
  * it). At 100 TB each batch is one O(batch) kernel pass plus an
  * O(batch) parquet write; nothing rewrites existing members. */
object StreamingSigIndexer {

  /** Fold one batch into the index; redeliveries of a committed batch
    * id are no-ops. */
  def indexBatch(index: DedupIndex, batch: DataFrame, batchId: Long): Unit =
    index.appendTagged(s"b$batchId", batch)

  /** Attach to a streaming source of (doc_id, text) rows. */
  def run(index: DedupIndex, stream: DataFrame,
          checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => indexBatch(index, batch, id))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

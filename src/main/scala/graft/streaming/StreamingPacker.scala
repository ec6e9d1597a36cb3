package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Sampling.packOf`: continuous sequence packing —
  * every arriving document is appended to its stratum's concatenation
  * stream and leaves with its start offset and training-context bin
  * already assigned, so downstream batch assembly never re-scans the
  * corpus.
  *
  * State per stratum is ONE long (the stream's running token total) —
  * O(strata), independent of document volume, never timed out (a
  * stratum's offset is permanent stream position, not a window).
  *
  * Ordering contract: offsets follow ARRIVAL order across micro-batches
  * (within a batch, ids are sorted for determinism). When documents
  * arrive in id order, the stream's layout is bit-identical to the batch
  * operator's — StreamingPackerSpec feeds the same corpus through both
  * and equates them; out-of-order arrival yields a valid packing in
  * arrival order, which is the semantics a continuous ingest pipeline
  * actually wants (you cannot hold the stream to re-sort history).
  */
object StreamingPacker {

  final case class Doc(doc_id: Long, stratum: String, n_tokens: Long)
  final case class Packed(
    doc_id: Long, stratum: String, n_tokens: Long,
    start_offset: Long, bin: Long, bin_offset: Long)
  final case class PackState(nextOffset: Long)

  def step(budget: Long)(stratum: String, docs: Iterator[Doc],
                         state: GroupState[PackState]): Iterator[Packed] = {
    require(budget > 0, s"token budget must be positive: $budget")
    var off = state.getOption.map(_.nextOffset).getOrElse(0L)
    val out = docs.toIndexedSeq.sortBy(_.doc_id).map { d =>
      val p = Packed(d.doc_id, stratum, d.n_tokens, off,
        off / budget, off % budget)
      off += d.n_tokens
      p
    }
    state.update(PackState(off))
    out.iterator
  }

  /** Wire the stateful step over a (streaming or batch) document
    * Dataset. No watermark: offsets are permanent stream positions.
    *
    * Throughput shape: each trigger funnels a stratum's batch slice
    * through one task (the within-batch sort buffers that slice), so
    * per-trigger cost is O(largest stratum's slice), not O(strata) —
    * the state is tiny, the per-trigger work is not automatically so.
    * A single mega-stratum ingest should pre-shard the stratum key
    * (the streaming analogue of `Sampling.packOfSharded`) and stitch
    * shard offsets downstream. */
  def pack(s: SparkSession, docs: Dataset[Doc],
           budget: Long = graft.operators.Sampling.Budget): Dataset[Packed] = {
    require(budget > 0, s"token budget must be positive: $budget")
    import s.implicits._
    docs.groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        step(budget))
  }
}

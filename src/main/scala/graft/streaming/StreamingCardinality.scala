package graft.streaming

import graft.functions.SketchOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Windowed cardinality + distribution tracking over an ingest stream —
  * the streaming twin of `distinct_by_lang`/`quantiles_by_lang`
  * ("distinct shingles and length percentiles per language, this hour,
  * over 100 TB/day of ingest"). The same composition that gives
  * [[StreamingTrends]] bounded state gives it to both new sketches:
  * they are TypedImperativeAggregates, so the sketch buffer IS the
  * state-store row (serialize/deserialize are the checkpoint format) —
  * state per (window, group) is one sparse set / register array and one
  * level pyramid, regardless of stream cardinality, and each
  * micro-batch folds in through the mergeable combine, so arrival
  * order and batch boundaries never change the exact-regime answer
  * (StreamingCardinalitySpec proves stream ≡ batch per window).
  *
  * Watermark bounds how long a window's sketches stay in state; the
  * emitted rows carry the SERIALIZED sketches too, so a downstream
  * [[StreamingPointStore]] can fold finalized windows straight into a
  * persisted sketch-measured point table — stream → window sketch →
  * LSM store, every stage mergeable (StreamingCardinalitySpec pins the
  * wired chain end-to-end: append-mode finalized windows foldBatch'd
  * per micro-batch, maintained snapshot ≡ the batch recompute across
  * restart, forced redelivery, and compaction). */
object StreamingCardinality {

  /** One ingest event: a group key, a distinct-counted item, and a
    * measured length. */
  final case class Evt(ts: java.sql.Timestamp, grp: String,
                       item: Long, len: Long)

  def vocab(evts: Dataset[Evt], p: Int, sparseCap: Int, quantileK: Int,
            windowLen: String = "10 minutes",
            delay: String = "5 minutes"): DataFrame =
    evts
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen), col("grp"))
      .agg(SketchOps.distinctSketch(col("item"), p, sparseCap).as("dsk"),
        SketchOps.quantileSketch(col("len"), quantileK).as("qsk"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("grp"),
        SketchOps.sketchEst(col("dsk")).as("n_distinct"),
        SketchOps.quantileAt(col("qsk"), 0.5).as("p50"),
        SketchOps.quantileAt(col("qsk"), 0.95).as("p95"),
        col("dsk"), col("qsk"))
}

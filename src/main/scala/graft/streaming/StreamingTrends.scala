package graft.streaming

import graft.functions.SketchOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Windowed heavy-hitters over a token stream — the streaming twin of
  * `freq_tokens` ("what's trending this window" over 100 TB/day of
  * ingest). The SpaceSaving aggregate composes with Structured
  * Streaming's stateful aggregation exactly because it is a
  * TypedImperativeAggregate: the k-counter buffer IS the state-store
  * row (serialize/deserialize are the checkpoint format), so state per
  * window stays k entries regardless of the token universe — the same
  * bounded-state argument the batch sketch makes about the exchange,
  * applied to the state store.
  *
  * Watermark bounds how long a window's sketch stays in state; each
  * micro-batch folds into it via the mergeable-summaries combine, so
  * arrival order and batch boundaries never change the exact-regime
  * answer (StreamingTrendsSpec proves stream ≡ batch per window). */
object StreamingTrends {

  final case class Tok(ts: java.sql.Timestamp, token: String)

  def trends(toks: Dataset[Tok], k: Int,
             windowLen: String = "10 minutes",
             delay: String = "5 minutes"): DataFrame =
    toks
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen))
      .agg(SketchOps.topkFreq(col("token"), k).as("tk"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("tk"))
}

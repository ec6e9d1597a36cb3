package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment: join a live event stream against a static
  * (or slowly-refreshed) dimension table — the streaming face of the
  * reference's dimension joins. The static side is broadcast per
  * micro-batch, so the stream never shuffles; downstream the enriched
  * stream feeds the same windowed aggregations the batch engine runs.
  * EnricherSpec equates stream output with the batch join. */
object Enricher {

  /** Attach dimension columns to each event by key. Works on a batch OR
    * streaming `events` frame (stream-static join is stateless). */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
             dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Enriched tumbling-window rollup: events × dim → per (window, dim
    * attribute) counts — the crunch shape over a live stream. */
  def enrichedCounts(events: DataFrame, dim: DataFrame, eventKey: String,
                     dimKey: String, dimAttr: String): DataFrame =
    enrich(events, dim, eventKey, dimKey)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col(dimAttr))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col(dimAttr), col("n"))
}

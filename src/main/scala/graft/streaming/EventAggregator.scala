package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming twin of `Windows.eventsWindow`: tumbling 1-hour event-time
  * windows with a 2-hour watermark. Works on any DataFrame with
  * (ts timestamp, event_type string, value double) — batch or stream; on
  * a stream the state store holds only open windows (watermark evicts
  * closed ones), so state is bounded by windows-in-flight × event types,
  * not by events.
  *
  * `countDistinct` is not available under incremental aggregation, so the
  * streaming schema carries (n, sum_value) — the batch twin's remaining
  * `users` column is a batch-only extra, and EventStreamSpec equates the
  * shared columns.
  */
object EventAggregator {

  def aggregate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: correlate each trigger event
  * with the response events of the same user inside the response window
  * (e.g. view → click within 30 minutes).
  *
  * Both sides carry watermarks and the join condition bounds the time
  * range, so the state store holds only rows inside the watermark +
  * window horizon — the state-bounded form of a stream-stream join
  * (unbounded conditions are rejected by Spark for exactly this reason).
  * Works identically on batch frames; CorrelatorSpec equates the two.
  */
object Correlator {

  val WindowMinutes = 30

  /** `triggers` and `responses`: (ts, user_id, event_id) frames. Returns
    * one row per (trigger, response) pair within the window. */
  def correlate(triggers: DataFrame, responses: DataFrame): DataFrame = {
    val t = triggers
      .withWatermark("ts", "1 hour")
      .select(col("ts").as("t_ts"), col("user_id").as("t_user"),
        col("event_id").as("trigger_id"))
    val r = responses
      .withWatermark("ts", "1 hour")
      .select(col("ts").as("r_ts"), col("user_id").as("r_user"),
        col("event_id").as("response_id"))
    t.join(r,
      col("t_user") === col("r_user") &&
      col("r_ts") >= col("t_ts") &&
      col("r_ts") <= col("t_ts") + expr(s"INTERVAL $WindowMinutes MINUTES"))
      .select(col("t_user").as("user_id"), col("trigger_id"), col("response_id"),
        date_format(col("t_ts"), "yyyy-MM-dd HH:mm:ss").as("trigger_ts"),
        date_format(col("r_ts"), "yyyy-MM-dd HH:mm:ss").as("response_ts"))
  }
}

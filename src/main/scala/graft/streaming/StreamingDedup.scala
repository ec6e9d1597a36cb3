package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup: drop re-deliveries of the same document inside
  * the watermark horizon — the ingest-side guard in front of the batch
  * dedup operators (Dedup.scala). State holds one key per distinct
  * content hash seen within the watermark; eviction is automatic, so
  * state is bounded by arrival rate × horizon, not corpus size. The
  * content key is md5(text), the same key `dedup_exact` groups on —
  * ingest-time and batch-time dedup agree by construction. */
object StreamingDedup {

  def dedup(docs: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
}

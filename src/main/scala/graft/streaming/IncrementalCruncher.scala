package graft.streaming

import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's worker loop (consume batch → crunch → additive upsert
  * into the point table; worker.js:119-165) as Structured Streaming.
  *
  * Each micro-batch is aggregated to the dimension tuple and additively
  * merged with the persisted point table via `Merge.merge` — the same
  * distributed shuffle-on-key combine the `upsert_merge` oracle proves,
  * so state after N batches equals the one-shot aggregate of their union
  * (asserted in IncrementalSpec). The point table is versioned
  * (`state/v<epoch>` + `_LATEST` pointer): each commit is an atomic
  * pointer flip, readers never see a half-written table, and the merge
  * never reads the file it is writing. At cluster scale the same shape
  * runs against a table format's transactional MERGE; the aggregation
  * and merge plans are unchanged.
  */
final class IncrementalCruncher(spark: SparkSession, stateDir: String) {

  private val fs = new java.io.File(stateDir)
  fs.mkdirs()

  private def latestFile = new java.io.File(fs, "_LATEST")

  def currentVersion: Option[String] =
    if (latestFile.exists)
      Some(new String(java.nio.file.Files.readAllBytes(latestFile.toPath)).trim)
    else None

  /** The live point table (empty-schema None before the first batch). */
  def pointTable(): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(s"$stateDir/$v"))

  /** Fold one batch of fact rows into the point table. */
  def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
    val batchPoint = Merge.pointAgg(batch)
    val merged = pointTable() match {
      case Some(prev) => Merge.merge(Seq(prev, batchPoint))
      case None       => batchPoint
    }
    val v = f"v$batchId%06d"
    merged.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/$v")
    val tmp = new java.io.File(fs, "_LATEST.tmp")
    java.nio.file.Files.write(tmp.toPath, v.getBytes)
    java.nio.file.Files.move(tmp.toPath, latestFile.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Attach to a streaming source of fact rows. */
  def run(stream: DataFrame, checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => mergeBatch(batch, id))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Finished point table in the driver-contract shape. */
  def result(): Option[DataFrame] = pointTable().map(Merge.finish)
}

package graft.streaming

import graft.sources.PointStore
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The product-analytics reports as MAINTAINED tables — the
  * [[IncrementalCruncher]]/[[StreamingPointStore]] loop applied to the
  * analytics family: the streaming twins' exactly-once emitted cells
  * ([[StreamingFunnel]] reaches, [[StreamingRetention]] cohort cells,
  * [[StreamingPaths]] adjacency pairs) fold into persisted PointStores
  * as each micro-batch lands, so the report READ is O(store) — a
  * handful of key-grain rows — instead of the O(events) re-scan every
  * GET /funnel //retention//paths otherwise pays. At 100 TB of events
  * the difference is the whole point: the scan happens once, in the
  * stream, and the dashboard read never touches it.
  *
  * Exactly-once end to end: the twins emit each cell once by the
  * watermark-finality contract (StreamingSpec), and
  * [[StreamingPointStore.foldBatch]] commits each micro-batch's
  * additive partial under the store's tag ledger, so a foreachBatch
  * redelivery is a no-op and the snapshot is always a prefix-exact
  * report.
  *
  * The registered lifecycle (`funnel_maintained`) drives the loop the
  * way production would: the events table lands as three parquet
  * "nightly drops" sliced by a content hash (a user's journey spans
  * all three — the out-of-order worst case), the maintenance job runs
  * with `Trigger.AvailableNow` and RESTARTS between drops (watermark
  * and file ledger ride the on-disk checkpoint), two far-future
  * watermark-advance sentinels finalize the tail, and the query
  * returns the maintained report — oracled against the one-shot batch
  * funnel SQL over the same events. */
object Maintained {

  /** Sentinel rows advance the watermark without entering any twin's
    * state: not a funnel step, filtered nowhere, folded nowhere. */
  val SentinelType = "_watermark"

  /** Land a frame as ONE parquet file in the watched drop directory —
    * the "nightly file lands in the bucket" shape a streaming file
    * source consumes. */
  private def dropFile(df: DataFrame, watched: java.io.File,
                       name: String): Unit = {
    val stage = new java.io.File(watched.getParentFile, s"stage_$name")
    df.coalesce(1).write.mode("overwrite").parquet(stage.getPath)
    val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(watched, s"$name.parquet").toPath)
    PointStore.deleteRec(stage)
  }

  /** The funnel report read from a maintained (step, step_name)/users
    * store: absent step = zero users — the batch report's exact shape
    * (non-increasing counts, every step present). */
  def funnelReportFrom(s: SparkSession, store: PointStore): DataFrame = {
    import s.implicits._
    val steps = StreamingFunnel.Steps.zipWithIndex
      .map { case (n, i) => (i + 1, n) }.toDF("step", "step_name")
      .select(col("step").cast("int").as("step"), col("step_name"))
    steps.join(store.snapshot, Seq("step", "step_name"), "left")
      .select(col("step"), col("step_name"),
        coalesce(col("users"), lit(0L)).as("users"))
  }

  /** One maintenance run: consume every not-yet-seen drop file, fold
    * each micro-batch's reaches into the store, stop. Restartable —
    * the checkpoint carries the watermark and the file ledger. */
  private def runFunnelOnce(s: SparkSession, watched: java.io.File,
                            store: PointStore, ckpt: String): Unit = {
    val stream = s.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_type STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(watched.getPath)
    import s.implicits._
    val q = StreamingFunnel.funnel(s, stream.as[StreamingFunnel.Ev])
      .writeStream
      .foreachBatch((b: Dataset[StreamingFunnel.Reach], id: Long) =>
        StreamingPointStore.foldBatch(store,
          _.groupBy("step", "step_name").agg(count(lit(1)).as("users")),
          b.toDF, id))
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** `funnel_maintained`: the registered lifecycle — three hash-sliced
    * nightly drops, a maintenance restart between nights, two
    * watermark sentinels, then the O(store) report read. Oracle = the
    * one-shot staged-min funnel SQL over the same events. */
  def funnelMaintained(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val root = graft.operators.DedupIndex.freshRunDir("graft_funmaint_", d)
    val watched = new java.io.File(root, "drops"); watched.mkdirs()
    val ev = graft.Tables.events(s, d)
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"))
    val slice = pmod(xxhash64(col("user_id"), col("ts")), lit(3))
    (0 to 2).foreach(i => dropFile(ev.filter(slice === i), watched, s"n$i"))
    val maxTs = ev.agg(max(col("ts"))).head.getTimestamp(0) // two-value bound
    val store = new PointStore(s, new java.io.File(root, "funnel").getPath,
      keys = Seq("step", "step_name"), sums = Seq("users"), maxes = Nil)
    val ckpt = new java.io.File(root, "ckpt").getPath
    def sentinel(name: String, plusDays: Int): Unit =
      dropFile(Seq((-1L,
          new java.sql.Timestamp(maxTs.getTime + plusDays * 86400000L),
          SentinelType)).toDF("user_id", "ts", "event_type"),
        watched, name)
    runFunnelOnce(s, watched, store, ckpt) // the three drops, one per batch
    sentinel("s1", 2)
    runFunnelOnce(s, watched, store, ckpt) // restart: state off the checkpoint
    sentinel("s2", 4)
    runFunnelOnce(s, watched, store, ckpt) // wm now past every real event
    funnelReportFrom(s, store)
  }
}

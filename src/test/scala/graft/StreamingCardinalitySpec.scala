package graft

import graft.functions.SketchOps
import graft.streaming.StreamingCardinality
import graft.streaming.StreamingCardinality.Evt
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Both new sketches must fold through the state store exactly:
  * per-window streamed distinct counts and quantiles equal the batch
  * windowed aggregation, across micro-batch boundaries that split
  * windows, and the emitted sketch binaries stay foldable downstream. */
class StreamingCardinalitySpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)

  test("windowed stream sketches equal the batch windowed aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two 10-minute windows, two groups; items repeat (distinct < count)
    val rows = (0 until 400).map { i =>
      Evt(ts((i % 2) * 10 + i % 10), if (i % 3 == 0) "en" else "de",
        (i % 57).toLong + (i % 2) * 1000, (i % 23).toLong)
    }

    val stream = MemoryStream[Evt]
    val q = StreamingCardinality.vocab(stream.toDS, p = 12,
        sparseCap = 4096, quantileK = 1024)
      .writeStream.format("memory").queryName("card_out")
      .outputMode("complete").start()
    // split arrivals mid-window: the state-store fold must not care
    stream.addData(rows.take(150)); q.processAllAvailable()
    stream.addData(rows.drop(150)); q.processAllAvailable()
    q.stop()

    def norm(df: org.apache.spark.sql.DataFrame)
        : Set[(Timestamp, String, Long, Long, Long)] =
      df.select(col("ws"), col("grp"), col("n_distinct"), col("p50"), col("p95"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet

    val got = norm(spark.table("card_out"))
    val batch = norm(rows.toDF()
      .groupBy(window(col("ts"), "10 minutes"), col("grp"))
      .agg(SketchOps.distinctSketch(col("item"), 12, 4096).as("dsk"),
        SketchOps.quantileSketch(col("len"), 1024).as("qsk"))
      .select(col("window.start").as("ws"), col("grp"),
        SketchOps.sketchEst(col("dsk")).as("n_distinct"),
        SketchOps.quantileAt(col("qsk"), 0.5).as("p50"),
        SketchOps.quantileAt(col("qsk"), 0.95).as("p95")))
    assert(got == batch && got.size == 4)

    // exact regime through the state store: spot-check one window/group
    // against a driver-side exact computation
    val w0en = rows.filter(e =>
      e.ts.getTime >= ts(0).getTime && e.ts.getTime < ts(10).getTime &&
        e.grp == "en")
    val exactDistinct = w0en.map(_.item).distinct.size.toLong
    val sortedLens = w0en.map(_.len).sorted
    def disc(q: Double): Long =
      sortedLens(math.max(1, math.ceil(q * sortedLens.size).toInt) - 1)
    assert(got.contains((ts(0), "en", exactDistinct, disc(0.5), disc(0.95))))

    // the emitted binaries stay foldable: merging the two windows'
    // sketches per group equals sketching the union
    val folded = spark.table("card_out")
      .groupBy(col("grp"))
      .agg(SketchOps.sketchMerge(col("dsk")).as("dsk"),
        SketchOps.quantileMerge(col("qsk")).as("qsk"))
      .select(col("grp"), SketchOps.sketchEst(col("dsk")).as("d"),
        SketchOps.quantileAt(col("qsk"), 0.5).as("m"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val byGrp = rows.groupBy(_.grp)
    byGrp.foreach { case (g, es) =>
      val d = es.map(_.item).distinct.size.toLong
      val ls = es.map(_.len).sorted
      val m = ls(math.max(1, math.ceil(0.5 * ls.size).toInt) - 1)
      assert(folded(g) == ((d, m)), g)
    }

    // stream → window sketch → LSM store: the finalized window rows
    // fold into a persisted sketch-measured PointStore (the composed
    // pipeline the docs describe), and the merge-on-read snapshot
    // reproduces the emitted estimates through a real disk round-trip
    val dir = java.nio.file.Files.createTempDirectory("graft_card_store").toString
    val store = new graft.sources.PointStore(spark, dir,
      keys = Seq("ws", "grp"), sums = Nil, maxes = Nil,
      sketches = Seq("dsk"), quantiles = Seq("qsk"))
    graft.streaming.StreamingPointStore.foldBatch(store,
      b => b.select(col("ws"), col("grp"), col("dsk"), col("qsk")),
      spark.table("card_out"), 0L)
    val stored = store.snapshot
      .select(col("ws"), col("grp"),
        SketchOps.sketchEst(col("dsk")).as("n_distinct"),
        SketchOps.quantileAt(col("qsk"), 0.5).as("p50"),
        SketchOps.quantileAt(col("qsk"), 0.95).as("p95"))
    assert(norm(stored) == got)
  }

  test("composed chain end-to-end: stream → finalized window sketches → " +
    "streaming LSM store; maintained snapshot ≡ batch recompute") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.PointStore
    import graft.streaming.StreamingPointStore

    // the documented composition, WIRED: StreamingCardinality's
    // append-mode output (only FINALIZED windows — watermark-closed, so
    // each (window, grp) row is emitted exactly once) feeds
    // StreamingPointStore.foldBatch per micro-batch, landing window
    // sketches in a persisted sketch-measured point table as they close
    val rows = (0 until 400).map { i =>
      Evt(ts((i % 2) * 10 + i % 10), if (i % 3 == 0) "en" else "de",
        (i % 57).toLong + (i % 2) * 1000, (i % 23).toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_card_chain").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_card_chain_ck").toString
    def store() = new PointStore(spark, dir,
      keys = Seq("ws", "grp"), sums = Nil, maxes = Nil,
      sketches = Seq("dsk"), quantiles = Seq("qsk"))
    def partialOf(b: org.apache.spark.sql.DataFrame) =
      b.select(col("ws"), col("grp"), col("dsk"), col("qsk"))
    val stream = MemoryStream[Evt]
    def attach() = StreamingCardinality.vocab(stream.toDS, p = 12,
        sparseCap = 4096, quantileK = 1024)
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamingPointStore.foldBatch(store(), partialOf, b, id))
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // arrivals in window order (append mode DROPS events behind the
    // watermark — the first chunk's max ts must not out-run the second
    // chunk's window; the complete-mode test above covers split-window
    // arrivals, this one covers the finalize-and-land chain)
    val q = attach()
    stream.addData(rows.filter(_.ts.getTime < ts(10).getTime))
    q.processAllAvailable()
    stream.addData(rows.filter(_.ts.getTime >= ts(10).getTime))
    // sentinel pushes the watermark past both data windows so they close
    stream.addData(Seq(Evt(ts(100000), "en", 0L, 0L)))
    q.processAllAvailable(); q.stop()

    def norm(df: org.apache.spark.sql.DataFrame)
        : Set[(Timestamp, String, Long, Long, Long)] =
      df.select(col("ws"), col("grp"),
          SketchOps.sketchEst(col("dsk")).as("d"),
          SketchOps.quantileAt(col("qsk"), 0.5).as("p50"),
          SketchOps.quantileAt(col("qsk"), 0.95).as("p95"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet

    // batch recompute over everything ingested, restricted to the
    // windows the watermark closed (the sentinel's own stays open)
    val expected = norm(rows.toDF()
      .groupBy(window(col("ts"), "10 minutes"), col("grp"))
      .agg(SketchOps.distinctSketch(col("item"), 12, 4096).as("dsk"),
        SketchOps.quantileSketch(col("len"), 1024).as("qsk"))
      .select(col("window.start").as("ws"), col("grp"), col("dsk"), col("qsk")))
    assert(expected.size == 4)
    val snap = norm(store().snapshot)
    assert(snap == expected,
      s"maintained store diverged from the batch recompute: $snap")

    // RESTART on the same checkpoint: nothing new to fold; a FORCED
    // redelivery of a committed batch id is a no-op (the store's tag
    // ledger, not the checkpoint, is what makes the fold exactly-once)
    val q2 = attach(); q2.processAllAvailable(); q2.stop()
    StreamingPointStore.foldBatch(store(), partialOf,
      partialOf(store().snapshot), 0L)
    assert(norm(store().snapshot) == expected)

    // offline compaction folds the per-batch deltas without changing
    // the answer (sketch merges are state-exact)
    store().compact()
    assert(store().members.size == 1 && norm(store().snapshot) == expected)
  }
}

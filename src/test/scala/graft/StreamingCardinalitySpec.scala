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
}

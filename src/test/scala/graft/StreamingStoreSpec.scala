package graft

import graft.functions.SketchOps
import graft.sources.PointStore
import graft.streaming.StreamingPointStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming maintenance of a PointStore with every measure class —
  * sums, distinct sketches, quantile sketches, topk sketches: batches
  * fold in exactly once (restart and forced redelivery included), auto-compaction
  * bounds the member list mid-stream, and the maintained snapshot
  * equals the one-shot aggregate of everything streamed. */
class StreamingStoreSpec extends SparkSpec {

  private def partialOf(batch: DataFrame): DataFrame =
    batch.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        SketchOps.distinctSketch(col("v"), 12, 4096).as("dsk"),
        SketchOps.quantileSketch(col("v"), 1024).as("qsk"),
        // heavy hitters over v mod 7 — 7 distinct, k=16 is the exact
        // regime, so the folded leader is exactly the modal residue
        SketchOps.topkSketch(pmod(col("v"), lit(7L)).cast("string"), 16)
          .as("tk"))

  private def readOut(store: PointStore): Map[String, (Long, Long, Long, String, Long)] =
    store.snapshot
      .select(col("grp"), col("n"),
        SketchOps.sketchEst(col("dsk")).as("d"),
        SketchOps.quantileAt(col("qsk"), 0.5).as("m"),
        SketchOps.topkRead(col("tk")).getItem(0).as("top"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getStruct(4).getString(0), r.getStruct(4).getLong(1)))).toMap

  test("streamed batches fold in exactly once; snapshot == one-shot; " +
    "auto-compaction bounds the members mid-stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_streamstore").toString
    val ckpt = Files.createTempDirectory("graft_streamstore_ck").toString
    def build() = new PointStore(spark, dir, keys = Seq("grp"),
      sums = Seq("n"), maxes = Nil, sketches = Seq("dsk"),
      quantiles = Seq("qsk"), topks = Seq("tk"))
    val store = build()

    // 900 rows: values 0..899 (distinct), grp by parity
    val rows = (0 until 900).map(i => (if (i % 2 == 0) "even" else "odd", i.toLong))
    val src = MemoryStream[(String, Long)]
    // three separate micro-batches (one addData per trigger cycle)
    rows.grouped(300).foreach(g => src.addData(g.toSeq))
    StreamingPointStore.run(store, src.toDF.toDF("grp", "v"),
      partialOf, ckpt).awaitTermination()

    val want = Map(
      // 450 values each; median of evens 0,2..898 at ceil(0.5*450)=225th
      // (1-based) = 448; odds = 449. mod-7 residues of the 450 evens
      // cycle 0,2,4,6,1,3,5 → 64 full cycles + (0,2): residues 0 and 2
      // hit 65, ties break item-asc → leader ("0", 65); odds cycle
      // 1,3,5,0,2,4,6 + (1,3) → leader ("1", 65)
      "even" -> ((450L, 450L, 448L, "0", 65L)),
      "odd" -> ((450L, 450L, 449L, "1", 65L)))
    assert(readOut(build()) == want)

    // RESTART on the same checkpoint: nothing new; a forced redelivery
    // of a committed batch id is a no-op even after an offline compact
    store.compact()
    assert(build().members.length == 1)
    StreamingPointStore.run(build(), src.toDF.toDF("grp", "v"),
      partialOf, ckpt).awaitTermination()
    StreamingPointStore.foldBatch(build(), partialOf,
      rows.take(300).toDF("grp", "v"), 0L)
    assert(readOut(build()) == want)

    // auto-compaction: drive many foldBatches with a tiny bound — the
    // live delta list stays bounded while every batch still lands
    val store2dir = Files.createTempDirectory("graft_streamstore2").toString
    def build2() = new PointStore(spark, store2dir, keys = Seq("grp"),
      sums = Seq("n"), maxes = Nil, sketches = Seq("dsk"),
      quantiles = Seq("qsk"), topks = Seq("tk"))
    rows.grouped(100).zipWithIndex.foreach { case (g, i) =>
      StreamingPointStore.foldBatch(build2(), partialOf,
        g.toDF("grp", "v"), i.toLong, autoCompactAt = 3)
    }
    assert(build2().deltaCount <= 3)
    assert(readOut(build2()) == want)
  }
}

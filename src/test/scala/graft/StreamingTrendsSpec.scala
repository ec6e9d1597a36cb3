package graft

import graft.functions.SketchOps
import graft.streaming.StreamingTrends
import graft.streaming.StreamingTrends.Tok
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The sketch must fold through the state store exactly: per-window
  * streamed heavy-hitters equal the batch windowed aggregation, across
  * micro-batch boundaries that split windows. */
class StreamingTrendsSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)

  test("windowed stream sketch equals the batch windowed aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two 10-minute windows; token frequencies differ per window
    val w1 = Seq.fill(30)("alpha") ++ Seq.fill(12)("beta") ++ Seq.fill(3)("gamma")
    val w2 = Seq.fill(25)("beta") ++ Seq.fill(10)("gamma") ++ Seq.fill(2)("alpha")
    val rows = w1.zipWithIndex.map { case (t, i) => Tok(ts(i % 10), t) } ++
      w2.zipWithIndex.map { case (t, i) => Tok(ts(10 + i % 10), t) }

    val stream = MemoryStream[Tok]
    val q = StreamingTrends.trends(stream.toDS, k = 64)
      .writeStream.format("memory").queryName("trends_out")
      .outputMode("complete").start()
    // split arrivals mid-window: the state-store fold must not care
    stream.addData(rows.take(20)); q.processAllAvailable()
    stream.addData(rows.drop(20)); q.processAllAvailable()
    q.stop()

    def norm(df: org.apache.spark.sql.DataFrame): Set[(Timestamp, String, Long)] =
      df.select(col("ws"), explode(col("tk")).as("e"))
        .select(col("ws"), col("e.item"), col("e.count"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val got = norm(spark.table("trends_out"))
    val batch = norm(rows.toDF("ts", "token")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(SketchOps.topkFreq(col("token"), 64).as("tk"))
      .select(col("window.start").as("ws"), col("tk")))

    assert(got == batch && got.nonEmpty)
    // and the exact regime holds through the state store
    assert(got.contains((ts(0), "alpha", 30L)) && got.contains((ts(10), "beta", 25L)))
  }
}

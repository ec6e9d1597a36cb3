package graft

import graft.streaming.Correlator
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream interval join must equal the batch interval join. */
class CorrelatorSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp((1440 + min) * 60000L)

  test("streamed view->click correlation equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: click at +10 (in window) and +50 (outside 30-min window of
    // the first view, inside the second's); user 2: no click
    val views = Seq(
      (ts(0), 1L, 100L), (ts(40), 1L, 101L), (ts(5), 2L, 102L))
    val clicks = Seq(
      (ts(10), 1L, 200L), (ts(50), 1L, 201L), (ts(90), 3L, 202L))

    val vs = MemoryStream[(Timestamp, Long, Long)]
    val cs = MemoryStream[(Timestamp, Long, Long)]
    vs.addData(views); cs.addData(clicks)
    vs.addData(Seq((ts(100000), 0L, 0L))); cs.addData(Seq((ts(100000), 0L, 1L)))
    val q = Correlator.correlate(
        vs.toDF.toDF("ts", "user_id", "event_id"),
        cs.toDF.toDF("ts", "user_id", "event_id"))
      .writeStream.format("memory").queryName("corr_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("corr_out").filter(col("user_id") =!= 0)
      .collect().map(_.mkString("|")).toSet
    val batch = Correlator.correlate(
        views.toDF("ts", "user_id", "event_id"),
        clicks.toDF("ts", "user_id", "event_id"))
      .filter(col("user_id") =!= 0)
      .collect().map(_.mkString("|")).toSet
    assert(got == batch && got.nonEmpty)
    // the out-of-window click pairs only with the second view
    val pairs = got.map(_.split("\\|").take(3).mkString(","))
    assert(pairs.contains("1,100,200") && pairs.contains("1,101,201"))
    assert(!pairs.exists(_ == "1,100,201"))
  }
}

package graft

import graft.streaming.Enricher
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-static enrichment must agree with the identical batch join. */
class EnricherSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp((1440 + min) * 60000L)

  test("streamed enriched counts equal the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "segment")
    val events = Seq(
      (ts(0), 1L), (ts(10), 1L), (ts(20), 2L), (ts(70), 2L), (ts(80), 9L))

    val stream = MemoryStream[(Timestamp, Long)]
    stream.addData(events)
    stream.addData(Seq((ts(100000), 0L))) // advance watermark, close windows
    val q = Enricher.enrichedCounts(
        stream.toDF.toDF("ts", "user_id"), dim, "user_id", "cust_id", "segment")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("enrich_out")
      .filter(col("window_start") < "1972-01-01") // drop the sentinel window
      .collect().map(_.mkString("|")).toSet
    val batch = Enricher.enrichedCounts(
        events.toDF("ts", "user_id"), dim, "user_id", "cust_id", "segment")
      .collect().map(_.mkString("|")).toSet
    assert(got == batch && got.nonEmpty)
    // the unmatched key survives with a null segment (left join semantics)
    assert(got.exists(_.contains("null")))
  }
}

package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingDedupSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp((1440 + min) * 60000L)

  test("re-delivered documents inside the watermark are dropped once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    // doc 2 re-delivered twice within the horizon, doc 1 once
    stream.addData(Seq(
      (ts(0), 1L, "alpha beta"), (ts(1), 2L, "gamma delta"),
      (ts(2), 2L, "gamma delta")))
    stream.addData(Seq(
      (ts(3), 2L, "gamma delta"), (ts(4), 3L, "epsilon zeta")))

    val q = StreamingDedup.dedup(stream.toDF.toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("dedup_out")
      .groupBy(col("content_hash")).count()
      .collect().map(r => r.getLong(1)).toSeq
    assert(got.nonEmpty && got.forall(_ == 1L)) // each distinct text exactly once
    assert(spark.table("dedup_out").count() == 3) // alpha, gamma, epsilon
  }
}

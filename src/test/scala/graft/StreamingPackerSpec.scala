package graft

import graft.operators.Sampling
import graft.streaming.StreamingPacker
import graft.streaming.StreamingPacker.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming packer must lay out in-order arrivals exactly like the
  * batch operator, across micro-batch boundaries and restarts of the
  * per-stratum running offset. */
class StreamingPackerSpec extends SparkSpec {

  test("stream packing of in-order arrivals equals the batch layout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (1L to 60L).map(i =>
      Doc(i, if (i % 3 == 0) "en" else "es", n_tokens = (i % 7) + 1))

    val stream = MemoryStream[Doc]
    // three micro-batches, id order preserved across them
    docs.grouped(20).foreach(g => stream.addData(g))
    val q = StreamingPacker.pack(spark, stream.toDS(), budget = 16L)
      .writeStream.format("memory").queryName("pack_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("pack_out")
      .select("doc_id", "start_offset", "bin", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val batch = Sampling.packOf(
        docs.toDF("doc_id", "stratum", "n_tokens"),
        "doc_id", "stratum", "n_tokens", budget = 16L)
      .select(col("doc_id"), col("start_offset"), col("bin"), col("bin_offset"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(streamed == batch && streamed.size == 60)
  }

  test("state is one offset per stratum and survives empty batches") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def state(prior: Option[StreamingPacker.PackState]) =
      TestGroupState.create[StreamingPacker.PackState](
        prior.map(Optional.of[StreamingPacker.PackState]).getOrElse(Optional.empty()),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty(), hasTimedOut = false)

    val s1 = state(None)
    val out1 = StreamingPacker.step(10L)("en",
      Iterator(Doc(1, "en", 4), Doc(2, "en", 8)), s1).toList
    assert(out1.map(p => (p.start_offset, p.bin, p.bin_offset))
      == List((0L, 0L, 0L), (4L, 0L, 4L)))
    assert(s1.get.nextOffset == 12L)

    // empty delivery: state untouched
    val s2 = state(Some(s1.get))
    assert(StreamingPacker.step(10L)("en", Iterator.empty, s2).isEmpty)
    assert(s2.get.nextOffset == 12L)

    // later doc continues from the stream position: offset 12 → bin 1
    val s3 = state(Some(s2.get))
    val out3 = StreamingPacker.step(10L)("en", Iterator(Doc(3, "en", 5)), s3).toList
    assert(out3.map(p => (p.start_offset, p.bin, p.bin_offset)) == List((12L, 1L, 2L)))
  }
}

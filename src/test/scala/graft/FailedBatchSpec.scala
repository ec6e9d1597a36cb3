package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

/** worker.js failed-batch routing: a batch whose crunch fails is routed
  * whole to the failed queue; the merge proceeds over the healthy ones. */
class FailedBatchSpec extends SparkSpec {

  test("poisoned batch routes to failed queue without poisoning the merge") {
    val allIds = Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.take(300)
    val poison = allIds(150) // lands in the second batch of 100

    // validator that rejects any batch containing the poison id — the
    // stand-in for a batch whose rows fail decode/constraint checks
    val validator: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.withColumn("l_quantity",
        when(col("l_orderkey") === poison,
          raise_error(lit("poisoned row"))).otherwise(col("l_quantity")))

    val c = new Merge.Cruncher(spark, sf, batchSize = 100, validate = validator)
    allIds.foreach(c.submit)
    val merged = c.result().collect().map(_.mkString("|")).toSet

    // exactly one failed batch, containing the poison id
    assert(c.failed.size == 1)
    assert(c.failed.head.contains(poison) && c.failed.head.size == 100)

    // merge equals the one-shot crunch of the two healthy batches
    val healthy = (allIds.take(100) ++ allIds.drop(200)).toSet
    val li = Tables.lineitem(spark, sf).filter(col("l_orderkey").isin(healthy.toSeq: _*))
    val oneShot = Merge.finish(Merge.merge(Seq(Merge.pointAgg(li))))
      .collect().map(_.mkString("|")).toSet
    assert(merged == oneShot)
  }

  test("ingest guard drops single messages; duplicates collapse") {
    val ids = Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.take(50)
    val malformed = ids(10)
    val c = new Merge.Cruncher(spark, sf, batchSize = 1000,
      accept = _ != malformed)
    ids.foreach(c.submit)
    ids.take(20).foreach(c.submit) // re-deliveries
    c.submit(malformed)            // another malformed delivery
    val merged = c.result().collect().map(_.mkString("|")).toSet

    // the malformed message died alone on every delivery (original,
    // re-delivery, explicit) — no batch was poisoned
    assert(c.rejected == Seq(malformed, malformed, malformed) && c.failed.isEmpty)
    // duplicates collapsed: result equals one-shot over the distinct
    // accepted ids
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey").isin(ids.filter(_ != malformed): _*))
    val oneShot = Merge.finish(Merge.merge(Seq(Merge.pointAgg(li))))
      .collect().map(_.mkString("|")).toSet
    assert(merged == oneShot)
  }

  test("plan-construction failure routes the batch to the failed queue") {
    // the round-4 ADVICE medium: a validator that throws SYNCHRONOUSLY
    // (or an AnalysisException at plan construction) used to escape
    // flush() after the buffer was cleared — losing the batch from both
    // queues. It must route to failed like any runtime crunch failure.
    val ids = Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.take(100)
    var calls = 0
    val validator: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => { calls += 1; if (calls == 2) sys.error("bad batch decode") else df }
    val c = new Merge.Cruncher(spark, sf, batchSize = 50, validate = validator)
    ids.foreach(c.submit)
    val merged = c.result().collect().map(_.mkString("|")).toSet
    assert(c.failed == Seq(ids.drop(50).toSeq))
    val li = Tables.lineitem(spark, sf).filter(col("l_orderkey").isin(ids.take(50): _*))
    val oneShot = Merge.finish(Merge.merge(Seq(Merge.pointAgg(li))))
      .collect().map(_.mkString("|")).toSet
    assert(merged == oneShot)

    // nack contract: the failed batch's ids are forgotten, so the queue's
    // redelivery is accepted and the retry folds into the merge
    ids.drop(50).foreach(c.submit)
    val retried = c.result().collect().map(_.mkString("|")).toSet
    val liAll = Tables.lineitem(spark, sf).filter(col("l_orderkey").isin(ids: _*))
    val oneShotAll = Merge.finish(Merge.merge(Seq(Merge.pointAgg(liAll))))
      .collect().map(_.mkString("|")).toSet
    assert(retried == oneShotAll && c.failed.size == 1)
  }

  test("duplicates collapse across flushed batches, not just within a buffer") {
    val ids = Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.take(50)
    val c = new Merge.Cruncher(spark, sf, batchSize = 25)
    ids.foreach(c.submit)          // two full batches flushed
    ids.take(30).foreach(c.submit) // re-deliveries of already-crunched ids
    val merged = c.result().collect().map(_.mkString("|")).toSet
    val li = Tables.lineitem(spark, sf).filter(col("l_orderkey").isin(ids: _*))
    val oneShot = Merge.finish(Merge.merge(Seq(Merge.pointAgg(li))))
      .collect().map(_.mkString("|")).toSet
    assert(merged == oneShot && c.failed.isEmpty)
  }

  test("load timeout flushes a partial batch (injected clock)") {
    val ids = Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.take(10)
    var clock = 0L
    val c = new Merge.Cruncher(spark, sf, batchSize = 1000,
      loadTimeoutMs = 50L, now = () => clock)
    ids.take(5).foreach(c.submit)   // buffered, well under batchSize
    clock = 60L                     // oldest id now past the timeout
    c.submit(ids(5))                // triggers the timeout flush
    ids.drop(6).foreach(c.submit)
    val merged = c.result().collect().map(_.mkString("|")).toSet
    val li = Tables.lineitem(spark, sf).filter(col("l_orderkey").isin(ids: _*))
    val oneShot = Merge.finish(Merge.merge(Seq(Merge.pointAgg(li))))
      .collect().map(_.mkString("|")).toSet
    assert(merged == oneShot) // timeout flush changes batching, never results
  }
}

package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

/** The incremental-merge law: crunch(A) ⊕ crunch(B) == crunch(A ∪ B),
  * for any batch split — the distributed re-expression of the reference's
  * ON DUPLICATE KEY UPDATE additive upsert. */
class MergeSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("two-way split merges to the one-shot aggregate") {
    val li = Tables.lineitem(spark, sf)
    val merged = Merge.upsertMerge(spark, sf)
    // one-shot: the same aggregation over the unsplit table, via the
    // trivial single-batch merge
    val oneShot = Merge.merge(Seq(Merge.pointAgg(li)))
    assert(rows(merged) == rows(Merge.finish(oneShot)))
  }

  test("three-way uneven split merges identically") {
    val li = Tables.lineitem(spark, sf)
    val parts = Seq(
      li.filter(col("l_orderkey") % 3 === 0),
      li.filter(col("l_orderkey") % 3 === 1),
      li.filter(col("l_orderkey") % 3 === 2))
    val merged = Merge.finish(Merge.merge(parts.map(Merge.pointAgg)))
    val oneShot = Merge.finish(Merge.merge(Seq(Merge.pointAgg(li))))
    assert(rows(merged) == rows(oneShot))
  }

  test("batch driver equals set-semantics crunch of the same ids") {
    val driver = Merge.batchDriver(spark, sf)
    val li = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 2 === 0)
    val direct = Merge.finish(Merge.merge(Seq(Merge.pointAgg(li))))
    assert(rows(driver) == rows(direct))
  }

  test("RELIABILITY shedding drops deterministically and routes like rejections") {
    val ids = (1L to 200L).toVector
    def run(rel: Double, seed: Long) = {
      val c = new Merge.Cruncher(spark, sf, batchSize = 1000,
        reliability = rel, shedSeed = seed)
      ids.foreach(c.submit)
      val total = c.result().agg(org.apache.spark.sql.functions.sum("played"))
        .collect()(0)
      c.release()
      (c.shed.toVector, c.failed, c.rejected)
    }
    val (shedA, failedA, rejectedA) = run(0.7, 7L)
    val (shedB, _, _) = run(0.7, 7L)
    // deterministic for a fixed (seed, corpus); roughly the right rate
    assert(shedA == shedB)
    assert(shedA.nonEmpty && shedA.size < ids.size / 2)
    // shed ids route like rejections: dropped alone, never into a
    // failed batch, never into the dedup set or the merge
    assert(failedA.isEmpty && rejectedA.isEmpty)
    assert(shedA.toSet.subsetOf(ids.toSet))
    // reliability 1.0 sheds nothing
    val (shedFull, _, _) = run(1.0, 7L)
    assert(shedFull.isEmpty)
  }

  test("batch completion fires onUpdate per notifying message at the ack point") {
    var updates = Vector.empty[String]
    val c = new Merge.Cruncher(spark, sf, batchSize = 3,
      onUpdate = t => updates :+= t)
    c.submit(2L, Some("web.eu"))
    c.submit(4L, None)
    c.submit(6L, Some("web.na")) // batch of 3 flushes here
    c.submit(8L, Some("web.eu"))
    // nothing published before the ack point
    assert(updates.isEmpty)
    c.result()
    assert(updates == Vector("web.eu", "web.na", "web.eu"))
    // a failed batch nacks and never notifies
    var updates2 = Vector.empty[String]
    val boom = new Merge.Cruncher(spark, sf, batchSize = 2,
      validate = _ => throw new RuntimeException("boom"),
      onUpdate = t => updates2 :+= t)
    boom.submit(2L, Some("web.eu"))
    boom.submit(4L, Some("web.na"))
    // every batch failed -> nothing to merge; the routing still happens
    scala.util.Try(boom.result())
    assert(updates2.isEmpty && boom.failed == Seq(Seq(2L, 4L)))
    c.release(); boom.release()
  }

  test("a throwing onUpdate loses that notification only — never the merge") {
    import org.apache.spark.sql.functions.col
    var attempts = Vector.empty[String]
    val c = new Merge.Cruncher(spark, sf, batchSize = 2,
      onUpdate = t => { attempts :+= t
        if (t == "web.eu") throw new RuntimeException("broker down") })
    c.submit(2L, Some("web.eu"))
    c.submit(4L, Some("web.na")) // flushes
    // the flaky publish is fault-isolated: result() returns the merge,
    // the LATER notification still fires, and the committed batch never
    // routes to the failed queue (redelivery would double-count it)
    val played = c.result().select(org.apache.spark.sql.functions.sum("played"))
      .collect()(0).getLong(0)
    assert(attempts == Vector("web.eu", "web.na") && c.failed.isEmpty)
    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey").isin(2L, 4L)).count()
    assert(played == expect)
    c.release()
  }

  test("all batches failed: result() is the EMPTY point frame, not a crash") {
    val boom = new Merge.Cruncher(spark, sf, batchSize = 2,
      validate = _ => throw new RuntimeException("boom"))
    boom.submit(2L); boom.submit(4L) // flushes; the batch fails
    val res = boom.result()
    assert(res.count() == 0 && boom.failed == Seq(Seq(2L, 4L)))
    // schema matches the healthy merge path (same finish projection)
    assert(res.columns.contains("played") && res.columns.contains("wins"))
    boom.release()
  }

  test("reset() clears the dedup set and queues — a reused cruncher re-crunches") {
    val ids = Tables.orders(spark, sf).filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.toSeq
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 7 === 0)
    val expect = rows(Merge.finish(Merge.merge(Seq(Merge.pointAgg(li)))))
    val c = new Merge.Cruncher(spark, sf, batchSize = math.max(1, ids.size / 2))
    ids.foreach(c.submit)
    assert(rows(c.result()) == expect)
    c.reset()
    // without reset, every id is in seenIds and result() merges nothing;
    // after reset the same cruncher runs the full cycle again
    ids.foreach(c.submit)
    assert(rows(c.result()) == expect)
    c.reset()
  }
}

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

package graft

import graft.operators.Joins

/** The custom AsofJoin plan node must agree exactly with the composed
  * union+window operator, and its physical plan must be the injected
  * AsofJoinExec (not a fallback). */
class AsofNativeSpec extends SparkSpec {

  test("native as-of plan equals the composed operator") {
    val native   = Joins.asofJoinNative(spark, sf).collect().map(_.mkString("|")).toSet
    val composed = Joins.asofJoin(spark, sf).collect().map(_.mkString("|")).toSet
    assert(native == composed && native.nonEmpty)
  }

  test("a Date right side is aligned, not compared raw against timestamps") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev  = Seq((1L, java.sql.Timestamp.valueOf("1996-06-01 00:00:00"), 7L))
      .toDF("k", "t", "event_id")
    val ord = Seq((1L, "1995-01-01", 100L), (1L, "1999-01-01", 200L))
      .toDF("k", "d", "o_orderkey")
      .select(col("k"), to_date(col("d")).as("t"), col("o_orderkey")) // DateType side
    val got = graft.operators.AsOf.joinNative(spark, ev, ord, "k", "t", "o_orderkey",
        Seq("o_orderkey"))
      .select("event_id", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // raw day-number-vs-microsecond comparison would pick the 1999 order
    // (dated AFTER the event); alignment must pick the 1995 one
    assert(got == Set((7L, 100L)))
  }

  test("a null right-side time is skipped, not a barrier") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Seq((1L, 10L, 7L)).toDF("k", "t", "event_id")
    val ord = Seq((1L, Option.empty[Long], 100L), (1L, Some(5L), 200L))
      .toDF("k", "t", "o_orderkey")
    val got = graft.operators.AsOf.joinNative(spark, ev, ord, "k", "t", "o_orderkey",
        Seq("o_orderkey"))
      .select("event_id", "o_orderkey").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == Set((7L, 200L))) // the valid t=5 order matches despite the null row
  }

  test("the physical plan contains AsofJoinExec with no union or window") {
    val qe = Joins.asofJoinNative(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(500))
    assert(!plan.contains("Window"), "native path must not fall back to window")
    assert(!plan.contains("Union"), "native path must not union-widen")
  }
}

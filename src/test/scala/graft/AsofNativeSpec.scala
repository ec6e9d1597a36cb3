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

  test("the physical plan contains AsofJoinExec with no union or window") {
    val qe = Joins.asofJoinNative(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(500))
    assert(!plan.contains("Window"), "native path must not fall back to window")
    assert(!plan.contains("Union"), "native path must not union-widen")
  }
}

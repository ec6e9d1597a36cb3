package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, NullsLast, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator as-of join as a first-class plan node — the reference
  * operator Spark lacks natively, for the case where composing built-ins
  * (graft.operators.AsOf's union+window) is not enough: the native
  * operator runs ONE merge pass per co-partitioned sorted partition pair,
  * with no union row-widening, no null-padded carry columns through a
  * window, and no second sort.
  *
  * Semantics (same as AsOf.join): for every left row, the right row of
  * the same key with the greatest time ≤ left time; ties on time resolved
  * toward the greatest tieBreak (right side sorted by time, tieBreak
  * ascending — the last row consumed wins the carry).
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTieBreak: Attribute, carry: Seq[Attribute])
  extends BinaryNode {
  // the merge compares key/time values with a single physical ordering, so
  // both sides must agree exactly (a Timestamp-vs-Date pair would compare
  // microseconds against day numbers and silently mis-match)
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
  override def output: Seq[Attribute] = left.output ++ carry.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsofJoin logical → AsofJoinExec physical. Injected
  * via SparkSessionExtensions.injectPlannerStrategy (GraftExtensions). */
object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tb, carry) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, carry) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join. EnsureRequirements gives both children the same
  * hash partitioning on the key and a per-partition (key, time[,tie])
  * sort; doExecute then zips partition pairs and merges in one pass with
  * O(1) state (the last matching right row per key). */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTieBreak: Attribute, carry: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carry.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending, NullsLast, Seq.empty))) // nulls last, like the composed operator's asc_nulls_last

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx  = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx  = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val keyType  = leftKey.dataType
    val timeType = leftTime.dataType
    val keyOrd  = PhysicalDataType.ordering(keyType).asInstanceOf[Ordering[Any]]
    val timeOrd = PhysicalDataType.ordering(timeType).asInstanceOf[Ordering[Any]]
    val rightOutput = right.output
    val leftOutput  = left.output
    val carryAttrs  = carry
    val outAttrs    = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(
        outAttrs, leftOutput ++ rightOutput.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOutput.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      var lastKey: Any = null
      var lastMatch: InternalRow = null

      lIter.map { lRow =>
        val lKey  = if (lRow.isNullAt(lKeyIdx)) null else lRow.get(lKeyIdx, keyType)
        val lTime = if (lRow.isNullAt(lTimeIdx)) null else lRow.get(lTimeIdx, timeType)
        if (lKey != null && lTime != null) {
          // advance the right side through every row at-or-before (lKey, lTime)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = if (rRow.isNullAt(rKeyIdx)) null else rRow.get(rKeyIdx, keyType)
            if (rKey == null) { rBuf.next() } // null keys sort first; no match
            else {
              val kc = keyOrd.compare(rKey, lKey)
              if (kc < 0) rBuf.next()
              else if (kc == 0) {
                val rTime = if (rRow.isNullAt(rTimeIdx)) null else rRow.get(rTimeIdx, timeType)
                if (rTime == null) { rBuf.next() } // no time, no match — skip, never block
                else if (timeOrd.compare(rTime, lTime) <= 0) {
                  val copied = rBuf.next().copy()
                  lastMatch = copied
                  // re-extract from the COPY: a buffer-backed key value
                  // (e.g. UTF8String) from the live row would mutate
                  lastKey = copied.get(rKeyIdx, keyType)
                } else advancing = false
              } else advancing = false
            }
          }
        }
        val matched = lKey != null && lastMatch != null && lastKey != null &&
          keyOrd.compare(lastKey, lKey) == 0
        project(joined(lRow, if (matched) lastMatch else nullRight))
      }
    }
  }
}

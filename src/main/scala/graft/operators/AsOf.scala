package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable as-of join — an operator Spark lacks natively, composed from
  * built-ins per the custom-operator preference order (compose before
  * custom plans): union-tag both sides, one shuffle on the key, one sort
  * within partitions, and last_value(ignoreNulls) carries the most recent
  * right row onto each left row. O(n log n) per key group, no per-row
  * subquery, no theta-join blow-up — the classic scale-safe plan.
  *
  * `left` needs (key, time, payload...); `right` needs (key, time,
  * carry...). Right rows at the same instant sort before left rows
  * (as-of is inclusive); among simultaneous right rows the greatest
  * `tieBreak` wins.
  */
object AsOf {

  /** The custom-plan flavor: builds the [[org.apache.spark.sql.graft.AsofJoin]]
    * logical node directly (resolved attributes from both analyzed
    * children), planned by the injected AsofJoinStrategy into a one-pass
    * co-partitioned merge — no union row-widening, no window. Same
    * semantics as [[join]]; AsofNativeSpec equates them and the
    * `asof_join_native` oracle is the same SQL. */
  def joinNative(spark: org.apache.spark.sql.SparkSession,
                 left: DataFrame, right: DataFrame, key: String, time: String,
                 tieBreak: String, carry: Seq[String]): DataFrame = {
    validate(left, right, key, time, carry)
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    // the merge exec compares with one physical ordering, so the time
    // types must agree EXACTLY; align time-like right sides (Date /
    // TimestampNTZ / Timestamp) to the left type with an explicit cast —
    // a Date-vs-Timestamp pair compared raw would match day-numbers
    // against microseconds and silently pick wrong rows
    val timeLike = Set[org.apache.spark.sql.types.DataType](
      DateType, TimestampType, TimestampNTZType)
    val lType = left.schema(time).dataType
    val rType = right.schema(time).dataType
    val alignedRight =
      if (rType != lType && timeLike(lType) && timeLike(rType))
        right.withColumn(time, col(time).cast(lType))
      else right
    val lp = GraftShim.analyzed(left)
    val rp = GraftShim.analyzed(alignedRight)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    GraftShim.ofRows(spark, org.apache.spark.sql.graft.AsofJoin(
      lp, rp,
      leftKey = attr(lp, key), rightKey = attr(rp, key),
      leftTime = attr(lp, time), rightTime = attr(rp, time),
      rightTieBreak = attr(rp, tieBreak),
      carry = carry.map(attr(rp, _))))
  }

  /** The union encoding needs left payload names, carry names, and the
    * `_side` tag to be distinct — a left frame already containing a
    * carry-named (or `_side`) column would produce ambiguous columns and
    * the carry window would clobber left data. Fail fast instead. */
  private def validate(left: DataFrame, right: DataFrame, key: String,
                       time: String, carry: Seq[String]): Unit = {
    // key and time are left columns too: carrying a column under those
    // names would also duplicate them in the union encoding
    val clash = carry.filter(c =>
      left.columns.contains(c) || c == key || c == time)
    require(clash.isEmpty,
      s"as-of carry column(s) ${clash.mkString(", ")} collide with left-side " +
        "columns; rename one side before the join")
    require(!left.columns.contains("_side") && !right.columns.contains("_side"),
      "'_side' is reserved by the as-of join encoding; rename the column")
    val dupCarry = carry.diff(carry.distinct)
    require(dupCarry.isEmpty, s"duplicate carry column(s): ${dupCarry.mkString(", ")}")
  }

  def join(left: DataFrame, right: DataFrame, key: String, time: String,
           tieBreak: String, carry: Seq[String]): DataFrame = {
    validate(left, right, key, time, carry)
    val leftCols  = left.columns.filterNot(c => c == key || c == time)
    val l = left
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col(time), col("_side")) ++
        leftCols.map(col) ++ carry.map(c => lit(null).as(c)): _*)
    val r = right
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col(time), col("_side")) ++
        leftCols.map(c => lit(null).as(c)) ++ carry.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"), col(tieBreak).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carry.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
      .filter(col("_side") === 1)
      .drop("_side")
  }
}

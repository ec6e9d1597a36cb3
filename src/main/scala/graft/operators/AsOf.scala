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

  def join(left: DataFrame, right: DataFrame, key: String, time: String,
           tieBreak: String, carry: Seq[String]): DataFrame = {
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

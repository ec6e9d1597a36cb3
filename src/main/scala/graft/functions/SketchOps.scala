package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim

/** DataFrame face of the sketch aggregates. */
object SketchOps {

  /** Heavy-hitters sketch aggregate: top-k string frequencies with error
    * bounds, `array<struct<item, count, err>>` sorted by (count desc,
    * item asc). Exact when the column's distinct cardinality ≤ k. */
  def topkFreq(c: Column, k: Int): Column =
    GraftShim.column(
      TopKFreq(GraftShim.expression(c), k).toAggregateExpression())
}

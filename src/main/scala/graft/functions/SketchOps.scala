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

  /** STORABLE heavy-hitters sketch aggregate: the serialized SpaceSaving
    * state (binary) instead of [[topkFreq]]'s unpacked array — land it
    * in parquet or a PointStore `topks` measure, fold with
    * [[topkMerge]], read with [[topkRead]]. */
  def topkSketch(c: Column, k: Int): Column =
    GraftShim.column(
      TopKSketchAgg(GraftShim.expression(c), k).toAggregateExpression())

  /** Fold a column of serialized SpaceSaving sketches into one. */
  def topkMerge(c: Column): Column =
    GraftShim.column(
      TopKMergeAgg(GraftShim.expression(c)).toAggregateExpression())

  /** Unpack a serialized SpaceSaving sketch to the sorted entry array. */
  def topkRead(c: Column): Column =
    GraftShim.column(TopKRead(GraftShim.expression(c)))

  /** Distinct-count sketch aggregate: serialized [[DistinctSketch]]
    * (binary) — exact below `sparseCap` distinct values, dense HLL with
    * ~1.04/√2^p relative error past it. A first-class column: store it,
    * fold it with [[sketchMerge]], read it with [[sketchEst]]. */
  def distinctSketch(c: Column, p: Int, sparseCap: Int): Column =
    GraftShim.column(
      DistinctSketchAgg(GraftShim.expression(c), p, sparseCap)
        .toAggregateExpression())

  /** Fold a column of serialized sketches into one. */
  def sketchMerge(c: Column): Column =
    GraftShim.column(
      SketchMergeAgg(GraftShim.expression(c)).toAggregateExpression())

  /** Cardinality estimate of a serialized sketch. */
  def sketchEst(c: Column): Column =
    GraftShim.column(SketchEst(GraftShim.expression(c)))

  /** Quantile sketch aggregate over a long/int column: serialized
    * [[QuantileSketch]] (binary) — EXACT below k values per group,
    * bounded-rank-error compactor summary past it. Store it, fold it
    * with [[quantileMerge]], read it with [[quantileAt]]. */
  def quantileSketch(c: Column, k: Int): Column =
    GraftShim.column(
      QuantileSketchAgg(GraftShim.expression(c), k).toAggregateExpression())

  /** Fold a column of serialized quantile sketches into one. */
  def quantileMerge(c: Column): Column =
    GraftShim.column(
      QuantileMergeAgg(GraftShim.expression(c)).toAggregateExpression())

  /** The q-quantile of a serialized sketch (DuckDB quantile_disc rule). */
  def quantileAt(c: Column, q: Double): Column =
    GraftShim.column(QuantileAt(GraftShim.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(q)))
}

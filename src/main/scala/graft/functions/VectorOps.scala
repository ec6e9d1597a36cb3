package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * higher-order functions (`zip_with`/`aggregate`/`transform`) so every
  * step stays inside Catalyst and whole-stage codegen — no UDF, no
  * serialization boundary in the hot path.
  *
  * All arithmetic is double: elements are cast up front, so Spark and the
  * DuckDB oracle (which casts its lists to DOUBLE[]) accumulate with the
  * same precision and the ranking margins in the data (≥1e-5) dwarf any
  * cross-engine ulp drift (~1e-13).
  */
object VectorOps {

  import org.apache.spark.sql.GraftShim

  /** array<float> → array<double>. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Σ xᵢyᵢ — native codegen loop (see [[DotProduct]]); bit-identical to a
    * sequential left fold in double. */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(
      DotProduct(GraftShim.expression(a), GraftShim.expression(b)))

  /** The higher-order-function twin of [[dot]] — interpreted per element;
    * kept for differential testing of the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays — fused single-pass native
    * expression (see [[CosineSimilarity]]). */
  def cosine(a: Column, b: Column): Column =
    GraftShim.column(
      CosineSimilarity(GraftShim.expression(a), GraftShim.expression(b)))

  /** Cosine via pre-normalized vectors (norm folded in once — the form to
    * use when one side is scanned many times). Native single-pass
    * expression (see [[NormalizeVec]]): the HOF `transform(v, _ / norm)`
    * re-evaluated the norm per element (no CSE through lambdas). */
  def normalize(v: Column): Column =
    GraftShim.column(NormalizeVec(GraftShim.expression(v)))
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a,b,*),...)`)
  * is evaluated interpretively per element — a boxed Column-lambda call and
  * a zipped array allocation for every pair — which made the 2M-pair
  * embedding-dedup scan ~30 s at sf0.1. This expression participates in
  * whole-stage codegen: `doGenCode` emits a tight primitive loop over the
  * two ArrayData buffers (no allocation, no boxing), the form the hot
  * inner loop of every similarity operator wants at 100 TB.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // callers guarantee array<double> inputs (VectorOps casts up front);
  // ExpectsInputTypes is private[sql], so no declarative check here
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: dot product and both norms accumulated in a
  * SINGLE pass over the arrays (three accumulators, one loop) instead of
  * the three separate loops the composed `dot/(√dot·√dot)` form costs.
  * Backs the SQL `graft_cosine` function; NaN on a zero-norm side, like
  * the composed form (0/0). */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $d += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $d / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Scores of one vector against a whole centroid matrix (row-major,
  * Cells × dim) in a single fused loop: `out[c] = Σᵢ m[c][i]·v[i]`.
  *
  * The composed form — Cells separate `DotProduct(v, typedLit(centroidᵢ))`
  * expressions inside an `array(struct(...))` — embeds Cells×dim literal
  * array constants into the generated Java of EVERY plan that assigns or
  * probes cells; the resulting classes took ~1 s each to javac-compile,
  * dominating ANN/dedup wall time at small SF and re-paying on every plan
  * variation. Here the matrix rides along as ONE reference object (no
  * code-size growth with Cells or dim) and the kernel is the two-loop
  * matrix-vector product the hardware wants. */
case class CellScores(child: Expression, matrix: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_cell_scores"

  private val cells = matrix.length
  private val dim = if (matrix.isEmpty) 0 else matrix(0).length
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](cells * dim)
    var c = 0
    while (c < cells) {
      System.arraycopy(matrix(c), 0, f, c * dim, dim); c += 1
    }
    f
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    VectorGuards.checkDim(dim, x.numElements(), prettyName)
    val out = new Array[Double](cells)
    var c = 0
    while (c < cells) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < dim) { s += flat(off + i) * x.getDouble(i); i += 1 }
      out(c) = s
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cellMatrix", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      s"""
         |graft.functions.VectorGuards.checkDim($dim, $v.numElements(), "$prettyName");
         |double[] $out = new double[$cells];
         |for (int $c = 0; $c < $cells; $c++) {
         |  int $off = $c * $dim;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $s += $m[$off + $i] * $v.getDouble($i);
         |  }
         |  $out[$c] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellScores =
    copy(child = newChild)
}

/** Runtime guards shared by the interpreted and codegen paths. */
object VectorGuards {
  /** A vector whose length differs from the quantizer's dimensionality
    * would silently produce plausible PARTIAL dot products (and so
    * plausible-but-wrong cell assignments — e.g. float-vs-double or
    * differently-sized embeddings appended to an IvfIndex). Dimension
    * drift fails loudly instead. */
  def checkDim(expected: Int, actual: Int, op: String): Unit =
    if (actual != expected) throw new IllegalArgumentException(
      s"$op: input vector has $actual elements, quantizer dimensionality is $expected")
}

/** L2-normalize an `array<double>` in one pass: accumulate Σx², divide
  * each element by the root. The HOF form `transform(v, x / sqrt(dot(v,
  * v)))` references the norm INSIDE the lambda, and Catalyst does not CSE
  * through higher-order-function lambdas — the full dot product re-ran
  * per element (O(dim²)/row, interpreted). Division by a zero norm yields
  * the same ±Inf/NaN elements the composed form produced. */
case class NormalizeVec(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) { val xi = x.getDouble(i); s += xi * xi; out(i) = xi; i += 1 }
    val norm = math.sqrt(s)
    i = 0
    while (i < n) { out(i) = out(i) / norm; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val norm = ctx.freshName("norm")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      s"""
         |int $n = $v.numElements();
         |double[] $out = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $v.getDouble($i);
         |  $s += $xi * $xi;
         |  $out[$i] = $xi;
         |}
         |double $norm = java.lang.Math.sqrt($s);
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $out[$i] / $norm;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeVec =
    copy(child = newChild)
}

/** Cell ids ranked by descending score of the vector against the centroid
  * matrix (ties → lower id), in ONE evaluation: the matrix-vector kernel
  * plus an insertion sort over the Cells entries, returning the actual
  * `ids` (not positions — a non-contiguous centroid set ranks correctly).
  *
  * This exists because composing the ranking from `CellScores` with
  * `transform`/`element_at` re-evaluates the kernel once per lambda
  * element (Catalyst does not CSE through higher-order-function lambdas —
  * the measured pitfall that motivated these expressions): Cells× the
  * work per row. Here the probe path is a single call. */
case class CellRank(child: Expression, matrix: Array[Array[Double]],
                    ids: Array[Int])
  extends UnaryExpression {

  require(ids.length == matrix.length, "one id per centroid row")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)
  override def prettyName: String = "graft_cell_rank"

  private val cells = matrix.length
  private val dim = if (matrix.isEmpty) 0 else matrix(0).length
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](cells * dim)
    var c = 0
    while (c < cells) { System.arraycopy(matrix(c), 0, f, c * dim, dim); c += 1 }
    f
  }

  /** Rank positions by (score desc, position asc) via insertion sort. */
  private def rank(scores: Array[Double]): Array[Int] = {
    val order = new Array[Int](cells)
    var c = 0
    while (c < cells) {
      var j = c
      while (j > 0 && scores(order(j - 1)) < scores(c)) {
        order(j) = order(j - 1); j -= 1
      }
      order(j) = c
      c += 1
    }
    val out = new Array[Int](cells)
    c = 0
    while (c < cells) { out(c) = ids(order(c)); c += 1 }
    out
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    VectorGuards.checkDim(dim, x.numElements(), prettyName)
    val scores = new Array[Double](cells)
    var c = 0
    while (c < cells) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < dim) { s += flat(off + i) * x.getDouble(i); i += 1 }
      scores(c) = s
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(rank(scores))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the scoring loop is the hot part; the Cells-element sort runs on a
    // tiny local array, so delegate rank+id mapping to this instance
    val self = ctx.addReferenceObj("cellRank", this,
      classOf[CellRank].getName)
    val m = ctx.addReferenceObj("cellMatrix", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val scores = ctx.freshName("scores")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      s"""
         |graft.functions.VectorGuards.checkDim($dim, $v.numElements(), "$prettyName");
         |double[] $scores = new double[$cells];
         |for (int $c = 0; $c < $cells; $c++) {
         |  int $off = $c * $dim;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $s += $m[$off + $i] * $v.getDouble($i);
         |  }
         |  $scores[$c] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($self.rankPublic($scores));
       """.stripMargin
    })
  }

  /** Codegen entry point for the rank step. */
  def rankPublic(scores: Array[Double]): Array[Int] = rank(scores)

  override protected def withNewChildInternal(newChild: Expression): CellRank =
    copy(child = newChild)
}

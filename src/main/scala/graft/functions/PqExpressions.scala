package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — the FAISS IVF-PQ shape).
  *
  * A 100 TB embedding corpus cannot scan raw vectors: 64 float64 dims =
  * 512 bytes/vector. PQ splits the vector into M subspaces, quantizes
  * each against its own Ks-entry codebook, and stores M small codes —
  * M one-byte codes replace dim·8 bytes of float64 (the shipped M=16,
  * dim=64 configuration is 32× less scan IO) — while queries score
  * compressed
  * codes DIRECTLY via asymmetric distance computation (ADC): a per-query
  * lookup table of sub-centroid·sub-query dot products turns each
  * candidate score into M table lookups (8 adds/pair instead of a
  * 64-mult dot).
  *
  * Three expressions, all codegen'd with the codebook riding along as
  * ONE reference object (the [[CellScores]] lesson — literal constants
  * grow generated code with M·Ks·dim and javac becomes the cost):
  *  - [[PqEncode]]  vector → M argmin-L2 codes (index build side);
  *  - [[PqLut]]     query vector → flattened M×Ks dot table (once per query);
  *  - [[PqAdc]]     (codes, lut) → approximate dot score (the hot loop).
  */
object Pq {
  /** Flatten codebooks (M × Ks × sub) row-major for the kernels. */
  private[functions] def flatten(cb: Array[Array[Array[Double]]]): Array[Double] = {
    val m = cb.length; val ks = cb(0).length; val sub = cb(0)(0).length
    val f = new Array[Double](m * ks * sub)
    var mi = 0
    while (mi < m) {
      var k = 0
      while (k < ks) {
        System.arraycopy(cb(mi)(k), 0, f, (mi * ks + k) * sub, sub); k += 1
      }
      mi += 1
    }
    f
  }
}

/** Encode an `array<double>` vector as M product-quantization codes:
  * code m = argmin over the subspace codebook of the L2 distance to the
  * vector's m-th subvector (deterministic ties → lower code). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  private val m = codebooks.length
  private val ks = codebooks(0).length
  private val sub = codebooks(0)(0).length
  @transient private lazy val flat = Pq.flatten(codebooks)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    VectorGuards.checkDim(m * sub, x.numElements(), prettyName)
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0; var bestD = Double.MaxValue
      var k = 0
      while (k < ks) {
        val off = (mi * ks + k) * sub
        var d = 0.0; var i = 0
        while (i < sub) {
          val t = flat(off + i) - x.getDouble(mi * sub + i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(mi) = best
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val off = ctx.freshName("off")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""
         |graft.functions.VectorGuards.checkDim(${m * sub}, $v.numElements(), "$prettyName");
         |int[] $out = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $k = 0; $k < $ks; $k++) {
         |    int $off = ($mi * $ks + $k) * $sub;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $t = $cb[$off + $i] - $v.getDouble($mi * $sub + $i);
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $k; }
         |  }
         |  $out[$mi] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table: `lut[m·Ks + k] = codebook[m][k] · q_sub[m]`
  * (flattened M×Ks doubles — ~2 KB of metadata per query row). */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  private val m = codebooks.length
  private val ks = codebooks(0).length
  private val sub = codebooks(0)(0).length
  @transient private lazy val flat = Pq.flatten(codebooks)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    VectorGuards.checkDim(m * sub, x.numElements(), prettyName)
    val out = new Array[Double](m * ks)
    var mi = 0
    while (mi < m) {
      var k = 0
      while (k < ks) {
        val off = (mi * ks + k) * sub
        var s = 0.0; var i = 0
        while (i < sub) { s += flat(off + i) * x.getDouble(mi * sub + i); i += 1 }
        out(mi * ks + k) = s
        k += 1
      }
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      s"""
         |graft.functions.VectorGuards.checkDim(${m * sub}, $v.numElements(), "$prettyName");
         |double[] $out = new double[${m * ks}];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  for (int $k = 0; $k < $ks; $k++) {
         |    int $off = ($mi * $ks + $k) * $sub;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      $s += $cb[$off + $i] * $v.getDouble($mi * $sub + $i);
         |    }
         |    $out[$mi * $ks + $k] = $s;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** ADC scores of one encoded vector against a whole BATCH of query
  * lookup tables in one kernel: `out[q] = Σ_m luts[q][m·Ks + codes[m]]`.
  * The luts ride along as ONE reference object — joining a 16 KB lut
  * column against every candidate materialized hundreds of MB of row
  * copies through the nested-loop join (measured 2.3 s of a 2.4 s scan);
  * this is the batch-of-queries scoring shape where the scan row stays
  * 24 bytes and the per-candidate work is Q·M table lookups. */
case class PqAdcAll(child: Expression, luts: Array[Array[Double]], ks: Int)
  extends UnaryExpression {

  // an empty batch would set lutLen = 0 and the first non-empty codes row
  // would die with a misleading "quantizer dimensionality" error — callers
  // with no queries must short-circuit to an empty frame instead
  require(luts.nonEmpty,
    "graft_pq_adc_all needs at least one query lookup table; " +
      "short-circuit an empty query workload to an empty result frame")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_adc_all"

  private val q = luts.length
  private val lutLen = luts(0).length
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](q * lutLen)
    var i = 0
    while (i < q) { System.arraycopy(luts(i), 0, f, i * lutLen, lutLen); i += 1 }
    f
  }

  override def nullSafeEval(codes: Any): Any = {
    val c = codes.asInstanceOf[ArrayData]
    VectorGuards.checkDim(c.numElements() * ks, lutLen, prettyName)
    val m = c.numElements()
    val out = new Array[Double](q)
    var qi = 0
    while (qi < q) {
      val base = qi * lutLen
      var s = 0.0; var mi = 0
      while (mi < m) { s += flat(base + mi * ks + c.getInt(mi)); mi += 1 }
      out(qi) = s
      qi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("pqLuts", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val qi = ctx.freshName("qi"); val mi = ctx.freshName("mi")
      val m = ctx.freshName("m"); val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      s"""
         |int $m = $c.numElements();
         |graft.functions.VectorGuards.checkDim($m * $ks, $lutLen, "$prettyName");
         |double[] $out = new double[$q];
         |for (int $qi = 0; $qi < $q; $qi++) {
         |  int $base = $qi * $lutLen;
         |  double $s = 0.0;
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    $s += $l[$base + $mi * $ks + $c.getInt($mi)];
         |  }
         |  $out[$qi] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcAll =
    copy(child = newChild)
}

/** ADC score of one encoded vector against one query lookup table:
  * `Σ_m lut[m·Ks + codes[m]]` — M adds per candidate, the whole hot
  * loop of a PQ scan. `ks` is the codebook size the lut was built with
  * (lut length must be M·ks for the codes' M). */
case class PqAdc(left: Expression, right: Expression, ks: Int)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(codes: Any, lut: Any): Any = {
    val c = codes.asInstanceOf[ArrayData]
    val l = lut.asInstanceOf[ArrayData]
    VectorGuards.checkDim(c.numElements() * ks, l.numElements(), prettyName)
    var s = 0.0
    var mi = 0
    val m = c.numElements()
    while (mi < m) { s += l.getDouble(mi * ks + c.getInt(mi)); mi += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val s = ctx.freshName("s")
      val mi = ctx.freshName("mi")
      val m = ctx.freshName("m")
      s"""
         |int $m = $c.numElements();
         |graft.functions.VectorGuards.checkDim($m * $ks, $l.numElements(), "$prettyName");
         |double $s = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $s += $l.getDouble($mi * $ks + $c.getInt($mi));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable quantile sketch over 64-bit integers — the third member of
  * the persisted-sketch family (heavy hitters [[SpaceSaving]], distinct
  * counts [[DistinctSketch]], now order statistics): length and
  * token-count DISTRIBUTIONS per group, answerable from stored state.
  *
  * Spark's `approx_percentile` (GK) answers one-shot; like the HLL state
  * behind `approx_count_distinct`, its summary is not a storable column.
  * This sketch is a first-class binary value: per-night per-group
  * sketches land in parquet, `graft_quantile_merge` folds them, and
  * `graft_quantile_at(sk, q)` reads any quantile — so "p95 document
  * length per language, over the whole corpus, updated nightly" costs a
  * per-night O(delta) pass plus a metadata-sized fold.
  *
  * Structure: the deterministic compactor (Munro-Paterson SFCS'78
  * lineage; the buffer-pyramid shape KLL [Karnin-Lang-Liberty FOCS'16]
  * randomizes): level i holds values of weight 2^i in a buffer of
  * capacity k; a full buffer sorts and promotes every other element to
  * level i+1 (the kept offset ALTERNATES per level — the deterministic
  * stand-in for KLL's coin, canceling drift between consecutive
  * compactions). Rank error grows O(2^i) per compaction at level i;
  * with k = 4096 the measured max rank error at n = 200k is well under
  * 1% (QuantileSketchSpec pins the bound).
  *
  * Two regimes, the family's exact-regime discipline:
  *  - n ≤ k: level 0 never compacts, the sketch IS the sorted multiset,
  *    and every quantile is EXACT — the registered queries' regime at
  *    all driver SFs, which is what lets a `quantile_disc` DuckDB
  *    oracle hash-match (estimator rule matched to DuckDB's: smallest
  *    value whose cumulative weight ≥ ceil(q·N)).
  *  - past k: bounded-rank-error summaries whose merge stays mergeable
  *    (concatenate levels, recompact) — spec-bound, order-dependent
  *    like every compaction-based summary (Spark's own GK included).
  *
  * Serialization sorts each level, so exact-regime sketch bytes are
  * deterministic under insertion order and partitioning. */
final class QuantileSketch(val k: Int) {
  require(k == 0 || (k >= 8 && k % 2 == 0),
    s"graft_quantile_sketch: capacity must be even and >= 8, got $k")

  private[functions] val levels = ArrayBuffer(ArrayBuffer.empty[Long])
  private[functions] var toggles: Long = 0L

  def isEmptyPlaceholder: Boolean = k == 0
  private[graft] def nLevels: Int = levels.length
  def totalWeight: Long =
    levels.iterator.zipWithIndex.map { case (b, i) => b.length.toLong << i }.sum

  def add(v: Long): Unit = {
    levels(0) += v
    if (levels(0).length >= k) compactLevel(0)
  }

  /** Sort level i, promote every other element (alternating offset) to
    * level i+1 with doubled implicit weight, cascade if that fills.
    * Weight is conserved EXACTLY: an odd-length buffer (reachable only
    * through [[absorb]]'s level concatenation — [[add]] compacts at
    * exactly k, which is even) retains its largest element at level i
    * instead of folding it into a half-pair, so
    * totalWeight(merge(a, b)) == totalWeight(a) + totalWeight(b) always
    * (the KLL/Munro-Paterson leftover rule; QuantileSketchSpec pins the
    * invariant). */
  private def compactLevel(i: Int): Unit = {
    val arr = levels(i).toArray
    java.util.Arrays.sort(arr)
    val even = arr.length & ~1
    val off = ((toggles >>> i) & 1L).toInt
    toggles ^= 1L << i
    if (levels.length == i + 1) levels += ArrayBuffer.empty[Long]
    val up = levels(i + 1)
    var j = off
    while (j < even) { up += arr(j); j += 2 }
    levels(i).clear()
    if (even < arr.length) levels(i) += arr(even) // the unpaired leftover
    if (up.length >= k) compactLevel(i + 1)
  }

  /** Fold `other` into THIS sketch in place — the aggregation path
    * (O(other) per fold instead of rebuilding the accumulated state
    * per input row). Returns the surviving instance: `other` when this
    * is the placeholder (a freshly-deserialized input is safe to own),
    * this otherwise. Capacities must match — the loud-mismatch rule
    * the whole family shares. */
  def absorb(other: QuantileSketch): QuantileSketch = {
    if (other.isEmptyPlaceholder) return this
    if (isEmptyPlaceholder) return other
    require(k == other.k,
      s"graft_quantile_merge: cannot merge sketches with different " +
        s"capacities ($k vs ${other.k})")
    toggles ^= other.toggles
    while (levels.length < other.levels.length)
      levels += ArrayBuffer.empty[Long]
    var i = 0
    while (i < other.levels.length) {
      levels(i) ++= other.levels(i)
      i += 1
    }
    i = 0
    while (i < levels.length) { // cascade handles freshly-filled uppers
      if (levels(i).length >= k) compactLevel(i)
      i += 1
    }
    this
  }

  /** Pure merge (operands untouched): a deep copy of this absorbs
    * `other` — identical semantics to the aggregation path. */
  def mergeIn(other: QuantileSketch): QuantileSketch =
    copySketch().absorb(other)

  private def copySketch(): QuantileSketch = {
    val out = new QuantileSketch(k)
    out.toggles = toggles
    out.levels.clear()
    levels.foreach(b => out.levels += b.clone())
    out
  }

  /** The q-quantile: smallest stored value whose cumulative weight
    * reaches ceil(q·N) — DuckDB `quantile_disc`'s rule, so the exact
    * regime hash-matches it verbatim. */
  def estimate(q: Double): Long = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0, 1]")
    val n = totalWeight
    require(n > 0, "empty quantile sketch has no quantiles")
    val pairs = ArrayBuffer.empty[(Long, Long)]
    levels.iterator.zipWithIndex.foreach { case (b, i) =>
      b.foreach(v => pairs += ((v, 1L << i)))
    }
    val sorted = pairs.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var idx = 0
    while (idx < sorted.length) {
      cum += sorted(idx)._2
      if (cum >= target) return sorted(idx)._1
      idx += 1
    }
    sorted.last._1
  }

  /** Wire format (levels SORTED → exact-regime bytes deterministic):
    * k, toggles, level count, then per level count + values. */
  def serialize(): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(k)
    out.writeLong(toggles)
    out.writeInt(levels.length)
    levels.foreach { b =>
      val arr = b.toArray
      java.util.Arrays.sort(arr)
      out.writeInt(arr.length)
      arr.foreach(out.writeLong)
    }
    out.flush(); bytes.toByteArray
  }
}

object QuantileSketch {

  def placeholder(): QuantileSketch = new QuantileSketch(0)

  def deserialize(b: Array[Byte]): QuantileSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val sk = new QuantileSketch(in.readInt())
    sk.toggles = in.readLong()
    val nl = in.readInt()
    while (sk.levels.length < nl) sk.levels += ArrayBuffer.empty[Long]
    var i = 0
    while (i < nl) {
      var c = in.readInt()
      while (c > 0) { sk.levels(i) += in.readLong(); c -= 1 }
      i += 1
    }
    sk
  }

  /** Static entry the codegen'd [[QuantileAt]] calls. */
  def estimateBytes(b: Array[Byte], q: Double): Long =
    deserialize(b).estimate(q)
}

/** `graft_quantile_sketch(v, k)` — TypedImperativeAggregate building a
  * [[QuantileSketch]] over a long/int column; returns the serialized
  * sketch. ObjectHashAggregate: partials compact map-side, only k-scale
  * buffers cross the exchange. */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch] with UnaryLike[Expression] {

  require(k >= 8 && k % 2 == 0,
    s"graft_quantile_sketch: capacity must be even and >= 8, got $k")

  override def prettyName: String = "graft_quantile_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_sketch expects an integer column, got ${child.dataType}")

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(k)

  override def update(buf: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case l: Long => l
      case i: Int => i.toLong
      case other => sys.error(
        s"graft_quantile_sketch: integer input required, got ${other.getClass.getName}")
    })
    buf
  }

  override def merge(a: QuantileSketch, b: QuantileSketch): QuantileSketch =
    a.absorb(b) // partial buffers are aggregation-private: in-place is safe

  override def eval(buf: QuantileSketch): Any = buf.serialize()
  override def serialize(buf: QuantileSketch): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

object QuantileSketchAgg {
  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "graft_quantile_sketch(v, k) takes exactly two arguments")
    val k = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_quantile_sketch: k must be an integer literal, got $other")
    }
    QuantileSketchAgg(children.head, k)
  }
}

/** `graft_quantile_merge(sketch)` — folds serialized quantile sketches. */
case class QuantileMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_quantile_merge"
  // SQL-conventional: an empty or all-null group merges to NULL rather
  // than aborting the whole snapshot read (one bad group would otherwise
  // throw from eval and kill the job)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QuantileSketch =
    QuantileSketch.placeholder()

  override def update(buf: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v == null) buf
    // in-place absorb: O(input) per row, not O(accumulated state)
    else buf.absorb(QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: QuantileSketch, b: QuantileSketch): QuantileSketch =
    a.absorb(b)

  override def eval(buf: QuantileSketch): Any =
    if (buf.isEmptyPlaceholder) null else buf.serialize()

  override def serialize(buf: QuantileSketch): Array[Byte] =
    if (buf.isEmptyPlaceholder) Array.emptyByteArray else buf.serialize()
  override def deserialize(b: Array[Byte]): QuantileSketch =
    if (b.isEmpty) QuantileSketch.placeholder()
    else QuantileSketch.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): QuantileMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): QuantileMergeAgg =
    copy(child = newChild)
}

/** `graft_quantile_at(sketch, q)` — the q-quantile of a serialized
  * sketch. Group-grain input, codegen'd anyway (one static call). */
case class QuantileAt(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_quantile_at"
  override def dataType: DataType = LongType
  // STRICT on the sketch side: an implicit-cast trait would let the
  // analyzer cast a string column to binary and fail at runtime inside
  // deserialize with a garbage-header message; only the QUANTILE arg is
  // coercible, and the SQL builder inserts that cast explicitly so the
  // natural spelling graft_quantile_at(sk, 0.5) (DECIMAL literal) works
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_at expects (binary sketch, double quantile), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(sk: Any, q: Any): Any =
    QuantileSketch.estimateBytes(sk.asInstanceOf[Array[Byte]],
      q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, q) =>
      s"graft.functions.QuantileSketch$$.MODULE$$.estimateBytes($sk, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileAt =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sparse-exact / dense-HLL distinct-count sketch — the mergeable,
  * PERSISTABLE cardinality aggregate (vocabulary growth per language,
  * distinct documents per domain, dedup-rate estimation).
  *
  * Spark's built-in `approx_count_distinct` answers the one-shot
  * question, but its HLL state is an opaque internal buffer: it cannot
  * be stored as a column, folded night over night, or merged across
  * separately-computed tables — the exact shape an incremental corpus
  * pipeline needs (the same reason [[graft.operators.PointStore]]
  * exists for additive point tables; reference analog: the ON DUPLICATE
  * KEY fold, crunch_global.sql:58-75, applied to a non-additive
  * measure). This sketch is a first-class BINARY value: per-night
  * per-group sketches land in ordinary parquet, `graft_sketch_merge`
  * folds any number of them, and `graft_sketch_est` reads the estimate
  * — the Druid/DataSketches production pattern.
  *
  * Two regimes (the HLL++ sparse idea, Heule et al. EDBT'13, without
  * the bias tables):
  *  - SPARSE below `sparseCap` distinct rehashes: the 64-bit rehash set
  *    itself, so the estimate is EXACT (collision odds ~k²/2⁶⁴ — the
  *    tolerance every hashed-shingle operator here already prices).
  *    The registered queries run in this regime, which is what lets an
  *    approximate structure hash-match a `count(DISTINCT …)` DuckDB
  *    oracle — the [[SpaceSaving]] exact-regime trick.
  *  - DENSE past the cap: classic HyperLogLog (Flajolet et al. AofA'07)
  *    — m = 2^p six-bit-scale registers held one-per-byte, estimate
  *    α_m·m²/Σ2^(-reg) with the small-range linear-counting correction.
  *    Relative error ~1.04/√m regardless of cardinality: the 100 TB
  *    regime, where state per group is m bytes, period.
  *
  * Merges are exact algebra in both regimes (set union / register max),
  * so the fold tree is associative and commutative: partial buffers per
  * partition, k-byte frames through the exchange, and
  * merge(sketch(A), sketch(B)) is STATE-identical to sketch(A ∪ B) —
  * SketchSpec pins that equality across the sparse/dense boundary.
  * Serialization sorts the sparse set, so equal sketch states are equal
  * bytes (deterministic parquet output under any partitioning).
  *
  * Inputs are rehashed (XXH64, the engine-wide hash family) whatever
  * the child type: already-uniform inputs lose nothing, and sequential
  * ids — which would shred raw-value register indexing — become
  * uniform.
  */
final class DistinctSketch(val p: Int, val sparseCap: Int) {
  require(p == 0 || (p >= 4 && p <= 18),
    s"graft_distinct_sketch: precision must be in [4, 18], got $p")
  // beyond this the sparse regime's memory cost dwarfs the dense
  // registers it exists to avoid — and grow()'s doubled table length
  // would overflow Int around 1.5e9 entries
  require(sparseCap <= DistinctSketch.MaxSparseCap,
    s"graft_distinct_sketch: sparseCap $sparseCap exceeds the " +
      s"${DistinctSketch.MaxSparseCap} bound (use the dense regime — " +
      "a larger p — past that)")

  import DistinctSketch._

  // sparse state: open-addressed 64-bit hash set (0 kept out-of-table)
  private[functions] var table: Array[Long] =
    if (p == 0) null else new Array[Long](tableSizeFor(16))
  private[functions] var hasZero = false
  private[functions] var sparseN = 0
  // dense state: one byte per register once promoted
  private[functions] var regs: Array[Byte] = null

  def isEmptyPlaceholder: Boolean = p == 0
  def isDense: Boolean = regs != null

  def add(rawHash: Long): Unit =
    if (regs != null) addDense(rawHash) else addSparse(rawHash)

  private def addSparse(h: Long): Unit = {
    if (h == 0L) {
      if (!hasZero) { hasZero = true; sparseN += 1 }
    } else {
      val mask = table.length - 1
      var i = (mixProbe(h) & mask.toLong).toInt
      while (table(i) != 0L && table(i) != h) i = (i + 1) & mask
      if (table(i) == 0L) {
        table(i) = h; sparseN += 1
        if (sparseN > (table.length * 7) / 10) grow()
      }
    }
    if (sparseN > sparseCap) promote()
  }

  private def grow(): Unit = {
    val old = table
    table = new Array[Long](old.length * 2)
    val mask = table.length - 1
    var j = 0
    while (j < old.length) {
      val h = old(j)
      if (h != 0L) {
        var i = (mixProbe(h) & mask.toLong).toInt
        while (table(i) != 0L) i = (i + 1) & mask
        table(i) = h
      }
      j += 1
    }
  }

  private def addDense(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt // high p bits: register index < 2^p
    val rest = h << p
    val rho =
      (if (rest == 0L) 64 - p + 1
       else java.lang.Long.numberOfLeadingZeros(rest) + 1).toByte
    if (rho > regs(idx)) regs(idx) = rho
  }

  /** Sparse → dense: re-play the stored rehashes into fresh registers.
    * One-way — exactness is spent, the α_m/√m guarantee takes over. */
  private[functions] def promote(): Unit = {
    if (regs != null) return
    regs = new Array[Byte](1 << p)
    if (hasZero) addDense(0L)
    var j = 0
    while (j < table.length) {
      if (table(j) != 0L) addDense(table(j))
      j += 1
    }
    table = null; hasZero = false; sparseN = 0
  }

  private def foreachSparse(f: Long => Unit): Unit = {
    if (hasZero) f(0L)
    var j = 0
    while (j < table.length) { if (table(j) != 0L) f(table(j)); j += 1 }
  }

  /** Fold `other` into THIS sketch in place — the aggregation path
    * (O(other) per fold instead of rebuilding the accumulated state per
    * input row). Returns the surviving instance: `other` when this is
    * the placeholder (a freshly-deserialized input is safe to own),
    * this otherwise. Parameters must match — silently folding a p=12
    * sketch into a p=16 one would yield a number with neither sketch's
    * guarantee, so mismatches are loud. The final state is a pure
    * function of the value set whatever the fold tree (set union /
    * register max; DistinctSketchSpec's chunking property pins it). */
  def absorb(other: DistinctSketch): DistinctSketch = {
    if (other.isEmptyPlaceholder) return this
    if (isEmptyPlaceholder) return other
    require(p == other.p && sparseCap == other.sparseCap,
      s"graft_sketch_merge: cannot merge sketches with different shapes " +
        s"(p=$p cap=$sparseCap vs p=${other.p} cap=${other.sparseCap})")
    if (other.isDense && !isDense) promote()
    if (isDense) {
      if (other.isDense) {
        var i = 0
        while (i < regs.length) {
          if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
          i += 1
        }
      } else other.foreachSparse(addDense)
    } else other.foreachSparse(add) // add promotes if the union crosses cap
    this
  }

  /** Pure merge (operands untouched): a deep copy of this absorbs
    * `other` — identical semantics to the aggregation path. */
  def mergeIn(other: DistinctSketch): DistinctSketch =
    copySketch().absorb(other)

  private def copySketch(): DistinctSketch = {
    val out = new DistinctSketch(p, sparseCap)
    if (isDense) { out.promote(); Array.copy(regs, 0, out.regs, 0, regs.length) }
    else if (p != 0) foreachSparse(out.add)
    out
  }

  /** The cardinality estimate: exact sparse size, or the HLL estimator
    * with the small-range linear-counting correction. */
  def estimate: Long =
    if (isEmptyPlaceholder) 0L
    else if (regs == null) sparseN.toLong
    else {
      val m = regs.length
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        invSum += java.lang.Math.scalb(1.0, -regs(i))
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _  => 0.7213 / (1.0 + 1.079 / m)
      }
      val e = alpha * m * m / invSum
      val corrected =
        if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else e
      math.rint(corrected).toLong
    }

  /** Wire format (sparse set SORTED → equal states are equal bytes):
    * mode byte, p, sparseCap, then count+hashes or raw registers. */
  def serialize(): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeByte(if (isDense) 1 else 0)
    out.writeInt(p)
    out.writeInt(sparseCap)
    if (isDense) out.write(regs)
    else {
      val arr = new Array[Long](sparseN)
      var n = 0
      foreachSparse { h => arr(n) = h; n += 1 }
      java.util.Arrays.sort(arr)
      out.writeInt(arr.length)
      arr.foreach(out.writeLong)
    }
    out.flush(); bytes.toByteArray
  }
}

object DistinctSketch {

  /** Upper bound on the sparse-exact regime (2^27 entries ≈ 1 GiB of
    * table at the 0.7 load factor) — past it the open-addressed table's
    * doubling would overflow and the dense registers are cheaper anyway. */
  val MaxSparseCap: Int = 1 << 27

  /** Empty placeholder a [[SketchMergeAgg]] buffer starts as — adopts
    * the first real sketch's parameters on merge. */
  def placeholder(): DistinctSketch = new DistinctSketch(0, 0)

  private def tableSizeFor(n: Int): Int = {
    var s = 16
    while (s < n * 2) s <<= 1
    s
  }

  /** Probe mix for the open-addressed table: the raw rehash is already
    * uniform, but linear probing wants the LOW bits scrambled relative
    * to the value (the dense register index uses the HIGH bits). */
  private def mixProbe(h: Long): Long = {
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z ^ (z >>> 27)
  }

  /** The one rehash applied to every input, whatever the child type. */
  def rehash(v: Any): Long = v match {
    case l: Long => XXH64.hashLong(l, 42L)
    case i: Int => XXH64.hashLong(i.toLong, 42L)
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    case b: Array[Byte] =>
      XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 42L)
    case other => sys.error(
      s"graft_distinct_sketch: unsupported input ${other.getClass.getName}")
  }

  def deserialize(b: Array[Byte]): DistinctSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val dense = in.readByte() == 1
    val p = in.readInt()
    val cap = in.readInt()
    val sk = new DistinctSketch(p, cap)
    if (dense) {
      sk.promote()
      in.readFully(sk.regs)
    } else {
      var n = in.readInt()
      while (n > 0) { sk.add(in.readLong()); n -= 1 }
    }
    sk
  }

  /** Static estimate entry the codegen'd [[SketchEst]] calls. */
  def estimateBytes(b: Array[Byte]): Long = deserialize(b).estimate
}

/** `graft_distinct_sketch(item, p, sparseCap)` — TypedImperativeAggregate
  * building a [[DistinctSketch]] from raw values; returns the serialized
  * sketch (binary). Planned through ObjectHashAggregate: partials build
  * per-partition sketches (map-side combine), only sketch buffers cross
  * the exchange. */
case class DistinctSketchAgg(
    child: Expression,
    p: Int,
    sparseCap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DistinctSketch] with UnaryLike[Expression] {

  require(p >= 4 && p <= 18,
    s"graft_distinct_sketch: precision must be in [4, 18], got $p")
  require(sparseCap >= 0, s"graft_distinct_sketch: negative sparseCap $sparseCap")

  override def prettyName: String = "graft_distinct_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(LongType, IntegerType, StringType, BinaryType).contains(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_distinct_sketch expects a long/int/string/binary column, " +
        s"got ${child.dataType}")

  override def createAggregationBuffer(): DistinctSketch =
    new DistinctSketch(p, sparseCap)

  override def update(buf: DistinctSketch, input: InternalRow): DistinctSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(DistinctSketch.rehash(v))
    buf
  }

  override def merge(a: DistinctSketch, b: DistinctSketch): DistinctSketch =
    a.absorb(b) // partial buffers are aggregation-private: in-place is safe

  override def eval(buf: DistinctSketch): Any = buf.serialize()

  override def serialize(buf: DistinctSketch): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): DistinctSketch =
    DistinctSketch.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): DistinctSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DistinctSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): DistinctSketchAgg =
    copy(child = newChild)
}

object DistinctSketchAgg {
  /** SQL-registry builder: `graft_distinct_sketch(item, p, sparseCap)`,
    * p and sparseCap integer literals. */
  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      "graft_distinct_sketch(item, p, sparseCap) takes exactly three arguments")
    def intLit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_distinct_sketch: $name must be an integer literal, got $other")
    }
    DistinctSketchAgg(children.head, intLit(children(1), "p"),
      intLit(children(2), "sparseCap"))
  }
}

/** `graft_sketch_merge(sketch)` — folds a column of serialized sketches
  * into one (binary). The read half of the persisted-fold pattern: the
  * nightly table stores one sketch per (group, night); this merge is
  * how a snapshot answers at the group grain. */
case class SketchMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DistinctSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_sketch_merge"
  // SQL-conventional: an empty or all-null group merges to NULL rather
  // than aborting the whole snapshot read (one bad group would otherwise
  // throw from eval and kill the job)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): DistinctSketch =
    DistinctSketch.placeholder()

  override def update(buf: DistinctSketch, input: InternalRow): DistinctSketch = {
    val v = child.eval(input)
    if (v == null) buf
    // in-place absorb: O(input) per row, not O(accumulated state)
    else buf.absorb(DistinctSketch.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: DistinctSketch, b: DistinctSketch): DistinctSketch =
    a.absorb(b)

  override def eval(buf: DistinctSketch): Any =
    if (buf.isEmptyPlaceholder) null else buf.serialize()

  override def serialize(buf: DistinctSketch): Array[Byte] =
    if (buf.isEmptyPlaceholder) Array.emptyByteArray else buf.serialize()
  override def deserialize(b: Array[Byte]): DistinctSketch =
    if (b.isEmpty) DistinctSketch.placeholder()
    else DistinctSketch.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): SketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): SketchMergeAgg =
    copy(child = newChild)
}

/** `graft_sketch_est(sketch)` — the cardinality estimate of a serialized
  * sketch. Group-grain input, but codegen'd anyway (one static call) so
  * it never breaks a WholeStageCodegen span it appears in. */
case class SketchEst(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_sketch_est"
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_sketch_est expects a binary sketch, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    DistinctSketch.estimateBytes(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"graft.functions.DistinctSketch$$.MODULE$$.estimateBytes($b)")

  override protected def withNewChildInternal(newChild: Expression): SketchEst =
    copy(child = newChild)
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al. ICDT'05) with the
  * mergeable-summaries merge (Agarwal et al. PODS'12) — the "what are the
  * top domains/tokens across 100 TB" aggregate.
  *
  * An exact token frequency table group-bys the whole token universe
  * through a shuffle; the sketch caps state at k counters PER PARTIAL and
  * ships one small buffer per partition through the merge tree, so the
  * answer costs one scan regardless of cardinality. Invariant maintained
  * end-to-end (update, merge, truncation):
  *
  *     true(x) ≤ est(x) ≤ true(x) + err(x)
  *
  * and any item NOT in the sketch has true count ≤ floor (the sketch's
  * minimum estimate once full) — which is what makes every item with
  * true count > N/k guaranteed-present. When the distinct cardinality
  * never exceeds k, no eviction happens anywhere, every floor is 0, and
  * the sketch is EXACT — the registered `freq_tokens` query runs in that
  * regime, which is what lets an approximate structure hash-match a plain
  * GROUP BY oracle (same trick as skew_salted_agg: the oracle proves the
  * sketch machinery is count-preserving).
  */
final class SpaceSaving(val k: Int) {
  /** item → (estimated count, overestimation bound). */
  val entries = new mutable.HashMap[String, (Long, Long)]

  /** Upper bound on the true count of any item absent from this sketch:
    * the minimum estimate once the sketch has filled, 0 before. */
  def floor: Long =
    if (entries.size >= k) entries.valuesIterator.map(_._1).min else 0L

  /** Classic SpaceSaving update: hit → increment; room → insert; full →
    * the min-count entry is reassigned to the new item with err = its old
    * count. The eviction scan is O(k); k is small (hundreds) and a skewed
    * stream hits existing entries almost always. */
  def add(item: String): Unit = entries.get(item) match {
    case Some((c, e)) => entries.update(item, (c + 1, e))
    case None if entries.size < k => entries.update(item, (1L, 0L))
    case None =>
      val (minItem, (minC, _)) = entries.minBy { case (i, (c, _)) => (c, i) }
      entries.remove(minItem)
      entries.update(item, (minC + 1, minC))
  }

  /** Mergeable-summaries combine: est/err sum over the union, with an
    * absent side contributing its floor to BOTH (true_other(x) ≤ floor,
    * so the sum stays an upper bound and the error bound stays sound);
    * then keep the top k — every dropped item's estimate is ≤ the
    * surviving minimum, i.e. ≤ the merged sketch's floor, preserving the
    * absent-item bound. Ties truncate deterministically (count desc,
    * item asc). */
  def mergeIn(other: SpaceSaving): SpaceSaving = {
    val fa = floor; val fb = other.floor
    val merged = new mutable.HashMap[String, (Long, Long)]
    (entries.keysIterator ++ other.entries.keysIterator).foreach { item =>
      if (!merged.contains(item)) {
        val (ca, ea) = entries.getOrElse(item, (fa, fa))
        val (cb, eb) = other.entries.getOrElse(item, (fb, fb))
        merged.update(item, (ca + cb, ea + eb))
      }
    }
    val out = new SpaceSaving(k)
    if (merged.size <= k) out.entries ++= merged
    else out.entries ++= merged.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    out
  }

  /** Entries sorted (count desc, item asc) — the eval order. */
  def sorted: Seq[(String, Long, Long)] =
    entries.toSeq.map { case (i, (c, e)) => (i, c, e) }
      .sortBy { case (i, c, _) => (-c, i) }

  /** The [[SpaceSaving.placeholder]] a merge buffer starts as. */
  def isEmptyPlaceholder: Boolean = k == 0

  /** Fold `other` into a merged sketch — the serialized-column merge
    * path ([[TopKMergeAgg]]). Placeholders adopt the other side;
    * mismatched k is loud (the [[DistinctSketch.absorb]] rule: silently
    * folding a k=64 sketch into a k=256 one would yield counts with
    * neither sketch's floor guarantee). */
  def absorb(other: SpaceSaving): SpaceSaving =
    if (other.isEmptyPlaceholder) this
    else if (isEmptyPlaceholder) other
    else {
      require(k == other.k,
        s"graft_topk_merge: cannot merge sketches with different k " +
          s"($k vs ${other.k})")
      mergeIn(other)
    }

  /** Wire format (entries SORTED count desc, item asc → equal states are
    * equal bytes — the [[DistinctSketch.serialize]] determinism rule,
    * required of any sketch landed as a parquet column): k, count, then
    * per entry writeInt(byteLen) + raw UTF-8 (NOT writeUTF, whose
    * modified-UTF-8 format caps entries at 64 KB) + est + err. */
  def serialize(): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(k)
    out.writeInt(entries.size)
    sorted.foreach { case (i, c, e) =>
      val ib = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(ib.length); out.write(ib)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bytes.toByteArray
  }
}

object SpaceSaving {

  /** Empty placeholder a [[TopKMergeAgg]] buffer starts as — adopts the
    * first real sketch's k on merge. */
  def placeholder(): SpaceSaving = new SpaceSaving(0)

  def deserialize(b: Array[Byte]): SpaceSaving = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val buf = new SpaceSaving(in.readInt())
    var n = in.readInt()
    while (n > 0) {
      val ib = new Array[Byte](in.readInt()); in.readFully(ib)
      val i = new String(ib, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      buf.entries.update(i, (c, e)); n -= 1
    }
    buf
  }

  /** The `array<struct<item, count, err>>` row type every top-k eval
    * shares ([[TopKFreq]], [[TopKRead]]). */
  private[functions] val EntriesType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  private[functions] def toArrayData(buf: SpaceSaving): GenericArrayData =
    new GenericArrayData(buf.sorted.map { case (i, c, e) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }.toArray[Any])

  /** Static read entry the codegen'd [[TopKRead]] calls. */
  def readBytes(b: Array[Byte]): GenericArrayData = toArrayData(deserialize(b))
}

/** `graft_topk_freq(item, k)` — TypedImperativeAggregate over string keys
  * returning `array<struct<item, count, err>>` sorted by (count desc,
  * item asc). Planned through ObjectHashAggregate: partials build local
  * sketches (map-side combine over raw rows), only k-entry buffers cross
  * the exchange. */
case class TopKFreq(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] with UnaryLike[Expression] {

  require(k > 0, s"graft_topk_freq: k must be positive, got $k")

  override def prettyName: String = "graft_topk_freq"
  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSaving.EntriesType

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(k)

  override def update(buf: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString) // copies out of the reused row buffer
    buf
  }

  override def merge(a: SpaceSaving, b: SpaceSaving): SpaceSaving =
    a.mergeIn(b)

  override def eval(buf: SpaceSaving): Any = SpaceSaving.toArrayData(buf)

  override def serialize(buf: SpaceSaving): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): SpaceSaving =
    SpaceSaving.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): TopKFreq =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKFreq =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TopKFreq =
    copy(child = newChild)
}

object TopKFreq {
  /** SQL-registry builder: `graft_topk_freq(item, k)`, k a literal. */
  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "graft_topk_freq(item, k) takes exactly two arguments")
    val k = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_topk_freq: k must be an integer literal, got $other")
    }
    TopKFreq(children.head, k)
  }
}

/** `graft_topk_sketch(item, k)` — the STORABLE form of [[TopKFreq]]:
  * identical SpaceSaving machinery, but eval returns the serialized
  * sketch (binary) instead of the unpacked entry array. Completes the
  * persisted-sketch trio's store story: heavy hitters join distinct
  * counts ([[DistinctSketchAgg]]) and quantiles ([[QuantileSketchAgg]])
  * as first-class BINARY columns — land one per (group, night) in
  * parquet or a [[graft.sources.PointStore]] `topks` measure, fold them
  * night over night with `graft_topk_merge` (the mergeable-summaries
  * merge is what makes the fold tree associative), and read the ranking
  * back with `graft_topk_read`. */
case class TopKSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] with UnaryLike[Expression] {

  require(k > 0, s"graft_topk_sketch: k must be positive, got $k")

  override def prettyName: String = "graft_topk_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(k)

  override def update(buf: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(a: SpaceSaving, b: SpaceSaving): SpaceSaving =
    a.mergeIn(b)

  override def eval(buf: SpaceSaving): Any = buf.serialize()

  override def serialize(buf: SpaceSaving): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): SpaceSaving =
    SpaceSaving.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TopKSketchAgg =
    copy(child = newChild)
}

object TopKSketchAgg {
  /** SQL-registry builder: `graft_topk_sketch(item, k)`, k a literal. */
  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "graft_topk_sketch(item, k) takes exactly two arguments")
    val k = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_topk_sketch: k must be an integer literal, got $other")
    }
    TopKSketchAgg(children.head, k)
  }
}

/** `graft_topk_merge(sketch)` — folds a column of serialized SpaceSaving
  * sketches into one (binary). The read half of the persisted-fold
  * pattern, and the merge a [[graft.sources.PointStore]] `topks`
  * measure compacts with. Empty/all-null input merges to NULL (the
  * SQL-aggregate convention the sketch/quantile merges share). */
case class TopKMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] with UnaryLike[Expression] {

  override def prettyName: String = "graft_topk_merge"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): SpaceSaving =
    SpaceSaving.placeholder()

  override def update(buf: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v == null) buf
    else buf.absorb(SpaceSaving.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: SpaceSaving, b: SpaceSaving): SpaceSaving =
    a.absorb(b)

  override def eval(buf: SpaceSaving): Any =
    if (buf.isEmptyPlaceholder) null else buf.serialize()

  override def serialize(buf: SpaceSaving): Array[Byte] =
    if (buf.isEmptyPlaceholder) Array.emptyByteArray else buf.serialize()
  override def deserialize(b: Array[Byte]): SpaceSaving =
    if (b.isEmpty) SpaceSaving.placeholder()
    else SpaceSaving.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): TopKMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TopKMergeAgg =
    copy(child = newChild)
}

/** `graft_topk_read(sketch)` — unpack a serialized SpaceSaving sketch to
  * the `array<struct<item, count, err>>` eval form of [[TopKFreq]],
  * sorted (count desc, item asc) so `posexplode` IS the per-group
  * ranking. Group-grain input, but codegen'd anyway (one static call)
  * so it never breaks a WholeStageCodegen span. */
case class TopKRead(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_topk_read"
  override def dataType: DataType = SpaceSaving.EntriesType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_topk_read expects a binary sketch, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    SpaceSaving.readBytes(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"graft.functions.SpaceSaving$$.MODULE$$.readBytes($b)")

  override protected def withNewChildInternal(newChild: Expression): TopKRead =
    copy(child = newChild)
}

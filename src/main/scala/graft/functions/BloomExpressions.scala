package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom filter over 64-bit keys — the scan-side semi-join prune.
  *
  * The 100 TB problem it solves: a membership screen (is this shingle in
  * the benchmark set? is this key in the delete list?) expressed as a
  * join ships EVERY probe-side row through a shuffle to learn that ~99%
  * of them match nothing. The bloom summarizes the build side into a
  * fixed budget of bits — kilobytes-to-megabytes of driver metadata
  * regardless of probe-side scale — and the probe becomes a codegen'd
  * per-row filter at scan speed. False positives (and only positives)
  * survive to a normal equi-join that verifies them EXACTLY, so the
  * composed operator's results are identical to the plain join's; the
  * bloom only moves where the non-matches die. This is the runtime-
  * filter pattern Spark applies to shuffle joins internally, made an
  * explicit, SQL-visible operator.
  *
  * Standard construction (Bloom '70; Kirsch-Mitzenhenner double hashing):
  * k bit positions per key derived from two independent 64-bit finalizer
  * mixes, bit array a power-of-two size. No false negatives, FP rate
  * ~(1-e^(-kn/m))^k; [[Bloom.optimal]] sizes m,k for a target rate.
  */
final class BloomBuffer(val numHashes: Int, val words: Array[Long]) {

  // numBits - 1, in LONG arithmetic: an Int mask wraps at 2^26 words and
  // would silently address only the low half of a larger filter
  private val mask = (words.length.toLong << 6) - 1

  def add(v: Long): Unit = {
    val h1 = Bloom.mix1(v); val h2 = Bloom.mix2(v)
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i * h2) & mask
      words((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  def mightContain(v: Long): Boolean =
    Bloom.mightContain(words, numHashes, v)

  def orInPlace(other: BloomBuffer): BloomBuffer = {
    require(other.words.length == words.length && other.numHashes == numHashes,
      "bloom merge: mismatched filter shapes")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }
}

object Bloom {

  /** MurmurHash3 fmix64 — the standard 64-bit finalizer avalanche. */
  def mix1(v: Long): Long = {
    var x = v
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  /** Second independent mix (offset by the golden ratio), forced odd so
    * the double-hash stride visits distinct positions mod a power of 2. */
  def mix2(v: Long): Long = mix1(v + 0x9e3779b97f4a7c15L) | 1L

  /** Shared probe kernel — interpreted eval, codegen, and the buffer all
    * call this one definition. */
  def mightContain(words: Array[Long], numHashes: Int, v: Long): Boolean = {
    val mask = (words.length.toLong << 6) - 1 // Long: see BloomBuffer
    val h1 = mix1(v); val h2 = mix2(v)
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i * h2) & mask
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** (words, numHashes) for `n` expected keys at target FP rate `fpp`:
    * the textbook m = -n·ln p/ln²2 rounded UP to a power of two (the
    * mask trick needs it), k = (m/n)·ln 2 clamped to [1, 16]. */
  def optimal(n: Long, fpp: Double): (Int, Int) = {
    require(n >= 0 && fpp > 0 && fpp < 1, s"bloom sizing: n=$n fpp=$fpp")
    val bits = math.ceil(
      -n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val m =
      if (bits <= 64) 64L
      else java.lang.Long.highestOneBit(bits - 1) << 1 // next power of two ≥ bits
    // (m >>> 6).toInt would wrap NEGATIVE past 2^37 bits and sail under
    // any caller's byte cap — refuse the un-addressable size loudly
    require((m >>> 6) <= Int.MaxValue,
      s"bloom sizing: $n keys at fpp=$fpp needs $m bits — beyond a single " +
        "filter's addressable range; a set this large is corpus-scale, " +
        "screen it with a shuffled join instead")
    val k = math.max(1, math.min(16,
      math.round(m.toDouble / math.max(1L, n) * math.log(2)).toInt))
    ((m >>> 6).toInt, k)
  }

  /** Wire format: [numHashes][numWords][words…] — what [[BloomAgg]]
    * emits and [[BloomMightContain]] consumes. */
  def serialize(buf: BloomBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(8 + buf.words.length * 8)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.numHashes)
    out.writeInt(buf.words.length)
    buf.words.foreach(out.writeLong)
    out.flush(); bytes.toByteArray
  }

  /** Header-validated: `graft_bloom_contains` is SQL-visible, so this can
    * receive arbitrary user BINARY — the embedded word count must be
    * checked against the blob's actual length BEFORE the allocation, or a
    * crafted value throws a raw EOFException / NegativeArraySizeException
    * or attempts a multi-GB array. */
  def deserialize(b: Array[Byte]): BloomBuffer = {
    require(b.length >= 8,
      s"graft_bloom: filter blob is ${b.length} bytes — not a serialized " +
        "bloom filter (needs an 8-byte header)")
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val k = in.readInt()
    val numWords = in.readInt()
    // numWords >= 1, not 0: a zero-word filter would pass the length
    // check but make every probe index an empty array (legitimate
    // filters always have >= 1 word — optimal() floors m at 64 bits)
    require(k >= 1 && k <= 16 && numWords >= 1 && 8 + 8L * numWords == b.length,
      s"graft_bloom: malformed filter header (numHashes=$k, numWords=" +
        s"$numWords) for a ${b.length}-byte blob — expected " +
        "numHashes in [1,16], numWords >= 1, and 8 + 8*numWords == length")
    val words = new Array[Long](numWords)
    var i = 0
    while (i < words.length) { words(i) = in.readLong(); i += 1 }
    new BloomBuffer(k, words)
  }
}

/** `graft_bloom_agg(key)` — aggregate a LongType column into a serialized
  * bloom filter (BinaryType). Planned through ObjectHashAggregate like
  * [[TopKFreq]]: partials build local bit arrays, only fixed-size filters
  * cross the exchange (the merge is a bitwise OR — associative and
  * commutative, so partial/final split is exact). */
case class BloomAgg(
    child: Expression,
    numWords: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] with UnaryLike[Expression] {

  require(numWords > 0 && (numWords & (numWords - 1)) == 0,
    s"graft_bloom_agg: numWords must be a positive power of two, got $numWords")
  require(numHashes > 0 && numHashes <= 16,
    s"graft_bloom_agg: numHashes must be in [1,16], got $numHashes")

  override def prettyName: String = "graft_bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a BIGINT key, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(numHashes, new Array[Long](numWords))

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomBuffer, b: BloomBuffer): BloomBuffer =
    a.orInPlace(b)

  override def eval(buf: BloomBuffer): Any = Bloom.serialize(buf)

  override def serialize(buf: BloomBuffer): Array[Byte] = Bloom.serialize(buf)
  override def deserialize(b: Array[Byte]): BloomBuffer = Bloom.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `mightContain(key)` against a DRIVER-HELD filter: the collected bloom
  * rides into codegen as one reference object (the PQ-codebook lesson —
  * never a per-row literal, never a join), so the probe is a handful of
  * shifts and ANDs inside whole-stage codegen at scan speed. */
case class BloomMightContain(child: Expression, filter: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val parsed = Bloom.deserialize(filter)

  override def nullSafeEval(v: Any): Any =
    Bloom.mightContain(parsed.words, parsed.numHashes, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val words = ctx.addReferenceObj("bloomWords", parsed.words, "long[]")
    val k = parsed.numHashes
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Bloom.mightContain($words, $k, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** SQL face of the probe: `graft_bloom_contains(filter, key)` where
  * `filter` is a BINARY constant or (the useful case) a scalar subquery
  * over [[BloomAgg]] — `WHERE graft_bloom_contains((SELECT
  * graft_bloom_agg(k, 1024, 5) FROM bench), key)`. The filter operand
  * must be row-independent (no input references); it is deserialized
  * ONCE per task on first probe, not per row, via the expression
  * instance riding into codegen as its own reference object. */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.references.nonEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the filter operand must be a constant or scalar " +
          "subquery, not a per-row column")
    else if (left.dataType != BinaryType || right.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName(filter BINARY, key BIGINT), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  // cache keyed on the byte-array identity: the filter is one constant
  // object per task, so the parse happens once, not per row
  @transient private var cachedFor: Array[Byte] = _
  @transient private var cached: BloomBuffer = _

  def probe(filter: Array[Byte], v: Long): Boolean = {
    if (cached == null || (cachedFor ne filter)) {
      cached = Bloom.deserialize(filter); cachedFor = filter
    }
    Bloom.mightContain(cached.words, cached.numHashes, v)
  }

  override def nullSafeEval(f: Any, v: Any): Any =
    probe(f.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this,
      classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, (f, v) => s"${ev.value} = $ref.probe($f, $v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomAgg {
  /** SQL-registry builder: `graft_bloom_agg(key, numWords, numHashes)`,
    * sizes as integer literals. */
  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      "graft_bloom_agg(key, numWords, numHashes) takes exactly three arguments")
    def intLit(e: Expression, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_bloom_agg: $name must be an integer literal, got $other")
    }
    BloomAgg(children.head, intLit(children(1), "numWords"),
      intLit(children(2), "numHashes"))
  }
}

/** DataFrame face of the bloom kernels. */
object BloomOps {
  import org.apache.spark.sql.{Column, GraftShim}

  def bloomAgg(key: Column, numWords: Int, numHashes: Int): Column =
    GraftShim.column(
      BloomAgg(GraftShim.expression(key), numWords, numHashes)
        .toAggregateExpression())

  def mightContain(key: Column, filter: Array[Byte]): Column =
    GraftShim.column(BloomMightContain(GraftShim.expression(key), filter))
}

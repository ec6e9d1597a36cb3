package graft

import graft.functions.{Bloom, BloomOps}
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Bloom-filter properties the operator oracle can't state: the
  * no-false-negative guarantee under the distributed OR-merge, the FP
  * rate landing near its sizing target, and the screen ≡ the plain
  * shuffled screen row-for-row. */
class BloomSpec extends SparkSpec {

  private def filterOf(keys: Seq[Long], words: Int, hashes: Int): Array[Byte] = {
    import spark.implicits._
    // many partitions so the merge path (partial OR partial) is exercised
    keys.toDF("k").repartition(7)
      .agg(BloomOps.bloomAgg(col("k"), words, hashes))
      .head.getAs[Array[Byte]](0)
  }

  test("no false negatives across the partial-buffer merge") {
    val keys = (0L until 5000L).map(i => i * 0x9e3779b97f4a7c15L + 17)
    val (words, hashes) = Bloom.optimal(keys.size, Curation.BloomFpp)
    val f = Bloom.deserialize(filterOf(keys, words, hashes))
    keys.foreach(k => assert(f.mightContain(k), s"false negative for $k"))
  }

  test("false-positive rate lands near the sizing target") {
    val keys = (0L until 5000L).map(i => i * 0x9e3779b97f4a7c15L + 17)
    val (words, hashes) = Bloom.optimal(keys.size, Curation.BloomFpp)
    val f = Bloom.deserialize(filterOf(keys, words, hashes))
    val inSet = keys.toSet
    val probes = (0L until 20000L).map(i => i * 0x2545f4914f6cdd1dL + 3)
      .filterNot(inSet)
    val fp = probes.count(f.mightContain).toDouble / probes.size
    assert(fp < Curation.BloomFpp * 5, s"fp rate $fp vs target ${Curation.BloomFpp}")
    assert(fp > 0.0, "suspiciously perfect — probe set too easy?")
  }

  test("codegen'd probe equals the interpreted kernel") {
    import spark.implicits._
    val keys = (0L until 500L).map(i => i * 31 + 7)
    val (words, hashes) = Bloom.optimal(keys.size, Curation.BloomFpp)
    val bytes = filterOf(keys, words, hashes)
    val f = Bloom.deserialize(bytes)
    val probes = (0L until 3000L)
    val got = probes.toDF("k")
      .select(col("k"), BloomOps.mightContain(col("k"), bytes).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach(p => assert(got(p) == f.mightContain(p), s"probe $p"))
  }

  test("optimal sizing: power-of-two words, sane k, monotone in n") {
    val (w1, k1) = Bloom.optimal(1000, 0.01)
    val (w2, _) = Bloom.optimal(1000000, 0.01)
    assert((w1 & (w1 - 1)) == 0 && (w2 & (w2 - 1)) == 0)
    assert(w2 > w1)
    assert(k1 >= 1 && k1 <= 16)
    val (wTiny, kTiny) = Bloom.optimal(0, 0.01)
    assert(wTiny >= 1 && kTiny >= 1) // degenerate suite still yields a valid filter
  }

  test("deserialize rejects malformed blobs before allocating") {
    def bad(b: Array[Byte]): Unit = {
      val e = intercept[IllegalArgumentException](Bloom.deserialize(b))
      assert(e.getMessage.contains("graft_bloom"), e.getMessage)
    }
    bad(Array.emptyByteArray)
    bad(Array[Byte](1, 2, 3)) // shorter than the header
    // claims 2^28 words (2 GiB) in a 16-byte blob — must fail, not allocate
    bad(java.nio.ByteBuffer.allocate(16).putInt(5).putInt(1 << 28).array())
    // negative word count — must fail, not throw NegativeArraySizeException
    bad(java.nio.ByteBuffer.allocate(16).putInt(5).putInt(-4).array())
    // truncated body: header says 4 words, blob carries 2
    bad(java.nio.ByteBuffer.allocate(8 + 16).putInt(5).putInt(4).array())
    // zero words: length-consistent but every probe would index an
    // empty array
    bad(java.nio.ByteBuffer.allocate(8).putInt(5).putInt(0).array())
    // a valid filter still round-trips
    val buf = new functions.BloomBuffer(3, new Array[Long](8))
    buf.add(42L)
    assert(Bloom.deserialize(Bloom.serialize(buf)).mightContain(42L))
  }

  test("the bloom screen's verdicts equal the shuffled screen's exactly") {
    val plain = Curation.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val bloom = Curation.decontaminateBloom(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(bloom == plain)
  }

  test("SQL registration: build via scalar subquery, probe in a WHERE clause") {
    import spark.implicits._
    (0L until 200L).toDF("k").createOrReplaceTempView("bloom_bench")
    (0L until 1000L).toDF("k").createOrReplaceTempView("bloom_probes")
    val got = spark.sql("""
      SELECT k FROM bloom_probes
      WHERE graft_bloom_contains(
        (SELECT graft_bloom_agg(k, 64, 5) FROM bloom_bench), k)""")
      .collect().map(_.getLong(0)).toSet
    // no false negatives: every bench key present in the probe range survives
    assert((0L until 200L).forall(got.contains), s"missing: ${(0L until 200L).filterNot(got)}")
    // and the filter actually prunes (FP rate far under the non-member count)
    assert(got.size < 500, s"bloom pruned nothing: ${got.size}")
  }

  test("the probe plan has no broadcast and no extra shuffle before the filter") {
    val plan = Curation.decontaminateBloom(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"), plan.take(800))
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
      plan.split("\n").filter(_.contains("Broadcast")).mkString("\n"))
  }
}

package graft

import graft.operators.{Ann, Pq}
import org.apache.spark.sql.functions._

/** Product quantization: the ADC algebra must be exact (score ==
  * reconstruction · query, bit for bit), the codes must actually
  * compress, and recall against the brute-force baseline must be
  * measurable — the same contract AnnSpec pins for IVF. */
class PqSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)

  test("ADC score equals reconstruction-dot-query exactly") {
    val cb = Pq.cachedCodebooks(spark, sf)
    val sub = cb(0)(0).length
    val rows = emb.select(col("vec_id"),
        graft.functions.VectorOps.normalize(
          graft.functions.VectorOps.toDouble(col("embedding"))).as("nv"))
      .select(col("vec_id"), col("nv"),
        Pq.encodeCol(col("nv"), cb).as("codes"),
        Pq.lutCol(col("nv"), cb).as("lut"))
      .limit(50).collect()
    for (r <- rows; q <- rows.take(5)) {
      val codes = r.getSeq[Int](2)
      val qv = q.getSeq[Double](1).toArray
      // driver-side reconstruction of r from its codes, dotted with q
      val recon = codes.zipWithIndex.flatMap { case (c, mi) => cb(mi)(c) }.toArray
      val expect = recon.zip(qv).map { case (a, b) => a * b }.sum
      // the SAME sum order: ADC adds per-subspace partial dots — regroup
      val expectGrouped = codes.zipWithIndex.map { case (c, mi) =>
        (0 until sub).map(i => cb(mi)(c)(i) * qv(mi * sub + i)).sum
      }.sum
      val adc = spark.sql("SELECT 1").select(
        Pq.adcCol(typedLit(codes), Pq.lutCol(typedLit(q.getSeq[Double](1)), cb)))
        .head.getDouble(0)
      assert(math.abs(adc - expectGrouped) < 1e-12,
        s"ADC ${adc} vs grouped ${expectGrouped}")
      assert(math.abs(adc - expect) < 1e-9, s"ADC $adc vs flat dot $expect")
    }
  }

  test("codes compress 64 doubles to M small ints and stay in range") {
    val cb = Pq.cachedCodebooks(spark, sf)
    val codes = emb.select(Pq.encodeCol(
        graft.functions.VectorOps.normalize(
          graft.functions.VectorOps.toDouble(col("embedding"))), cb).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == Pq.M))
    assert(codes.forall(_.forall(k => k >= 0 && k < Pq.Ks)))
    // the codebook is actually used — more than one code per subspace
    val distinctPerSub = (0 until Pq.M).map(mi => codes.map(_(mi)).distinct.size)
    assert(distinctPerSub.forall(_ > 1), s"dead subspaces: $distinctPerSub")
  }

  test("pq top-k finds a measurable share of the exact neighbors") {
    val exact = Ann.annTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Pq.annPq(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(approx.nonEmpty && approx.map(_._1) == exact.map(_._1))
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"ann_pq recall@${Ann.K} M=${Pq.M} Ks=${Pq.Ks}: $recall%.3f")
    assert(recall > 0.0)
  }

  test("dimension drift fails loudly in every kernel") {
    val cb = Pq.cachedCodebooks(spark, sf)
    import spark.implicits._
    val bad = Seq(Seq(1.0, 2.0, 3.0)).toDF("v")
    intercept[Exception](bad.select(Pq.encodeCol(col("v"), cb)).collect())
    intercept[Exception](bad.select(Pq.lutCol(col("v"), cb)).collect())
  }
}

package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Properties the DuckDB hash-compare can't state: sample nesting and
  * stability, packing invariants. */
class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("samples are nested: a lower rate selects a subset of a higher rate") {
    def ids(rate: Double): Set[Long] =
      Sampling.stratifiedOf(docs, "doc_id", "lang",
        Seq("en" -> rate), defaultRate = rate)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val lo = ids(0.2); val mid = ids(0.5); val hi = ids(0.8)
    assert(lo.subsetOf(mid) && mid.subsetOf(hi))
    // and the rates are roughly honored (hash uniformity)
    val n = docs.count().toDouble
    assert(math.abs(mid.size / n - 0.5) < 0.1, s"${mid.size} of $n at rate 0.5")
  }

  test("sample is stable under repartitioning (no rand(), no order dependence)") {
    val a = Sampling.sampleStratified(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleStratified(spark, sf)
      .repartition(7).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("negative ids hash into range: rate 0 keeps nothing, rates bind") {
    import spark.implicits._
    val signed = Seq(-5L, -4L, -3L, -2L, -1L, 1L, 2L, 3L, 4L, 5L)
      .map(i => (i, "en")).toDF("id", "s")
    // rate 0 everywhere must keep NO rows — a sign-leaking hash would
    // pass every negative id under the 0 threshold
    assert(Sampling.stratifiedOf(signed, "id", "s",
      Seq("en" -> 0.0), defaultRate = 0.0).count() == 0)
    // rate 1 keeps everything, negative ids included
    assert(Sampling.stratifiedOf(signed, "id", "s",
      Seq("en" -> 1.0), defaultRate = 1.0).count() == 10)
  }

  test("duplicate strata in the rate list are rejected (join would fan out)") {
    intercept[IllegalArgumentException] {
      Sampling.stratifiedOf(docs, "doc_id", "lang",
        Seq("en" -> 0.5, "en" -> 0.3), defaultRate = 0.1)
    }
  }

  test("per-stratum rates differ as configured") {
    // en sampled at 0.5 vs es at 0.2: the observed per-stratum fractions
    // must separate (loose bounds — hash uniformity, small corpus)
    val kept = Sampling.sampleStratified(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def frac(l: String) = kept.getOrElse(l, 0L).toDouble / all(l)
    assert(frac("en") > frac("es"), s"en=${frac("en")} es=${frac("es")}")
  }

  test("packing: offsets are gapless running sums and bins match the budget") {
    val packed = Sampling.packSequences(spark, sf).collect()
    val byLang = packed.groupBy(_.getString(1))
    for ((_, rows) <- byLang) {
      val ordered = rows.sortBy(_.getLong(0)) // by doc_id
      var expect = 0L
      for (r <- ordered) {
        val (tokens, off, bin, binOff) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(off == expect, s"gap at doc ${r.getLong(0)}")
        assert(bin == off / Sampling.Budget && binOff == off % Sampling.Budget)
        expect = off + tokens
      }
    }
    assert(packed.nonEmpty)
  }

  test("sharded packing equals the serial prefix sum, shard size free") {
    val tokens = length(col("text")).cast("long")
    val in = docs.select(col("doc_id"), col("lang"), tokens.as("n"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("start_offset"), col("bin"), col("bin_offset"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val serial = rows(Sampling.packOf(in, "doc_id", "lang", "n", 512L))
    for (shardSize <- Seq(1L, 16L, 1000000L)) // degenerate, many, single shard
      assert(rows(Sampling.packOfSharded(in, "doc_id", "lang", "n", 512L, shardSize))
        == serial, s"diverged at shardSize=$shardSize")
  }

  test("sharded packing keeps null-stratum rows (null-safe base join)") {
    // packOf's window keeps a null stratum as its own partition; the
    // sharded form's base join must match it too — an inner equi-join
    // on the stratum silently dropped these rows (ADVICE r5 medium)
    import spark.implicits._
    val in = Seq((1L, Some("en"), 10L), (2L, None, 20L), (3L, None, 30L),
        (4L, Some("en"), 40L), (5L, None, 50L))
      .toDF("doc_id", "lang", "n")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("start_offset"), col("bin"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val serial = rows(Sampling.packOf(in, "doc_id", "lang", "n", 32L))
    assert(serial.map(_._1) == Set(1L, 2L, 3L, 4L, 5L))
    for (shardSize <- Seq(1L, 2L, 100L))
      assert(rows(Sampling.packOfSharded(in, "doc_id", "lang", "n", 32L, shardSize))
        == serial, s"null-stratum rows lost at shardSize=$shardSize")
  }

  test("stratified sampling runs unchanged on a stream (stateless ingest filter)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 200L).map(i => (i, if (i % 2 == 0) "en" else "es"))
    val stream = MemoryStream[(Long, String)]
    stream.addData(rows)
    val q = Sampling.stratifiedOf(
        stream.toDF.toDF("id", "s"), "id", "s",
        Seq("en" -> 0.5, "es" -> 0.2), defaultRate = 0.0)
      .writeStream.format("memory").queryName("sample_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sample_out")
      .collect().map(_.getLong(0)).toSet
    val batch = Sampling.stratifiedOf(rows.toDF("id", "s"), "id", "s",
        Seq("en" -> 0.5, "es" -> 0.2), defaultRate = 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("fluent api faces delegate to the same plans") {
    import graft.api._
    val viaApi = docs.stratifiedSample("doc_id", "lang",
      Sampling.Rates, Sampling.DefaultRate)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val viaOp = Sampling.sampleStratified(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(viaApi == viaOp)

    val counts = docs.select(col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("n"))
    val p = counts.packedSequences("doc_id", "lang", "n", budget = 100L)
    assert(p.filter(col("bin") =!= call_function("div", col("start_offset"), lit(100L)))
      .count() == 0)
  }
}

package graft

import graft.functions.{QuantileSketch, SketchOps}
import org.apache.spark.sql.functions._

/** QuantileSketch properties the exact-regime oracles can't state: the
  * compacted regime's rank-error bound, merge behavior across the
  * boundary, deterministic exact-regime serialization, and the SQL
  * registration. */
class QuantileSketchSpec extends SparkSpec {

  /** Deterministic shuffled values 0 until n (each exactly once), so
    * true quantiles are known in closed form. */
  private def shuffled(n: Int, seed: Long): Seq[Long] = {
    val arr = Array.tabulate(n)(_.toLong)
    var s = seed
    var i = n - 1
    while (i > 0) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val j = (((s >>> 33) % (i + 1)) + (i + 1)) % (i + 1)
      val t = arr(i); arr(i) = arr(j.toInt); arr(j.toInt) = t
      i -= 1
    }
    arr.toSeq
  }

  private def sketchOf(vals: Seq[Long], k: Int): QuantileSketch = {
    val sk = new QuantileSketch(k)
    vals.foreach(sk.add)
    sk
  }

  /** DuckDB quantile_disc ground truth on 0 until n: value at 1-based
    * index ceil(q*n), i.e. max(0, ceil(q*n)-1). */
  private def trueQ(n: Int, q: Double): Long =
    math.max(1L, math.ceil(q * n).toLong) - 1

  test("exact regime: every quantile equals quantile_disc, any partitioning") {
    import spark.implicits._
    val vals = shuffled(1500, 7L)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(SketchOps.quantileSketch(col("v"), 4096).as("sk"))
        .select(SketchOps.quantileAt(col("sk"), 0.25).as("a"),
          SketchOps.quantileAt(col("sk"), 0.5).as("b"),
          SketchOps.quantileAt(col("sk"), 0.95).as("c"),
          SketchOps.quantileAt(col("sk"), 1.0).as("d")).head()
      assert(got.getLong(0) == trueQ(1500, 0.25), s"p25 parts=$parts")
      assert(got.getLong(1) == trueQ(1500, 0.5), s"p50 parts=$parts")
      assert(got.getLong(2) == trueQ(1500, 0.95), s"p95 parts=$parts")
      assert(got.getLong(3) == 1499L, s"p100 parts=$parts")
    }
  }

  test("compacted regime: rank error stays under 1% at n=200k, k=4096") {
    val n = 200000
    val sk = sketchOf(shuffled(n, 11L), 4096)
    assert(sk.nLevels > 1) // genuinely compacted
    // value v has true rank v+1; the estimate's rank error is |est - trueQ|
    // because values are 0..n-1 (rank == value + 1)
    val worst = (1 to 19).map(_ / 20.0).map { q =>
      math.abs(sk.estimate(q) - trueQ(n, q)).toDouble / n
    }.max
    assert(worst < 0.01, s"max rank error $worst")
  }

  test("merge: exact-regime union stays exact; compacted merge stays bounded") {
    val a = shuffled(4000, 3L).filter(_ % 2 == 0) // evens
    val b = shuffled(4000, 5L).filter(_ % 2 == 1) // odds
    val merged = sketchOf(a, 8192).mergeIn(sketchOf(b, 8192))
    assert(merged.totalWeight == a.size + b.size) // weight conserved exactly
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(merged.estimate(q) == trueQ(4000, q), s"q=$q")
    // compacted: two 100k halves at k=1024
    val big = sketchOf(shuffled(200000, 13L).filter(_ < 100000), 1024)
      .mergeIn(sketchOf(shuffled(200000, 17L).filter(_ >= 100000), 1024))
    assert(big.totalWeight == 200000L) // conserved through odd-length compactions
    val worst = (1 to 9).map(_ / 10.0).map { q =>
      math.abs(big.estimate(q) - trueQ(200000, q)).toDouble / 200000
    }.max
    assert(worst < 0.02, s"merged max rank error $worst")
  }

  test("exact-regime serialization is deterministic and roundtrip-stable") {
    val vals = shuffled(900, 19L)
    val fwd = sketchOf(vals, 2048)
    val rev = sketchOf(vals.reverse, 2048)
    assert(java.util.Arrays.equals(fwd.serialize(), rev.serialize()))
    val rt = QuantileSketch.deserialize(fwd.serialize())
    assert(java.util.Arrays.equals(rt.serialize(), fwd.serialize()))
    assert(rt.estimate(0.5) == fwd.estimate(0.5))
  }

  test("two-level fold == one-shot in the exact regime (the nightly shape)") {
    import spark.implicits._
    val rows = shuffled(1200, 23L).zipWithIndex
      .map { case (v, i) => (i % 3, if (v % 2 == 0) "a" else "b", v) }
    val folded = rows.toDF("night", "grp", "v").repartition(9)
      .groupBy(col("night"), col("grp"))
      .agg(SketchOps.quantileSketch(col("v"), 4096).as("sk"))
      .groupBy(col("grp")).agg(SketchOps.quantileMerge(col("sk")).as("sk"))
      .select(col("grp"), SketchOps.quantileAt(col("sk"), 0.5).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def exactMedian(vs: Seq[Long]): Long = {
      val s = vs.sorted
      s(math.max(1, math.ceil(0.5 * s.size).toInt) - 1)
    }
    val byGrp = rows.groupBy(_._2).view.mapValues(_.map(_._3))
    byGrp.foreach { case (g, vs) => assert(folded(g) == exactMedian(vs.toSeq), g) }
  }

  test("SQL registration: the three functions agree with the DataFrame forms") {
    import spark.implicits._
    val vals = shuffled(700, 29L)
    vals.toDF("v").createOrReplaceTempView("qsk_vals")
    val viaSql = spark.sql(
      """SELECT graft_quantile_at(graft_quantile_sketch(v, 4096), 0.5) AS m
        |FROM qsk_vals""".stripMargin).head().getLong(0)
    assert(viaSql == trueQ(700, 0.5))
    val viaMerge = spark.sql(
      """SELECT graft_quantile_at(graft_quantile_merge(sk), 0.75) AS m FROM (
        |  SELECT graft_quantile_sketch(v, 4096) AS sk
        |  FROM qsk_vals GROUP BY v % 5)""".stripMargin).head().getLong(0)
    assert(viaMerge == trueQ(700, 0.75))
  }

  test("empty and invalid inputs are loud") {
    import spark.implicits._
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    // empty sketch has no quantiles
    val e1 = intercept[Exception] {
      Seq.empty[Long].toDF("v")
        .agg(SketchOps.quantileSketch(col("v"), 4096).as("sk"))
        .select(SketchOps.quantileAt(col("sk"), 0.5)).collect()
    }
    assert(chain(e1).contains("no quantiles"), chain(e1))
    // mismatched capacities refuse to merge
    val e2 = intercept[Exception] {
      sketchOf(Seq(1L), 1024).mergeIn(sketchOf(Seq(2L), 2048))
    }
    assert(chain(e2).contains("different capacities"), chain(e2))
    // odd / tiny capacity rejected at construction
    intercept[Exception] { new QuantileSketch(7) }
    intercept[Exception] {
      Seq(1L).toDF("v").agg(SketchOps.quantileSketch(col("v"), 5)).collect()
    }
  }

  test("property: rank error stays bounded under random chunking and merge order") {
    var seed = 0xCAFE5L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (trial <- 1 to 12) {
      val n = 2000 + next(18000)
      val k = 512
      val vals = shuffled(n, 1000L + trial)
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var rest = vals
      while (rest.nonEmpty) {
        val c = 1 + next(math.max(1, rest.length))
        chunks += rest.take(c); rest = rest.drop(c)
      }
      val merged = chunks.sortBy(_ => next(1 << 20))
        .map(c => sketchOf(c, k)).reduce(_ mergeIn _)
      assert(merged.totalWeight == n.toLong,
        s"trial $trial: weight ${merged.totalWeight} != $n")
      val worst = (1 to 9).map(_ / 10.0).map { q =>
        math.abs(merged.estimate(q) - trueQ(n, q)).toDouble / n
      }.max
      assert(worst < 0.05,
        s"trial $trial: n=$n chunks=${chunks.size} max rank error $worst")
    }
  }

  test("plan: sketch partials run through ObjectHashAggregate (map-side combine)") {
    import spark.implicits._
    val plan = shuffled(100, 31L).toDF("v").repartition(4)
      .agg(SketchOps.quantileSketch(col("v"), 64))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}

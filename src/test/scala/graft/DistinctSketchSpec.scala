package graft

import graft.functions.{DistinctSketch, SketchOps}
import org.apache.spark.sql.functions._

/** DistinctSketch properties the exact-regime oracles can't state: the
  * dense-HLL regime's accuracy, state-exact merges across the
  * sparse/dense boundary, deterministic serialization, and the SQL
  * registration. */
class DistinctSketchSpec extends SparkSpec {

  /** Exactly `distinct` distinct raw values (each appearing twice, in an
    * interleaved order) — SEQUENTIAL longs on purpose: without the
    * internal rehash, sequential values would collapse onto a handful of
    * dense registers, so these streams also prove the rehash is doing
    * its job. */
  private def stream(base: Long, distinct: Int): Seq[Long] = {
    val vals = (0 until distinct).map(base * 1000000L + _)
    (vals ++ vals.reverse).toSeq
  }

  private def sketchOf(vals: Seq[Long], p: Int, cap: Int): DistinctSketch = {
    val sk = new DistinctSketch(p, cap)
    vals.foreach(v => sk.add(DistinctSketch.rehash(v)))
    sk
  }

  test("sparse regime is exact, and the estimate survives any partitioning") {
    import spark.implicits._
    val vals = stream(7L, 1234)
    val exact = vals.distinct.size.toLong
    for (parts <- Seq(1, 7, 32)) {
      val est = vals.toDF("v").repartition(parts)
        .agg(SketchOps.distinctSketch(col("v"), 14, 1 << 16).as("sk"))
        .select(SketchOps.sketchEst(col("sk")).as("n"))
        .head().getLong(0)
      assert(est == exact, s"parts=$parts")
    }
  }

  test("dense regime: 200k distinct at p=12 lands within the 3-sigma HLL bound") {
    val distinct = 200000
    val sk = sketchOf(stream(11L, distinct), 12, 1000)
    assert(sk.isDense)
    val est = sk.estimate.toDouble
    val bound = 3 * 1.04 / math.sqrt(1 << 12) // ~4.9%
    assert(math.abs(est - distinct) / distinct < bound,
      s"est $est vs $distinct (rel ${math.abs(est - distinct) / distinct})")
  }

  test("merge is state-exact: merge(sk(A), sk(B)) == sk(A ++ B) bytes, " +
    "across the sparse/dense boundary") {
    val cases = Seq(
      // (sizeA, sizeB, cap): sparse+sparse staying sparse
      (300, 400, 5000),
      // sparse+sparse whose union promotes
      (300, 400, 500),
      // dense+sparse
      (3000, 100, 1000),
      // dense+dense
      (3000, 4000, 1000))
    cases.foreach { case (na, nb, cap) =>
      val a = stream(1L, na)
      val b = stream(2L, nb)
      val merged = sketchOf(a, 12, cap).mergeIn(sketchOf(b, 12, cap))
      val oneShot = sketchOf(a ++ b, 12, cap)
      assert(java.util.Arrays.equals(merged.serialize(), oneShot.serialize()),
        s"case ($na, $nb, $cap)")
    }
  }

  test("serialization: deterministic under insertion order, roundtrip-stable") {
    val vals = stream(3L, 800)
    val fwd = sketchOf(vals, 14, 1 << 16)
    val rev = sketchOf(vals.reverse, 14, 1 << 16)
    assert(java.util.Arrays.equals(fwd.serialize(), rev.serialize()))
    val rt = DistinctSketch.deserialize(fwd.serialize())
    assert(java.util.Arrays.equals(rt.serialize(), fwd.serialize()))
    assert(rt.estimate == fwd.estimate)
  }

  test("two-level fold == one-shot: per-night sketches merged per group") {
    import spark.implicits._
    val rows = stream(5L, 900).zipWithIndex
      .map { case (v, i) => (i % 3, if (v % 2 == 0) "a" else "b", v) }
    val df = rows.toDF("night", "grp", "v").repartition(9)
    val folded = df.groupBy(col("night"), col("grp"))
      .agg(SketchOps.distinctSketch(col("v"), 14, 1 << 16).as("sk"))
      .groupBy(col("grp")).agg(SketchOps.sketchMerge(col("sk")).as("sk"))
      .select(col("grp"), SketchOps.sketchEst(col("sk")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size.toLong)
    exact.foreach { case (g, n) => assert(folded(g) == n, g) }
    assert(folded.size == exact.size)
  }

  test("SQL registration: the three functions agree with the DataFrame forms") {
    import spark.implicits._
    val vals = stream(9L, 700)
    vals.toDF("v").createOrReplaceTempView("dsk_vals")
    val viaSql = spark.sql(
      """SELECT graft_sketch_est(graft_distinct_sketch(v, 14, 65536)) AS n
        |FROM dsk_vals""".stripMargin).head().getLong(0)
    assert(viaSql == vals.distinct.size.toLong)
    val viaMergeSql = spark.sql(
      """SELECT graft_sketch_est(graft_sketch_merge(sk)) AS n FROM (
        |  SELECT graft_distinct_sketch(v, 14, 65536) AS sk
        |  FROM dsk_vals GROUP BY v % 4)""".stripMargin).head().getLong(0)
    assert(viaMergeSql == vals.distinct.size.toLong)
  }

  test("string and long inputs both sketch; mixed-shape merges are loud") {
    import spark.implicits._
    val strs = Seq("alpha", "beta", "gamma", "alpha", "beta")
    val est = strs.toDF("s")
      .agg(SketchOps.distinctSketch(col("s"), 12, 100).as("sk"))
      .select(SketchOps.sketchEst(col("sk"))).head().getLong(0)
    assert(est == 3L)
    val e = intercept[Exception] {
      sketchOf(Seq(1L, 2L), 12, 100).mergeIn(sketchOf(Seq(3L), 14, 100))
    }
    assert(e.getMessage.contains("different shapes"))
  }

  test("bad precision and unsupported child types fail analysis, not mid-job") {
    import spark.implicits._
    // p=0 is the internal placeholder escape hatch — the aggregate
    // must reject it before any executor sees a null table
    intercept[Exception] {
      Seq(1L).toDF("v").agg(SketchOps.distinctSketch(col("v"), 0, 100)).collect()
    }
    // double input: rehashing a rounded double would silently conflate
    // values — refused at analysis
    val e = intercept[Exception] {
      Seq(1.5).toDF("v").agg(SketchOps.distinctSketch(col("v"), 12, 100)).collect()
    }
    assert(e.getMessage.contains("long/int/string/binary") ||
      e.toString.contains("DATATYPE_MISMATCH"), e.toString)
    // quantile sketch likewise refuses a string column
    intercept[Exception] {
      Seq("x").toDF("v").agg(SketchOps.quantileSketch(col("v"), 64)).collect()
    }
  }

  test("empty input: sketch of nothing estimates 0; merging nothing is NULL") {
    import spark.implicits._
    val est = Seq.empty[Long].toDF("v")
      .agg(SketchOps.distinctSketch(col("v"), 12, 100).as("sk"))
      .select(SketchOps.sketchEst(col("sk"))).head().getLong(0)
    assert(est == 0L)
    // SQL-conventional empty-input aggregate: NULL, not a crash — one
    // all-null group must not abort a whole snapshot read (r11 ADVICE)
    val m = Seq.empty[Array[Byte]].toDF("sk")
      .agg(SketchOps.sketchMerge(col("sk")).as("m"),
        SketchOps.quantileMerge(col("sk")).as("q"))
      .head()
    assert(m.isNullAt(0) && m.isNullAt(1))
    // and the estimate of a NULL sketch propagates NULL
    assert(Seq.empty[Array[Byte]].toDF("sk")
      .agg(SketchOps.sketchMerge(col("sk")).as("m"))
      .select(SketchOps.sketchEst(col("m"))).head().isNullAt(0))
  }

  test("property: sketch state is a pure function of the value set — " +
    "any chunking, any merge order, identical bytes") {
    // the distributed guarantee in one line: however the planner splits
    // and merges partials, the final sketch (and so the estimate and
    // any bytes landed in parquet) is identical
    var seed = 0xD15C0L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (trial <- 1 to 20) {
      val p = 8 + next(5)
      val cap = 50 + next(400)
      val distinct = 20 + next(800) // straddles cap across trials
      val vals = Seq.tabulate(distinct * 2)(i => (i % distinct).toLong + trial * 100000L)
      val oneShot = sketchOf(vals, p, cap).serialize()
      // random chunking, then merge chunks in a random order
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var rest = vals
      while (rest.nonEmpty) {
        val n = 1 + next(math.max(1, rest.length))
        chunks += rest.take(n); rest = rest.drop(n)
      }
      val shuffledChunks = chunks.sortBy(_ => next(1 << 20))
      val merged = shuffledChunks.map(c => sketchOf(c, p, cap)).reduce(_ mergeIn _)
      assert(java.util.Arrays.equals(merged.serialize(), oneShot),
        s"trial $trial (p=$p cap=$cap distinct=$distinct chunks=${chunks.size})")
    }
  }

  test("plan: sketch partials run through ObjectHashAggregate (map-side combine)") {
    import spark.implicits._
    val plan = stream(13L, 50).toDF("v").repartition(4)
      .agg(SketchOps.distinctSketch(col("v"), 12, 1000))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}

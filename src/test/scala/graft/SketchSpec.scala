package graft

import graft.functions.SketchOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SpaceSaving sketch properties the exact-regime oracle can't state:
  * the approximate regime's guarantees on a skewed stream, merge
  * soundness across partitions, and the SQL registration. */
class SketchSpec extends SparkSpec {

  /** Zipf-ish corpus: item t<j> appears floor(2000/j) times, j = 1..200.
    * True counts are known exactly. */
  private val trueCounts: Map[String, Long] =
    (1 to 200).map(j => s"t$j" -> (2000L / j)).toMap
  private val n: Long = trueCounts.values.sum

  private def corpus = {
    import spark.implicits._
    // deterministic interleave so partials see mixed items
    val rows = trueCounts.toSeq.flatMap { case (i, c) =>
      (0L until c).map(r => (r, i))
    }.sortBy(_._1).map(_._2)
    rows.toDF("token").repartition(13)
  }

  private def sketch(k: Int): Seq[Row] =
    corpus.agg(SketchOps.topkFreq(col("token"), k).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.item", "e.count", "e.err")
      .collect().toSeq

  test("exact regime: k above cardinality reproduces the exact counts, err 0") {
    val got = sketch(1000)
    assert(got.size == trueCounts.size)
    got.foreach { r =>
      assert(r.getLong(1) == trueCounts(r.getString(0)), r.getString(0))
      assert(r.getLong(2) == 0L)
    }
    // and sorted (count desc, item asc)
    val keys = got.map(r => (-r.getLong(1), r.getString(0)))
    assert(keys == keys.sorted)
  }

  test("approximate regime: every item with count > n/k survives, bounds hold") {
    val k = 16
    val got = sketch(k)
    assert(got.size <= k)
    val est = got.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // guaranteed heavy hitters present
    trueCounts.filter(_._2 > n / k).keys.foreach { hh =>
      assert(est.contains(hh), s"heavy hitter $hh (true ${trueCounts(hh)}, " +
        s"threshold ${n / k}) missing from k=$k sketch")
    }
    // true ≤ est ≤ true + err, for every surviving item
    est.foreach { case (item, (c, e)) =>
      val t = trueCounts(item)
      assert(t <= c && c <= t + e, s"$item: true $t est $c err $e")
    }
  }

  test("merge soundness: the partition layout does not change the exact regime") {
    val a = sketch(1000)
    val b = corpus.repartition(1)
      .agg(SketchOps.topkFreq(col("token"), 1000).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.item", "e.count", "e.err")
      .collect().toSeq
    assert(a == b)
  }

  test("SQL registration: graft_topk_freq agrees with the DataFrame form") {
    corpus.createOrReplaceTempView("sketch_corpus")
    val viaSql = spark.sql(
      "SELECT explode(graft_topk_freq(token, 1000)) AS e FROM sketch_corpus")
      .select("e.item", "e.count", "e.err").collect().toSeq
    assert(viaSql == sketch(1000))
  }

  test("property: guarantees hold on random streams, any k, any partitioning") {
    // pure-JVM property over the SpaceSaving/merge kernel itself
    // (deterministic LCG; the Spark plumbing is covered above)
    var seed = 0xC0FFEE42L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (trial <- 1 to 25) {
      val k = 2 + next(20)
      val nItems = 1 + next(40)
      val stream = Seq.fill(200 + next(800))(s"i${next(nItems)}")
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // build SEVERAL partial sketches over a random partitioning, then
      // merge in a random order — the distributed shape
      val parts = stream.grouped(1 + next(97)).map { chunk =>
        val s = new graft.functions.SpaceSaving(k)
        chunk.foreach(s.add); s
      }.toSeq
      val merged = parts.reduce(_ mergeIn _)
      val est = merged.sorted.map { case (i, c, e) => i -> ((c, e)) }.toMap
      val n = stream.size.toLong
      truth.filter(_._2 > n / k).keys.foreach { hh =>
        assert(est.contains(hh), s"trial $trial: HH $hh missing (k=$k)")
      }
      est.foreach { case (i, (c, e)) =>
        val t = truth.getOrElse(i, 0L)
        assert(t <= c && c <= t + e, s"trial $trial: $i true=$t est=$c err=$e")
      }
    }
  }

  test("grouped aggregation: one sketch per group key, each exact in regime") {
    import spark.implicits._
    val grouped = trueCounts.toSeq.flatMap { case (i, c) =>
      (0L until c).map(_ => (if (i.drop(1).toInt % 2 == 0) "even" else "odd", i))
    }.toDF("grp", "token").repartition(7)
    val got = grouped.groupBy("grp")
      .agg(SketchOps.topkFreq(col("token"), 1000).as("tk"))
      .select(col("grp"), explode(col("tk")).as("e"))
      .select("grp", "e.item", "e.count")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    trueCounts.foreach { case (i, c) =>
      val g = if (i.drop(1).toInt % 2 == 0) "even" else "odd"
      assert(got((g, i)) == c, i)
    }
    assert(got.size == trueCounts.size)
  }

  test("plan: sketch partials run through ObjectHashAggregate (map-side combine)") {
    val plan = corpus.agg(SketchOps.topkFreq(col("token"), 64))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    // two-level: a partial before the exchange, a merge after
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("k must be a literal in SQL") {
    corpus.createOrReplaceTempView("sketch_corpus")
    intercept[Exception] {
      spark.sql("SELECT graft_topk_freq(token, length(token)) FROM sketch_corpus")
        .collect()
    }
  }

  test("storable face: sketch→merge→read equals topk_freq; empty merges NULL; " +
    "bytes are deterministic") {
    import spark.implicits._
    // split the corpus 3 ways, sketch each part to a binary, merge the
    // binaries, read the ranking — must equal the one-shot topkFreq
    // (exact regime, so both are the plain counts)
    val withId = corpus.withColumn("part", pmod(crc32(col("token")), lit(3)))
    val parts = withId.groupBy(col("part"))
      .agg(SketchOps.topkSketch(col("token"), 256).as("tk"))
    val merged = parts.agg(SketchOps.topkMerge(col("tk")).as("tk"))
      .select(explode(SketchOps.topkRead(col("tk"))).as("e"))
      .select("e.item", "e.count", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val oneShot = corpus.agg(SketchOps.topkFreq(col("token"), 256).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.item", "e.count", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged == oneShot)
    // SQL registration of all three
    withId.createOrReplaceTempView("sk_corpus3")
    val viaSql = spark.sql("""
      WITH p AS (SELECT part, graft_topk_sketch(token, 256) AS tk
                 FROM sk_corpus3 GROUP BY 1),
           m AS (SELECT graft_topk_merge(tk) AS tk FROM p)
      SELECT e.item, e.count, e.err
      FROM m LATERAL VIEW explode(graft_topk_read(tk)) AS e""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql == oneShot)
    // byte determinism: equal states serialize to equal bytes whatever
    // the partitioning (the stored-column contract)
    def bytesOf(parts: Int): Seq[Byte] =
      corpus.repartition(parts)
        .agg(SketchOps.topkSketch(col("token"), 256).as("tk"))
        .head().getAs[Array[Byte]](0).toSeq
    assert(bytesOf(2) == bytesOf(7))
    // empty/all-null input merges to NULL, not a crash
    assert(Seq.empty[Array[Byte]].toDF("tk")
      .agg(SketchOps.topkMerge(col("tk"))).head().isNullAt(0))
  }

  test("items beyond writeUTF's 64 KB cap survive the partial-buffer shuffle") {
    import spark.implicits._
    // modified-UTF-8 writeUTF would throw UTFDataFormatException on this
    // item when partials serialize for the merge exchange
    val big = "x" * 70000
    val got = (Seq.fill(5)(big) ++ Seq("small", "small")).toDF("token")
      .repartition(4)
      .agg(SketchOps.topkFreq(col("token"), 10).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.item", "e.count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got(big) == 5L && got("small") == 2L)
  }
}

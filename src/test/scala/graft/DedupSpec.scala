package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** LSH paths checked against brute force computed in-suite. */
class DedupSpec extends SparkSpec {

  /** Brute-force word-3-shingle Jaccard pairs over the tiny SF. */
  private lazy val bruteJaccard: Map[(Long, Long), Double] = {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.shingleArr(col("text"), 3).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .sortBy(_._1)
    (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (a, sa) = sets(i); (b, sb) = sets(j)
      inter = (sa & sb).size if inter > 0
    } yield (a, b) -> inter.toDouble / (sa.size + sb.size - inter)).toMap
  }

  test("minhash LSH finds exactly the J>=0.5 pairs at sf0.001") {
    // NB: filter+keySet, not collect-to-pairs (which would rebuild a Map
    // and silently collapse pairs sharing a first element)
    val expected = bruteJaccard.filter(_._2 >= 0.5).keySet
    val got = Dedup.dedupMinhash(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("minhash verified jaccard values are exact") {
    val got = Dedup.dedupMinhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    got.foreach { case (pair, j) =>
      assert(math.abs(j - bruteJaccard(pair)) < 1e-12, s"pair $pair")
    }
  }

  test("ngram exact index equals brute force at its threshold") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.shingleArr(col("text"), 4).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).sortBy(_._1)
    val expected = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (a, sa) = sets(i); (b, sb) = sets(j)
      inter = (sa & sb).size if inter > 0
      jac = inter.toDouble / (sa.size + sb.size - inter) if jac >= 0.5
    } yield (a, b)).toSet
    val got = Dedup.dedupNgram(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("simhash bucketing finds every pair the full signature table has at hamming<=3") {
    val sigs = Dedup.simhashSignatures(Tables.documents(spark, sf), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val expected = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      (a, ha) = sigs(i); (b, hb) = sigs(j)
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val got = Dedup.dedupSimhash(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 bands × 15 bits: hamming<=3 implies >=1 exact band (pigeonhole) —
    // bucketed candidates are guaranteed complete, so equality must hold
    assert(got == expected)
  }

  test("exact dedup keeps one keeper per distinct text") {
    val df = Dedup.dedupExact(spark, sf)
    assert(df.count() == df.select("content_hash").distinct().count())
  }

  test("connected components: chain, fork, pair — min label wins through multi-round propagation") {
    import spark.implicits._
    // chain 10-…-17 has diameter 7, so the min label needs SEVEN rounds
    // to reach the far end — the loop's convergence logic, not just one
    // propagation step, is what this pins; plus a fork (1-{2,3},3-4) and
    // an isolated pair
    val pairs = ((10L to 16L).map(i => (i, i + 1)) ++
      Seq((2L, 1L), (3L, 1L), (4L, 3L), (20L, 21L))).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (10L to 17L).foreach(n => assert(got(n) == 10L, s"chain node $n"))
    Seq(1L, 2L, 3L, 4L).foreach(n => assert(got(n) == 1L, s"fork node $n"))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got.size == 14) // only nodes that appear in pairs
  }

  test("hub-shingle DF cutoff: a stop phrase in every doc stays exact without quadratic fanout") {
    import spark.implicits._
    // every doc opens with the same 12-word stop phrase (9 hub 4-gram
    // shingles, df = 40); similarity evidence lives in the unique tails
    val stop = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val rows = (0L until 20L).flatMap { k =>
      val tail = s"t$k r$k g$k b$k c$k m$k y$k w$k"
      if (k < 10) Seq((2 * k, s"$stop $tail one"), (2 * k + 1, s"$stop $tail two"))
      else Seq((2 * k, s"$stop $tail solo"), (2 * k + 1, s"$stop x$k q$k z$k u$k o$k p$k v$k n$k solo"))
    }
    val docs = rows.toDF("doc_id", "text")
    val sh = Dedup.hashedShingles(docs, 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // without the cutoff the stop phrase makes EVERY pair a candidate —
      // the quadratic fanout; with it, only tail-sharing pairs survive
      assert(Dedup.ngramCandidates(sh, Int.MaxValue).count() == 40L * 39 / 2)
      assert(Dedup.ngramCandidates(sh, 10).count() == 10L)
    } finally sh.unpersist(false)
    // and the capped operator still returns the exact brute-force answer
    val sets = docs.select(col("doc_id"), Dedup.shingleArr(col("text"), 4).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).sortBy(_._1)
    val expected = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (a, sa) = sets(i); (b, sb) = sets(j)
      inter = (sa & sb).size if inter > 0
      jac = inter.toDouble / (sa.size + sb.size - inter) if jac >= 0.5
    } yield (a, b)).toSet
    assert(expected.size == 10, s"corpus construction: ${expected.size} true pairs")
    val got = Dedup.ngramDedup(docs, 4, 0.5, 10)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("verbatim copies replicated past the DF cutoff keep all their pairs") {
    import spark.implicits._
    // 30 identical copies: at DOC grain every shingle would have df=30
    // > cutoff 10; at the operator's distinct-set grain they are ONE
    // group, and the within-group expansion must return all C(30,2)
    // pairs at exactly J=1.0, once each
    val page = "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val rows = (0L until 30L).map(i => (i, page)) :+
      ((100L, "unrelated aa bb cc dd ee ff gg hh"))
    val got = Dedup.ngramDedup(rows.toDF("doc_id", "text"), 4, 0.5, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length == 30 * 29 / 2, s"${got.length} pairs")
    val sz = 9L // 12 words → 9 distinct 4-shingles
    got.foreach { case (a, b, i, sa, sb, jac) =>
      assert(a < b && i == sz && sa == sz && sb == sz && jac == 1.0, s"pair ($a,$b)")
    }
  }

  test("near-dup variant of a heavily replicated page survives the cutoff") {
    import spark.implicits._
    // 30 verbatim copies of P push every P-shingle's DOC-grain df to 30
    // > cutoff 10 — under doc-grain df the variant P' (P plus one
    // sentence) would share only hub shingles with the copies and its
    // pairs would be silently dropped, though J = 9/13 ≥ 0.5. At
    // DISTINCT-SET grain P is ONE set, its shingles have df = 2
    // ({P, P'}), and the rare path finds the variant against every
    // copy: 30 variant pairs + C(30,2) copy pairs, all values exact.
    val p = "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val rows = (0L until 30L).map(i => (i, p)) :+
      ((50L, s"$p sigma tau upsilon phi"))
    val got = Dedup.ngramDedup(rows.toDF("doc_id", "text"), 4, 0.5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.size == 30 * 29 / 2 + 30, s"${got.size} pairs")
    (0L until 30L).foreach { i =>
      // P: 12 words → 9 distinct 4-shingles; P': 16 words → 13; ∩ = 9
      assert(got((i, 50L)) == ((9L, 9L, 13L, 9.0 / 13.0)),
        s"variant pair ($i,50): ${got((i, 50L))}")
    }
    got.filterNot(_._1._2 == 50L).values.foreach { v =>
      assert(v == ((9L, 9L, 9L, 1.0)), s"copy pair: $v")
    }
  }

  test("windowless docs stay out of the rescue; normalization variants stay in") {
    import spark.implicits._
    // 40 windowless docs that all share the empty shingle set (the
    // (0,0,0) fingerprint) plus 20 identical sub-n one-liners: without
    // the sz > 0 guard the group collapse would treat them as one
    // duplicate group and the within-group expansion would emit
    // C(40,2)+C(20,2) spurious J=1.0 pairs — they must instead produce
    // NOTHING (no window ⇒ no shingle ⇒ no pair), matching the posting
    // paths and the all-pairs oracle. The case/whitespace variant pair,
    // which DOES have windows (identical shingle sets), must still
    // come out at exactly J = 1.0.
    val rows = (0L until 20L).map(i => (i, "")) ++
      (20L until 40L).map(i => (i, " \t \n ")) ++
      (40L until 60L).map(i => (i, "tiny doc")) ++ // 2 tokens < n=4
      Seq((100L, "CASE And WhiteSpace  test one two three four five"),
          (101L, "case and whitespace test one two three four five"))
    val got = Dedup.ngramDedup(rows.toDF("doc_id", "text"), 4, 0.5, 10)
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSet == Set((100L, 101L, 1.0)))
  }

  test("cluster election pre-collapses heavy verbatim replication; windowless copies stay singletons") {
    import spark.implicits._
    // 80 copies of P (> CollapseMaxGroup 64) would feed the direct pair
    // graph C(80,2)=3160 J=1.0 edges; the gated pre-collapse reduces
    // them to one representative node whose members inherit the
    // component label — including the label pulled in by P's near-dup
    // variant (J = 7/9). Identical sub-n docs (no shingles ⇒ no pairs
    // ⇒ oracle keeps them apart) must NOT collapse.
    assert(80 > Dedup.CollapseMaxGroup)
    val p = "alpha beta gamma delta epsilon zeta eta theta iota"
    val rows = (0L until 80L).map(i => (i, p)) ++ Seq(
      (90L, s"$p kappa lambda"), // variant: 7 shared / 9 ∪ 7 → J ≈ 0.78
      (95L, "xy"), (96L, "xy"),  // 2 tokens < n=3, identical text
      (99L, "totally unrelated content on an entirely different page"))
    val got = Dedup.dedupClustersOf(rows.toDF("doc_id", "text"), 3, 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.size == 84)
    (0L until 80L).foreach(i => assert(got(i) == ((0L, i == 0L)), s"copy $i: ${got(i)}"))
    assert(got(90L) == ((0L, false)), s"variant: ${got(90L)}")
    assert(got(95L) == ((95L, true)) && got(96L) == ((96L, true)),
      s"windowless: ${got(95L)} ${got(96L)}")
    assert(got(99L) == ((99L, true)))
    // the SAME corpus under the gate (5 copies) takes the direct path
    // and must produce the same verdict shape
    val small = ((0L until 5L).map(i => (i, p)) ++ Seq(
      (90L, s"$p kappa lambda"), (95L, "xy"), (96L, "xy"))).toDF("doc_id", "text")
    val got2 = Dedup.dedupClustersOf(small, 3, 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    (0L until 5L).foreach(i => assert(got2(i) == ((0L, i == 0L))))
    assert(got2(90L) == ((0L, false)))
    assert(got2(95L) == ((95L, true)) && got2(96L) == ((96L, true)))
  }

  test("cluster election: empty corpus yields an empty verdict frame") {
    import spark.implicits._
    // max(m) over zero groups is one NULL row — the gate must coalesce
    // it, not NPE, and fall through to an empty result
    val got = Dedup.dedupClustersOf(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 3, 0.5)
    assert(got.columns.toSeq == Seq("doc_id", "cluster_id", "is_keeper"))
    assert(got.count() == 0L)
  }

  test("the windowless gate counts tokens as the kernel does (trailing whitespace)") {
    import spark.implicits._
    // "hello world\n" is 3 tokens to plain SQL split (trailing empty
    // kept) but 2 to the kernel's Java split — below n=3, so the pair
    // graph has no shingles for it: 70 identical copies must stay
    // singletons even while P's 80 copies trip the collapsed path (the
    // ungated-count bug fused all 70 into one cluster here). Docs 90/91
    // differ only by trailing whitespace: one md5 group they are NOT
    // (texts differ), but their rtrim'd shingle sets are identical, so
    // the kernel pairs them at J = 1.0.
    val p = "alpha beta gamma delta epsilon zeta eta theta iota"
    val rows = (0L until 80L).map(i => (i, p)) ++
      (100L until 170L).map(i => (i, "hello world\n")) ++
      Seq((90L, "one two three four"), (91L, "one two three four\n"))
    val got = Dedup.dedupClustersOf(rows.toDF("doc_id", "text"), 3, 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.size == 152)
    (0L until 80L).foreach(i => assert(got(i) == ((0L, i == 0L)), s"P copy $i: ${got(i)}"))
    (100L until 170L).foreach(i =>
      assert(got(i) == ((i, true)), s"windowless copy $i fused: ${got(i)}"))
    assert(got(90L) == ((90L, true)) && got(91L) == ((90L, false)),
      s"trailing-ws near-dup: ${got(90L)} ${got(91L)}")
    // the SQL-expression path shares the kernel's tokenization
    val arrs = Seq(("a b c", "a b c\n", "a b c \n \t"))
      .toDF("x", "y", "z")
      .select(Dedup.shingleArr(col("x"), 3).as("x"),
        Dedup.shingleArr(col("y"), 3).as("y"),
        Dedup.shingleArr(col("z"), 3).as("z"))
      .head()
    assert(arrs.getSeq[String](0) == Seq("a b c"))
    assert(arrs.getSeq[String](1) == Seq("a b c"))
    assert(arrs.getSeq[String](2) == Seq("a b c"))
    // Java's $ would strip the INTERIOR \n before a final U+2029 (a
    // line terminator that is NOT \s); the \z anchor must not — the
    // kernel and the RE2 twin both keep all four tokens here
    val lt = Seq(Tuple1("a b c\n\u2029")).toDF("t")
      .select(Dedup.shingleArr(col("t"), 3).as("s")).head().getSeq[String](0)
    assert(lt == Seq("a b c", "b c \u2029"), s"line-terminator corner: $lt")
    // and the KERNEL must agree on that corner — a tokenizer that
    // treats U+2029 as whitespace (e.g. Character.isWhitespace) would
    // silently re-diverge the pair graph from the SQL family
    val sqlHashes = Seq(Tuple1("a b c\n\u2029")).toDF("t")
      .select(explode(Dedup.shingleArr(col("t"), 3)).as("s"))
      .select(xxhash64(col("s"))).collect().map(_.getLong(0)).toSet
    assert(Dedup.hashShingleWindows("a b c\n\u2029", 3).toSet == sqlHashes)
  }

  test("a 200-link chain escalates to the star rewrites and converges") {
    import spark.implicits._
    // diameter 200 ≫ the 8-round propagation budget: the old loop aborted
    // here; now the star escalation must finish it in O(log) rounds
    val pairs = ((1000L until 1200L).map(i => (i, i + 1)) ++ Seq((5L, 6L)))
      .toDF("a", "b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1000L to 1200L).foreach(n => assert(got(n) == 1000L, s"chain node $n"))
    assert(got(5L) == 5L && got(6L) == 5L)
    assert(got.size == 203)
  }

  test("star rounds ride one job each: fixpoint via Observation, not count+except") {
    import spark.implicits._
    // count ACTIONS (SQL executions), not scheduler jobs: under AQE one
    // action runs a job per query stage, so job counts vary with the
    // plan while the action count is exactly what the fixpoint
    // restructuring changed
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          jobs.incrementAndGet(); ()
        case _ => ()
      }
    }
    // a fresh 150-link chain (node ids unused by other tests, so no
    // cached-plan reuse skews the count) forces the star escalation
    val pairs = (3000L until 3150L).map(i => (i, i + 1)).toDF("a", "b")
    spark.sparkContext.addSparkListener(listener)
    val got =
      try {
        val res = Dedup.connectedComponents(pairs).collect()
        // listener events post asynchronously; wait for the bus to drain
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        var last = -1
        while (jobs.get != last && System.nanoTime() < deadline) {
          last = jobs.get; Thread.sleep(100)
        }
        res
      } finally spark.sparkContext.removeSparkListener(listener)
    val labels = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    (3000L to 3150L).foreach(n => assert(labels(n) == 3000L))
    // Action budget for the whole CC call, measured at 19 on this
    // chain: edge persist + label seed (2), eight fast-path rounds (1
    // action each), star seed cut + its count (2), ~5 star rounds at
    // ONE action per round (the Observation rides the round's own
    // cut), final star-label join cut (1), the collect (1). The
    // pre-r10 fixpoint test ran count + except as two EXTRA actions
    // per star round (~29 here), which this bound rejects while
    // leaving ~3 rounds of slack for graph-shape drift.
    assert(jobs.get <= 25,
      s"connected components ran ${jobs.get} jobs — a star round is " +
        "running extra fixpoint actions")
  }

  test("stable-storage checkpoint path: identical labels, superseded rounds reclaimed") {
    import spark.implicits._
    // diameter 60 forces the escalation too, so BOTH loops run their
    // spill-cut round lifecycle through the configured directory
    val pairs = ((100L until 160L).map(i => (i, i + 1)) ++ Seq((7L, 9L)))
      .toDF("a", "b")
    val default = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    spark.conf.set(Dedup.CcCheckpointDirKey, dir)
    try {
      val spilled = Dedup.connectedComponents(pairs)
      assert(spilled.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == default)
      // the returned frame is self-contained: re-consumable after release()
      assert(spilled.count() == default.size.toLong)
      // the ENTIRE per-run scratch subdir is reclaimed before the call
      // returns — a nightly job must not leak one directory per run
      val remaining = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count()
      assert(remaining == 0, s"expected an empty checkpoint dir, found $remaining entries")
    } finally {
      spark.conf.unset(Dedup.CcCheckpointDirKey)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("fast-path convergence rides the round's own job — no per-round probe action") {
    import spark.implicits._
    val actions = new java.util.concurrent.atomic.AtomicInteger
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit = { actions.incrementAndGet(); () }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    try {
      val got = Dedup.connectedComponents(Seq((1L, 2L), (3L, 4L)).toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
      // listener delivery is async — wait until the count stops moving
      var prev = -1
      while (prev != actions.get) { prev = actions.get; Thread.sleep(250) }
      // initial-label cut + 2 round cuts (1 improving + 1 confirming) +
      // the collect = 4 actions. The old probe-per-round loop took 6; a
      // single observation falling back to its scan is tolerated at 5.
      assert(actions.get <= 5, s"${actions.get} query actions — the " +
        "convergence probe is running as its own action again")
    } finally spark.listenerManager.unregister(ql)
  }

  test("in-row signature kernel is bit-identical to the posting aggregation") {
    val docs = Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        (1 until r.length).map(r.getLong).toSeq).toMap
    val viaAgg = rows(Dedup.minhashSignaturesOf(Dedup.hashedShingles(docs, 3)))
    val inRow = rows(Dedup.minhashSignaturesInRow(docs, 3))
    assert(inRow.keySet == viaAgg.keySet)
    inRow.foreach { case (id, sig) =>
      assert(sig == viaAgg(id), s"doc $id signature diverged")
    }
  }
}

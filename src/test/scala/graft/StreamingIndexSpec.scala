package graft

import graft.functions.VectorOps._
import graft.operators.{Ann, IvfIndex}
import graft.streaming.StreamingIndexer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming index maintenance: a stream of embeddings folds into a
  * persisted IVF-PQ index exactly once — a restarted stream neither
  * drops nor double-indexes a batch — and searches see old ∪ new. */
class StreamingIndexSpec extends SparkSpec {

  private def queries = Tables.embeddings(spark, sf)
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("qid"), normalize(toDouble(col("embedding"))).as("qv"))

  private def emb = Tables.embeddings(spark, sf)

  test("an offline rebalance between batches heals: reload + exactly-once retry") {
    val dir = Files.createTempDirectory("graft_sidx_reb").toString
    val third = emb.filter(col("vec_id") % 3 === 0)
    val idx = IvfIndex.buildFrom(third, dir)
    val sink = new StreamingIndexer(idx)

    sink.indexBatch(emb.filter(col("vec_id") % 3 === 1), 1L)
    val afterB1 = IvfIndex.load(spark, dir).index.count()
    // offline retrain flips the manifest under the running indexer
    IvfIndex.load(spark, dir).rebalance()
    assert(IvfIndex.load(spark, dir).index.count() == afterB1)

    // redelivery of b1 must stay a no-op THROUGH the heal path, and a
    // new batch must commit against the retrained quantizers
    sink.indexBatch(emb.filter(col("vec_id") % 3 === 1), 1L)
    assert(IvfIndex.load(spark, dir).index.count() == afterB1)
    sink.indexBatch(emb.filter(col("vec_id") % 3 === 2), 2L)

    val finalIdx = IvfIndex.load(spark, dir)
    assert(finalIdx.index.count() == emb.count())
    // full-probe search over the healed index ≡ brute force on everything
    val got = finalIdx.search(queries, Ann.K, nprobe = Ann.Cells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Ann.annTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact)
  }

  test("streamed appends reach searchPq exactly once, incl. across restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sidx").toString
    val ckpt = Files.createTempDirectory("graft_sidx_ck").toString
    // build on the even half; stream the odd half in
    val idx = IvfIndex.buildFrom(emb.filter(col("vec_id") % 2 === 0), dir)
    val baseCount = idx.index.count()

    val streamed = emb.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq

    val src = MemoryStream[(Long, Array[Float])]
    src.addData(streamed)
    val sink = new StreamingIndexer(idx)
    val q1 = sink.run(src.toDF.toDF("vec_id", "embedding"), ckpt)
    q1.awaitTermination()

    val afterStream = idx.index.count()
    assert(afterStream == baseCount + streamed.size)

    // RESTART with the same checkpoint: AvailableNow finds nothing new —
    // and even a forced redelivery of a committed batch id is a no-op
    val q2 = new StreamingIndexer(IvfIndex.load(spark, dir))
      .run(src.toDF.toDF("vec_id", "embedding"), ckpt)
    q2.awaitTermination()
    val reloaded = IvfIndex.load(spark, dir)
    assert(reloaded.index.count() == afterStream)
    reloaded.appendTagged("b0", emb.filter(col("vec_id") % 2 =!= 0))
    assert(reloaded.index.count() == afterStream)

    // searchPq over old ∪ new equals a from-scratch index over the whole
    // corpus searched with the SAME quantizers (frozen-quantizer contract)
    val got = reloaded.searchPq(queries, Ann.K, nprobe = Ann.Cells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rebuilt = IvfIndex.buildFrom(emb,
      Files.createTempDirectory("graft_sidx_rb").toString,
      reloaded.centroids, reloaded.codebooks)
    val want = rebuilt.searchPq(queries, Ann.K, nprobe = Ann.Cells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("occupancy drift in the stream triggers the offline rebalance between batches") {
    val dir = Files.createTempDirectory("graft_sidx_drift").toString
    val idx = IvfIndex.buildFrom(emb.filter(col("vec_id") % 2 === 0), dir)
    // bound: twice the healthy build-time imbalance — the same band the
    // IvfIndexSpec drift cycle established
    val bound = idx.occupancy.imbalance * 2
    val sink = new StreamingIndexer(idx, rebalanceAtImbalance = bound)

    // batch 1: the rest of the SAME distribution — no alarm, no retrain
    sink.indexBatch(emb.filter(col("vec_id") % 2 =!= 0), 1L)
    assert(sink.rebalances == 0L,
      "a same-distribution batch must not trigger a rebalance")

    // batch 2: a drifted mode (wide cone the build-time quantizer has no
    // cells for) — the alarm fires and the indexer retrains BETWEEN
    // batches: one member, new quantizer generation
    val drifted = emb.filter(col("vec_id") % 2 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.4f)).as("embedding"))
    sink.indexBatch(drifted, 2L)
    assert(sink.rebalances == 1L, "drifted batch must trigger the rebalance")
    val cur = sink.currentIndex
    assert(cur.members.length == 1 && cur.members.head.startsWith("rebase-"),
      s"expected a retrained single member, got ${cur.members}")

    // exactly-once THROUGH the triggered retrain: the ledger survived,
    // so redelivered batch ids commit nothing — and a retrain that
    // didn't flatten a genuinely modal mode must not storm
    val total = cur.index.count()
    assert(total == emb.count() + drifted.count())
    sink.indexBatch(emb.filter(col("vec_id") % 2 =!= 0), 1L)
    sink.indexBatch(drifted, 2L)
    assert(sink.currentIndex.index.count() == total,
      "redelivery after the triggered rebalance double-indexed a batch")
    assert(sink.rebalances == 1L,
      "no-op redeliveries must not trigger repeat retrains")

    // the retrained index still answers exactly: full-probe search over
    // the drifted contents ≡ in-suite brute force (exact scoring, and a
    // full probe is centroid-agnostic)
    val stored = sink.currentIndex.index.select(col("neighbor_id"), col("nv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val qs = queries.limit(3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val got = sink.currentIndex
      .search(queries.limit(3), Ann.K, nprobe = sink.currentIndex.centroids.length)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, ns) => q -> ns.map(_._2).toSet }
    qs.foreach { case (qid, qv) =>
      val exact = stored.filter(_._1 != qid)
        .map { case (id, nv) =>
          (id, nv.zip(qv).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, c) => (-c, id) }.take(Ann.K).map(_._1).toSet
      assert(got(qid) == exact, s"query $qid: search diverged from brute force")
    }
  }

  test("appended members keep partition pruning in the searchPq scan") {
    val dir = Files.createTempDirectory("graft_sidx2").toString
    val idx = IvfIndex.buildFrom(emb.filter(col("vec_id") % 2 === 0), dir)
    idx.appendTagged("t1", emb.filter(col("vec_id") % 2 =!= 0))
    val search = idx.searchPq(queries, Ann.K, nprobe = 2)
    val plan = search.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#") ||
           plan.matches("(?s).*PartitionFilters: \\[.*cell.*IN.*"),
      plan.split("\n").filter(_.contains("PartitionFilters")).mkString("\n"))
    assert(search.count() > 0)
  }
}

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

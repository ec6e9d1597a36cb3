package graft

import graft.operators.{Dedup, DedupIndex}
import graft.streaming.StreamingSigIndexer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming maintenance of the near-dup signature index: a document
  * stream folds in exactly once (restart neither drops nor
  * double-indexes, compaction between batches included), and the
  * maintained index answers pair queries identically to a from-scratch
  * batch build. */
class StreamingSigIndexSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed batches reach the index exactly once, incl. across restart and compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sigidx").toString
    val ckpt = Files.createTempDirectory("graft_sigidx_ck").toString
    // build on 60% of the corpus; stream the rest in
    val idx = DedupIndex.build(docs.filter(col("doc_id") % 5 < 3), dir, 3)
    val baseCount = idx.index.count()

    val streamed = docs.filter(col("doc_id") % 5 >= 3)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq

    val src = MemoryStream[(Long, String)]
    src.addData(streamed)
    StreamingSigIndexer.run(idx, src.toDF.toDF("doc_id", "text"), ckpt)
      .awaitTermination()

    val shingled = docs
      .select(Dedup.shingleArr(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0).count()
    val afterStream = idx.reload()
    assert(afterStream.index.count() == shingled,
      "stream must add exactly the shingle-bearing remainder")

    // compaction between stream runs: members fold to one, ledger intact
    afterStream.compact()
    assert(afterStream.members.length == 1)

    // RESTART on the same checkpoint: AvailableNow finds nothing new,
    // and a forced redelivery of a committed batch id is a no-op even
    // though compaction replaced every member directory
    StreamingSigIndexer.run(afterStream, src.toDF.toDF("doc_id", "text"), ckpt)
      .awaitTermination()
    StreamingSigIndexer.indexBatch(afterStream,
      docs.filter(col("doc_id") % 5 >= 3), 0L)
    val reloaded = DedupIndex.load(spark, dir)
    assert(reloaded.index.count() == shingled)

    // the maintained index answers pairs exactly like a one-shot run
    // over the whole corpus
    assert(pairSet(reloaded.allPairs(0.5)) ==
      pairSet(Dedup.minhashDedup(docs, 3, 0.5)))
  }

  test("probe without append finds exactly the cross-boundary pairs") {
    val dir = Files.createTempDirectory("graft_sigidx_probe").toString
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val idx = DedupIndex.build(corpus, dir, 3)
    val membersBefore = idx.members
    // directional output: (a = probe doc, b = indexed doc); the one-shot
    // emits a < b — compare as unordered pairs restricted to the boundary
    val got = pairSet(idx.probe(delta, 0.5))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val want = pairSet(Dedup.minhashDedup(docs, 3, 0.5))
      .filter { case (a, b) => (a % 5 == 0) != (b % 5 == 0) }
    assert(got == want)
    assert(got.nonEmpty, "split produced no cross-boundary pairs to check")
    // probing committed nothing
    assert(idx.reload().members == membersBefore)
  }
}

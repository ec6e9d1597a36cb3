package graft

import graft.operators.Curation
import graft.streaming.StreamingDecontaminator
import graft.streaming.StreamingDecontaminator.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The ingest-side screen must agree with the batch operator: a doc
  * streamed past the benchmark set gets the same n_hits / verdict the
  * batch decontaminate assigns it. */
class StreamingDecontamSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)

  test("stream verdicts equal the batch operator's, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf)
    val bench = StreamingDecontaminator.benchSet(
      docs.filter(col("doc_id") % Curation.BenchMod === 0))
    assert(bench.nonEmpty)

    // stream the whole corpus slice the batch operator screens
    val corpus = docs.filter(col("doc_id") % Curation.BenchMod =!= 0)
      .select("doc_id", "text").collect()
      .zipWithIndex.map { case (r, i) => Doc(r.getLong(0), ts(i), r.getString(1)) }

    val stream = MemoryStream[Doc]
    val q = StreamingDecontaminator.screen(stream.toDS, bench)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    // two micro-batches: boundaries must not affect verdicts
    stream.addData(corpus.take(100)); q.processAllAvailable()
    stream.addData(corpus.drop(100)); q.processAllAvailable()
    q.stop()

    val got = spark.table("decon_out")
      .select("doc_id", "n_hits", "contaminated")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    val expect = Curation.decontaminate(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    assert(got.keySet == expect.keySet)
    got.foreach { case (id, v) => assert(v == expect(id), s"doc $id") }
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }

  test("chunking is streaming-safe: ingest-side chunks equal the batch operator's") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the chunker is a pure per-doc expansion (tokenize → explode →
    // slice, no aggregation/watermark), so the SAME operator body runs
    // in append mode — micro-batch boundaries cannot move a chunk
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, String)]
    val q = graft.operators.TextOps.chunkDocumentsOf(stream.toDS.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_out")
      .outputMode("append").start()
    stream.addData(docs.take(docs.length / 2)); q.processAllAvailable()
    stream.addData(docs.drop(docs.length / 2)); q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
    val got = spark.table("chunk_out").collect().map(key).toSet
    val expect = graft.operators.TextOps.chunkDocuments(spark, sf).collect().map(key).toSet
    assert(got == expect)
  }

  test("benchSet enforces its metadata-size contract instead of assuming it") {
    val bench = Tables.documents(spark, sf)
      .filter(col("doc_id") % Curation.BenchMod === 0)
    val ex = intercept[IllegalArgumentException] {
      StreamingDecontaminator.benchSet(bench, maxShingles = 10)
    }
    assert(ex.getMessage.contains("metadata-sized"), ex.getMessage)
  }
}

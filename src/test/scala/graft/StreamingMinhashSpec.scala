package graft

import graft.operators.Dedup
import graft.streaming.StreamingMinhash
import graft.streaming.StreamingMinhash.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-side MinHash must agree with the batch pipeline: candidates a
  * streamed doc raises against the static corpus index are exactly the
  * batch candidate pairs between that doc and the corpus. */
class StreamingMinhashSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)
  private val IdOffset = 10000000L

  test("stream candidates equal the batch candidate set against the corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Tables.documents(spark, sf).select("doc_id", "text")
    val corpusBands = StreamingMinhash.corpusIndex(corpus, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusBands.count()

    // stream 20 docs that are byte-copies of corpus docs under new ids —
    // each must at minimum candidate-match its own twin
    val streamed = corpus.limit(20).collect().zipWithIndex.map {
      case (r, i) => Doc(r.getLong(0) + IdOffset, ts(i), r.getString(1))
    }.toSeq

    val stream = MemoryStream[Doc]
    stream.addData(streamed)
    val q = StreamingMinhash.candidates(stream.toDS, corpusBands)
      .writeStream.format("memory").queryName("mh_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("mh_out")
      .select("new_doc", "corpus_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch truth: candidates over corpus ∪ streamed, cross pairs only
    // (streamed ids are all larger, so they land in `b` of the a<b pairs)
    val streamedDf = streamed.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val expected = Dedup.minhashCandidates(Dedup.minhashSignaturesOf(
        Dedup.hashedShingles(corpus.unionByName(streamedDf), 3)))
      .filter(col("b") >= IdOffset && col("a") < IdOffset)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet

    corpusBands.unpersist(false)
    assert(got == expected)
    // every byte-copy found its twin
    val twins = streamed.map(d => (d.doc_id, d.doc_id - IdOffset)).toSet
    assert(twins.subsetOf(got))
  }

  test("re-delivered candidate pairs within the watermark are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.documents(spark, sf).select("doc_id", "text").limit(50)
    val corpusBands = StreamingMinhash.corpusIndex(corpus, 3)
    val doc = corpus.collect()(0)
    val stream = MemoryStream[Doc]
    // same doc delivered twice inside the watermark → one candidate pair
    stream.addData(Seq(Doc(doc.getLong(0) + IdOffset, ts(0), doc.getString(1))))
    stream.addData(Seq(Doc(doc.getLong(0) + IdOffset, ts(1), doc.getString(1))))
    val q = StreamingMinhash.candidates(stream.toDS, corpusBands)
      .writeStream.format("memory").queryName("mh_dup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("mh_dup_out")
      .filter(col("corpus_doc") === doc.getLong(0))
      .select("new_doc", "corpus_doc").collect()
    assert(pairs.length == 1)
  }
}

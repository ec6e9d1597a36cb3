package graft

import graft.operators.{CurateStore, Pipeline}
import graft.streaming.StreamingCurator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming maintenance of the persisted curation store: a document
  * stream folds in exactly once (restart neither drops nor
  * double-curates, offline compaction between runs included), and the
  * maintained snapshot answers identically to the one-shot funnel over
  * everything ingested. */
class StreamingCuratorSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  private def resultMap(df: DataFrame): Map[Long, (String, String, Long, Double, Long, Boolean, String)] =
    df.collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("content_hash"), r.getAs[String]("lang"),
          r.getAs[Long]("n_tokens"), r.getAs[Double]("quality_score"),
          r.getAs[Long]("cluster_id"), r.getAs[Boolean]("near_dup_keeper"),
          r.getAs[String]("cleaned")))
    }.toMap

  test("streamed batches fold exactly once; snapshot ≡ one-shot funnel, " +
    "incl. across restart, forced redelivery, and compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_streamcurate").toString
    val ckpt = Files.createTempDirectory("graft_streamcurate_ck").toString
    val store = CurateStore.build(docs.filter(col("doc_id") <= 299), dir)

    // two ingest drops stream in as separate batches
    val src = MemoryStream[(Long, String, String)]
    def rows(lo: Long, hi: Long) = docs
      .filter(col("doc_id") > lo && col("doc_id") <= hi)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect().toSeq
    src.addData(rows(299, 399))
    src.addData(rows(399, 499))
    StreamingCurator.run(store,
      src.toDF.toDF("doc_id", "text", "lang"), ckpt).awaitTermination()

    val expected = resultMap(Pipeline.pipelineCurateOf(docs))
    assert(store.docCount == 500L)
    assert(resultMap(store.snapshot()) == expected)

    // offline compaction between stream runs, then RESTART on the same
    // checkpoint (AvailableNow finds nothing new) plus a FORCED
    // redelivery of a committed batch id: both must be no-ops even
    // though compaction replaced every member directory
    store.compact()
    store.vacuum()
    StreamingCurator.run(store,
      src.toDF.toDF("doc_id", "text", "lang"), ckpt).awaitTermination()
    StreamingCurator.curateBatch(store,
      docs.filter(col("doc_id") > 299 && col("doc_id") <= 399), 0L)
    assert(store.docCount == 500L)
    assert(resultMap(store.snapshot()) == expected)

    // the health series rides the stream: night 0 plus one night per
    // MICRO-BATCH (AvailableNow may coalesce queued drops into one),
    // current to the last batch, doc counts summing to everything ever
    // curated — and the forced redelivery added no extra night
    val health = store.health().collect()
    val nights = health.map(_.getString(0)).toSet
    assert(nights.contains("base") &&
      (nights - "base").nonEmpty && (nights - "base").forall(_.startsWith("b")),
      s"expected base + batch nights, got $nights")
    assert(health.map(_.getLong(2)).sum == 500L)
  }
}

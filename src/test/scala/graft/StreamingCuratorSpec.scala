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

  test("health series is current to the LAST ingested drop, and " +
    "redelivery/restart/compaction leave it bit-stable") {
    val dir = Files.createTempDirectory("graft_streamcurate_h").toString
    val store = CurateStore.build(docs.filter(col("doc_id") <= 299), dir)
    def healthRows = store.health().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    def drop(lo: Long, hi: Long) =
      docs.filter(col("doc_id") > lo && col("doc_id") <= hi)

    // before any drop: night 0 alone, covering the built corpus
    val h0 = healthRows
    assert(h0.map(_._1) == Set("base") && h0.toSeq.map(_._3).sum == 300L)

    // FRESHNESS: after each drop the series gains exactly that drop's
    // night, doc counts current to everything ingested so far — the
    // series rides curateNight, so a drop is visible the moment its
    // fold commits, with no separate refresh step
    StreamingCurator.curateBatch(store, drop(299, 399), 7L)
    val h1 = healthRows
    assert(h1.map(_._1) == Set("base", "b7"), s"nights ${h1.map(_._1)}")
    assert(h1.filter(_._1 == "b7").toSeq.map(_._3).sum == 100L)
    assert(h0.subsetOf(h1), "drop 7 must not rewrite earlier nights")

    StreamingCurator.curateBatch(store, drop(399, 499), 8L)
    val h2 = healthRows
    assert(h2.map(_._1) == Set("base", "b7", "b8"))
    assert(h2.toSeq.map(_._3).sum == 500L)
    assert(h1.subsetOf(h2))

    // an at-least-once REDELIVERY of a committed drop adds no night and
    // changes no row (sketch bytes are deterministic, so estimates are
    // bit-stable, not merely approximately equal)
    StreamingCurator.curateBatch(store, drop(299, 399), 7L)
    assert(healthRows == h2)

    // a reopened handle (the restart read path) and an offline
    // compaction + vacuum see the identical series
    assert(CurateStore.load(spark, dir).health().collect().length == h2.size)
    store.compact()
    store.vacuum()
    assert(healthRows == h2)
  }
}

package graft

import graft.sources.{JsonlCorpus, StoreFs}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** JSONL ingest: field-exact roundtrip (nulls, newlines, unicode),
  * verbatim quarantine routing, and the no-abort contract on garbage. */
class JsonlSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    graft.operators.DedupIndex.freshRunDir(s"graft_jsonl_spec_${tag}_", "t")
      .getPath

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "plain text", "en", "web", 10L),
      (2L, "line\nbreak\tand \"quotes\"", "de", "web", 22L),
      (3L, "ünïcödé — 中文 🙂", "zh", "crawl", 14L),
      (4L, "", "en", "web", 0L),
      (5L, null.asInstanceOf[String], null.asInstanceOf[String], "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("write → read roundtrips every field exactly, nulls included") {
    val dir = freshDir("rt")
    JsonlCorpus.write(corpus, dir)
    val (clean, quarantined) = JsonlCorpus.readSplit(spark, dir)
    assert(quarantined.count() == 0)
    val got = clean.orderBy("doc_id").collect().toSeq
    val want = corpus.orderBy("doc_id").collect().toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("malformed lines route to quarantine verbatim; clean rows unaffected") {
    val dir = freshDir("q")
    JsonlCorpus.write(corpus, dir)
    val bad = Seq("""{"doc_id": 7, "text": "unterminated""", "garbage", "{]")
    StoreFs(spark, dir).atomicWrite("zz-bad.json", bad.mkString("\n").getBytes)
    val (clean, quarantined) = JsonlCorpus.readSplit(spark, dir)
    assert(clean.count() == corpus.count())
    assert(quarantined.collect().map(_.getString(0)).toSet == bad.toSet)
  }

  test("an all-garbage file quarantines every line instead of aborting") {
    val dir = freshDir("g")
    spark.range(1).selectExpr("'{ nope' AS x").write.mode("overwrite").text(dir)
    val (clean, quarantined) = JsonlCorpus.readSplit(spark, dir)
    assert(clean.count() == 0)
    assert(quarantined.head().getString(0) == "{ nope")
  }
}

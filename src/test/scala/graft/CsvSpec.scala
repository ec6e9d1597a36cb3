package graft

import graft.sources.{CsvCorpus, StoreFs}
import org.apache.spark.sql.functions._

/** CSV ingest: field-exact roundtrip (quoting, unicode, nulls), the
  * line-grain write contract, verbatim quarantine routing, and the
  * no-abort contract on garbage. */
class CsvSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    graft.operators.DedupIndex.freshRunDir(s"graft_csv_spec_${tag}_", "t")
      .getPath

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "plain text", "en", "web", 10L),
      (2L, "commas, \"quotes\", more, commas", "de", "web", 30L),
      (3L, "ünïcödé — 中文 🙂", "zh", "crawl", 14L),
      (4L, null.asInstanceOf[String], null.asInstanceOf[String], "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("write → read roundtrips every field exactly, quoting included") {
    val dir = freshDir("rt")
    CsvCorpus.write(corpus, dir)
    val (clean, quarantined) = CsvCorpus.readSplit(spark, dir)
    assert(quarantined.count() == 0)
    val got = clean.orderBy("doc_id").collect().toSeq
    val want = corpus.orderBy("doc_id").collect().toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("write refuses payloads with embedded line terminators (use JSONL)") {
    import spark.implicits._
    val withBreak = Seq((9L, "line\nbreak", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[IllegalArgumentException] {
      CsvCorpus.write(withBreak, freshDir("brk"))
    }
    assert(e.getMessage.contains("JSONL"), e.getMessage)
  }

  test("malformed lines route to quarantine verbatim; clean rows unaffected") {
    val dir = freshDir("q")
    CsvCorpus.write(corpus, dir)
    val bad = Seq(
      "doc_id,text,lang,source,n_chars", // a stray header is garbage too
      "7,too few",
      "7,a,b,c,5,too many",
      "notanumber,x,en,web,1",
      "\"unclosed,en,web,2")
    StoreFs(spark, dir).atomicWrite("zz-bad.csv", bad.mkString("\n").getBytes)
    val (clean, quarantined) = CsvCorpus.readSplit(spark, dir)
    assert(clean.count() == corpus.count())
    assert(quarantined.collect().map(_.getString(0)).toSet == bad.toSet)
  }

  test("an all-garbage file quarantines every line instead of aborting") {
    val dir = freshDir("g")
    spark.range(1).selectExpr("'x,y' AS v").write.mode("overwrite").text(dir)
    val (clean, quarantined) = CsvCorpus.readSplit(spark, dir)
    assert(clean.count() == 0)
    assert(quarantined.head().getString(0) == "x,y")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV corpus ingest — the other interchange format real deliveries
  * arrive in (vendor metadata dumps, label/annotation exports, URL
  * lists land as CSV at least as often as JSONL). The twin of
  * [[JsonlCorpus]], under the same two 100 TB rules:
  *
  *  - **Explicit schema, never inference** — inference costs a full
  *    extra pass and guesses per-file; the schema is declared once and
  *    the read is one pass over a line-splittable text scan.
  *  - **Corrupt lines are data, not failures** — wrong token counts,
  *    type failures, broken quoting all route VERBATIM into a
  *    quarantine column; [[readSplit]] lands clean rows and ships bad
  *    lines to review (worker.js nack routing at the record grain).
  *
  * Implemented as text scan + `from_csv` rather than `spark.read.csv`
  * for the same reason [[JsonlCorpus]] avoids `spark.read.json`: the
  * file source refuses plans whose pruned scan references only its
  * internal corrupt-record column (the quarantine branch of the split
  * is exactly that plan), while a projection-computed quarantine is an
  * ordinary column — both halves stay lazy single-pass scans.
  *
  * **One record per line is a hard contract.** CSV's only escape for an
  * embedded line terminator is a quoted multi-line record, and a
  * multi-line record cannot be read by a line-splittable scan — the
  * `multiLine` fallback funnels each file through one reader, the
  * single-reader choke point this source exists to avoid. So [[write]]
  * REFUSES payloads containing line terminators (use JSONL, which
  * escapes them, for document text) instead of silently emitting a file
  * that would mis-parse; commas and quotes are fine (standard CSV
  * quoting, handled symmetrically on both sides). Files are headerless
  * by the same explicit-schema rule — a vendor file that does carry a
  * header simply quarantines that line (visibly reviewable), it cannot
  * silently corrupt the clean half. */
object CsvCorpus {

  /** Quarantine column: null for parsed rows, the raw line verbatim for
    * unparseable ones. */
  val CorruptCol = "_quarantine"

  /** Shared documents-table schema (TESTDATA.md). */
  val Schema: StructType = JsonlCorpus.Schema

  private val ParseSchema: StructType =
    Schema.add(StructField(CorruptCol, StringType))

  private val Options = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> CorruptCol)

  /** Write a corpus frame as headerless CSV, one record per line.
    * Refuses string payloads with embedded line terminators — they have
    * no line-splittable CSV representation (see class doc); the check
    * is one column-pruned pass over the string fields, paid at write
    * time so the refusal is loud HERE rather than a mis-parse at some
    * later read. */
  def write(docs: DataFrame, dir: String): Unit = {
    val stringCols = docs.schema.fields
      .filter(_.dataType == StringType).map(_.name)
    if (stringCols.nonEmpty) {
      val breaks = docs.filter(stringCols
          .map(c => col(c).contains("\n") || col(c).contains("\r"))
          .reduce(_ || _)).count()
      require(breaks == 0L,
        s"$breaks row(s) carry embedded line terminators in string " +
          s"fields (${stringCols.mkString(", ")}) — a line-splittable " +
          "CSV cannot represent them; write those payloads as JSONL " +
          "(JsonlCorpus), which escapes line breaks")
    }
    docs.write.mode(SaveMode.Overwrite).csv(dir)
  }

  /** One-pass schema'd read: table columns plus [[CorruptCol]] (null ⇔
    * the line parsed). Blank lines are skipped (the CSV source's own
    * behavior); a line with too few/too many tokens, a type-cast
    * failure, or broken quoting quarantines verbatim. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val parsed = spark.read.text(dir)
      .filter(length(col("value")) > 0)
      .select(col("value"),
        from_csv(col("value"), ParseSchema, Options).as("_r"))
    val bad = col("_r").isNull || col(s"_r.$CorruptCol").isNotNull
    parsed.select(
      Schema.fieldNames.toSeq.map(f =>
        when(bad, lit(null)).otherwise(col(s"_r.$f")).as(f)) :+
        when(bad, col("value")).as(CorruptCol): _*)
  }

  /** (clean rows in table schema, quarantined raw lines). */
  def readSplit(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val all = read(spark, dir)
    (all.filter(col(CorruptCol).isNull)
       .select(Schema.fieldNames.toSeq.map(col): _*),
     all.filter(col(CorruptCol).isNotNull)
       .select(col(CorruptCol).as("raw_line")))
  }

  /** Registered `csv_roundtrip`: documents → headerless CSV on disk
    * (with deliberately-injected malformed lines — wrong token counts,
    * a type failure, broken quoting, and a stray header) → schema'd
    * read → split. Returns the clean rows; the injected garbage must
    * land in quarantine — all of it, and nothing else — or the query
    * fails loudly. The oracle is the documents table itself
    * ([[JsonlCorpus.roundtrip]]'s contract): a hash match proves the
    * write → parse → route cycle field-preserves every row while the
    * garbage was carried OUT of the clean path. */
  def roundtrip(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(s, d)
    val dir = graft.operators.DedupIndex.freshRunDir("graft_csv_", d).getPath
    write(docs, dir)
    val bad = Seq(
      "doc_id,text,lang,source,n_chars", // stray header: type failure
      "1,only two tokens",               // too few tokens
      "1,a,b,c,5,extra",                 // too many tokens
      "notanumber,text,en,web,12",       // doc_id type failure
      "\"unclosed quote,en,web,3")       // broken quoting
    StoreFs(s, dir).atomicWrite("zz-corrupt.csv", bad.mkString("\n").getBytes)
    val (clean, quarantined) = readSplit(s, dir)
    val q = quarantined.collect().map(_.getString(0)).toSet // 5 lines, bounded
    require(q == bad.toSet,
      s"quarantine mismatch: expected ${bad.toSet}, got $q")
    clean
  }

  def roundtripOracle: String = JsonlCorpus.roundtripOracle
}

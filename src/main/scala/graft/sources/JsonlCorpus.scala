package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) corpus ingest — the crawl interchange
  * format (Common Crawl WET-derived dumps, web-scrape drops, vendor
  * deliveries all arrive as JSONL long before anything is parquet).
  *
  * The two 100 TB rules this source encodes:
  *
  *  - **Explicit schema, never inference.** Schema inference runs a FULL
  *    extra pass over the data just to guess types (and guesses
  *    per-file, so a heterogeneous dump can yield conflicting schemas).
  *    The corpus schema is declared once; the read is one pass over a
  *    line-splittable text scan that parallelizes like any other — no
  *    single-reader choke point.
  *  - **Corrupt lines are data, not failures.** A trillion-line crawl
  *    WILL contain truncated writes and malformed records; a job that
  *    aborts on line 10¹¹ wastes the cluster, and silently dropping
  *    lines corrupts accounting. Every unparseable line routes —
  *    verbatim — into a quarantine column; [[readSplit]] returns
  *    (clean, quarantined) so the pipeline lands good rows and ships bad
  *    lines to a review table, the `batch_driver` failed-batch pattern
  *    (reference: worker.js nack routing) applied at the record grain.
  *
  * Implemented as text scan + `from_json` in one projection rather than
  * `spark.read.json`: the JSON file source refuses plans whose pruned
  * scan references only its internal corrupt-record column
  * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
  * documented workaround is caching the parsed corpus, a non-starter at
  * scale). Parsing in a projection makes the quarantine column an
  * ORDINARY computed column: both halves of the split stay lazy
  * single-pass scans, and the parser work is identical (same Jackson
  * path, same PERMISSIVE semantics). Blank lines are skipped (the JSON
  * source's behavior); a line holding the JSON literal `null` parses to
  * a null struct and quarantines — it is not a record. */
object JsonlCorpus {

  /** Quarantine column: null for parsed rows, the raw line verbatim for
    * unparseable ones. */
  val CorruptCol = "_quarantine"

  /** The documents-table schema (TESTDATA.md) declared for the parser. */
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val ParseSchema: StructType =
    Schema.add(StructField(CorruptCol, StringType))

  /** Write a corpus frame as JSONL (gzip-able, line-splittable). */
  def write(docs: DataFrame, dir: String): Unit =
    docs.write.mode(SaveMode.Overwrite).json(dir)

  /** One-pass schema'd read: table columns plus [[CorruptCol]] (null ⇔
    * the line parsed). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val parsed = spark.read.text(dir)
      .filter(length(col("value")) > 0)
      .select(col("value"),
        from_json(col("value"), ParseSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("_r"))
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

  /** Registered `jsonl_roundtrip`: documents → JSONL on disk (with
    * deliberately-injected malformed lines) → schema'd read → split.
    * Returns the clean rows; the malformed lines must land in quarantine
    * — all of them, and nothing else — or the query fails loudly (a
    * silent quarantine regression would otherwise look like a pass).
    * The oracle is the documents table itself: a hash match proves the
    * write → parse → route cycle byte-preserves every field while the
    * garbage was carried OUT of the clean path rather than aborting the
    * job or leaking nulls into it. */
  def roundtrip(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(s, d)
    val dir = graft.operators.DedupIndex.freshRunDir("graft_jsonl_", d).getPath
    write(docs, dir)
    val bad = Seq(
      """{"doc_id": 1, "text": "truncated""",
      """not json at all""",
      """{"doc_id": }""")
    StoreFs(s, dir).atomicWrite("zz-corrupt.json", bad.mkString("\n").getBytes)
    val (clean, quarantined) = readSplit(s, dir)
    val q = quarantined.collect().map(_.getString(0)).toSet // 3 lines, bounded
    require(q == bad.toSet,
      s"quarantine mismatch: expected ${bad.toSet}, got $q")
    clean
  }

  def roundtripOracle: String =
    "SELECT doc_id, text, lang, source, n_chars FROM documents"
}

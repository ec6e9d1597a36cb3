package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order clustering for multi-dimensional
  * data skipping — the OPTIMIZE ZORDER shape of Delta/Iceberg.
  *
  * A 100 TB fact table is pruned at scan time by file/row-group min-max
  * statistics, but a linear sort gives tight statistics on ONE column
  * only: every file still spans the full range of every other filter
  * column. Interleaving the bits of k quantized dimensions into one
  * z-value and range-sorting on it makes every file a small HYPER-CUBE:
  * min-max pruning works for predicates on ANY subset of the dims
  * (LayoutSpec measures the bounding boxes directly).
  *
  * Everything is exact integer arithmetic in plain `functions._`:
  * quantization is `(clamp(x) - min) * (2^bits - 1) div (max - min)`
  * against driver-collected min/max (two-value metadata per dim — the
  * same bounded-metadata pattern as the IVF quantizer), interleave is a
  * shift/or fold — fully codegen'd, no UDF, and replicated verbatim in
  * the DuckDB oracle, which checks the z-keys AND content preservation
  * through a real clustered write → read-back roundtrip.
  */
object Layout {

  /** Bits per dimension (2 dims ⇒ 2·ZBits-bit z-values, 2^ZBits range
    * buckets per dim — file-count-scale resolution, not value-scale:
    * statistics prune FILES, so buckets only need to out-resolve the
    * file count). */
  val ZBits = 8

  /** Quantize `x` from [lo, hi] onto [0, 2^bits - 1]: exact integral
    * arithmetic `(clamp(x)-lo)·(2^bits-1) div (hi-lo)`, monotonic,
    * edge-exact (lo↦0, hi↦2^bits-1), total — x is clamped INTO [lo, hi]
    * BEFORE the multiply, so a stale min/max (even a Long.MaxValue
    * sentinel) never overflows under ANSI mode; degenerate hi==lo maps
    * everything to 0. The span guard keeps (hi-lo)·(2^bits-1) itself
    * inside Long. */
  def quantize(x: Column, lo: Long, hi: Long, bits: Int = ZBits): Column = {
    val top = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else {
      // Math.subtractExact: hi - lo itself overflows Long when lo is very
      // negative and hi very positive, which would make the span guard
      // pass spuriously and push the overflow into the job's column
      // arithmetic — fail on the driver instead.
      val span =
        try Math.subtractExact(hi, lo)
        catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"dimension span $lo..$hi too wide to quantize at $bits bits") }
      require(span <= Long.MaxValue / top,
        s"dimension span $lo..$hi too wide to quantize at $bits bits")
      val cx = least(lit(hi), greatest(lit(lo), x.cast("long")))
      call_function("div", (cx - lit(lo)) * lit(top), lit(span))
    }
  }

  /** Interleave two `bits`-wide quantized values: bit i of `qa` lands at
    * z-bit 2i, bit i of `qb` at 2i+1 (the Morton curve). */
  def interleave(qa: Column, qb: Column, bits: Int = ZBits): Column =
    interleaveN(Seq(qa, qb), bits)

  /** k-dimensional Morton interleave: bit i of dimension d lands at
    * z-bit `i·k + d`. `k·bits` must fit a signed Long (≤ 62); at the
    * default 8 bits that allows up to 7 clustering dimensions — more
    * than min-max file statistics can usefully exploit anyway. */
  def interleaveN(qs: Seq[Column], bits: Int = ZBits): Column = {
    val k = qs.size
    require(k >= 1 && k * bits <= 62,
      s"$k dims × $bits bits exceeds a signed Long z-value")
    (for { i <- 0 until bits; (q, d) <- qs.zipWithIndex } yield
      shiftright(q, i).bitwiseAND(lit(1L)) * lit(1L << (i * k + d)))
      .reduce(_ + _)
  }

  /** Rewrite `df` clustered on the z-order of (`colA`, `colB`): range
    * partition into `files` output files by z-value, sort within each,
    * write. One shuffle, layout-only — content is untouched (the oracle
    * proves it). Returns the read-back frame WITH the z-key column. */
  def clusterZOrder(df: DataFrame, colA: String, loA: Long, hiA: Long,
                    colB: String, loB: Long, hiB: Long,
                    outPath: String, files: Int): DataFrame = {
    val z = interleave(quantize(col(colA), loA, hiA),
      quantize(col(colB), loB, hiB)).as("zkey")
    df.withColumn("zkey", z)
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(outPath)
    df.sparkSession.read.parquet(outPath)
  }

  /** `cluster_zorder`: cluster the documents table on (n_chars, doc_id),
    * through a real on-disk rewrite. The driver-side min/max collect is
    * two rows of metadata (the IVF-quantizer pattern). The oracle
    * recomputes the z-keys from min/max subqueries with the identical
    * integer arithmetic and checks every row survived the rewrite. */
  def clusterZorderQuery(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val Array(loA, hiA, loB, hiB) = docs.agg(
      min(col("n_chars")).cast("long"), max(col("n_chars")).cast("long"),
      min(col("doc_id")), max(col("doc_id"))).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_zorder_" + d.replaceAll("[^A-Za-z0-9]", "_")).getPath
    clusterZOrder(docs.select(col("doc_id"), col("lang"), col("n_chars")),
      "n_chars", loA, hiA, "doc_id", loB, hiB, out, files = 8)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("zkey"))
  }

  def clusterZorderOracle: String = {
    val top = (1L << ZBits) - 1
    def q(x: String, lo: String, hi: String) =
      s"CASE WHEN $hi <= $lo THEN 0 ELSE " +
        s"((least($hi, greatest($lo, $x)) - $lo) * $top) // ($hi - $lo) END"
    val terms = (0 until ZBits).map { i =>
      s"((qa >> $i) & 1) * ${1L << (2 * i)} + ((qb >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""
    WITH b AS (
      SELECT CAST(min(n_chars) AS BIGINT) AS loA, CAST(max(n_chars) AS BIGINT) AS hiA,
             min(doc_id) AS loB, max(doc_id) AS hiB
      FROM documents),
    q AS (
      SELECT doc_id, lang, n_chars,
        ${q("CAST(n_chars AS BIGINT)", "loA", "hiA")} AS qa,
        ${q("doc_id", "loB", "hiB")} AS qb
      FROM documents, b)
    SELECT doc_id, lang, n_chars, CAST($terms AS BIGINT) AS zkey FROM q"""
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, StringType}

/** Generic one-pass column profiling — the data-quality primitive every
  * lake operation leans on before trusting a table (the `SUMMARIZE` /
  * `ANALYZE` shape, as a first-class operator over any DataFrame): row
  * count, per-column null count, distinct cardinality, numeric min/max,
  * lexicographic string min/max, and mean string length, in long format
  * (one row per profiled column) so downstream checks join on the column
  * name instead of pivoting a one-row wide frame.
  *
  * Everything folds in ONE aggregation over ONE scan: per-column
  * partials combine map-side, so the exchange carries a handful of
  * scalars per partition regardless of table size. Distinct cardinality
  * is the one knob with a real 100 TB trade:
  *
  *   - `exact = true` plans Spark's multi-distinct rewrite — an Expand
  *     that replicates each input row once per distinct-aggregated
  *     column before the partial agg. Correct at any scale but the scan
  *     amplifies by the profiled-column count; this is the
  *     oracle-checked regime (DuckDB `count(DISTINCT col)`).
  *   - `exact = false` (the 100 TB default) swaps in
  *     `approx_count_distinct` (HyperLogLog++, relative error `rsd`):
  *     no Expand, single-pass, the plan is identical to the non-distinct
  *     profile's. ProfileSpec pins the approximate cardinalities within
  *     rsd-tolerance of the exact ones AND the no-Expand plan shape.
  *
  * Min/max stay TYPED (numeric columns fill `min_num`/`max_num`,
  * strings fill `min_str`/`max_str`) — one long-format schema without
  * lossy casts, NULL where a measure does not apply.
  */
object Profile {

  /** Long-format profile of `cols` (default: every column) of `df`:
    * `(column, n_rows, n_null, n_distinct, min_num, max_num, min_str,
    * max_str, avg_len)`. One aggregation, one scan; see class doc for
    * the `exact` trade. */
  def profileOf(df: DataFrame, cols: Seq[String] = Nil,
                exact: Boolean = false, rsd: Double = 0.02): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    require(names.forall(types.contains),
      s"profileOf: unknown column(s) ${names.filterNot(types.contains)}")

    def nullLong: Column = lit(null).cast(LongType)
    def nullDouble: Column = lit(null).cast(DoubleType)
    def nullString: Column = lit(null).cast(StringType)

    // one flat aggregate: every column contributes its measure exprs,
    // all partial-foldable — the exchange moves scalars, never rows
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +: names.flatMap { n =>
        val c = col(n)
        val dist =
          if (exact) count_distinct(c)
          else approx_count_distinct(c, rsd)
        val (minN, maxN) = types(n) match {
          case _: NumericType =>
            (min(c).cast(DoubleType), max(c).cast(DoubleType))
          case _ => (nullDouble, nullDouble)
        }
        val (minS, maxS, avgL) = types(n) match {
          case StringType => (min(c), max(c), avg(length(c)))
          case _ => (nullString, nullString, nullDouble)
        }
        Seq(
          count(c).as(s"nn_$n"), dist.as(s"nd_$n"),
          minN.as(s"mn_$n"), maxN.as(s"mx_$n"),
          minS.as(s"ms_$n"), maxS.as(s"xs_$n"), avgL.as(s"al_$n"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)

    // unpivot the one-row frame to long format on the executors (a
    // single row — inline is metadata work, not a shuffle)
    val rows = names.map { n =>
      struct(
        lit(n).as("column"),
        col("n_rows"),
        (col("n_rows") - col(s"nn_$n")).as("n_null"),
        col(s"nd_$n").cast(LongType).as("n_distinct"),
        col(s"mn_$n").as("min_num"), col(s"mx_$n").as("max_num"),
        col(s"ms_$n").as("min_str"), col(s"xs_$n").as("max_str"),
        col(s"al_$n").as("avg_len"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** `profile_documents`: the registered face — exact-regime profile of
    * every `documents` column, hash-checked against DuckDB's
    * per-column `count/count(DISTINCT)/min/max/avg(length)`. */
  def profileDocuments(s: SparkSession, d: String): DataFrame =
    profileOf(graft.Tables.documents(s, d), exact = true)

  def profileDocumentsOracle: String = {
    def block(n: String, numeric: Boolean, isStr: Boolean) = {
      val minN = if (numeric) s"CAST(min($n) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val maxN = if (numeric) s"CAST(max($n) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val minS = if (isStr) s"min($n)" else "CAST(NULL AS VARCHAR)"
      val maxS = if (isStr) s"max($n)" else "CAST(NULL AS VARCHAR)"
      val avgL = if (isStr) s"avg(length($n))" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$n' AS "column", count(*) AS n_rows,
             count(*) - count($n) AS n_null,
             count(DISTINCT $n) AS n_distinct,
             $minN AS min_num, $maxN AS max_num,
             $minS AS min_str, $maxS AS max_str, $avgL AS avg_len
           FROM documents"""
    }
    Seq(
      block("doc_id", numeric = true, isStr = false),
      block("text", numeric = false, isStr = true),
      block("lang", numeric = false, isStr = true),
      block("source", numeric = false, isStr = true),
      block("n_chars", numeric = true, isStr = false)
    ).mkString("\nUNION ALL\n")
  }
}

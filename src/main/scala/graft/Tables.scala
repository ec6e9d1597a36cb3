package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parquet star-schema loaders (TESTDATA.md) plus shared numeric helpers.
  *
  * All money/measure sums are computed as DECIMAL(18,2) and cast back to
  * DOUBLE at the end: decimal addition is exact and order-independent, so
  * results are bit-stable across partitionings, engines (DuckDB oracle) and
  * cluster sizes — raw double summation is not. At 100 TB the aggregation
  * order is nondeterministic, so this is a correctness property, not a
  * nicety.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong and
    * the long is converted to a microsecond timestamp here (exact: the
    * generator writes whole microseconds). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", nanosToTimestamp(col("ts")))
      case _ => raw
    }
  }

  /** ns→µs must stay in LONG arithmetic: `(ns / 1000).cast("long")` promotes
    * to double first, and 2024-epoch nanos (~1.7e18) exceed double's 2^53
    * exact range — ~1.6% of values truncate 1 µs low, which can flip
    * exact-boundary comparisons (sessionize gaps, as-of `<=`, watermarks).
    * Integral DIV is exact for the generator's non-negative timestamps. */
  def nanosToTimestamp(c: Column): Column =
    timestamp_micros(call_function("div", c, lit(1000L)))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Exact 2-dp decimal view of a double column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a 2-dp quantity, surfaced as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Timestamps cross the Spark/DuckDB/pandas boundary as strings so tz
    * adjustment and unit differences can't corrupt the compare. */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}

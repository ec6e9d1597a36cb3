package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed group keys.
  *
  * A hot key funnels its entire row volume through one reducer; salting
  * splits phase 1 across `buckets` sub-groups of (key, salt) and phase 2
  * re-combines partials on the key alone — the additive-merge law
  * (Merge.scala) applied inside one query. AQE's skew handling covers
  * skewed JOINS; skewed AGGREGATION keys are the case you salt by hand,
  * and this is the pattern the Dedup hub-shingle note refers to.
  *
  * The registered `skew_salted_agg` aggregates lineitem by l_returnflag —
  * 3 keys over the whole fact table, maximal skew — salted 16 ways on the
  * order key; its DuckDB oracle is the PLAIN group-by, so the hash match
  * proves salting is result-invariant end to end.
  */
object Skew {

  val Buckets = 16

  /** Two-phase salted aggregation: `sums` are (outName, inputColumn)
    * decimal-summable measures; counts ride along. */
  def saltedAgg(df: DataFrame, key: Column, salt: Column,
                sums: Seq[(String, Column)], buckets: Int = Buckets): DataFrame = {
    val partialAggs = count(lit(1)).as("_n") +:
      sums.map { case (n, c) => sum(dec(c)).as(s"_$n") }
    val phase1 = df
      .groupBy(key.as("k"), pmod(salt, lit(buckets)).as("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sum(col("_n")).as("n") +:
      sums.map { case (n, _) => sum(col(s"_$n")).cast("double").as(n) }
    phase1.groupBy(col("k")).agg(finalAggs.head, finalAggs.tail: _*)
  }

  def skewSaltedAgg(s: SparkSession, d: String): DataFrame =
    saltedAgg(
      lineitem(s, d),
      key  = col("l_returnflag"),
      salt = col("l_orderkey"),
      sums = Seq(
        "sum_qty"   -> col("l_quantity"),
        "sum_price" -> col("l_extendedprice"),
        "sum_disc"  -> col("l_discount")))
      .withColumnRenamed("k", "game_mode")

  def skewSaltedAggOracle: String = """
    SELECT l_returnflag AS game_mode,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
    FROM lineitem GROUP BY 1"""
}

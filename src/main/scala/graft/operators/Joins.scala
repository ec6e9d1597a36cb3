package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pair self-join and as-of join operators.
  *
  * hero_vs_hero (crunch_hero_vs_hero.sql:36-40) pairs participants of the
  * same match: an equi-self-join on the match key with bounded fan-out
  * (~lines-per-order squared), never a cartesian product. The as-of join is
  * an operator Spark lacks natively; implemented as union→repartition-by-
  * key→sort-within-partition→last_value carry-forward, which scales as one
  * shuffle + one sort and never builds a theta join.
  */
object Joins {

  /** hero_vs_hero: pair aggregation of lineitems sharing an order.
    * `played_with` ≈ same-supplier flag (roster equality in the reference). */
  def heroVsHero(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val a = li.select(
      col("l_orderkey").as("k"), col("l_linenumber").as("ln_a"),
      col("l_returnflag").as("hero"), col("l_suppkey").as("supp_a"),
      col("l_quantity").as("qty_a"), col("l_extendedprice").as("price_a"))
    val b = li.select(
      col("l_orderkey").as("k2"), col("l_linenumber").as("ln_b"),
      col("l_returnflag").as("hero2"), col("l_suppkey").as("supp_b"))
    a.join(b, col("k") === col("k2") && col("ln_a") =!= col("ln_b"))
      .groupBy(
        col("hero"), col("hero2"),
        (col("supp_a") === col("supp_b")).as("played_with"))
      .agg(
        count(lit(1)).as("played"),
        dsum(col("qty_a")).as("sum_qty"),
        dsum(col("price_a")).as("sum_price"),
        countDistinct(col("k")).as("matches"))
  }

  def heroVsHeroOracle: String = """
    SELECT a.l_returnflag AS hero, b.l_returnflag AS hero2,
           a.l_suppkey = b.l_suppkey AS played_with,
           count(*) AS played,
           CAST(sum(CAST(a.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(a.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           count(DISTINCT a.l_orderkey) AS matches
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                   AND a.l_linenumber <> b.l_linenumber
    GROUP BY 1, 2, 3"""

  /** As-of join: each event picks the latest order (by o_orderdate, ties by
    * greatest o_orderkey) of the same customer with o_orderdate <= ts.
    * Delegates to the reusable [[AsOf.join]] operator (union-sort-window
    * carry-forward — one shuffle, one sort, no theta join). */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
    val ord = orders(s, d)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
        col("o_orderkey"), col("o_totalprice"))
    AsOf.join(ev, ord, key = "k", time = "t", tieBreak = "o_orderkey",
        carry = Seq("o_orderkey", "o_totalprice"))
      .select(
        col("event_id"), col("k").as("user_id"), tstr(col("t")).as("ts"),
        col("o_orderkey").as("match_order"),
        when(col("o_orderkey").isNotNull, dec(col("o_totalprice")).cast("double"))
          .as("match_price"))
  }

  /** Same as-of query through the custom AsofJoin plan node (one-pass
    * co-partitioned merge); shares [[asofJoinOracle]]'s SQL. */
  def asofJoinNative(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
    val ord = orders(s, d)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
        col("o_orderkey"), col("o_totalprice"))
    AsOf.joinNative(s, ev, ord, key = "k", time = "t", tieBreak = "o_orderkey",
        carry = Seq("o_orderkey", "o_totalprice"))
      .select(
        col("event_id"), col("k").as("user_id"), tstr(col("t")).as("ts"),
        col("o_orderkey").as("match_order"),
        when(col("o_orderkey").isNotNull, dec(col("o_totalprice")).cast("double"))
          .as("match_price"))
  }

  def asofJoinNativeOracle: String = asofJoinOracle

  def asofJoinOracle: String = """
    WITH cand AS (
      SELECT e.event_id, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    SELECT e.event_id, e.user_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           c.o_orderkey AS match_order,
           CAST(CAST(c.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS match_price
    FROM events e
    LEFT JOIN cand c ON c.event_id = e.event_id AND c.rn = 1"""
}

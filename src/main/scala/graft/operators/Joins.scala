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
      col("l_returnflag").as("hero"), col("l_linestatus").as("role"),
      col("l_suppkey").as("supp_a"),
      col("l_quantity").as("qty_a"), col("l_extendedprice").as("price_a"),
      col("l_discount").as("disc_a"), col("l_tax").as("tax_a"))
    val b = li.select(
      col("l_orderkey").as("k2"), col("l_linenumber").as("ln_b"),
      col("l_returnflag").as("hero2"), col("l_linestatus").as("role2"),
      col("l_suppkey").as("supp_b"))
    // full per-pair measure block of crunch_hero_vs_hero.sql:20-37, keyed
    // by (hero, role, hero2, role2, played_with) like the reference's
    // (hero, role, hero2, role2, roster-equality) grouping
    a.join(b, col("k") === col("k2") && col("ln_a") =!= col("ln_b"))
      .groupBy(
        col("hero"), col("role"), col("hero2"), col("role2"),
        (col("supp_a") === col("supp_b")).as("played_with"))
      .agg(
        count(lit(1)).as("played"),
        sum(when(col("qty_a") > 25, 1L).otherwise(0L)).as("wins"),
        sum(dec(col("disc_a")) - dec(lit(0.05))).cast("double").as("trueskill_delta"),
        dsum(col("qty_a")).as("duration"),
        dsum(col("price_a")).as("kills"),
        dsum(col("disc_a")).as("deaths"),
        dsum(col("tax_a")).as("assists"),
        sum(dec(col("price_a")) * (lit(1) - dec(col("disc_a"))))
          .cast("double").as("farm"),
        sum(when(col("ln_a") === 1, 1L).otherwise(0L)).as("crystal_mine_captures"),
        sum(when(col("ln_a") === 2, 1L).otherwise(0L)).as("gold_mine_captures"),
        sum(dec(col("price_a")) * (lit(1) - dec(col("disc_a")))
          * (lit(1) + dec(col("tax_a")))).cast("double").as("gold"),
        sum(when(col("disc_a") > 0.05, 1L).otherwise(0L)).as("surrender"),
        countDistinct(col("k")).as("matches"))
  }

  def heroVsHeroOracle: String = """
    SELECT a.l_returnflag AS hero, a.l_linestatus AS role,
           b.l_returnflag AS hero2, b.l_linestatus AS role2,
           a.l_suppkey = b.l_suppkey AS played_with,
           count(*) AS played,
           CAST(sum(CASE WHEN a.l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS wins,
           CAST(sum(CAST(a.l_discount AS DECIMAL(18,2)) - CAST(0.05 AS DECIMAL(18,2))) AS DOUBLE) AS trueskill_delta,
           CAST(sum(CAST(a.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS duration,
           CAST(sum(CAST(a.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS kills,
           CAST(sum(CAST(a.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS deaths,
           CAST(sum(CAST(a.l_tax AS DECIMAL(18,2))) AS DOUBLE) AS assists,
           CAST(sum(CAST(a.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(a.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS farm,
           CAST(sum(CASE WHEN a.l_linenumber = 1 THEN 1 ELSE 0 END) AS BIGINT) AS crystal_mine_captures,
           CAST(sum(CASE WHEN a.l_linenumber = 2 THEN 1 ELSE 0 END) AS BIGINT) AS gold_mine_captures,
           CAST(sum(CAST(a.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(a.l_discount AS DECIMAL(18,2))) * (1 + CAST(a.l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS gold,
           CAST(sum(CASE WHEN a.l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS surrender,
           count(DISTINCT a.l_orderkey) AS matches
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                   AND a.l_linenumber <> b.l_linenumber
    GROUP BY 1, 2, 3, 4, 5"""

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

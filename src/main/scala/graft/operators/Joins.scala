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
    * `played_with` ≈ same-supplier flag (roster equality in the reference).
    * Every measure depends only on the A row, so the decimal casts,
    * products and flag tests are all resolved PER LINEITEM before the
    * pair fan-out (the established pre-fan-out pattern: ~3× fewer rows
    * see the arithmetic, and the pair stage is pure column sums). */
  def heroVsHero(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val a = li.select(
      col("l_orderkey").as("k"), col("l_linenumber").as("ln_a"),
      col("l_returnflag").as("hero"), col("l_linestatus").as("role"),
      col("l_suppkey").as("supp_a"),
      when(col("l_quantity") > 25, 1L).otherwise(0L).as("win_a"),
      (dec(col("l_discount")) - dec(lit(0.05))).as("ts_a"),
      dec(col("l_quantity")).as("qty_a"),
      dec(col("l_extendedprice")).as("price_a"),
      dec(col("l_discount")).as("disc_a"),
      dec(col("l_tax")).as("tax_a"),
      (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .as("farm_a"),
      (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
        * (lit(1) + dec(col("l_tax")))).as("gold_a"),
      when(col("l_linenumber") === 1, 1L).otherwise(0L).as("mine1_a"),
      when(col("l_linenumber") === 2, 1L).otherwise(0L).as("mine2_a"),
      when(col("l_discount") > 0.05, 1L).otherwise(0L).as("surr_a"))
    val b = li.select(
      col("l_orderkey").as("k2"), col("l_linenumber").as("ln_b"),
      col("l_returnflag").as("hero2"), col("l_linestatus").as("role2"),
      col("l_suppkey").as("supp_b"))
    // full per-pair measure block of crunch_hero_vs_hero.sql:20-37, keyed
    // by (hero, role, hero2, role2, played_with) like the reference's
    // (hero, role, hero2, role2, roster-equality) grouping.
    // shuffle_hash: the pair join is fact × fact (a SELF-join) — both
    // sides co-partition on the match key; broadcasting the B side only
    // looks fine at bench SF
    a.join(b.hint("shuffle_hash"),
      col("k") === col("k2") && col("ln_a") =!= col("ln_b"))
      .groupBy(
        col("hero"), col("role"), col("hero2"), col("role2"),
        (col("supp_a") === col("supp_b")).as("played_with"))
      .agg(
        count(lit(1)).as("played"),
        sum(col("win_a")).as("wins"),
        sum(col("ts_a")).cast("double").as("trueskill_delta"),
        sum(col("qty_a")).cast("double").as("duration"),
        sum(col("price_a")).cast("double").as("kills"),
        sum(col("disc_a")).cast("double").as("deaths"),
        sum(col("tax_a")).cast("double").as("assists"),
        sum(col("farm_a")).cast("double").as("farm"),
        sum(col("mine1_a")).as("crystal_mine_captures"),
        sum(col("mine2_a")).as("gold_mine_captures"),
        sum(col("gold_a")).cast("double").as("gold"),
        sum(col("surr_a")).as("surrender"),
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

  /** hero_vs_hero_full: the reference's COMPLETE pair grain
    * (crunch_hero_vs_hero.sql:4-15) — series range join on the match
    * date (sql:38), skill-tier range join (sql:48), region dim (sql:46),
    * with "all" members on region and skill_tier (the `reg.name = 'all'` /
    * `st.name = 'all'` OR-joins of sql:46-48) — plus the full 17-measure
    * block (sql:17-35). The OR-join "all" expansion is expressed as
    * GROUPING SETS over a single finest-grain pass (two-phase: the Expand
    * multiplies pre-aggregated partials, never the pair fan-out), and the
    * series/tier range joins are broadcast range joins against tiny dims.
    * All measures are algebraic sums, so the two-phase result is
    * bit-identical to grouping the raw pairs — which the single-phase
    * DuckDB oracle proves. */
  def heroVsHeroFull(s: SparkSession, d: String): DataFrame = {
    val series = Dimensions.seriesDim(s)
    val tiers = Dimensions.tiersDim(s)
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
    val qa = col("qa"); val pa = col("pa"); val da = col("da"); val ta = col("ta")
    val pairKeys = Seq(col("series"), col("hero"), col("role"),
      col("hero2"), col("role2"), col("played_with"))
    // order-side dims (player→region chain + the series range join)
    // resolve at ORDER grain before touching the pair fan-out: the
    // ~12× larger pair frame then pays ONE equi-join on the match key
    // instead of carrying every row through four joins and a range scan
    val ordDims = Crunch.orderSide(s, d)
      .join(series, col("o_orderdate").between(col("s_start"), col("s_end")))
      .select(col("o_orderkey"), col("o_totalprice"), col("r_name"), col("series"))
    // Every dim and every cast depends on the A side alone, so ALL of it
    // resolves BEFORE the pair fan-out: the tier range scan and the
    // decimal casts run per lineitem row (not per pair, ~3× more), and —
    // the part that matters at 100 TB — the fanned-out pair frame is
    // never re-shuffled: enriched-A arrives at the self-join already
    // partitioned by the match key, B joins on that same key, and the
    // partial aggregation runs directly on the join output. (The old
    // shape joined dims onto the PAIR frame, which forced the ~3× larger
    // fan-out through another exchange.)
    val aEnriched = a
      .join(tiers, col("qty_a") >= col("lo") && col("qty_a") < col("hi"))
      // shuffle_hash: ordDims is order-grain (fact-scale) — this join
      // establishes the match-key partitioning the pair join reuses
      .join(ordDims.hint("shuffle_hash"), col("k") === col("o_orderkey"))
      // the decimal casts feed 12 of the 17 measures — project them once
      // per lineitem row instead of re-casting inside every aggregate
      .withColumn("qa", dec(col("qty_a")))
      .withColumn("pa", dec(col("price_a")))
      .withColumn("da", dec(col("disc_a")))
      .withColumn("ta", dec(col("tax_a")))
    val partials = aEnriched
      .join(b.hint("shuffle_hash"),
        col("k") === col("k2") && col("ln_a") =!= col("ln_b"))
      .groupBy(col("series"), col("r_name"), col("tier"), col("hero"),
        col("role"), col("hero2"), col("role2"),
        (col("supp_a") === col("supp_b")).as("played_with"))
      .agg(
        count(lit(1)).as("p_played"),
        sum(when(col("qty_a") > 25, 1L).otherwise(0L)).as("p_wins"),
        sum(da - dec(lit(0.05))).as("p_trueskill"),
        sum(qa).as("p_duration"),
        sum(pa).as("p_kills"),
        sum(da).as("p_deaths"),
        sum(ta).as("p_assists"),
        sum(pa * (lit(1) - da)).as("p_farm"),
        sum(when(col("role") === "O", qa).otherwise(dec(lit(0)))).as("p_minion"),
        sum(when(col("qty_a") > 25, 1L).otherwise(0L)).as("p_jungle"),
        sum(when(col("qty_a") <= 25, qa).otherwise(dec(lit(0)))).as("p_nonjungle"),
        sum(when(col("ln_a") === 1, 1L).otherwise(0L)).as("p_cap1"),
        sum(when(col("ln_a") === 2, 1L).otherwise(0L)).as("p_cap2"),
        sum(when(col("ln_a") === 3, 1L).otherwise(0L)).as("p_cap3"),
        sum(when(col("ln_a") === 4, 1L).otherwise(0L)).as("p_cap4"),
        sum(pa * (lit(1) - da) * (lit(1) + ta)).as("p_gold"),
        sum(dec(col("o_totalprice"))).as("p_impact"),
        sum(when(col("disc_a") > 0.05, 1L).otherwise(0L)).as("p_surrender"))
    partials
      .groupingSets(
        Seq(
          pairKeys ++ Seq(col("r_name"), col("tier")),
          pairKeys :+ col("r_name"),
          pairKeys :+ col("tier"),
          pairKeys),
        (pairKeys ++ Seq(col("r_name"), col("tier"))): _*)
      .agg(
        sum(col("p_played")).as("played"),
        sum(col("p_wins")).as("wins"),
        sum(col("p_trueskill")).cast("double").as("trueskill_delta"),
        sum(col("p_duration")).cast("double").as("duration"),
        sum(col("p_kills")).cast("double").as("kills"),
        sum(col("p_deaths")).cast("double").as("deaths"),
        sum(col("p_assists")).cast("double").as("assists"),
        sum(col("p_farm")).cast("double").as("farm"),
        sum(col("p_minion")).cast("double").as("minion_kills"),
        sum(col("p_jungle")).as("jungle_kills"),
        sum(col("p_nonjungle")).cast("double").as("non_jungle_minion_kills"),
        sum(col("p_cap1")).as("crystal_mine_captures"),
        sum(col("p_cap2")).as("gold_mine_captures"),
        sum(col("p_cap3")).as("kraken_captures"),
        sum(col("p_cap4")).as("turret_captures"),
        sum(col("p_gold")).cast("double").as("gold"),
        sum(col("p_impact")).cast("double").as("impact_score"),
        sum(col("p_surrender")).as("surrender"))
      .select(
        Seq(col("series"),
          coalesce(col("r_name"), lit("all")).as("region"),
          coalesce(col("tier"), lit("all")).as("skill_tier"),
          col("hero"), col("role"), col("hero2"), col("role2"),
          col("played_with"), col("played"), col("wins"),
          col("trueskill_delta"), col("duration"), col("kills"),
          col("deaths"), col("assists"), col("farm"), col("minion_kills"),
          col("jungle_kills"), col("non_jungle_minion_kills"),
          col("crystal_mine_captures"), col("gold_mine_captures"),
          col("kraken_captures"), col("turret_captures"), col("gold"),
          col("impact_score"), col("surrender")): _*)
  }

  def heroVsHeroFullOracle: String = {
    val series = Dimensions.seriesValuesSql
    val tiers = Dimensions.tiersValuesSql
    s"""
    WITH pair AS (
      SELECT s.series, r_name, t.tier,
             a.l_returnflag AS hero, a.l_linestatus AS role,
             b.l_returnflag AS hero2, b.l_linestatus AS role2,
             a.l_suppkey = b.l_suppkey AS played_with,
             a.l_quantity AS qty_a, a.l_extendedprice AS price_a,
             a.l_discount AS disc_a, a.l_tax AS tax_a,
             a.l_linenumber AS ln_a, o.o_totalprice
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                     AND a.l_linenumber <> b.l_linenumber
      JOIN orders o ON a.l_orderkey = o.o_orderkey
      JOIN customer ON o.o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN (VALUES $series) AS s(series, s_start, s_end)
        ON o.o_orderdate BETWEEN s_start AND s_end
      JOIN (VALUES $tiers) AS t(tier, lo, hi)
        ON a.l_quantity >= lo AND a.l_quantity < hi)
    SELECT series,
      coalesce(r_name, 'all') AS region,
      coalesce(tier, 'all') AS skill_tier,
      hero, role, hero2, role2, played_with,
      count(*) AS played,
      CAST(sum(CASE WHEN qty_a > 25 THEN 1 ELSE 0 END) AS BIGINT) AS wins,
      CAST(sum(CAST(disc_a AS DECIMAL(18,2)) - CAST(0.05 AS DECIMAL(18,2))) AS DOUBLE) AS trueskill_delta,
      CAST(sum(CAST(qty_a AS DECIMAL(18,2))) AS DOUBLE) AS duration,
      CAST(sum(CAST(price_a AS DECIMAL(18,2))) AS DOUBLE) AS kills,
      CAST(sum(CAST(disc_a AS DECIMAL(18,2))) AS DOUBLE) AS deaths,
      CAST(sum(CAST(tax_a AS DECIMAL(18,2))) AS DOUBLE) AS assists,
      CAST(sum(CAST(price_a AS DECIMAL(18,2)) * (1 - CAST(disc_a AS DECIMAL(18,2)))) AS DOUBLE) AS farm,
      CAST(sum(CASE WHEN role = 'O' THEN CAST(qty_a AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS minion_kills,
      CAST(sum(CASE WHEN qty_a > 25 THEN 1 ELSE 0 END) AS BIGINT) AS jungle_kills,
      CAST(sum(CASE WHEN qty_a <= 25 THEN CAST(qty_a AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS non_jungle_minion_kills,
      CAST(sum(CASE WHEN ln_a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS crystal_mine_captures,
      CAST(sum(CASE WHEN ln_a = 2 THEN 1 ELSE 0 END) AS BIGINT) AS gold_mine_captures,
      CAST(sum(CASE WHEN ln_a = 3 THEN 1 ELSE 0 END) AS BIGINT) AS kraken_captures,
      CAST(sum(CASE WHEN ln_a = 4 THEN 1 ELSE 0 END) AS BIGINT) AS turret_captures,
      CAST(sum(CAST(price_a AS DECIMAL(18,2)) * (1 - CAST(disc_a AS DECIMAL(18,2))) * (1 + CAST(tax_a AS DECIMAL(18,2)))) AS DOUBLE) AS gold,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS impact_score,
      CAST(sum(CASE WHEN disc_a > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS surrender
    FROM pair
    GROUP BY GROUPING SETS (
      (series, hero, role, hero2, role2, played_with, r_name, tier),
      (series, hero, role, hero2, role2, played_with, r_name),
      (series, hero, role, hero2, role2, played_with, tier),
      (series, hero, role, hero2, role2, played_with))"""
  }

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

package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's point-table aggregations, Spark-first.
  *
  * Reference: /root/reference/crunch_global.sql:1-75 (global_point),
  * crunch_player.sql:1-45 (player_point), crunch_phases.sql (70-SUM wide
  * agg), crunch_phases_bans.sql (ban counts). The MariaDB originals are
  * incremental INSERT..ON DUPLICATE upserts; here each is a declarative
  * aggregation (Catalyst gets full pushdown/pruning freedom) and the
  * incremental-merge semantics live in [[Cruncher]] / `upsert_merge`.
  *
  * Scale notes: nation/region are broadcast (tiny dims); the
  * lineitem⋈orders join shuffles on the order key — the natural 100 TB
  * co-partitioning — and all measures are map-side-combinable sums, so the
  * shuffle carries pre-aggregated partials, not raw fact rows.
  */
object Crunch {

  /** Order-side dims resolved at ORDER grain: orders (match) ⋈ customer
    * (player) ⋈ nation ⋈ region. Attaching player/region to the ~4×
    * smaller order table before the fact join keeps the dim-join chain
    * (and any order-level range join stacked on top) off the fact
    * fan-out — the fact side then pays exactly one equi-join. */
  def orderSide(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))

  /** Fact spine: lineitem (participant+stats) ⋈ order-side dims,
    * mirroring participant ⋈ participant_stats ⋈ dims of
    * crunch_global.sql:32-44. The shuffle_hash hint PINS the promised
    * shuffle-on-order-key plan: both sides are fact-scale, and at small
    * SF the planner's size estimates otherwise flip this into
    * broadcasting a raw fact scan (PlanAuditSpec nets every query). */
  def spine(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orderSide(s, d).hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))

  /** global_point: multi-dimensional multi-measure aggregation
    * (crunch_global.sql:14-31's 18 measures, re-keyed to the star schema:
    * region≈region, returnflag≈game_mode, linestatus≈role).
    *
    * The items side is OPTIONAL in the reference — `left outer join
    * participant_items` with `coalesce(p_i.surrender, 0)` measures
    * (crunch_global.sql:33-35): a participant with no items row still
    * aggregates, its item measures contributing 0. Modeled as the left
    * join to `part` with a coalesced `item_uses` measure; invisible on
    * FK-clean testdata, row-preserving on real data (DanglingItemsSpec
    * proves it against a corpus with the items rows knocked out). */
  def global(s: SparkSession, d: String): DataFrame =
    spine(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"), "left")
      .groupBy(col("r_name").as("region"), col("l_returnflag").as("game_mode"),
               col("l_linestatus").as("role"))
      .agg(
        count(lit(1)).as("played"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("wins"),
        dsum(col("l_quantity")).as("time_spent"),
        dsum(col("l_extendedprice")).as("kills"),
        dsum(col("l_discount")).as("deaths"),
        dsum(col("l_tax")).as("assists"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("farm"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
            * (lit(1) + dec(col("l_tax")))).cast("double").as("gold"),
        sum(when(col("l_linestatus") === "O", dec(col("l_quantity")))
          .otherwise(dec(lit(0)))).cast("double").as("minion_kills"),
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("jungle_kills"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("surrender"),
        dsum(col("o_totalprice")).as("impact_score"),
        countDistinct(col("o_orderkey")).as("matches"),
        countDistinct(col("c_custkey")).as("players"),
        max(dec(col("l_extendedprice"))).cast("double").as("best_kill"),
        min(dec(col("l_extendedprice"))).cast("double").as("worst_kill"),
        sum(coalesce(dec(col("p_retailprice")), dec(lit(0))))
          .cast("double").as("item_uses"))

  def globalOracle: String = """
    SELECT r_name AS region, l_returnflag AS game_mode, l_linestatus AS role,
      count(*) AS played,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS time_spent,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS kills,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS deaths,
      CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS assists,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS farm,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS gold,
      CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS minion_kills,
      CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS jungle_kills,
      CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS surrender,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS impact_score,
      count(DISTINCT o_orderkey) AS matches,
      count(DISTINCT c_custkey) AS players,
      CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS best_kill,
      CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS worst_kill,
      CAST(sum(coalesce(CAST(p_retailprice AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2)))) AS DOUBLE) AS item_uses
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    LEFT JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2, 3"""

  /** player_point (crunch_player.sql:1-45): same spine keyed by player;
    * carries the `updated_at = greatest(...)` merge semantics as max(). */
  def player(s: SparkSession, d: String): DataFrame =
    // joins exactly what the measures need (lineitem⋈orders⋈customer) —
    // the spine's nation/region dims are unused here and would both waste
    // two broadcast joins and silently drop FK-dangling customers that
    // the oracle keeps
    lineitem(s, d)
      // shuffle_hash: orders is fact-scale — never its raw scan broadcast
      .join(orders(s, d).hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey").as("player_id"), col("c_name").as("player_name"))
      .agg(
        count(lit(1)).as("played"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("wins"),
        sum(dec(col("l_discount")) - dec(lit(0.05))).cast("double").as("trueskill_delta"),
        dsum(col("l_quantity")).as("time_spent"),
        dsum(col("l_extendedprice")).as("kills"),
        dsum(col("l_discount")).as("deaths"),
        dsum(col("l_tax")).as("assists"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("farm"),
        sum(when(col("l_linestatus") === "O", dec(col("l_quantity")))
          .otherwise(dec(lit(0)))).cast("double").as("minion_kills"),
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("jungle_kills"),
        sum(when(col("l_quantity") <= 25, dec(col("l_quantity")))
          .otherwise(dec(lit(0)))).cast("double").as("non_jungle_minion_kills"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * (lit(1) + dec(col("l_tax")))).cast("double").as("gold"),
        dsum(col("o_totalprice")).as("impact_score"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("surrender"),
        tstr(max(col("o_orderdate"))).as("updated_at"),
        countDistinct(col("o_orderkey")).as("matches"))

  def playerOracle: String = """
    SELECT c_custkey AS player_id, c_name AS player_name,
      count(*) AS played,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2)) - CAST(0.05 AS DECIMAL(18,2))) AS DOUBLE) AS trueskill_delta,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS time_spent,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS kills,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS deaths,
      CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS assists,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS farm,
      CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS minion_kills,
      CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS jungle_kills,
      CAST(sum(CASE WHEN l_quantity <= 25 THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS non_jungle_minion_kills,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS gold,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS impact_score,
      CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS surrender,
      strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS updated_at,
      count(DISTINCT o_orderkey) AS matches
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2"""

  /** Filter-dimension definitions (crunch_global.sql:38's `filter` table):
    * each named filter selects a set of matches. The reference populates
    * `global_point_filters` upstream; here the mapping table is DERIVED
    * from order predicates as its stand-in generator — the query below
    * consumes only the (match, filter) mapping frame, so swapping in an
    * externally-populated table changes nothing. */
  val filterDefs: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    ("urgent", col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
    ("bulk", col("o_totalprice") > 150000),
    ("modern", col("o_orderdate") >= to_date(lit("1997-01-01"))))

  val filterDefsSql: Seq[(String, String)] = Seq(
    ("urgent", "o_orderpriority IN ('1-URGENT', '2-HIGH')"),
    ("bulk", "o_totalprice > 150000"),
    ("modern", "o_orderdate >= DATE '1997-01-01'"))

  /** global_point_filters (crunch_global.sql:38): the match→filter
    * mapping table — one (o_orderkey, filter) row per membership, built
    * in ONE orders scan via a compacted when-array explode. */
  def globalPointFilters(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(col("o_orderkey"),
      explode(array_compact(array(
        filterDefs.map { case (n, p) => when(p, lit(n)) }: _*))).as("filter"))

  /** The reference's FULL global_point shape (crunch_global.sql:1-75):
    * series range join (created_at BETWEEN s.start AND s.end), skill-tier
    * range join, regex build classification (item_grants RLIKE), the
    * FILTER dimension (f.name = 'all' OR f.id IN (SELECT ... FROM
    * global_point_filters WHERE match_api_id = p.match_api_id),
    * crunch_global.sql:38 — a full member of the group key), and the
    * "all" dimension expansion — which the reference produces with
    * chained OR-joins that multiply every row through every dim table,
    * and which is expressed here as ONE finest-grain pass + grouping
    * sets (the same 2^5 expansion per filter member, done by Expand
    * after the joins, so dims never join non-equi). 18 measures matching
    * crunch_global.sql's measure block, re-keyed to the star schema.
    *
    * Filter-dimension scale shape: membership is resolved at ORDER grain
    * (mapping → collect_set → one equi-join), the membership SET rides
    * the partial aggregation as a group key, and the fan-out to
    * individual filter members (plus the unconditional 'all' member)
    * happens by exploding PARTIAL rows — a fact row is never multiplied
    * by its filter count, so the semantic fan-out costs hundreds of
    * partial-row copies instead of a second pass over the fact table. */
  def globalFull(s: SparkSession, d: String): DataFrame = {
    val series = Dimensions.seriesDim(s)
    val tiers = Dimensions.tiersDim(s)
    val build = when(col("p_type").rlike("^ECONOMY"), "economy")
      .when(col("p_type").rlike("^PROMO"), "promo")
      .when(col("p_type").rlike("^(SMALL|MEDIUM)"), "compact")
      .otherwise("other")
    val q  = dec(col("l_quantity"))
    val pr = dec(col("l_extendedprice"))
    val di = dec(col("l_discount"))
    val tx = dec(col("l_tax"))
    // Two-phase rollup (the scale-critical shape): aggregate ONCE at the
    // finest dimension grain — the Expand that CUBE needs then multiplies
    // a few hundred partial rows, not the joined fact table — and CUBE
    // re-aggregates the partials. Every measure is algebraic (sums and
    // counts; the ROUND applies after the final sum), so the two-phase
    // result is bit-identical to cubing the raw rows, which the unchanged
    // DuckDB oracle (single-phase CUBE) proves.
    // the items side is optional (crunch_global.sql:33-35): left join, and
    // a missing p_type lands in the "other" build via the CASE fallthrough.
    // The series range join runs at ORDER grain (inside orderSide's
    // output, before the fact join) — range-classifying 150k orders, not
    // 600k fact rows, since each order hits exactly one year window.
    // filter membership at ORDER grain: mapping table → per-order set
    // (one mapping-sized shuffle), left-joined so an order in no filter
    // list still lands in the 'all' member
    val memb = globalPointFilters(s, d)
      .groupBy(col("o_orderkey")).agg(collect_set(col("filter")).as("fs"))
      .withColumnRenamed("o_orderkey", "m_orderkey")
    // The fact join MUST stay a shuffle join: both sides are fact-scale
    // (orders ≈ matches, lineitem ≈ participants — both grow with the
    // corpus), and without the hint the planner's size estimate of the
    // memb-joined order side goes unknown, flipping it into BROADCASTING
    // LINEITEM — fine at sf0.1, an instant OOM at 100 TB (and even
    // locally the 600k-row hashed relation was ~2.5 s of the query).
    // SHUFFLE_HASH on the order side: co-partition both sides on the
    // order key, build the hash on the smaller (order-grain) side.
    val base = lineitem(s, d)
      .join(orderSide(s, d)
          .join(series, col("o_orderdate").between(col("s_start"), col("s_end")))
          // memb is ORDER-grain (one row per order in ≥1 filter list) —
          // aggregated but still fact-scale, so it shuffles too
          .join(memb.hint("shuffle_hash"),
            col("o_orderkey") === col("m_orderkey"), "left")
          .hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"), "left")
      .join(tiers, col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .withColumn("build", build)
      .withColumn("fset", array_sort(concat(
        coalesce(col("fs"), array().cast("array<string>")), array(lit("all")))))
      .groupBy(col("fset"), col("r_name"), col("l_returnflag"), col("l_linestatus"),
        col("tier"), col("build"))
      .agg(
        count(lit(1)).as("p_played"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("p_wins"),
        sum(di - dec(lit(0.05))).as("p_trueskill"),
        sum(q).as("p_qty"),
        sum(pr).as("p_price"),
        sum(di).as("p_disc"),
        sum(tx).as("p_tax"),
        sum(pr * (lit(1) - di)).as("p_farm"),
        sum(when(col("l_linestatus") === "O", q).otherwise(dec(lit(0)))).as("p_minion"),
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("p_jungle"),
        sum(when(col("l_quantity") <= 25, q).otherwise(dec(lit(0)))).as("p_nonjungle"),
        sum(when(col("l_linenumber") === 1, 1L).otherwise(0L)).as("p_cap1"),
        sum(when(col("l_linenumber") === 2, 1L).otherwise(0L)).as("p_cap2"),
        sum(when(col("l_linenumber") === 3, 1L).otherwise(0L)).as("p_cap3"),
        sum(when(col("l_linenumber") === 4, 1L).otherwise(0L)).as("p_cap4"),
        sum(pr * (lit(1) - di) * (lit(1) + tx)).as("p_gold"),
        sum(dec(col("o_totalprice"))).as("p_impact"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("p_surrender"))
    // fan out each PARTIAL row to its filter members ∪ {'all'}, then
    // grouping-sets with the filter pinned in every set: the filter is an
    // explicit dimension member (never a rollup null), the other five
    // dims get the full 2^5 'all' expansion
    val dims = Seq(col("r_name"), col("l_returnflag"), col("l_linestatus"),
      col("tier"), col("build"))
    val sets = (0 until 32).map { m =>
      col("filter") +: dims.zipWithIndex.collect {
        case (c, i) if ((m >> i) & 1) == 1 => c }
    }.toSeq
    base
      .withColumn("filter", explode(col("fset"))).drop("fset")
      .groupingSets(sets, (col("filter") +: dims): _*)
      .agg(
        sum(col("p_played")).as("played"),
        sum(col("p_wins")).as("wins"),
        sum(col("p_trueskill")).cast("double").as("trueskill_delta"),
        sum(col("p_qty")).cast("double").as("time_spent"),
        sum(col("p_price")).cast("double").as("kills"),
        sum(col("p_disc")).cast("double").as("deaths"),
        sum(col("p_tax")).cast("double").as("assists"),
        sum(col("p_farm")).cast("double").as("farm"),
        sum(col("p_minion")).cast("double").as("minion_kills"),
        sum(col("p_jungle")).as("jungle_kills"),
        sum(col("p_nonjungle")).cast("double").as("non_jungle_minion_kills"),
        sum(col("p_cap1")).as("crystal_mine_captures"),
        sum(col("p_cap2")).as("gold_mine_captures"),
        sum(col("p_cap3")).as("kraken_captures"),
        sum(col("p_cap4")).as("turret_captures"),
        sum(col("p_gold")).cast("double").as("gold"),
        round(sum(col("p_impact"))).cast("long").as("impact_score"),
        sum(col("p_surrender")).as("surrender"))
      .select(
        col("filter"),
        coalesce(col("r_name"), lit("all")).as("region"),
        coalesce(col("l_returnflag"), lit("all")).as("game_mode"),
        coalesce(col("l_linestatus"), lit("all")).as("role"),
        coalesce(col("tier"), lit("all")).as("skill_tier"),
        coalesce(col("build"), lit("all")).as("build"),
        col("played"), col("wins"), col("trueskill_delta"), col("time_spent"),
        col("kills"), col("deaths"), col("assists"), col("farm"),
        col("minion_kills"), col("jungle_kills"), col("non_jungle_minion_kills"),
        col("crystal_mine_captures"), col("gold_mine_captures"),
        col("kraken_captures"), col("turret_captures"), col("gold"),
        col("impact_score"), col("surrender"))
  }

  def globalFullOracle: String = {
    val series = Dimensions.seriesValuesSql
    val tiers = Dimensions.tiersValuesSql
    val gpf = filterDefsSql.map { case (n, p) =>
      s"SELECT o_orderkey, '$n' AS filter FROM orders WHERE $p"
    }.mkString("\n      UNION ALL ")
    s"""
    WITH gpf AS (
      $gpf),
    gpfa AS (
      SELECT o_orderkey, filter FROM gpf
      UNION ALL SELECT o_orderkey, 'all' AS filter FROM orders),
    fact AS (
      SELECT o_orderkey, r_name, l_returnflag, l_linestatus, t.tier,
        CASE WHEN regexp_matches(p_type, '^ECONOMY') THEN 'economy'
             WHEN regexp_matches(p_type, '^PROMO') THEN 'promo'
             WHEN regexp_matches(p_type, '^(SMALL|MEDIUM)') THEN 'compact'
             ELSE 'other' END AS build,
        l_quantity, l_extendedprice, l_discount, l_tax, l_linenumber,
        o_orderstatus, o_totalprice
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      LEFT JOIN part ON l_partkey = p_partkey
      JOIN (VALUES $series) AS s(series, s_start, s_end)
        ON o_orderdate BETWEEN s_start AND s_end
      JOIN (VALUES $tiers) AS t(tier, lo, hi)
        ON l_quantity >= lo AND l_quantity < hi),
    ffact AS (
      SELECT f.*, g.filter FROM fact f JOIN gpfa g ON f.o_orderkey = g.o_orderkey)
    SELECT
      filter,
      coalesce(r_name, 'all') AS region,
      coalesce(l_returnflag, 'all') AS game_mode,
      coalesce(l_linestatus, 'all') AS role,
      coalesce(tier, 'all') AS skill_tier,
      coalesce(build, 'all') AS build,
      count(*) AS played,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2)) - CAST(0.05 AS DECIMAL(18,2))) AS DOUBLE) AS trueskill_delta,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS time_spent,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS kills,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS deaths,
      CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS assists,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS farm,
      CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS minion_kills,
      CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS jungle_kills,
      CAST(sum(CASE WHEN l_quantity <= 25 THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS non_jungle_minion_kills,
      CAST(sum(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) AS BIGINT) AS crystal_mine_captures,
      CAST(sum(CASE WHEN l_linenumber = 2 THEN 1 ELSE 0 END) AS BIGINT) AS gold_mine_captures,
      CAST(sum(CASE WHEN l_linenumber = 3 THEN 1 ELSE 0 END) AS BIGINT) AS kraken_captures,
      CAST(sum(CASE WHEN l_linenumber = 4 THEN 1 ELSE 0 END) AS BIGINT) AS turret_captures,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS gold,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))) AS BIGINT) AS impact_score,
      CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS surrender
    FROM ffact
    GROUP BY filter, CUBE (r_name, l_returnflag, l_linestatus, tier, build)"""
  }

  /** Series dim carrying the reference's `show_in_web` visibility flag
    * (crunch_global.sql:43's `s.show_in_web = true`): the flag is series
    * DATA, so which rollup members a fact row feeds depends on which
    * series window it lands in. Default visibility: even years. */
  def gatedSeriesDim(s: SparkSession, visible: Int => Boolean): DataFrame = {
    import s.implicits._
    broadcast(Dimensions.seriesYears
      .map(y => (s"y$y", s"$y-01-01", s"$y-12-31", visible(y)))
      .toDF("series", "s_start", "s_end", "s_show")
      .select(col("series"), to_date(col("s_start")).as("s_start"),
        to_date(col("s_end")).as("s_end"), col("s_show")))
  }

  def defaultVisible: Int => Boolean = _ % 2 == 0

  /** Conditional dimension membership (crunch_global.sql:43-59): the
    * CONCRETE game-mode and skill-tier members exist only when the
    * containing series is visible (`(p.game_mode_id = gm.id and
    * s.show_in_web = true) or gm.name = 'all'`), and concrete BUILD
    * members additionally require the game-mode member to be 'all' with
    * the row's mode in the casual/ranked analog (crunch_global.sql:45-50)
    * — a dimension whose membership depends on ANOTHER dimension's
    * rollup state. A row in a hidden series still feeds every 'all'
    * member, so grand totals are visibility-invariant (GatingSpec).
    *
    * Expressed as per-row member ARRAYS exploded over PARTIAL rows: the
    * partial aggregate runs at the finest concrete grain (series, flag,
    * mode, tier, build) and the conditional 1-or-2-way fan-out per gated
    * dim multiplies a few hundred partials — the OR-join's semantics
    * without ever multiplying the fact scan. */
  def globalGated(s: SparkSession, d: String): DataFrame =
    globalGated(s, d, defaultVisible)

  def globalGated(s: SparkSession, d: String, visible: Int => Boolean): DataFrame = {
    val series = gatedSeriesDim(s, visible)
    val tiers = Dimensions.tiersDim(s)
    val build = when(col("p_type").rlike("^ECONOMY"), "economy")
      .when(col("p_type").rlike("^PROMO"), "promo")
      .when(col("p_type").rlike("^(SMALL|MEDIUM)"), "compact")
      .otherwise("other")
    // shuffle_hash on the order side for the same reason as globalFull:
    // the BNLJ-range-joined order side has no size estimate, and without
    // the hint the planner broadcasts LINEITEM — the fact table
    val base = lineitem(s, d)
      .join(orders(s, d)
          .join(series, col("o_orderdate").between(col("s_start"), col("s_end")))
          .hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"), "left")
      .join(tiers, col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .withColumn("build", build)
      .groupBy(col("series"), col("s_show"), col("l_returnflag"),
        col("tier"), col("build"))
      .agg(
        count(lit(1)).as("p_n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("p_wins"),
        sum(dec(col("l_quantity"))).as("p_qty"),
        sum(dec(col("l_extendedprice"))).as("p_price"))
    base
      .withColumn("gm_m", explode(when(col("s_show"),
        array(col("l_returnflag"), lit("all"))).otherwise(array(lit("all")))))
      .withColumn("t_m", explode(when(col("s_show"),
        array(col("tier"), lit("all"))).otherwise(array(lit("all")))))
      .withColumn("b_m", explode(when(
        col("s_show") && col("gm_m") === "all" &&
          col("l_returnflag").isin("N", "R"),
        array(col("build"), lit("all"))).otherwise(array(lit("all")))))
      .groupBy(col("series"), col("gm_m"), col("t_m"), col("b_m"))
      .agg(
        sum(col("p_n")).as("played"),
        sum(col("p_wins")).as("wins"),
        sum(col("p_qty")).cast("double").as("sum_qty"),
        sum(col("p_price")).cast("double").as("sum_price"))
      .select(col("series"), col("gm_m").as("game_mode"),
        col("t_m").as("skill_tier"), col("b_m").as("build"),
        col("played"), col("wins"), col("sum_qty"), col("sum_price"))
  }

  def globalGatedOracle: String = {
    val seriesShow = Dimensions.seriesYears.map { y =>
      s"('y$y', DATE '$y-01-01', DATE '$y-12-31', ${defaultVisible(y)})"
    }.mkString(", ")
    val tiers = Dimensions.tiersValuesSql
    val meas = "l_quantity, l_extendedprice, o_orderstatus"
    s"""
    WITH fact AS (
      SELECT s.series, s.s_show, l_returnflag AS rf, t.tier,
        CASE WHEN regexp_matches(p_type, '^ECONOMY') THEN 'economy'
             WHEN regexp_matches(p_type, '^PROMO') THEN 'promo'
             WHEN regexp_matches(p_type, '^(SMALL|MEDIUM)') THEN 'compact'
             ELSE 'other' END AS build,
        $meas
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN (VALUES $seriesShow) AS s(series, s_start, s_end, s_show)
        ON o_orderdate BETWEEN s_start AND s_end
      LEFT JOIN part ON l_partkey = p_partkey
      JOIN (VALUES $tiers) AS t(tier, lo, hi)
        ON l_quantity >= lo AND l_quantity < hi),
    m AS (
      SELECT series, rf AS gm_m, tier AS t_m, 'all' AS b_m, $meas
        FROM fact WHERE s_show
      UNION ALL SELECT series, rf, 'all', 'all', $meas FROM fact WHERE s_show
      UNION ALL SELECT series, 'all', tier, build, $meas
        FROM fact WHERE s_show AND rf IN ('N', 'R')
      UNION ALL SELECT series, 'all', tier, 'all', $meas FROM fact WHERE s_show
      UNION ALL SELECT series, 'all', 'all', build, $meas
        FROM fact WHERE s_show AND rf IN ('N', 'R')
      UNION ALL SELECT series, 'all', 'all', 'all', $meas FROM fact)
    SELECT series, gm_m AS game_mode, t_m AS skill_tier, b_m AS build,
      count(*) AS played,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM m GROUP BY 1, 2, 3, 4"""
  }

  /** Phase-window dim (crunch_phases.sql:14-15, `ph.start`/`ph.end`):
    * the reference's participant_phases rows carry per-game-phase windows
    * and the aggregate is KEYED by the window bounds. Here the in-match
    * sequence is the line number, and the windows are [start, end) slices
    * of it — range-joined from a tiny broadcast dim, exactly like the
    * skill-tier ranges. */
  val phaseWindows: Seq[(String, Int, Int)] =
    Seq(("early", 1, 3), ("mid", 3, 5), ("late", 5, 8))

  /** global_point_phase (crunch_phases.sql): rows per PHASE WINDOW
    * (grouped by ph.start/ph.end like the reference, not by a flag
    * column), each with one hash aggregate of ~70 SUM columns —
    * exercises wide-codegen, all map-side combinable. */
  def phases(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val q  = dec(col("l_quantity"))
    val p  = dec(col("l_extendedprice"))
    val di = dec(col("l_discount"))
    val tx = dec(col("l_tax"))
    val measures =
      Seq(
        count(lit(1)).as("played"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returns")) ++
      // dmg_* family: per-flag conditional decimal sums (crunch_phases.sql:32-60)
      (for (f <- Seq("A", "N", "R"); (nm, c) <- Seq("qty" -> q, "price" -> p, "disc" -> di, "tax" -> tx))
        yield sum(when(col("l_returnflag") === f, c).otherwise(dec(lit(0))))
          .cast("double").as(s"dmg_${nm}_$f")) ++
      // ability_* family: per-linestatus conditional sums
      (for (st <- Seq("O", "F"); (nm, c) <- Seq("qty" -> q, "price" -> p, "disc" -> di, "tax" -> tx))
        yield sum(when(col("l_linestatus") === st, c).otherwise(dec(lit(0))))
          .cast("double").as(s"ability_${nm}_$st")) ++
      // ln_* family: per-line-slot conditional sums — the reference's
      // per-item dynamic columns (worker.js:96-112) at phase grain; takes
      // the aggregate to the reference's ~70-SUM width in ONE hash agg
      (for (ln <- 1 to 7; (nm, c) <- Seq("cnt" -> lit(null), "qty" -> q, "price" -> p))
        yield (if (nm == "cnt")
          sum(when(col("l_linenumber") === ln, 1L).otherwise(0L))
        else
          sum(when(col("l_linenumber") === ln, c).otherwise(dec(lit(0)))).cast("double"))
          .as(s"ln${ln}_$nm")) ++
      Seq(
        sum(p * (lit(1) - di)).cast("double").as("net_price"),
        sum(p * (lit(1) - di) * (lit(1) + tx)).cast("double").as("charged"),
        sum(q * tx).cast("double").as("qty_tax"),
        sum(q * di).cast("double").as("qty_disc"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"),
        dsum(col("l_tax")).as("sum_tax"),
        sum(col("l_linenumber").cast("long")).as("sum_line"),
        max(col("l_orderkey")).as("max_order"),
        min(col("l_orderkey")).as("min_order"),
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_suppkey")).as("supps"),
        sum(when(col("l_quantity") > 40, 1L).otherwise(0L)).as("heavy"),
        sum(when(col("l_quantity") < 10, 1L).otherwise(0L)).as("light"))
    val ph = broadcast(phaseWindows.toDF("phase", "ph_start", "ph_end"))
    lineitem(s, d)
      .join(ph, col("l_linenumber") >= col("ph_start") &&
        col("l_linenumber") < col("ph_end"))
      .groupBy(col("phase"), col("ph_start"), col("ph_end"))
      .agg(measures.head, measures.tail: _*)
  }

  def phasesOracle: String = {
    val meas = Seq(
      "qty" -> "CAST(l_quantity AS DECIMAL(18,2))",
      "price" -> "CAST(l_extendedprice AS DECIMAL(18,2))",
      "disc" -> "CAST(l_discount AS DECIMAL(18,2))",
      "tax" -> "CAST(l_tax AS DECIMAL(18,2))")
    val dmg = for (f <- Seq("A", "N", "R"); (nm, e) <- meas)
      yield s"CAST(sum(CASE WHEN l_returnflag = '$f' THEN $e ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS dmg_${nm}_$f"
    val abil = for (st <- Seq("O", "F"); (nm, e) <- meas)
      yield s"CAST(sum(CASE WHEN l_linestatus = '$st' THEN $e ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS ability_${nm}_$st"
    val lnf = for (ln <- 1 to 7; (nm, e) <- meas.take(2).+:(("cnt", "")))
      yield
        if (nm == "cnt")
          s"CAST(sum(CASE WHEN l_linenumber = $ln THEN 1 ELSE 0 END) AS BIGINT) AS ln${ln}_cnt"
        else
          s"CAST(sum(CASE WHEN l_linenumber = $ln THEN $e ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS ln${ln}_$nm"
    val windows = phaseWindows
      .map { case (n, a, b) => s"('$n', $a, $b)" }.mkString(", ")
    s"""
    SELECT phase, ph_start, ph_end,
      count(*) AS played,
      CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returns,
      ${(dmg ++ abil ++ lnf).mkString(",\n      ")},
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS net_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS charged,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS qty_tax,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS qty_disc,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
      CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_tax,
      CAST(sum(l_linenumber) AS BIGINT) AS sum_line,
      max(l_orderkey) AS max_order,
      min(l_orderkey) AS min_order,
      count(DISTINCT l_partkey) AS parts,
      count(DISTINCT l_suppkey) AS supps,
      CAST(sum(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT) AS heavy,
      CAST(sum(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS light
    FROM lineitem
    JOIN (VALUES $windows) AS ph(phase, ph_start, ph_end)
      ON l_linenumber >= ph_start AND l_linenumber < ph_end
    GROUP BY 1, 2, 3"""
  }

  /** global_point_bans (crunch_phases_bans.sql): counts keyed by the
    * "banned" dimension — here events keyed by event_type, with the JSON
    * props payload surfaced like the reference's dynamic columns. */
  def bans(s: SparkSession, d: String): DataFrame =
    events(s, d)
      // the reference's `h.name = 'all'` OR-join on the ban dim
      // (crunch_phases_bans.sql:18) → rollup over the single dim
      .rollup(col("event_type"))
      .agg(
        count(lit(1)).as("played"),
        countDistinct(col("user_id")).as("users"),
        dsum(col("value")).as("total_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("props_k"))
      .select(coalesce(col("event_type"), lit("all")).as("banned"),
        col("played"), col("users"), col("total_value"), col("props_k"))

  def bansOracle: String = """
    SELECT coalesce(event_type, 'all') AS banned,
      count(*) AS played,
      count(DISTINCT user_id) AS users,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS props_k
    FROM events GROUP BY ROLLUP (event_type)"""
}

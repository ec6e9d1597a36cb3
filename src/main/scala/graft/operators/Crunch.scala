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

  /** Fact spine: lineitem (participant+stats) ⋈ orders (match) ⋈ customer
    * (player) ⋈ nation ⋈ region, mirroring participant ⋈ participant_stats
    * ⋈ dims of crunch_global.sql:32-44. */
  def spine(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))

  /** global_point: multi-dimensional multi-measure aggregation
    * (crunch_global.sql:14-31's 18 measures, re-keyed to the star schema:
    * region≈region, returnflag≈game_mode, linestatus≈role). */
  def global(s: SparkSession, d: String): DataFrame =
    spine(s, d)
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
        min(dec(col("l_extendedprice"))).cast("double").as("worst_kill"))

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
      CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS worst_kill
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2, 3"""

  /** player_point (crunch_player.sql:1-45): same spine keyed by player;
    * carries the `updated_at = greatest(...)` merge semantics as max(). */
  def player(s: SparkSession, d: String): DataFrame =
    spine(s, d)
      .groupBy(col("c_custkey").as("player_id"), col("c_name").as("player_name"))
      .agg(
        count(lit(1)).as("played"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("wins"),
        dsum(col("l_quantity")).as("time_spent"),
        dsum(col("l_extendedprice")).as("kills"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("farm"),
        dsum(col("o_totalprice")).as("gold"),
        tstr(max(col("o_orderdate"))).as("updated_at"),
        countDistinct(col("o_orderkey")).as("matches"))

  def playerOracle: String = """
    SELECT c_custkey AS player_id, c_name AS player_name,
      count(*) AS played,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS time_spent,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS kills,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS farm,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gold,
      strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS updated_at,
      count(DISTINCT o_orderkey) AS matches
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2"""

  /** global_point_phase (crunch_phases.sql): one hash aggregate with 40
    * SUM columns — exercises wide-codegen, all map-side combinable. */
  def phases(s: SparkSession, d: String): DataFrame = {
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
    lineitem(s, d)
      .groupBy(col("l_returnflag").as("phase"))
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
    s"""
    SELECT l_returnflag AS phase,
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
    FROM lineitem GROUP BY 1"""
  }

  /** global_point_bans (crunch_phases_bans.sql): counts keyed by the
    * "banned" dimension — here events keyed by event_type, with the JSON
    * props payload surfaced like the reference's dynamic columns. */
  def bans(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type").as("banned"))
      .agg(
        count(lit(1)).as("played"),
        countDistinct(col("user_id")).as("users"),
        dsum(col("value")).as("total_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("props_k"))

  def bansOracle: String = """
    SELECT event_type AS banned,
      count(*) AS played,
      count(DISTINCT user_id) AS users,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS props_k
    FROM events GROUP BY 1"""
}

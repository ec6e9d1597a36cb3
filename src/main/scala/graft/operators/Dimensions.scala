package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension-expansion semantics of the reference, done the scale-safe way.
  *
  * crunch_global.sql:38-44 produces "all" rollup members by OR-joins
  * (`p.hero_id = h.id or h.name = 'all'`), which a distributed engine would
  * execute as a row-multiplying BroadcastNestedLoopJoin. Here the identical
  * result set comes from GROUPING SETS over a single finest-grain pass —
  * one scan, one shuffle, no row explosion (VERDICT r1 scale guidance).
  */
object Dimensions {

  /** "all"-member rollup via CUBE: every combination of (region, flag)
    * plus 'all' markers — byte-identical to the OR-join formulation. */
  def rollupAll(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      // shuffle_hash: orders is fact-scale — never its raw scan broadcast
      .join(orders(s, d).hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      // two-phase: finest-grain partials first, CUBE's Expand then
      // multiplies ~15 partial rows instead of the joined fact table
      .groupBy(col("r_name"), col("l_returnflag"))
      .agg(
        count(lit(1)).as("p_n"),
        sum(dec(col("l_quantity"))).as("p_qty"),
        sum(dec(col("l_extendedprice"))).as("p_price"))
      .cube(col("r_name"), col("l_returnflag"))
      .agg(
        sum(col("p_n")).as("played"),
        sum(col("p_qty")).cast("double").as("sum_qty"),
        sum(col("p_price")).cast("double").as("sum_price"))
      .select(
        coalesce(col("r_name"), lit("all")).as("region"),
        coalesce(col("l_returnflag"), lit("all")).as("game_mode"),
        col("played"), col("sum_qty"), col("sum_price"))

  def rollupAllOracle: String = """
    SELECT coalesce(r_name, 'all') AS region,
           coalesce(l_returnflag, 'all') AS game_mode,
           count(*) AS played,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE (r_name, l_returnflag)"""

  /** skill_tier BETWEEN range join (crunch_global.sql:42): fact rows
    * classified into [lo, hi) tiers from a tiny inline dim. The dim side is
    * broadcast explicitly so the plan is a broadcast nested-loop over 5
    * rows streaming the fact side — never a shuffle-side theta join. */
  val tiers: Seq[(String, Double, Double)] = Seq(
    ("bronze", 0.0, 10.0), ("silver", 10.0, 20.0), ("gold", 20.0, 30.0),
    ("platinum", 30.0, 40.0), ("vainglorious", 40.0, 1e9))

  /** Broadcast tier dim frame — single definition for every range join
    * (rangeJoinTiers, crunch_global_full, hero_vs_hero_full). */
  def tiersDim(s: SparkSession): DataFrame = {
    import s.implicits._
    broadcast(tiers.toDF("tier", "lo", "hi"))
  }

  /** The same tiers as a DuckDB VALUES list for the oracles. */
  def tiersValuesSql: String =
    tiers.map { case (n, lo, hi) => s"('$n', $lo, $hi)" }.mkString(", ")

  /** Year-window series dim (crunch_global.sql:37's series table): one
    * row per year, range-joined on the order date — shared by
    * crunch_global_full and hero_vs_hero_full. */
  val seriesYears: Range = 1992 to 2001

  def seriesDim(s: SparkSession): DataFrame = {
    import s.implicits._
    broadcast(seriesYears.map(y => (s"y$y", s"$y-01-01", s"$y-12-31"))
      .toDF("series", "s_start", "s_end")
      .select(col("series"), to_date(col("s_start")).as("s_start"),
        to_date(col("s_end")).as("s_end")))
  }

  def seriesValuesSql: String =
    seriesYears.map(y => s"('y$y', DATE '$y-01-01', DATE '$y-12-31')")
      .mkString(", ")

  def rangeJoinTiers(s: SparkSession, d: String): DataFrame = {
    val dim = tiersDim(s)
    lineitem(s, d)
      .join(dim, col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy(col("tier"))
      .agg(
        count(lit(1)).as("played"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
  }

  def rangeJoinTiersOracle: String = {
    val vals = tiersValuesSql
    s"""
    SELECT tier, count(*) AS played,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    JOIN (VALUES $vals) AS t(tier, lo, hi)
      ON l_quantity >= lo AND l_quantity < hi
    GROUP BY 1"""
  }

  /** filter semi-join (crunch_global.sql:36): `f.id IN (SELECT ...)` →
    * left_semi, so the subquery side never widens the fact rows. */
  def filterSemijoin(s: SparkSession, d: String): DataFrame = {
    val urgent = orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    lineitem(s, d)
      // the urgent key set is ~20% of orders — fact-scale, so the semi
      // join must shuffle, not broadcast the key list
      .join(urgent.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag").as("game_mode"))
      .agg(
        count(lit(1)).as("played"),
        dsum(col("l_extendedprice")).as("sum_price"))
  }

  def filterSemijoinOracle: String = """
    SELECT l_returnflag AS game_mode, count(*) AS played,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY 1"""

  /** Build-regex matching (crunch_global.sql:46-53): the reference matches
    * serialized item_grants against per-build regexes; here "builds" are
    * regex patterns over part attributes, evaluated with RLIKE inside
    * codegen. Patterns are anchored alternations — identical semantics in
    * Java regex (Spark) and RE2 (DuckDB oracle). */
  val builds: Seq[(String, String)] = Seq(
    ("economy_small", "^(ECONOMY|SMALL)$"),
    ("heavy", "^(LARGE|MEDIUM)$"),
    ("promo", "^PROMO$"))

  def buildRegex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = broadcast(builds.toDF("build", "pattern"))
    lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .join(dim, regexp_like(col("p_type"), col("pattern")))
      .groupBy(col("build"))
      .agg(
        count(lit(1)).as("played"),
        dsum(col("l_quantity")).as("sum_qty"),
        countDistinct(col("p_partkey")).as("parts"))
  }

  def buildRegexOracle: String = {
    val vals = builds.map { case (n, p) => s"('$n', '$p')" }.mkString(", ")
    s"""
    SELECT build, count(*) AS played,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(DISTINCT p_partkey) AS parts
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN (VALUES $vals) AS b(build, pattern)
      ON regexp_matches(p_type, pattern)
    GROUP BY 1"""
  }

  /** The reference's regex sandwich (worker.js:200-201): a build slot
    * `item;count` matches a serialized `id;cnt,id;cnt,…` grants string
    * when it appears as a complete list element. `[0-9]` replaces the
    * original `[[:digit:]]` — Java regex (Spark) has no POSIX classes,
    * and the two are semantically identical here in both engines. */
  val BuildRegexStart = "^([0-9]+;[0-9]+,)*("
  val BuildRegexEnd = ")+(,[0-9]+;[0-9]+)*$"

  /** Multi-slot conjunctive builds (crunch_global.sql:52-59): up to 6
    * (item, count) slots per build, `None` = the reference's NULL
    * wildcard slot. Builds are plan-time dims (like tiers/series), so
    * the `b.item_k IS NULL OR rlike` per-row disjunction compiles away:
    * only the non-null slots emit RLIKE conjuncts. */
  val fullBuilds: Seq[(String, Seq[Option[(Int, Int)]])] = Seq(
    ("rush", Seq(Some((1, 2)), None, None, None, None, None)),
    ("split_push", Seq(Some((0, 1)), Some((3, 2)), None, None, None, None)),
    ("sustain", Seq(Some((2, 0)), Some((5, 4)), None, None, None, None)),
    ("late_game", Seq(Some((2, 1)), Some((4, 3)), Some((6, 0)), None, None, None)))

  /** `build_regex_full`: classify each match (order) against the
    * multi-slot builds by serializing its items to the reference's
    * `id;cnt,…` grants string and AND-ing one sandwich RLIKE per
    * non-null slot, with the unconditional 'all' member fanned out like
    * every rollup dim (crunch_global.sql:60's `or b.name = 'all'`).
    *
    * Scale shape: ONE shuffle to order grain builds the grants string
    * AND the order-level measure partials in the same aggregate; the
    * regex match and the build fan-out then touch order-count rows, and
    * the final per-build totals re-aggregate partials — the fact table
    * is scanned exactly once and never re-joined. */
  def buildRegexFull(s: SparkSession, d: String): DataFrame = {
    val elem = concat_ws(";", (col("l_partkey") % 8).cast("string"),
      (col("l_quantity").cast("int") % 5).cast("string"))
    val perOrder = lineitem(s, d)
      .select(col("l_orderkey"),
        struct(col("l_linenumber"), elem.as("e")).as("le"),
        col("l_quantity"))
      .groupBy(col("l_orderkey"))
      .agg(
        concat_ws(",", transform(array_sort(collect_list(col("le"))),
          x => x.getField("e"))).as("item_grants"),
        count(lit(1)).as("o_lines"),
        sum(dec(col("l_quantity"))).as("o_qty"))
    val members = fullBuilds.map { case (n, slots) =>
      val conj = slots.flatten.map { case (id, cnt) =>
        col("item_grants").rlike(BuildRegexStart + s"$id;$cnt" + BuildRegexEnd)
      }.reduce(_ && _)
      when(conj, lit(n))
    }
    perOrder
      .withColumn("build", explode(concat(
        array_compact(array(members: _*)), array(lit("all")))))
      .groupBy(col("build"))
      .agg(
        sum(col("o_lines")).as("played"),
        sum(col("o_qty")).cast("double").as("sum_qty"),
        count(lit(1)).as("orders_n"))
  }

  def buildRegexFullOracle: String = {
    val arms = fullBuilds.map { case (n, slots) =>
      val conj = slots.flatten.map { case (id, cnt) =>
        s"regexp_matches(ig, '$BuildRegexStart$id;$cnt$BuildRegexEnd')"
      }.mkString(" AND ")
      s"SELECT '$n' AS build, o_lines, o_qty FROM g WHERE $conj"
    }.mkString("\n      UNION ALL ")
    s"""
    WITH g AS (
      SELECT l_orderkey,
        string_agg(CAST(l_partkey % 8 AS VARCHAR) || ';' ||
                   CAST(CAST(l_quantity AS INT) % 5 AS VARCHAR),
                   ',' ORDER BY l_linenumber) AS ig,
        count(*) AS o_lines,
        sum(CAST(l_quantity AS DECIMAL(18,2))) AS o_qty
      FROM lineitem GROUP BY l_orderkey),
    m AS (
      $arms
      UNION ALL SELECT 'all' AS build, o_lines, o_qty FROM g)
    SELECT build, CAST(sum(o_lines) AS BIGINT) AS played,
           CAST(sum(o_qty) AS DOUBLE) AS sum_qty,
           count(*) AS orders_n
    FROM m GROUP BY 1"""
  }

  /** Dynamic item discovery (worker.js:83-95): the reference derives its
    * `item_NNN_use` pivot columns from the LIVE item list at plan time —
    * `getItems()` → per-item SQL codegen — not from a hard-coded set.
    * Same contract here: the pivot column set comes from a bounded
    * metadata query over the item (part) table. The brand dimension is
    * item METADATA (25 values for this generator family), so the driver
    * round-trip is the same shape as the reference's item-list fetch —
    * bounded by the dimension's cardinality, never by the fact table. */
  def discoverItems(s: SparkSession, d: String): Seq[String] =
    part(s, d).select(col("p_brand")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  /** Dynamic per-item pivot (worker.js:96-112): one conditional-SUM pair
    * per DISCOVERED item — stays inside one hash agg with map-side
    * combine, no second pivot shuffle, column set derived at plan time. */
  def itemPivot(s: SparkSession, d: String): DataFrame = {
    val pivots = discoverItems(s, d).flatMap { bn =>
      val id = bn.filter(_.isDigit).toInt
      Seq(
        sum(when(col("p_brand") === bn, dec(col("l_quantity")))
          .otherwise(dec(lit(0)))).cast("double").as(f"item_${id}%03d_use"),
        sum(when(col("p_brand") === bn, 1L).otherwise(0L))
          .as(f"item_${id}%03d_n"))
    }
    val aggs = count(lit(1)).as("played") +: pivots
    lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_returnflag").as("game_mode"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The oracle pins the generator's brand universe (Brand#1..Brand#25,
    * verified present at every driver SF) — the discovery query returns
    * exactly this set on the driver testdata, so a discovery regression
    * (missed or phantom items) breaks the hash/schema match. */
  def itemPivotOracle: String = {
    val cols = (1 to 25).flatMap { b =>
      Seq(
        f"CAST(sum(CASE WHEN p_brand = 'Brand#$b' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS item_${b}%03d_use",
        f"CAST(sum(CASE WHEN p_brand = 'Brand#$b' THEN 1 ELSE 0 END) AS BIGINT) AS item_${b}%03d_n")
    }
    s"""
    SELECT l_returnflag AS game_mode, count(*) AS played,
           ${cols.mkString(",\n           ")}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1"""
  }
}

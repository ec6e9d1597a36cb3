package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Team fame score (crunch_team.sql:1-50): a nested grouped subquery
  * counting memberships per match, a CASE-weighted product score
  * (count-weight × win-weight × status-weight), a trailing 7-day window,
  * folded to one fame value per member.
  *
  * Re-keyed to the star schema: customer≈team member, order≈match,
  * lineitems-per-order≈memberships seen in the match, c_mktsegment≈status.
  * CURDATE() is replaced by the dataset's max(o_orderdate) so the query is
  * deterministic (the reference anchors to wall-clock; an engine oracle
  * can't). Weights are decimal literals so the product and sum stay exact.
  */
object TeamFame {

  def teamFame(s: SparkSession, d: String): DataFrame = {
    val dd = DecimalType(18, 2)
    val ord = orders(s, d)
    // deterministic CURDATE(): latest order date, broadcast as a 1-row dim
    val anchor = ord.agg(max(col("o_orderdate")).as("max_date"))

    // inner grouped subquery (crunch_team.sql:23-37): per (customer, match)
    // membership count
    val cnt = lineitem(s, d)
      // shuffle_hash: orders is fact-scale — never its raw scan broadcast
      .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(anchor),
        col("o_orderdate") > date_sub(col("max_date"), 7 * 52)) // trailing window
      .groupBy(col("o_custkey").as("m_cust"), col("o_orderkey").as("m_order"),
               col("o_orderstatus").as("m_status"))
      .agg(count(lit(1)).as("tm_cnt"))

    // outer score (crunch_team.sql:5-21): CASE-weight product, sum per member
    val cntW = when(col("tm_cnt") === 1, lit("0.33").cast(dd))
      .when(col("tm_cnt") === 2, lit("0.66").cast(dd))
      .when(col("tm_cnt") >= 3, lit("1.33").cast(dd))
    val winW = when(col("m_status") === "F", lit("1.00").cast(dd))
      .when(col("m_status") === "O", lit("0.70").cast(dd))
      .otherwise(lit("0.50").cast(dd))
    val statusW = when(col("c_mktsegment") === "BUILDING", lit("10").cast(dd))
      .when(col("c_mktsegment") === "MACHINERY", lit("75").cast(dd))
      .when(col("c_mktsegment") === "HOUSEHOLD", lit("100").cast(dd))
      .when(col("c_mktsegment") === "AUTOMOBILE", lit("125").cast(dd))
      .otherwise(lit("125").cast(dd))

    cnt
      .join(customer(s, d), col("m_cust") === col("c_custkey"))
      .groupBy(col("c_custkey").as("member_id"), col("c_mktsegment").as("status"))
      .agg(
        sum(cntW * winW * statusW).cast("double").as("fame"),
        count(lit(1)).as("matches"))
  }

  /** The reference folds fame back INTO the membership table —
    * `UPDATE team_membership tm JOIN (fame subquery) ... SET tm.fame`
    * (crunch_team.sql:1-2,50). The distributed re-expression of an
    * UPDATE-join is a key-equi-join against the target table plus a
    * column overwrite: members the fame frame touches get the new value,
    * everyone else keeps their current fame (UPDATE only writes matched
    * rows) — one shuffle on the primary key, the natural upsert shape a
    * sorted/bucketed membership table gives you at 100 TB. Here the
    * membership table is `customer` and its standing fame column is
    * `c_acctbal`. */
  def teamFameUpdate(s: SparkSession, d: String): DataFrame = {
    val fame = teamFame(s, d).select(col("member_id"), col("fame").as("new_fame"))
    customer(s, d)
      .join(fame, col("c_custkey") === col("member_id"), "left")
      .select(
        col("c_custkey").as("member_id"),
        col("c_name").as("player_name"),
        col("c_mktsegment").as("status"),
        coalesce(col("new_fame"), dec(col("c_acctbal")).cast("double")).as("fame"),
        col("new_fame").isNotNull.as("updated"))
  }

  def teamFameUpdateOracle: String = s"""
    WITH fame AS ($teamFameOracle)
    SELECT c_custkey AS member_id, c_name AS player_name,
           c_mktsegment AS status,
           CAST(coalesce(f.fame,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE)) AS DOUBLE) AS fame,
           f.fame IS NOT NULL AS updated
    FROM customer
    LEFT JOIN fame f ON f.member_id = c_custkey"""

  def teamFameOracle: String = """
    WITH cnt AS (
      SELECT o_custkey AS m_cust, o_orderkey AS m_order,
             o_orderstatus AS m_status, count(*) AS tm_cnt
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders) - INTERVAL 364 DAY
      GROUP BY 1, 2, 3)
    SELECT c_custkey AS member_id, c_mktsegment AS status,
      CAST(sum(
        (CASE WHEN tm_cnt = 1 THEN CAST('0.33' AS DECIMAL(18,2))
              WHEN tm_cnt = 2 THEN CAST('0.66' AS DECIMAL(18,2))
              WHEN tm_cnt >= 3 THEN CAST('1.33' AS DECIMAL(18,2)) END) *
        (CASE WHEN m_status = 'F' THEN CAST('1.00' AS DECIMAL(18,2))
              WHEN m_status = 'O' THEN CAST('0.70' AS DECIMAL(18,2))
              ELSE CAST('0.50' AS DECIMAL(18,2)) END) *
        (CASE WHEN c_mktsegment = 'BUILDING' THEN CAST('10' AS DECIMAL(18,2))
              WHEN c_mktsegment = 'MACHINERY' THEN CAST('75' AS DECIMAL(18,2))
              WHEN c_mktsegment = 'HOUSEHOLD' THEN CAST('100' AS DECIMAL(18,2))
              WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST('125' AS DECIMAL(18,2))
              ELSE CAST('125' AS DECIMAL(18,2)) END)) AS DOUBLE) AS fame,
      count(*) AS matches
    FROM cnt
    JOIN customer ON m_cust = c_custkey
    GROUP BY 1, 2"""
}

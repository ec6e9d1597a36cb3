package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-expression surface of the reference (CASE, COALESCE, NULLIF,
  * CAST(bool AS INT), ROUND, date arithmetic — crunch_team.sql:5-21,
  * crunch_global.sql:17,29, crunch_team.sql:36 DATE_SUB/CURDATE).
  * One row per order, pure projection — stays in a single
  * WholeStageCodegen stage with no shuffle at all. */
object Scalars {

  def scalarExprs(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      // CASE ladder
      when(col("o_orderstatus") === "F", "finished")
        .when(col("o_orderstatus") === "O", "open")
        .otherwise("pending").as("status_name"),
      // COALESCE + NULLIF
      coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")),
               lit("unspecified")).as("priority"),
      // CAST(bool AS INT) — cast(p.winner as INT) of crunch_global.sql:17
      (col("o_orderstatus") === "F").cast("int").as("is_won"),
      // exact rounding via decimal (ROUND of crunch_global.sql:29)
      dec(col("o_totalprice")).cast("double").as("price_2dp"),
      floor(col("o_totalprice")).cast("long").as("price_floor"),
      // date arithmetic: days since epoch anchor, truncated month
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("days_since"),
      tstr(date_trunc("month", col("o_orderdate"))).as("month_start"),
      // string surface
      concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
      substring(col("o_orderpriority"), 1, 1).cast("int").as("prio_rank"))

  def scalarExprsOracle: String = """
    SELECT o_orderkey,
      CASE WHEN o_orderstatus = 'F' THEN 'finished'
           WHEN o_orderstatus = 'O' THEN 'open'
           ELSE 'pending' END AS status_name,
      coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS priority,
      CAST(o_orderstatus = 'F' AS INT) AS is_won,
      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_2dp,
      CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
      strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
      concat_ws('#', o_orderstatus, o_orderpriority) AS tag,
      CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_rank
    FROM orders"""
}

package graft

import graft.operators.Crunch
import org.apache.spark.sql.functions._

/** The items side of the crunch spine is OPTIONAL (crunch_global.sql:
  * 33-35: `left outer join participant_items` + `coalesce(x, 0)`).
  * FK-clean testdata can't see the difference between inner and left, so
  * this spec materializes a corpus with a third of the part (items) rows
  * knocked out and proves the crunch operators keep every participant
  * row, contributing 0 for the missing item measures. */
class DanglingItemsSpec extends SparkSpec {

  private lazy val dangDir: String = {
    val dir = "/tmp/graft_dangling_sf"
    val tables = Seq("lineitem", "orders", "customer", "nation", "region", "part")
    for (t <- tables) {
      val df = spark.read.parquet(s"$sf/$t.parquet")
      val out = if (t == "part") df.filter(col("p_partkey") % 3 =!= 0) else df
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("crunch_global keeps participants whose items rows are missing") {
    val clean = Crunch.global(spark, sf).collect()
      .map(r => r.getString(0) + "|" + r.getString(1) + "|" + r.getString(2) ->
        r.getLong(3)).toMap // key dims -> played
    val dang = Crunch.global(spark, dangDir).collect()
    val dangPlayed = dang.map(r =>
      r.getString(0) + "|" + r.getString(1) + "|" + r.getString(2) ->
        r.getLong(3)).toMap
    // every group survives with the SAME row contribution — the left join
    // must not drop participants that lost their items row
    assert(dangPlayed == clean)

    // and the item measure shrank (dangling rows now contribute 0)
    val cleanUses = Crunch.global(spark, sf)
      .agg(sum(col("item_uses"))).collect()(0).getDouble(0)
    val dangUses = Crunch.global(spark, dangDir)
      .agg(sum(col("item_uses"))).collect()(0).getDouble(0)
    assert(dangUses < cleanUses && dangUses > 0)
  }

  test("crunch_global_full grand total is unchanged by dangling items") {
    def grand(d: String): Long = Crunch.globalFull(spark, d)
      .filter(col("filter") === "all" && col("region") === "all" &&
        col("game_mode") === "all" && col("role") === "all" &&
        col("skill_tier") === "all" && col("build") === "all")
      .collect()(0).getAs[Long]("played")
    assert(grand(dangDir) == grand(sf))

    // dangling lines reclassify into the 'other' build instead of dropping
    def buildPlayed(d: String, b: String): Long = Crunch.globalFull(spark, d)
      .filter(col("filter") === "all" && col("region") === "all" &&
        col("game_mode") === "all" && col("role") === "all" &&
        col("skill_tier") === "all" && col("build") === b)
      .collect().headOption.map(_.getAs[Long]("played")).getOrElse(0L)
    assert(buildPlayed(dangDir, "other") > buildPlayed(sf, "other"))
  }
}

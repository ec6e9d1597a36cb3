package graft

import graft.operators.Crunch
import org.apache.spark.sql.functions._

/** Conditional dimension membership (crunch_global.sql:43-59): the
  * series visibility flag decides which rollup members materialize, so
  * flipping it must provably change the emitted rows — while every
  * 'all'-member total stays visibility-invariant (a hidden series'
  * rows still aggregate, they just lose their concrete members). */
class GatingSpec extends SparkSpec {

  test("flipping show_in_web changes which rollup members are emitted") {
    val allOn = Crunch.globalGated(spark, sf, _ => true)
    val allOff = Crunch.globalGated(spark, sf, _ => false)

    // with every series hidden, ONLY 'all' members exist for the gated dims
    val offMembers = allOff
      .select(col("game_mode"), col("skill_tier"), col("build"))
      .distinct().collect()
    assert(offMembers.length == 1 &&
      offMembers(0).toSeq == Seq("all", "all", "all"))

    // with every series visible, concrete members appear
    assert(allOn.filter(col("game_mode") =!= "all").count() > 0)
    assert(allOn.filter(col("skill_tier") =!= "all").count() > 0)
    assert(allOn.filter(col("build") =!= "all").count() > 0)
    assert(allOn.count() > allOff.count())
  }

  test("default gating: hidden (odd-year) series emit only 'all' members") {
    val df = Crunch.globalGated(spark, sf)
      .withColumn("yr", substring(col("series"), 2, 4).cast("int")).cache()
    // hidden (odd-year) series never emit a concrete gated member
    assert(df.filter(col("yr") % 2 === 1 && col("game_mode") =!= "all")
      .count() == 0)
    // visible (even-year) series do
    assert(df.filter(col("yr") % 2 === 0 && col("game_mode") =!= "all")
      .count() > 0)
    // hidden series are still present through their 'all' members
    assert(df.filter(col("yr") % 2 === 1).count() > 0)
    df.unpersist()
  }

  test("'all'-member totals are visibility-invariant") {
    def grand(visible: Int => Boolean) =
      Crunch.globalGated(spark, sf, visible)
        .filter(col("game_mode") === "all" && col("skill_tier") === "all" &&
          col("build") === "all")
        .agg(sum(col("played"))).collect()(0).getLong(0)
    assert(grand(_ => true) == grand(_ => false))
  }

  test("build members require the game-mode member to be 'all'") {
    val df = Crunch.globalGated(spark, sf, _ => true)
    assert(df.filter(col("build") =!= "all" && col("game_mode") =!= "all")
      .count() == 0)
  }
}

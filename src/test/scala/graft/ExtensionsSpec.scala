package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** The SQL registry face of the native expressions, plus the native/HOF
  * differential. */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot is registered and exact") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head.getDouble(0)
    assert(r == 32.0)
  }

  test("graft_cosine matches the DataFrame-side cosine") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 1.0d)) AS c")
      .head.getDouble(0)
    assert(math.abs(r - 1.0 / math.sqrt(2.0)) < 1e-15)
  }

  test("fused cosine equals the composed dot/norm form within double precision") {
    import spark.implicits._
    val df = Tables.embeddings(spark, sf).limit(100)
      .select(VectorOps.toDouble(col("embedding")).as("v"))
    val pair = df.withColumn("w", reverse(col("v")))
      .select(
        VectorOps.cosine(col("v"), col("w")).as("fused"),
        (VectorOps.dot(col("v"), col("w")) /
          (VectorOps.norm(col("v")) * VectorOps.norm(col("w")))).as("composed"))
    // fused single-pass accumulation vs three separate folds: same values
    // up to ulp-level reassociation
    assert(pair.filter(abs(col("fused") - col("composed")) > 1e-12).count() == 0)
  }

  test("native dot equals the interpreted higher-order fold bit-for-bit") {
    import spark.implicits._
    val df = Tables.embeddings(spark, sf).limit(200)
      .select(VectorOps.toDouble(col("embedding")).as("v"))
      .select(
        VectorOps.dot(col("v"), col("v")).as("native"),
        VectorOps.dotHof(col("v"), col("v")).as("hof"))
    // both are sequential left folds in double → bit-identical, not approx
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("NormalizeVec equals the composed transform(v, _/norm) bit-for-bit") {
    val df = Tables.embeddings(spark, sf).limit(200)
      .select(VectorOps.toDouble(col("embedding")).as("v"))
    val hofNorm = {
      val n = VectorOps.norm(col("v"))
      transform(col("v"), x => x / n)
    }
    val bad = df.select(
        VectorOps.normalize(col("v")).as("native"), hofNorm.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(bad.count() == 0)
  }

  test("CellScores / CellRank match driver-side arithmetic on real vectors") {
    import graft.functions.{CellRank, CellScores}
    import org.apache.spark.sql.GraftShim
    val rows = Tables.embeddings(spark, sf).limit(40)
      .select(VectorOps.toDouble(col("embedding")).as("v"))
    // a small centroid "matrix" from the first 4 vectors
    val matrix = rows.limit(4).collect().map(_.getSeq[Double](0).toArray)
    val ids = matrix.indices.toArray
    val got = rows.select(
        GraftShim.column(CellScores(GraftShim.expression(col("v")), matrix)).as("cs"),
        GraftShim.column(CellRank(GraftShim.expression(col("v")), matrix, ids)).as("rk"),
        col("v"))
      .collect()
    for (r <- got) {
      val v = r.getSeq[Double](2).toArray
      val expScores = matrix.map(c => c.indices.foldLeft(0.0)((s, i) => s + c(i) * v(i)))
      assert(r.getSeq[Double](0).toArray.sameElements(expScores))
      val expRank = ids.sortBy(i => (-expScores(i), i))
      assert(r.getSeq[Int](1).toArray.sameElements(expRank))
    }
  }
}

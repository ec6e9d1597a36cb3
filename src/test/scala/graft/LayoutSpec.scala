package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order clustering: the curve itself on known points, and the
  * property the operator exists for — clustered files are tight
  * bounding boxes in BOTH dimensions, where a linear sort is tight in
  * one and spans the full range of the other. */
class LayoutSpec extends SparkSpec {

  test("morton interleave matches known small cases") {
    import spark.implicits._
    // (a, b, z): bit i of a -> 2i, bit i of b -> 2i+1
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (0L, 2L, 8L), (3L, 3L, 15L), (5L, 3L, 27L))
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(col("a"), col("b"), Layout.interleave(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == cases)
  }

  test("k-dim interleave generalizes the 2-dim curve and packs 3 dims") {
    import spark.implicits._
    val two = Seq((5L, 3L)).toDF("a", "b").select(
      Layout.interleave(col("a"), col("b")),
      Layout.interleaveN(Seq(col("a"), col("b")))).head
    assert(two.getLong(0) == two.getLong(1)) // 2-dim delegates to N-dim
    // 3-dim: bit i of dim d lands at z-bit 3i+d — (1,1,1) -> 0b111 = 7,
    // (2,0,0) -> bit1 of dim0 at z-bit 3 = 8, (0,0,2) -> z-bit 5 = 32
    val three = Seq((1L, 1L, 1L, 7L), (2L, 0L, 0L, 8L), (0L, 0L, 2L, 32L))
      .toDF("a", "b", "c", "z")
      .select(Layout.interleaveN(Seq(col("a"), col("b"), col("c"))).as("got"), col("z"))
      .collect()
    three.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    intercept[IllegalArgumentException](
      Layout.interleaveN(Seq.fill(8)(col("a")))) // 8×8 bits > 62
  }

  test("quantize is monotonic, clamped, and exact at the edges") {
    import spark.implicits._
    val df = (0L to 100L).toDF("x")
      .select(col("x"), Layout.quantize(col("x"), 0L, 100L).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(df.head._2 == 0 && df.last._2 == 255)
    assert(df.sliding(2).forall { case Array(a, b) => a._2 <= b._2 })
    // out-of-range inputs clamp instead of throwing
    val clamped = Seq(-5L, 1000L).toDF("x")
      .select(Layout.quantize(col("x"), 0L, 100L)).collect().map(_.getLong(0))
    assert(clamped.toSeq == Seq(0L, 255L))
    // degenerate range maps everything to 0 (no division by zero)
    assert(Seq(7L).toDF("x").select(Layout.quantize(col("x"), 7L, 7L))
      .head.getLong(0) == 0L)
  }

  test("z-clustering prunes files on BOTH dims; a linear sort only on one") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val Array(loA, hiA, loB, hiB) = docs.agg(
      min(col("n_chars")).cast("long"), max(col("n_chars")).cast("long"),
      min(col("doc_id")), max(col("doc_id"))).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray

    // file-level min/max statistics — the exact information a scan's
    // skipping uses; hits = files whose [min,max] intersects the band
    def stats(dir: String, c: String): Array[(Long, Long)] =
      spark.read.parquet(dir).withColumn("f", input_file_name())
        .groupBy(col("f"))
        .agg(min(col(c)).cast("long").as("lo"), max(col(c)).cast("long").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    def hits(dir: String, c: String, lo: Long, hi: Long): Int =
      stats(dir, c).count { case (flo, fhi) => fhi >= lo && flo <= hi }

    val zDir = "/tmp/graft_layout_spec_z"
    val linDir = "/tmp/graft_layout_spec_lin"
    Layout.clusterZOrder(docs, "n_chars", loA, hiA, "doc_id", loB, hiB,
      zDir, files = 8)
    docs.repartitionByRange(8, col("n_chars"))
      .sortWithinPartitions(col("n_chars"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(linDir)
    val zFiles = stats(zDir, "doc_id").length
    val linFiles = stats(linDir, "doc_id").length
    assert(zFiles >= 4 && linFiles >= 4, s"want >=4 files: z=$zFiles lin=$linFiles")

    // a narrow doc_id band inside the first quarter of the id range:
    // the linear-by-n_chars layout cannot prune AT ALL (every file
    // spans ~the full id range); the z layout must touch at most half
    val bB = (hiB - loB) / 16
    val zB = hits(zDir, "doc_id", loB + bB, loB + 2 * bB)
    val linB = hits(linDir, "doc_id", loB + bB, loB + 2 * bB)
    assert(linB == linFiles, s"linear layout unexpectedly pruned ids: $linB")
    assert(zB * 2 <= zFiles, s"z hit $zB of $zFiles files on an id band")

    // a narrow n_chars band inside the first half: linear is near-perfect
    // there; z must still prune (it gives up only one bit per level)
    val bA = (hiA - loA) / 16
    val zA = hits(zDir, "n_chars", loA + bA, loA + 2 * bA)
    val linA = hits(linDir, "n_chars", loA + bA, loA + 2 * bA)
    assert(linA <= 2, s"linear should be tight on its sort dim: $linA")
    assert(zA < zFiles, s"z pruned nothing on n_chars: $zA of $zFiles")
    // one predicate per dim, total files touched: z strictly wins
    assert(zA + zB < linA + linB, s"z=$zA+$zB linear=$linA+$linB")

    // content preservation through the rewrite — count first, so a
    // dropped-and-duplicated pair of identical rows can't cancel out in
    // the set compare
    val rewritten = spark.read.parquet(zDir).drop("zkey")
    assert(rewritten.count() == docs.count())
    assert(rewritten.collect().map(_.mkString("|")).toSet
      == docs.collect().map(_.mkString("|")).toSet)
  }
}

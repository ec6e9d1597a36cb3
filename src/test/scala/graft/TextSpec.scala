package graft

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Heuristic text operators checked on constructed inputs with known
  * answers (the corpus lang labels are synthetic, so real sentences live
  * here). */
class TextSpec extends SparkSpec {

  test("lang_id classifies real sentences") {
    import spark.implicits._
    val samples = Seq(
      ("the cat sat on the mat and it was happy", "en"),
      ("der Hund ist nicht in dem Haus und ich bin da", "de"),
      ("le chat est dans la maison et il ne dort pas", "fr"),
      ("el perro es un animal que vive en la casa", "es"),
      ("今天天气很好我们去公园散步", "zh"))
    val df = samples.toDF("text", "expected")
      .withColumn("best", TextOps.langScores(col("text")))
    df.collect().foreach { r =>
      val expected = r.getString(1)
      val got = r.getStruct(2).getString(1)
      assert(got == expected, s"text='${r.getString(0)}'")
    }
  }

  test("winnowing fingerprints: identical docs agree, disjoint docs do not") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val shifted = "prefix words first " + base // same content, shifted offset
    val other = "one two three four five six seven eight nine ten eleven twelve"
    val fp = Seq(("a", base), ("b", shifted), ("c", other))
      .toDF("id", "text")
      .select(col("id"), TextOps.fingerprintArr(col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert((fp("a") & fp("b")).nonEmpty)   // winnowing guarantees shared runs surface
    assert((fp("a") & fp("c")).isEmpty)    // disjoint token streams share nothing
    assert(fp("a").subsetOf(fp("b") ++ fp("a"))) // shift only adds/keeps prints
  }

  test("token counts on a known string") {
    import spark.implicits._
    val df = Seq("Hello, world! abc123 def 42").toDF("text").select(
      size(Dedup.tokens(col("text"))).as("ws"),
      size(regexp_extract_all(col("text"), lit(TextOps.BpeIsh), lit(0))).as("bpe"))
    val r = df.head
    assert(r.getInt(0) == 5) // [hello,, world!, abc123, def, 42]
    // Hello , world ! abc 123 def 42 → 8 BPE-ish pieces
    assert(r.getInt(1) == 8)
  }

  test("text_stats ratios are consistent") {
    val df = TextOps.textStats(spark, sf)
    val bad = df.filter(
      col("stopword_ratio") < 0 || col("stopword_ratio") > 1 ||
      col("punct_ratio") < 0 || col("punct_ratio") > 1 ||
      col("quality_score") < 0 || col("quality_score") > 1.0001 ||
      col("n_stopwords") > col("n_tokens"))
    assert(bad.count() == 0)
    assert(df.count() == Tables.documents(spark, sf).count())
  }

  test("multimodal decode metadata is internally consistent") {
    val df = graft.operators.Multimodal.multimodalMeta(spark, sf)
    assert(df.filter(col("media_type") =!= "video" && col("n_frames") =!= 1).count() == 0)
    assert(df.filter(length(col("sha_hex")) =!= 64).count() == 0)
    assert(df.filter(col("width") < 16 || col("width") > 655).count() == 0)
  }
}

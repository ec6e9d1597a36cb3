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

  test("doc_perplexity: common phrasing outscores gibberish against the " +
      "corpus's own bigram counts; sub-bigram docs are absent") {
    import spark.implicits._
    val common = "the cat sat on the mat"
    val docs = ((1L to 8L).map(i => (i, common)) ++ Seq(
      (9L, "zq xv qj wk vz jx"), // bigrams seen nowhere else
      (10L, "solo"), (11L, ""))).toDF("doc_id", "text")
    val scores = TextOps.perplexityOf(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!scores.contains(10L) && !scores.contains(11L),
      "docs with no bigram must be absent, not zero-scored")
    assert((1L to 8L).forall(i => scores(i) > scores(9L)),
      s"gibberish must score strictly lower: $scores")
    // deterministic: a permuted re-run lands on identical doubles
    val again = TextOps.perplexityOf(docs.orderBy(org.apache.spark.sql
        .functions.rand(7)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == scores)
  }

  test("doc_perplexity_trigram: common phrasing outscores gibberish " +
      "self-scored; sub-trigram docs are absent; permutation-deterministic") {
    import spark.implicits._
    val common = "the cat sat on the mat"
    val docs = ((1L to 8L).map(i => (i, common)) ++ Seq(
      (9L, "zq xv qj wk vz jx"),
      (10L, "two words"), (11L, "solo"), (12L, ""))).toDF("doc_id", "text")
    val scores = TextOps.perplexityTrigramOf(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!scores.contains(10L) && !scores.contains(11L) &&
      !scores.contains(12L), "docs with no trigram must be absent")
    assert((1L to 8L).forall(i => scores(i) > scores(9L)),
      s"gibberish must score strictly lower: $scores")
    val again = TextOps.perplexityTrigramOf(docs.orderBy(rand(11)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == scores)
  }

  test("trigram probe walks the full backoff chain: add-one within a seen " +
      "context, 0.4 at an unseen trigram context, 0.16 at the unigram " +
      "floor — each level's exact closed form") {
    import spark.implicits._
    val hist = (1L to 3L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val counts = TextOps.trigramCountsOf(hist)
    // counts: 4 trigrams × 3; c12 = 3 per prefix; c2(w2) = 3 each of
    // cat/sat/on/the; c23 = 3 each; cu = 3 each of sat/on/the/mat;
    // N = 12, V = 4 (distinct w3)
    val batch = Seq(
      (1L, "the cat sat"),   // seen:            ln((3+1)/(3+4))
      (2L, "the cat jumped"),// unseen cont.:    ln((0+1)/(3+4))
      (3L, "big cat sat"),   // unseen context:  ln(0.4·(3+1)/(3+4))
      (4L, "big dog runs")   // unseen w2:       ln(0.16·(0+1)/(12+4))
    ).toDF("doc_id", "text")
    val got = TextOps.perplexityTrigramProbeAgainst(counts, batch)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .map(t => t._1 -> ((t._2, t._3))).toMap
    def dec6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L, 3L, 4L) && got.values.forall(_._2 == 1))
    assert(got(1L)._1 == dec6(math.log(4.0 / 7)), s"seen level: $got")
    assert(got(2L)._1 == dec6(math.log(1.0 / 7)), s"add-one level: $got")
    assert(got(3L)._1 == dec6(math.log(0.4 * 4 / 7)), s"0.4 level: $got")
    assert(got(4L)._1 == dec6(math.log(0.16 * 1 / 16)), s"floor: $got")
    // an empty store refuses loudly instead of scoring garbage
    intercept[IllegalArgumentException] {
      TextOps.perplexityTrigramProbeAgainst(counts.filter(lit(false)), batch)
    }
  }

  test("LM probe plan: the count-store snapshot is pinned ONCE — the " +
      "marginals and the scoring join replay the checkpoint, never the " +
      "member-scan fold") {
    import spark.implicits._
    val batch = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_pplpin3").toString
    val store = new graft.sources.PointStore(spark, dir,
      keys = Seq("w1", "w2", "w3"), sums = Seq("c3"), maxes = Nil)
    store.appendTagged("n1",
      Seq(("the", "cat", "sat", 3L), ("on", "the", "mat", 2L))
        .toDF("w1", "w2", "w3", "c3"))
    val plan = TextOps.perplexityTrigramProbeAgainst(store.snapshot, batch)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"count frame must be pinned behind a checkpoint:\n$plan")
    assert(!plan.contains("Scan parquet"),
      s"no consumer may re-run the store's member-scan fold:\n$plan")
    val bdir = java.nio.file.Files.createTempDirectory("graft_pplpin2").toString
    val bstore = new graft.sources.PointStore(spark, bdir,
      keys = Seq("w1", "w2"), sums = Seq("c2"), maxes = Nil)
    bstore.appendTagged("n1", Seq(("the", "cat", 3L)).toDF("w1", "w2", "c2"))
    val bplan = TextOps.perplexityProbeAgainst(bstore.snapshot, batch)
      .queryExecution.executedPlan.toString
    assert(bplan.contains("Scan ExistingRDD") && !bplan.contains("Scan parquet"),
      s"bigram probe must pin the count frame too:\n$bplan")
  }

  test("doc_perplexity_trigram plan: one instance-grain tokenization, the " +
      "count frame pinned, prefix counts derived — never a second " +
      "instance-grain aggregation") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, s"the cat $i sat on the mat"))
      .toDF("doc_id", "text")
    val plan = TextOps.perplexityTrigramOf(docs)
      .queryExecution.executedPlan.toString
    val explodes = "(?i)generate explode".r.findAllIn(plan).length
    assert(explodes == 1, s"want 1 instance-grain tokenization, got $explodes")
    assert(plan.contains("Scan ExistingRDD"),
      "aggregated trigram frame must be pinned behind its exchange")
    val prefixCountLines = plan.linesIterator.filter(l =>
      l.contains("HashAggregate") &&
        "keys=\\[w1#\\d+, w2#\\d+\\]".r.findFirstIn(l).isDefined &&
        l.contains("count(1)")).toSeq
    assert(prefixCountLines.isEmpty,
      s"prefix counts must derive from the pinned frame: $prefixCountLines")
  }

  test("doc_perplexity plan: the corpus tokenizes exactly twice and the " +
      "instance-grain uni/V passes are gone (both derive from the pinned " +
      "aggregated bigram frame)") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, s"the cat $i sat on the mat"))
      .toDF("doc_id", "text")
    val plan = TextOps.perplexityOf(docs).queryExecution.executedPlan.toString
    // tokenization = the arrays_zip explode; once feeding the instance
    // join — big's build ran eagerly at the localCheckpoint and shows
    // up as a Scan ExistingRDD, never a second token scan
    val explodes = "(?i)generate explode".r.findAllIn(plan).length
    assert(explodes == 1, s"want 1 instance-grain tokenization, got $explodes:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"aggregated bigram frame must be pinned behind its exchange:\n$plan")
    // no instance-grain w1 count-aggregation survives: any aggregate
    // keyed on w1 alone consumes the checkpoint (sums of c2), never a
    // count(1) over raw bigram instances
    val uniCountLines = plan.linesIterator.filter(l =>
      l.contains("HashAggregate") && "keys=\\[w1#\\d+\\]".r.findFirstIn(l).isDefined &&
        l.contains("count(1)")).toSeq
    assert(uniCountLines.isEmpty,
      s"instance-grain uni pass must be gone: $uniCountLines")
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

  test("chunking reconstructs every document through the overlap") {
    import graft.operators.TextOps.{ChunkStride, ChunkTokens}
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+")).toMap
    val chunks = graft.operators.TextOps.chunkDocuments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(chunks.keySet == docs.keySet)
    // the fixture must actually exercise the multi-chunk overlap path
    assert(chunks.values.exists(_.length > 1), "all docs single-chunk — resize")
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq, s"doc $id ids")
      sorted.foreach { case (_, k, n, text) =>
        val toks = text.split(" ")
        assert(toks.length == n, s"doc $id chunk $k token count")
        // each chunk is exactly the stride-offset slice of the original
        val expect = docs(id).slice(k.toInt * ChunkStride,
          k.toInt * ChunkStride + ChunkTokens)
        assert(toks.sameElements(expect), s"doc $id chunk $k content")
      }
      // consecutive chunks overlap by ChunkTokens - ChunkStride
      sorted.sliding(2).map(_.toSeq).foreach {
        case Seq((_, _, n1, t1), (_, _, _, t2)) if n1 == ChunkTokens =>
          val ov = ChunkTokens - ChunkStride
          assert(t1.split(" ").takeRight(ov).sameElements(t2.split(" ").take(ov)))
        case _ =>
      }
      // full coverage: concatenating stride-prefixes + the last chunk
      // reproduces the document
      val rebuilt = sorted.init.map(_._4.split(" ").take(ChunkStride))
        .flatten ++ sorted.last._4.split(" ")
      assert(rebuilt.sameElements(docs(id)), s"doc $id coverage")
    }
  }
}

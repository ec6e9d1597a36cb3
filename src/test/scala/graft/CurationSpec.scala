package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Properties the DuckDB hash-compare can't state: an independent plain-JVM
  * recomputation of each curation stat, and PII patterns firing on real
  * PII-bearing text (the driver corpus contains none, so the oracle only
  * pins the zero case). */
class CurationSpec extends SparkSpec {

  private def toks(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+")

  private def grams(text: String, n: Int): Seq[String] =
    toks(text).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq

  test("decontaminate matches a plain-Scala recomputation of the overlap") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bench = docs.filter(_._1 % Curation.BenchMod == 0)
      .values.flatMap(grams(_, Curation.DecontamN)).toSet
    assert(bench.nonEmpty, "fixture needs at least one benchmark doc")

    val got = Curation.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // one row per corpus doc, benchmark docs excluded
    assert(got.map(_._1).toSet == docs.keySet.filter(_ % Curation.BenchMod != 0))
    got.foreach { case (id, nHits, flag) =>
      val expect = grams(docs(id), Curation.DecontamN).toSet.count(bench)
      assert(nHits == expect, s"doc $id")
      assert(flag == (expect > 0), s"doc $id flag")
    }
    // the fixture actually exercises both branches
    assert(got.exists(_._3) && got.exists(!_._3), "need mixed contamination")
  }

  test("the exact screen never broadcasts its corpus-proportional bench slice") {
    val plan = Curation.decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
      plan.split("\n").filter(_.contains("Broadcast")).mkString("\n"))
  }

  test("boilerplate_screen matches a plain-Scala recomputation of document frequency") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> grams(r.getString(1), Curation.DecontamN).toSet).toMap
    val docFreq = docs.values.flatten.groupBy(identity).map { case (g, occ) => g -> occ.size }
    val common = docFreq.filter(_._2 >= Curation.boilerplateMinDocs(docs.size)).keySet
    assert(common.nonEmpty, "fixture needs common shingles")

    val got = Curation.boilerplateScreen(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    assert(got.map(_._1).toSet == docs.keySet)
    got.foreach { case (id, n, b, flag) =>
      assert(n == docs(id).size, s"doc $id total")
      val expectB = docs(id).count(common)
      assert(b == expectB, s"doc $id boilerplate count")
      assert(flag == (n > 0 && b.toDouble / n > Curation.BoilerplateMaxFrac), s"doc $id flag")
    }
    assert(got.exists(_._4) && got.exists(!_._4), "need mixed flags")
  }

  test("boilerplate_strip drops exactly the words covered by common shingles") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docFreq = docs.values
      .map(t => grams(t, Curation.DecontamN).toSet).flatten
      .groupBy(identity).map { case (g, occ) => g -> occ.size }
    val minDocs = Curation.boilerplateMinDocs(docs.size)
    val common = docFreq.filter(_._2 >= minDocs).keySet

    val got = Curation.boilerplateStrip(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.map(_._1).toSet == docs.keySet)
    got.foreach { case (id, n, dropped, cleaned) =>
      val w = toks(docs(id))
      val covered = w.sliding(Curation.DecontamN).zipWithIndex
        .filter { case (g, _) => g.length == Curation.DecontamN && common(g.mkString(" ")) }
        .flatMap { case (_, i) => i until i + Curation.DecontamN }
        .toSet
      assert(n == w.length, s"doc $id n_tokens")
      assert(dropped == covered.size, s"doc $id n_dropped")
      val expect = w.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        .mkString(" ")
      assert(cleaned == expect, s"doc $id cleaned")
    }
    // fixture exercises full-strip, partial-strip and untouched docs
    assert(got.exists(_._3 == 0) || got.exists(g => g._3 == g._2),
      "need boundary coverage")
    assert(got.exists(g => g._3 > 0 && g._3 < g._2), "need partial strips")
  }

  test("doc_repetition matches a plain-Scala recomputation per doc") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Curation.docRepetition(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val w  = toks(docs(r.getLong(0)))
      val bg = grams(docs(r.getLong(0)), 2)
      assert(r.getLong(1) == w.length)                        // n_tokens
      assert(r.getLong(2) == w.distinct.length)               // n_distinct
      assert(r.getDouble(3) == 1.0 - w.distinct.length.toDouble / w.length)
      assert(r.getLong(4) == bg.length)                       // n_bigrams
      val dupBg = if (bg.isEmpty) 0.0 else 1.0 - bg.distinct.length.toDouble / bg.length
      assert(r.getDouble(5) == dupBg)
      val topFrac = w.groupBy(identity).values.map(_.length).max.toDouble / w.length
      assert(r.getDouble(6) == topFrac)
      assert(r.getBoolean(7) ==
        (dupBg > Curation.DupBigramMax || topFrac > Curation.TopTokenMax))
    }
    assert(got.exists(_.getBoolean(7)) && got.exists(!_.getBoolean(7)),
      "need mixed repetitive flags")
  }

  test("degenerate docs: empty, whitespace, single-token, all-same-token") {
    val dir = java.nio.file.Files.createTempDirectory("curation_edge").toString
    import spark.implicits._
    Seq(
      (1L, "", "en", "s", 0L),                    // empty → one '' token
      (2L, "   ", "en", "s", 0L),                 // whitespace → trims to ''
      (3L, "solo", "en", "s", 0L),                // no bigrams → guard path
      (4L, "a a a a a a", "en", "s", 0L),         // max repetition
      (5L, "alpha beta gamma", "en", "s", 0L))    // all distinct
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = Curation.docRepetition(spark, dir).orderBy("doc_id").collect()
    // empty/whitespace text is ONE '' token in both engines' split
    assert(got(0).getLong(1) == 1 && got(0).getLong(4) == 0)
    assert(got(1).getLong(1) == 1)
    // single token: zero bigrams, dup fraction 0 via the guard, top = 1.0
    assert(got(2).getLong(4) == 0 && got(2).getDouble(5) == 0.0 &&
      got(2).getDouble(6) == 1.0 && got(2).getBoolean(7))
    // all-same-token: dup_token_frac 5/6, dup_bigram 4/5, flagged
    assert(got(3).getDouble(3) == 1.0 - 1.0 / 6 &&
      got(3).getDouble(5) == 1.0 - 1.0 / 5 && got(3).getBoolean(7))
    // all distinct: nothing duplicated — but top share 1/3 still crosses
    // TopTokenMax (the Gopher thresholds assume real-length docs; any
    // ≤8-token doc is "repetitive" by the top-share rule, by design)
    assert(got(4).getDouble(3) == 0.0 && got(4).getDouble(5) == 0.0 &&
      got(4).getDouble(6) == 1.0 / 3 && got(4).getBoolean(7))

    // decontaminate on a dir with NO benchmark docs (no id % 97 == 0):
    // the broadcast side is empty — every corpus doc is clean, none drops
    val dec = Curation.decontaminate(spark, dir).collect()
    assert(dec.length == 5 && dec.forall(!_.getBoolean(2)))
  }

  test("pii_scrub redacts emails, IPs and blocklist terms on PII-bearing text") {
    val dir = java.nio.file.Files.createTempDirectory("curation_pii").toString
    import spark.implicits._
    Seq(
      (1L, "contact bob.smith+x@mail.example.org or 10.0.42.7 today", "en", "s", 0L),
      (2L, "customer query spark customer", "en", "s", 0L),
      (3L, "nothing to hide here", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = Curation.piiScrub(spark, dir).orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 1 && got(0).getLong(2) == 1)
    assert(got(0).getString(4) == "contact <email> or <ip> today")
    assert(got(1).getLong(3) == 4)
    assert(got(1).getString(4) == "<masked> <masked> <masked> <masked>")
    assert(got(2).getLong(1) == 0 && got(2).getLong(2) == 0 &&
      got(2).getLong(3) == 0 && got(2).getString(4) == "nothing to hide here")
  }
}

package graft.operators

import graft.{SparkSpec, Tables}
import graft.sources.PointStore
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The persisted curation store: night-0 build + nightly delta folds
  * must reproduce the one-shot [[Pipeline.pipelineCurateOf]] funnel
  * EXACTLY over everything ingested so far — across common-set flips
  * (both the df-growth and the threshold-move direction), monotone
  * contamination growth, exact-keeper election, cross-boundary near-dup
  * clusters, and the string-exact stripped text — while never touching
  * corpus text after night 0 (pinned here by literally deleting the
  * corpus parquet before the night runs). */
class CurateStoreSpec extends SparkSpec {

  private def freshDir(name: String): java.io.File = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"), name)
    PointStore.deleteRec(f)
    f
  }

  /** Full-row compare key→value map; doubles exact (same Spark
    * expressions on both sides), cleaned string-exact. */
  private def resultMap(df: DataFrame): Map[Long, (String, String, Long, Double, Long, Boolean, String)] =
    df.collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("content_hash"), r.getAs[String]("lang"),
          r.getAs[Long]("n_tokens"), r.getAs[Double]("quality_score"),
          r.getAs[Long]("cluster_id"), r.getAs[Boolean]("near_dup_keeper"),
          r.getAs[String]("cleaned")))
    }.toMap

  private lazy val docs = Tables.documents(spark, sf)

  test("rollbackNight ≡ a store that never ingested the night (snapshot, " +
    "health, probe), across compaction; redelivery no-op; tag retired") {
    val dirA = freshDir("graft_test_curate_rb")
    val dirB = freshDir("graft_test_curate_rb_ref")
    val corpus = docs.filter(col("doc_id") <= 299)
    val bad = docs.filter(col("doc_id") > 299 && col("doc_id") <= 399)
    val good = docs.filter(col("doc_id") > 399)
    val store = CurateStore.build(corpus, dirA.getPath)
    store.curateNight("badnight", bad)
    store.curateNight("goodnight", good)
    // fold the per-night member history away FIRST — the rollback must
    // not depend on member boundaries surviving
    store.compact()
    assert(store.rollbackNight("badnight"), "first rollback must commit")
    assert(!store.rollbackNight("badnight"), "redelivered rollback must no-op")
    assert(!store.rollbackNight("never-was"), "unknown tag must no-op")

    val ref = CurateStore.build(corpus, dirB.getPath)
    ref.curateNight("goodnight", good)
    assert(store.docCount == ref.docCount)
    assert(resultMap(store.snapshot()) == resultMap(ref.snapshot()),
      "post-rollback snapshot must equal the never-ingested store")
    def hm(df: DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(hm(store.health()) == hm(ref.health()),
      "the rolled-back night must vanish from the health series")
    val batch = docs.filter(col("doc_id") > 299 && col("doc_id") <= 330)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"), col("lang"))
    def pm(df: DataFrame) = df.collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Boolean]("keep"),
        r.getAs[Long]("n_near_dup"), r.getAs[Boolean]("contaminated"),
        r.getAs[Boolean]("boilerplate")))).toMap
    assert(pm(store.probe(batch)) == pm(ref.probe(batch)),
      "probe must price a batch as if the night never happened")

    // the tag name is burned — a fixed batch ships under a fresh tag
    // AND fresh crawl ids (the rolled-back ids are retired with it,
    // per the DedupIndex.delete contract)
    val e = intercept[IllegalArgumentException] {
      store.curateNight("badnight", bad)
    }
    assert(e.getMessage.contains("RETIRED"), e.getMessage)
    val fixed = bad.select((col("doc_id") + 500000L).as("doc_id"),
      col("text"), col("lang"))
    store.curateNight("badnight-fixed", fixed)
    ref.curateNight("badnight-fixed", fixed)
    assert(resultMap(store.snapshot()) == resultMap(ref.snapshot()),
      "a post-rollback night must fold identically on both stores")

    // compaction + vacuum after the rollback: tombstones become
    // physical, results stable
    store.compact(); store.vacuum()
    assert(resultMap(store.snapshot()) == resultMap(ref.snapshot()))
  }

  test("deleteDocs: takedowns spanning nights ≡ a store never holding " +
    "those docs; absent ids harmless; redelivery no-op; bytes reclaimed") {
    import spark.implicits._
    val dirA = freshDir("graft_test_curate_del")
    val dirB = freshDir("graft_test_curate_del_ref")
    val corpus = docs.filter(col("doc_id") <= 399)
    val delta = docs.filter(col("doc_id") > 399)
    // the takedown set spans night-0 AND night-1 docs, includes bench-
    // slice docs, plus ids never ingested (must be ignored, not crash
    // or double-decrement)
    val goneCond = col("doc_id") % 7 === 3
    val gone = docs.filter(goneCond).select(col("doc_id"))
      .unionByName(Seq(999991L, 999992L).toDF("doc_id"))
    val store = CurateStore.build(corpus, dirA.getPath)
    store.curateNight("n1", delta)
    assert(store.deleteDocs("req-77", gone), "first delivery must commit")
    assert(!store.deleteDocs("req-77", gone), "redelivery must no-op")

    val ref = CurateStore.build(corpus.filter(!goneCond), dirB.getPath)
    ref.curateNight("n1", delta.filter(!goneCond))
    assert(store.docCount == ref.docCount)
    assert(resultMap(store.snapshot()) == resultMap(ref.snapshot()),
      "post-takedown snapshot must equal the never-ingested store")
    // probe prices identically: the deleted docs' signatures, df and
    // bench contributions are all gone
    val batch = docs.filter(col("doc_id") % 7 === 3).limit(30)
      .select((col("doc_id") + 800000L).as("doc_id"), col("text"), col("lang"))
    def pm(df: DataFrame) = df.collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Boolean]("keep"),
        r.getAs[Long]("n_near_dup"), r.getAs[Boolean]("contaminated"),
        r.getAs[Boolean]("boilerplate")))).toMap
    assert(pm(store.probe(batch)) == pm(ref.probe(batch)))
    // health keeps the ingest HISTORY (what each drop brought) — the
    // series is unchanged by a takedown, unlike a rollback
    assert(store.health().count() > 0)

    // compaction makes the removal physical; results stable
    store.compact(); store.vacuum()
    assert(resultMap(store.snapshot()) == resultMap(ref.snapshot()))
    val goneIds = docs.filter(goneCond).select(col("doc_id"))
    val winFolded = spark.read.parquet(
      new java.io.File(dirA, new java.io.File(dirA, "").list()
        .filter(_.startsWith("windows-compact-")).head).getPath)
    assert(winFolded.join(goneIds, Seq("doc_id"), "left_semi").count() == 0,
      "folded windows must physically exclude taken-down docs")
  }

  test("snapshotAt reads the curated corpus as of an earlier night; " +
    "loud past the compaction horizon and on unknown nights") {
    val dir = freshDir("graft_test_curate_tt")
    val dirRef = freshDir("graft_test_curate_tt_ref")
    val corpus = docs.filter(col("doc_id") <= 399)
    val d1 = docs.filter(col("doc_id") > 399 && col("doc_id") <= 449)
    val d2 = docs.filter(col("doc_id") > 449)
    val store = CurateStore.build(corpus, dir.getPath)
    store.curateNight("n1", d1)
    store.curateNight("n2", d2)
    assert(store.nightsInOrder == Seq("base", "n1", "n2"))
    val ref = CurateStore.build(corpus, dirRef.getPath)
    ref.curateNight("n1", d1)
    assert(resultMap(store.snapshotAt("n1")) == resultMap(ref.snapshot()),
      "snapshotAt(n1) must equal a store that stopped at n1")
    assert(resultMap(store.snapshotAt("base")) ==
      resultMap(Pipeline.pipelineCurateOf(corpus)))
    assert(resultMap(store.snapshotAt("n2")) == resultMap(store.snapshot()))
    intercept[IllegalArgumentException] { store.snapshotAt("nope") }
    store.compact()
    val e = intercept[IllegalArgumentException] { store.snapshotAt("n1") }
    assert(e.getMessage.contains("compact"), e.getMessage)
  }

  test("night-0 build reproduces the one-shot funnel over the corpus") {
    val dir = freshDir("graft_test_curate_n0")
    val corpus = docs.filter(col("doc_id") <= 399)
    val store = CurateStore.build(corpus, dir.getPath)
    assert(store.docCount == corpus.count())
    assert(resultMap(store.snapshot()) ==
      resultMap(Pipeline.pipelineCurateOf(corpus)))
  }

  test("one night equals one-shot over corpus ∪ delta — with the corpus " +
    "text DELETED before the night (zero corpus re-reads), and a " +
    "redelivered night a no-op") {
    val dir = freshDir("graft_test_curate_night")
    val cDir = freshDir("graft_test_curate_night_corpus")
    val dDir = freshDir("graft_test_curate_night_delta")
    docs.filter(col("doc_id") <= 399).write.parquet(cDir.getPath)
    docs.filter(col("doc_id") > 399).write.parquet(dDir.getPath)
    val corpus = spark.read.parquet(cDir.getPath)
    val delta = spark.read.parquet(dDir.getPath)
    // expected from the ORIGINAL testdata parquet (not the doomed copy)
    val expected = resultMap(Pipeline.pipelineCurateOf(docs))
    val store = CurateStore.build(corpus, dir.getPath)
    val night0 = resultMap(store.snapshot())
    // every corpus-side nightly read must come from the store: the
    // corpus text is GONE before the night runs
    PointStore.deleteRec(cDir)
    assert(store.curateNight("n1", delta),
      "first delivery must report committed=true")
    val night1 = resultMap(store.snapshot())
    assert(night1 == expected)
    // sanity: the incremental machinery actually fired at this SF —
    // some kept corpus doc's stripped text changed under the grown
    // common set (re-strip from stored windows)
    val restripped = night0.keySet.intersect(night1.keySet)
      .filter(id => id <= 399 && night0(id)._7 != night1(id)._7)
    assert(restripped.nonEmpty,
      "no corpus doc re-stripped — the delta produced no common-set flips")
    // redelivered night: no-op (count, members, result all unchanged) —
    // and curateNight's OWN return says so (the server's committed field
    // derives from it; a caller-side pre-check would TOCTOU)
    assert(!store.curateNight("n1", delta),
      "redelivery must report committed=false")
    assert(store.docCount == 500L)
    assert(resultMap(store.snapshot()) == expected)
  }

  test("health(): per-night vocabulary and length metrics from state alone, " +
    "exact, retry-stable, compaction-invariant") {
    val dir = freshDir("graft_test_curate_health")
    val corpus = docs.filter(col("doc_id") <= 399)
    val delta = docs.filter(col("doc_id") > 399)
    val store = CurateStore.build(corpus, dir.getPath)
    store.curateNight("n1", delta)
    store.curateNight("n1", delta) // redelivered night: health unchanged

    def healthMap(df: DataFrame): Map[(String, String), (Long, Long, Long, Long)] =
      df.collect().map { r =>
        (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      }.toMap
    val got = healthMap(store.health())

    // expected, computed independently per night slice: doc count,
    // distinct shingles, token-count p50/p95 per lang
    def expect(slice: DataFrame, night: String): Map[(String, String), (Long, Long, Long, Long)] = {
      val stats = slice.select(col("doc_id"), col("lang"),
        size(Dedup.tokens(col("text"))).cast("long").as("nt"))
      val voc = Dedup.hashedShingles(slice, Curation.DecontamN)
        .join(stats.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(col("lang")).agg(countDistinct(col("shingle")).as("v"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      stats.collect().groupBy(_.getString(1)).map { case (lang, rows) =>
        val lens = rows.map(_.getLong(2)).sorted
        def disc(q: Double): Long =
          lens(math.max(1, math.ceil(q * lens.size).toInt) - 1)
        (night, lang) -> ((rows.length.toLong, voc(lang), disc(0.5), disc(0.95)))
      }
    }
    val want = expect(corpus, "base") ++ expect(delta, "n1")
    assert(got == want)

    // compaction folds the nested store without changing the series
    store.compact()
    assert(healthMap(store.health()) == want)
  }

  test("health() on a store predating the series: empty frame, and the " +
    "read mints no health/ directory (read-only-mount safe)") {
    val dir = freshDir("graft_test_curate_health_legacy")
    CurateStore.build(docs.filter(col("doc_id") <= 199), dir.getPath)
    val healthDir = new java.io.File(dir, "health")
    PointStore.deleteRec(healthDir) // simulate a pre-series store
    val reloaded = CurateStore.load(spark, dir.getPath)
    assert(reloaded.health().count() == 0)
    assert(!healthDir.exists(), "a GET-shaped read minted store litter")
  }

  test("numeric night tags are refused loudly (the nested point-store " +
    "tag contract — a date tag would lose its ledger entry on compaction)") {
    val dir = freshDir("graft_test_curate_numtag")
    val store = CurateStore.build(docs.filter(col("doc_id") <= 199), dir.getPath)
    val e = intercept[IllegalArgumentException] {
      store.curateNight("20260814", docs.filter(col("doc_id") > 480))
    }
    assert(e.getMessage.contains("non-numeric"), e.getMessage)
  }

  test("health keeps a (night, lang) row even when every doc of that lang " +
    "is too short to shingle") {
    import spark.implicits._
    val dir = freshDir("graft_test_curate_health_short")
    // lang 'xx': all docs under the shingle width (2 tokens < DecontamN=3)
    // → zero shingles, but counts and length quantiles ARE computable
    val corpus = ((0L until 20L).map(i =>
        (i, s"alpha beta gamma delta epsilon zeta token$i", "en", "s", 40L)) ++
      (20L until 26L).map(i => (i, "aa bb", "xx", "s", 5L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val store = CurateStore.build(corpus, dir.getPath)
    val got = store.health().collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.contains("xx"), s"shingle-less lang dropped from health: $got")
    assert(got("xx") == ((6L, 0L, 2L))) // 6 docs, empty vocab, p50 = 2 tokens
    assert(got("en")._1 == 20L && got("en")._2 > 0L)
  }

  test("two nights fold like one (order-insensitive state, tags distinct)") {
    val dir = freshDir("graft_test_curate_two")
    val store = CurateStore.build(docs.filter(col("doc_id") <= 299), dir.getPath)
    store.curateNight("n1",
      docs.filter(col("doc_id") > 299 && col("doc_id") <= 399))
    store.curateNight("n2", docs.filter(col("doc_id") > 399))
    assert(store.docCount == 500L)
    assert(resultMap(store.snapshot()) ==
      resultMap(Pipeline.pipelineCurateOf(docs)))
  }

  test("night retry after a crash mid-commit converges (sub-stores " +
    "already folded under the tag; the manifest flip never happened)") {
    val dir = freshDir("graft_test_curate_crash")
    val corpus = docs.filter(col("doc_id") <= 399)
    val delta = docs.filter(col("doc_id") > 399)
    val store = CurateStore.build(corpus, dir.getPath)
    // simulate the crashed attempt: signature index, df table, and bench
    // table all committed their tagged folds, then the process died
    // before any member write / manifest flip
    store.sigindex.appendTagged("n1", delta)
    val deltaSh = store.sigindex.memberRows("append-n1")
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    new PointStore(spark, s"${dir.getPath}/df", Seq("shingle"), Seq("df"), Nil)
      .appendTagged("n1", deltaSh.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")))
    new PointStore(spark, s"${dir.getPath}/bench", Seq("shingle"), Seq("n_docs"), Nil)
      .appendTagged("n1", deltaSh
        .filter(col("doc_id") % Curation.BenchMod === 0)
        .groupBy(col("shingle")).agg(count(lit(1)).as("n_docs")))
    assert(store.consumedTags.isEmpty) // the night itself never committed
    // the retry must reconstruct the PRE-night df/bench state (additive
    // subtract) and land on the identical result
    store.curateNight("n1", delta)
    assert(resultMap(store.snapshot()) ==
      resultMap(Pipeline.pipelineCurateOf(docs)))
  }

  test("night retry converges even when an offline compaction folded " +
    "the crashed attempt's sigindex member away") {
    val dir = freshDir("graft_test_curate_crashfold")
    val corpus = docs.filter(col("doc_id") <= 399)
    val delta = docs.filter(col("doc_id") > 399)
    val store = CurateStore.build(corpus, dir.getPath)
    // crashed attempt: only the signature-index append committed...
    store.sigindex.appendTagged("n1", delta)
    // ...then a maintenance compaction folds append-n1 into the base
    store.sigindex.compact()
    assert(!store.sigindex.members.contains("append-n1"))
    // the retry recovers the delta/corpus split by id against the fold
    store.curateNight("n1", delta)
    assert(resultMap(store.snapshot()) ==
      resultMap(Pipeline.pipelineCurateOf(docs)))
  }

  test("reserved or unsafe night tags are refused before any write") {
    val dir = freshDir("graft_test_curate_tags")
    val store = CurateStore.build(docs.filter(col("doc_id") <= 60), dir.getPath)
    val delta = docs.filter(col("doc_id") > 480)
    Seq("base", "compact-000", "a/b", "a:b", "").foreach { bad =>
      intercept[IllegalArgumentException](store.curateNight(bad, delta))
    }
    assert(store.docCount == 61L, "a refused tag must commit nothing")
  }

  test("probe screens a batch against current state without committing — " +
    "verdicts match a string-shingle recomputation, near-dups the " +
    "one-shot cross pairs") {
    val dir = freshDir("graft_test_curate_probe")
    val corpus = docs.filter(col("doc_id") <= 399)
    val batch = docs.filter(col("doc_id") > 399)
    val store = CurateStore.build(corpus, dir.getPath)
    val countBefore = store.docCount
    val probed = store.probe(batch).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("contaminated"), r.getAs[Boolean]("boilerplate"),
          r.getAs[Long]("n_near_dup"), r.getAs[Boolean]("keep")))).toMap
    assert(store.docCount == countBefore, "probe must commit nothing")

    // independent recomputation on STRING shingles (no stored state, no
    // hash family): the screen thresholds against the corpus as it
    // stands, batch docs screened one by one
    val minDocs = Curation.boilerplateMinDocs(corpus.count())
    def strSh(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        explode(Dedup.shingleArr(col("text"), Curation.DecontamN)).as("s"))
    val corpusSh = strSh(corpus).cache()
    val commonStr = corpusSh.groupBy(col("s")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minDocs).select(col("s"))
      .collect().map(_.getString(0)).toSet
    val benchStr = corpusSh.filter(col("doc_id") % Curation.BenchMod === 0)
      .select(col("s")).distinct().collect().map(_.getString(0)).toSet
    corpusSh.unpersist(false)
    val batchSh = strSh(batch).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // one-shot union pairs restricted to the boundary give the near-dup
    // counts (a genuinely different path from the banded index probe)
    val crossCount = Dedup.minhashDedup(docs, 3, 0.5).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a > 399) != (b > 399) }
      .groupBy { case (a, b) => math.max(a, b) }.view.mapValues(_.size).toMap
    batch.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val sh = batchSh.getOrElse(id, Set.empty[String])
      val ct = id % Curation.BenchMod != 0 && sh.exists(benchStr)
      val bp = sh.nonEmpty &&
        sh.count(commonStr).toDouble / sh.size > Curation.BoilerplateMaxFrac
      val (gotCt, gotBp, gotNd, _) = probed(id)
      assert(gotCt == ct && gotBp == bp, s"verdict mismatch for doc $id")
      assert(gotNd == crossCount.getOrElse(id, 0).toLong,
        s"near-dup count mismatch for doc $id")
    }
    assert(probed.values.exists(_._4) && probed.values.exists(!_._4),
      "probe batch should mix keeps and drops at this SF")
  }

  test("auto-compaction folds the member lists (fold-before-commit); " +
    "tag ledger, count, and results survive; vacuum reclaims") {
    val dir = freshDir("graft_test_curate_compact")
    val store = CurateStore.build(docs.filter(col("doc_id") <= 299), dir.getPath)
    store.curateNight("n1",
      docs.filter(col("doc_id") > 299 && col("doc_id") <= 399),
      autoCompactAt = 2)
    // night 2 arrives at the bound (stats members: base + n1) → the
    // existing members fold FIRST, then the night commits beside the
    // fresh base — tonight's member always survives the fold
    store.curateNight("n2", docs.filter(col("doc_id") > 399),
      autoCompactAt = 2)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.getPath, "_CURATE")))
    assert(manifest.contains("stats:stats-compact-000") &&
      manifest.contains("stats:stats-n2"), s"unexpected manifest:\n$manifest")
    assert(store.consumedTags == Set("n1", "n2"))
    assert(store.docCount == 500L)
    val expected = resultMap(Pipeline.pipelineCurateOf(docs))
    assert(resultMap(store.snapshot()) == expected)
    // a redelivered pre-compaction night is still a no-op (the ledger
    // survived the fold)
    store.curateNight("n1",
      docs.filter(col("doc_id") > 299 && col("doc_id") <= 399))
    assert(store.docCount == 500L)
    // vacuum reclaims the superseded dirs, never the sub-stores
    store.vacuum()
    assert(!new java.io.File(dir, "stats-base").exists())
    assert(new java.io.File(dir, "sigindex").exists())
    assert(resultMap(store.snapshot()) == expected)
  }

  // ---- synthetic corpus: the threshold-move flip direction (a shingle
  // LEAVES the common set because the corpus grew, resurrecting a doc
  // the night-0 screen dropped) — real testdata can only grow the set ----

  private def synDoc(id: Long, words: Seq[String]): (Long, String, String) =
    (id, words.mkString(" "), "en")

  private def synFrame(rows: Seq[(Long, String, String)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (i, t, l) => Row(i, t, l) }.asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
  }

  test("threshold move resurrects a night-0 boilerplate doc (common " +
    "shrink), with its stripped text rebuilt from stored windows") {
    val phrase = (0 until 40).map(i => s"ph$i")
    def filler(id: Long, tag: String, n: Int) =
      (0 until n).map(k => s"$tag${id}x$k")
    // 553 corpus docs → minDocs = max(3, ceil(553/200)) = 3: the phrase
    // (in exactly 3 docs) is corpus-common on night 0
    val dominated = synDoc(10, filler(10, "f", 6) ++ phrase ++ filler(10, "g", 6))
    val carriers = Seq(11L, 12L).map(id =>
      synDoc(id, filler(id, "p", 30) ++ phrase ++ filler(id, "q", 30)))
    val fillers = (13L until 563L).map(id => synDoc(id, filler(id, "w", 48)))
    val corpus = synFrame(dominated +: carriers ++: fillers)
    // 150 phrase-free delta docs → 703 total → minDocs = 4: the phrase
    // drops OUT of the common set
    val delta = synFrame((1000L until 1150L).map(id => synDoc(id, filler(id, "d", 48))))
    val union = synFrame((dominated +: carriers ++: fillers) ++
      (1000L until 1150L).map(id => synDoc(id, filler(id, "d", 48))))

    val dir = freshDir("graft_test_curate_resurrect")
    val store = CurateStore.build(corpus, dir.getPath)
    val night0 = resultMap(store.snapshot())
    // night 0: the phrase-dominated doc is boilerplate (38 of 50
    // distinct shingles common) and gone; carriers are kept with the
    // phrase stripped out of `cleaned`
    assert(!night0.contains(10L))
    assert(night0.contains(11L) && !night0(11L)._7.contains("ph0"))

    store.curateNight("n1", delta)
    val night1 = resultMap(store.snapshot())
    assert(night1 == resultMap(Pipeline.pipelineCurateOf(union)))
    // the dominated doc resurrected — and its `cleaned` was built
    // tonight from the STORED window arrays (it had no night-0 strip)
    assert(night1.contains(10L))
    assert(night1(10L)._7.contains("ph0"))
    // carriers' strips were rebuilt too: nothing is covered any more
    assert(night1(11L)._7.contains("ph0"))
  }

  test("vacuum preserves the scratch members of an IN-FLIGHT rollback/" +
    "takedown and reclaims them once the operation commits") {
    val dir = freshDir("graft_test_curate_vac")
    val corpus = docs.filter(col("doc_id") <= 199)
    val store = CurateStore.build(corpus, dir.getPath)
    // simulate the crash window of a takedown/rollback that stopped
    // AFTER its scratch members landed but BEFORE the manifest flip —
    // once sigindex.delete has committed, these dirs are the only
    // record the retry can re-derive the subtraction from
    val pending = Seq("rbdf-del-pend", "rbbench-del-pend", "ids-del-pend",
      "rbdf-rb-pend", "rbbench-rb-pend")
    (pending :+ "stray-zzz").foreach { n =>
      val d = new java.io.File(dir, n)
      assert(d.mkdirs())
      java.nio.file.Files.write(d.toPath.resolve("part-0"), "x".getBytes)
    }
    store.vacuum()
    pending.foreach(n => assert(new java.io.File(dir, n).exists(),
      s"vacuum must not reclaim in-flight scratch member $n"))
    assert(!new java.io.File(dir, "stray-zzz").exists(),
      "unrelated unmanifested dirs still reclaim")

    // a COMMITTED takedown's rbdf-/rbbench- scratch is ordinary garbage
    import spark.implicits._
    assert(store.deleteDocs("tk1", Seq(5L, 6L).toDF("doc_id")))
    assert(new java.io.File(dir, "rbdf-del-tk1").exists())
    store.vacuum()
    assert(!new java.io.File(dir, "rbdf-del-tk1").exists() &&
      !new java.io.File(dir, "rbbench-del-tk1").exists(),
      "committed-operation scratch must reclaim")
    // its roster member is manifested (deadids:) — still live
    assert(new java.io.File(dir, "ids-del-tk1").exists())
    // and the still-pending fakes survive a second vacuum unchanged
    pending.foreach(n => assert(new java.io.File(dir, n).exists()))
  }
}

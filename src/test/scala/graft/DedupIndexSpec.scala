package graft

import graft.operators.{Dedup, DedupIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted LSH signature index: incremental build/append/probe
  * must reproduce the one-shot minhash dedup exactly, and the tagged
  * append must be idempotent under redelivery — across a compaction. */
class DedupIndexSpec extends SparkSpec {

  private def freshDir(name: String): java.io.File = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"), name)
    graft.sources.PointStore.deleteRec(f)
    f
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def pairMap(df: DataFrame): Map[(Long, Long), (Long, Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
      ((r.getAs[Long]("intersection"), r.getAs[Long]("size_a"),
        r.getAs[Long]("size_b"), r.getAs[Double]("jaccard")))).toMap

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val oneShot = pairMap(Dedup.minhashDedup(docs, 3, 0.5))

  test("allPairs over a built index equals the one-shot minhash dedup") {
    val dir = freshDir("graft_test_dedupindex_all")
    val idx = DedupIndex.build(docs, dir.getPath, 3)
    assert(pairMap(idx.allPairs(0.5)) == oneShot)
  }

  test("incremental build+append+probe equals one-shot over corpus ∪ delta") {
    val dir = freshDir("graft_test_dedupindex_inc")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val idx = DedupIndex.build(corpus, dir.getPath, 3)
    val historical = pairMap(idx.allPairs(0.5))
    idx.appendTagged("n1", delta)
    val fresh = pairMap(idx.pairsInvolving("append-n1", 0.5))
    // the two halves partition the one-shot result: corpus-internal
    // pairs vs pairs with >=1 delta endpoint — no overlap, no gap
    assert(historical.keySet.intersect(fresh.keySet).isEmpty)
    assert(historical ++ fresh == oneShot)
    // sanity: the probe actually finds cross-boundary pairs at this SF
    assert(fresh.nonEmpty, "delta probe found no pairs — split too clean to test anything")
  }

  test("appendTagged redelivery is a no-op; ledger survives compaction") {
    val dir = freshDir("graft_test_dedupindex_ledger")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val idx = DedupIndex.build(corpus, dir.getPath, 3)
    idx.appendTagged("n1", delta)
    idx.appendTagged("n1", delta) // redelivery
    assert(idx.members == Seq("base", "append-n1"))
    assert(idx.consumedTags == Set("n1"))
    val rowsBefore = idx.index.count()
    // exactly one stored row per shingle-bearing doc, none duplicated
    assert(rowsBefore == docs.select(Dedup.shingleArr(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0).count())
    val before = pairMap(idx.allPairs(0.5))
    idx.compact()
    assert(idx.members.length == 1 && idx.members.head.startsWith("compact-"))
    assert(idx.consumedTags == Set("n1"), "compaction must not erase the ledger")
    // a LATE redelivery after compaction must still commit nothing
    idx.appendTagged("n1", delta)
    assert(idx.members.length == 1)
    assert(idx.index.count() == rowsBefore)
    assert(pairMap(idx.allPairs(0.5)) == before,
      "compaction changed the stored pairs")
    assert(before == oneShot)
    // vacuum reclaims exactly the superseded member dirs: base and the
    // append vanish, the compacted member / manifest / ledger survive,
    // results unchanged; a second vacuum is a no-op
    idx.vacuum()
    idx.vacuum()
    val onDisk = Option(dir.listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName).toSet
    assert(onDisk == idx.members.toSet, s"leftover dirs: $onDisk")
    assert(idx.consumedTags == Set("n1"))
    assert(pairMap(idx.reload().allPairs(0.5)) == before)
  }

  test("compact after vacuum never renames onto the live member; build refuses a live index") {
    val dir = freshDir("graft_test_dedupindex_cycle")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val idx = DedupIndex.build(corpus, dir.getPath, 3)
    val before = pairMap(idx.allPairs(0.5))
    // two full nightly cycles: append -> compact -> vacuum. A compact
    // name derived by COUNTING compact-* dirs collides with the live
    // member on the cycle after a vacuum (the overwrite would target
    // its own input); sequence numbers must come from max+1
    idx.appendTagged("n1", delta)
    idx.compact(); idx.vacuum()
    assert(idx.members == Seq("compact-000"))
    idx.appendTagged("n2", docs.limit(0)) // an empty nightly still cycles
    idx.compact(); idx.vacuum()
    assert(idx.members == Seq("compact-001"))
    idx.appendTagged("n3", docs.limit(0))
    idx.compact(); idx.vacuum() // pre-fix: count=1 -> "compact-001" == live
    assert(idx.members == Seq("compact-002"))
    assert(pairMap(idx.allPairs(0.5)) == oneShot)
    assert(before.keySet.subsetOf(oneShot.keySet))
    // in-place rebuild over a live index is refused loudly: the base
    // Overwrite would destroy data the old manifest still names
    val ex = intercept[IllegalArgumentException] {
      DedupIndex.build(corpus, dir.getPath, 3)
    }
    assert(ex.getMessage.contains("already exists"), ex.getMessage)
  }

  test("a half-written member dir is invisible until the manifest names it") {
    import spark.implicits._
    val dir = freshDir("graft_test_dedupindex_orphan")
    val idx = DedupIndex.build(docs, dir.getPath, 3)
    val before = pairMap(idx.allPairs(0.5))
    // simulate a crashed append attempt: a data directory exists on
    // disk but no manifest flip ever published it
    val orphan = new java.io.File(dir, "append-crashed")
    DedupIndex.build( // easiest way to mint a valid-looking parquet dir
      Seq((999999L, "orphan text that would corrupt pair counts orphan text"))
        .toDF("doc_id", "text"), orphan.getPath + "_idx", 3)
    java.nio.file.Files.move(
      new java.io.File(orphan.getPath + "_idx", "base").toPath, orphan.toPath)
    graft.sources.PointStore.deleteRec(new java.io.File(orphan.getPath + "_idx"))
    // readers never see it: membership and results are manifest-defined
    val re = idx.reload()
    assert(re.members == Seq("base"))
    assert(pairMap(re.allPairs(0.5)) == before)
    // and vacuum reclaims the orphan along with any superseded member
    re.vacuum()
    assert(!orphan.exists, "vacuum left the crashed attempt on disk")
  }

  test("append pins the build-time shingle width") {
    val dir = freshDir("graft_test_dedupindex_width")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val idx = DedupIndex.build(corpus, dir.getPath, 4)
    assert(idx.shingleWidth == 4)
    idx.appendTagged("n1", docs.filter(col("doc_id") % 5 === 0))
    // all pairs at width 4 equal the one-shot run at width 4
    assert(pairMap(idx.allPairs(0.5)) == pairMap(Dedup.minhashDedup(docs, 4, 0.5)))
  }

  test("a fresh handle sees a committed append; a stale snapshot does not") {
    val dir = freshDir("graft_test_dedupindex_snap")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val idx = DedupIndex.build(corpus, dir.getPath, 3)
    val stale = DedupIndex.load(spark, dir.getPath)
    idx.appendTagged("n1", docs.filter(col("doc_id") % 5 === 0))
    assert(stale.members == Seq("base"), "snapshot must not move under a reader")
    assert(stale.reload().members == Seq("base", "append-n1"))
  }

  test("registered dedup_incremental query equals the one-shot operator") {
    val got = pairMap(DedupIndex.dedupIncremental(spark, sf))
    assert(got == oneShot)
  }

  test("append past the member bound auto-compacts: ledger intact, pairs unchanged") {
    val dir = freshDir("graft_test_dedupindex_autocompact")
    val q = (m: Int) => docs.filter(col("doc_id") % 4 === m)
    val idx = DedupIndex.build(q(0), dir.getPath, 3)
    idx.appendTagged("n1", q(1), autoCompactAt = 3)
    idx.appendTagged("n2", q(2), autoCompactAt = 3)
    assert(idx.members == Seq("base", "append-n1", "append-n2"),
      "below the bound, appends must not fold")
    // at the bound, the append folds the EXISTING members first, then
    // commits its delta beside the fresh base — the just-committed
    // member must survive for the nightly pairsInvolving pattern
    idx.appendTagged("n3", q(3), autoCompactAt = 3)
    assert(idx.members == Seq("compact-000", "append-n3"),
      s"expected fold-then-commit, got ${idx.members}")
    assert(idx.consumedTags == Set("n1", "n2", "n3"),
      "auto-compaction must carry the whole ledger")
    // the nightly probe still works on the surviving member
    assert(pairMap(idx.pairsInvolving("append-n3", 0.5)).keySet
      .subsetOf(oneShot.keySet))
    // a late redelivery of a folded-away tag commits nothing AND folds
    // nothing (ledger check precedes the fold trigger)
    idx.appendTagged("n2", q(2), autoCompactAt = 3)
    assert(idx.members == Seq("compact-000", "append-n3"))
    assert(pairMap(idx.allPairs(0.5)) == oneShot,
      "auto-compaction changed the stored pairs")
  }

  test("load on a directory with no committed index fails loudly, naming it") {
    val dir = freshDir("graft_test_dedupindex_missing")
    val ex = intercept[IllegalArgumentException] {
      DedupIndex.load(spark, dir.getPath)
    }
    assert(ex.getMessage.contains(dir.getPath), ex.getMessage)
    assert(ex.getMessage.contains("_MEMBERS"), ex.getMessage)
  }

  test("verifyDisjoint append refuses an overlapping delta; clean delta passes") {
    val dir = freshDir("graft_test_dedupindex_disjoint")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val idx = DedupIndex.build(corpus, dir.getPath, 3)
    assert(idx.overlapCount(delta) == 0L)
    // an overlapping delta (one already-indexed doc smuggled in) is the
    // silent-corruption case the contract forbids — checked, it is loud
    val dirty = delta.unionByName(corpus.limit(1))
    assert(idx.overlapCount(dirty) == 1L)
    val ex = intercept[IllegalArgumentException] {
      idx.appendTagged("bad", dirty, verifyDisjoint = true)
    }
    assert(ex.getMessage.contains("already indexed"), ex.getMessage)
    assert(idx.consumedTags.isEmpty, "refused append must commit nothing")
    // the clean delta passes the same check and commits normally
    idx.appendTagged("good", delta, verifyDisjoint = true)
    assert(pairMap(idx.allPairs(0.5)) == oneShot)
  }

  test("delete(docIds): every read face equals an index never holding " +
    "those docs; redelivery no-op; compact+vacuum reclaims the bytes") {
    import spark.implicits._
    val dir = freshDir("graft_test_dedupindex_del")
    val gone = docs.filter(col("doc_id") % 7 === 0)
    val kept = docs.filter(col("doc_id") % 7 =!= 0)
    val idx = DedupIndex.build(docs, dir.getPath, 3)
    // the never-ingested reference: a fresh index over the kept docs
    val refDir = freshDir("graft_test_dedupindex_del_ref")
    val ref = DedupIndex.build(kept, refDir.getPath, 3)
    val refPairs = pairMap(ref.allPairs(0.5))

    assert(idx.delete("takedown-1", gone.select(col("doc_id"))),
      "first delivery must commit")
    assert(!idx.delete("takedown-1", gone.select(col("doc_id"))),
      "redelivered takedown must no-op")
    assert(pairMap(idx.allPairs(0.5)) == refPairs,
      "allPairs after delete must equal the never-ingested index")
    assert(idx.index.join(gone.select(col("doc_id")), Seq("doc_id"),
      "left_semi").count() == 0, "deleted ids must be gone from index")
    // probe: a copy of a deleted doc must find NOTHING (its signatures
    // are gone), while kept docs still match
    val probeGone = gone.limit(1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("lang"))
    assert(idx.probe(probeGone, 0.99).count() == 0,
      "an exact copy of a deleted doc must not match the index")
    assert(pairMap(idx.probe(kept.limit(50)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"),
          col("lang")), 0.99).filter(col("b") === col("a") - 2000000L))
      .nonEmpty, "kept docs must still self-match under probe")

    // compact applies the deletion physically; vacuum reclaims dirs
    val nGone = gone.count()
    idx.compact(); idx.vacuum()
    val names = new java.io.File(dir, "").list().toSeq
    assert(!names.exists(_.startsWith("tombs-")),
      s"tombstone dirs must be reclaimed, have $names")
    val folded = spark.read.parquet(
      new java.io.File(dir, names.filter(_.startsWith("compact-")).head).getPath)
    assert(folded.join(gone.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .count() == 0, "folded member must physically exclude deleted rows")
    assert(pairMap(idx.reload().allPairs(0.5)) == refPairs)
    assert(nGone > 0)
  }
}

package graft

import graft.operators.{Dedup, DedupIndex, IvfIndex, Merge}
import graft.sources.{PointStore, StoreFs}
import org.apache.spark.sql.functions._

/** The persisted-store family through the Hadoop FileSystem API: every
  * store works against a SCHEME-QUALIFIED path (`file:///…`), proving
  * the manifest/member handling resolves through `FileSystem`/`Path`
  * rather than `java.io.File` — the same code path an `hdfs://` or
  * `s3a://` deployment takes (per-backend atomic-rename semantics are
  * documented on [[StoreFs]]; `file://` is the backend this sandbox can
  * execute). */
class StoreFsSpec extends SparkSpec {

  private def freshUri(name: String): String = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"), name)
    graft.sources.PointStore.deleteRec(f)
    f.toURI.toString.stripSuffix("/") // "file:/tmp/…" — schemed, absolute
  }

  private def localDirOf(uri: String): java.io.File =
    new java.io.File(java.net.URI.create(uri))

  test("StoreFs atomic manifest flip on a schemed path: old or new, never torn") {
    val uri = freshUri("graft_test_storefs_atomic")
    val sfs = StoreFs(spark, uri)
    assert(!sfs.exists("_M"))
    sfs.atomicWrite("_M", "one\n#tag:a".getBytes)
    assert(sfs.linesIfExists("_M") == Seq("one", "#tag:a"))
    sfs.atomicWrite("_M", "two".getBytes) // overwrite through the same flip
    assert(sfs.linesIfExists("_M") == Seq("two"))
    // no temp sibling survives a completed commit
    assert(sfs.names().toSet == Set("_M"))
  }

  test("PointStore lifecycle on a file:// URI equals the local-path store") {
    val uri = freshUri("graft_test_storefs_point")
    val store = new PointStore(spark, uri,
      keys = Seq("game_mode", "role"),
      sums = Seq("played", "wins", "time_spent_d", "gold_d"),
      maxes = Seq("last_match"))
    val li = Tables.lineitem(spark, sf)
    def batch(m: Int) = Merge.pointAgg(li.filter(col("l_orderkey") % 3 === m))
    store.appendTagged("b0", batch(0))
    store.appendTagged("b1", batch(1))
    store.compact()
    val checkpoint = store.version
    store.appendTagged("b2", batch(2))
    store.appendTagged("b2", batch(2)) // redelivery: no-op
    assert(store.consumedTags == Set("b0", "b1", "b2"))
    // snapshot ≡ the one-shot aggregate; changefeed window = batch 2 only
    val snap = Merge.finish(store.snapshot).collect().toSet
    val oneShot = Merge.finish(Merge.pointAgg(li)).collect().toSet
    assert(snap == oneShot)
    assert(store.changesSince(checkpoint).count() ==
      Merge.pointAgg(li.filter(col("l_orderkey") % 3 === 2)).count())
    // vacuum reclaims through the FS layer too
    store.vacuum()
    val onDisk = Option(localDirOf(uri).listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName).toSet
    assert(onDisk == store.members.toSet, s"leftover dirs: $onDisk")
  }

  test("DedupIndex build/append/compact/vacuum on a file:// URI") {
    val uri = freshUri("graft_test_storefs_dedup")
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val idx = DedupIndex.build(corpus, uri, 3)
    idx.appendTagged("n1", delta)
    idx.appendTagged("n1", delta) // redelivery: no-op
    assert(idx.members == Seq("base", "append-n1"))
    val oneShot = Dedup.minhashDedup(docs, 3, 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = idx.allPairs(0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == oneShot)
    idx.compact(); idx.vacuum()
    assert(idx.members.length == 1 && idx.consumedTags == Set("n1"))
    val after = idx.reload().allPairs(0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == oneShot)
  }

  test("IvfIndex build/append/search on a file:// URI") {
    val uri = freshUri("graft_test_storefs_ivf")
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val idx = IvfIndex.buildFrom(corpus, uri)
    idx.appendTagged("n1", delta)
    idx.appendTagged("n1", delta) // redelivery: no-op
    assert(idx.consumedTags == Set("n1"))
    assert(idx.index.count() == emb.count())
    // a full-width probed search through the schemed path returns rows
    import graft.functions.VectorOps.{normalize, toDouble}
    val queries = emb.limit(2).select(col("vec_id").as("qid"),
      normalize(toDouble(col("embedding"))).as("qv"))
    assert(idx.search(queries, 5, nprobe = graft.operators.Ann.Cells).count() > 0)
  }

  test("cloneTo: a consistent point-in-time backup — clone ≡ source, " +
      "independent both ways, live-writer refusal, no inherited lease") {
    import org.apache.spark.sql.functions._
    import graft.sources.PointStore
    import graft.functions.SketchOps
    val srcUri = freshUri("graft_test_clone_src")
    val dstUri = freshUri("graft_test_clone_dst")
    def build(uri: String) = new PointStore(spark, uri,
      keys = Seq("k"), sums = Seq("n"), maxes = Nil, sketches = Seq("sk"))
    def batch(lo: Int, hi: Int) = {
      import spark.implicits._
      (lo until hi).map(i => (s"g${i % 3}", i.toLong)).toDF("k", "v")
        .groupBy(col("k")).agg(count(lit(1)).as("n"),
          SketchOps.distinctSketch(col("v"), 12, 4096).as("sk"))
    }
    def readOut(s: PointStore) = s.snapshot
      .select(col("k"), col("n"), SketchOps.sketchEst(col("sk")).as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val src = build(srcUri)
    src.appendTagged("b1", batch(0, 300))
    src.compact()
    src.appendTagged("b2", batch(300, 500))
    val atBackup = readOut(src)

    StoreFs.cloneTo(spark, srcUri, dstUri)
    // the clone answers identically, via zero-config open too
    assert(readOut(build(dstUri)) == atBackup)
    assert(readOut(PointStore.open(spark, dstUri)) == atBackup)
    // no inherited lease: the clone takes its own writer lease freely
    assert(!StoreFs(spark, dstUri).exists(StoreFs.LeaseName))

    // independence both ways: source mutates, clone frozen; clone
    // mutates, source untouched
    src.appendTagged("b3", batch(500, 600))
    assert(readOut(build(dstUri)) == atBackup, "clone must be frozen")
    build(dstUri).appendTagged("c1", batch(900, 950))
    assert(readOut(build(srcUri)) != readOut(build(dstUri)))
    assert(readOut(build(srcUri)) == readOut(src))

    // a live foreign writer on the source refuses the backup loudly
    val dst2 = freshUri("graft_test_clone_dst2")
    val sfs = StoreFs(spark, srcUri)
    sfs.atomicWrite(StoreFs.LeaseName,
      s"otherhost:999:live-writer\n${System.currentTimeMillis()}".getBytes)
    val e = intercept[IllegalStateException] {
      StoreFs.cloneTo(spark, srcUri, dst2)
    }
    assert(e.getMessage.contains("otherhost:999:live-writer"), e.getMessage)
    sfs.breakWriterLease()
    // destination-exists refusal: a backup never overwrites
    val e2 = intercept[IllegalArgumentException] {
      StoreFs.cloneTo(spark, srcUri, dstUri)
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // nested-destination refusal: a clone INTO its own source tree
    // would self-feed unboundedly (the copy keeps discovering files it
    // just wrote) — refused before any lease or mkdir side effect
    val e3 = intercept[IllegalArgumentException] {
      StoreFs.cloneTo(spark, srcUri, srcUri + "/inner-backup")
    }
    assert(e3.getMessage.contains("nested"), e3.getMessage)
    assert(!StoreFs(spark, srcUri).exists("inner-backup"))
    // …while a sibling whose NAME extends the source's is fine
    val sibUri = freshUri("graft_test_clone_src-sib") // == srcUri + "-sib"
    StoreFs.cloneTo(spark, srcUri, sibUri)
    assert(readOut(build(sibUri)) == readOut(build(srcUri)))
  }

  test("writer lease: a second live writer refuses loudly; stale and " +
    "explicit takeover; re-entrancy; exception-safe release") {
    val uri = freshUri("graft_test_storefs_lease")
    val sfs = StoreFs(spark, uri)

    // held scope excludes a FOREIGN holder (simulated by a lock file
    // another process would have created) and is re-entrant within the
    // owning JVM
    var ran = 0
    sfs.withWriterLease() {
      assert(sfs.exists(StoreFs.LeaseName))
      sfs.withWriterLease() { ran += 1 } // nested: rides the held lease
      ran += 1
    }
    assert(ran == 2 && !sfs.exists(StoreFs.LeaseName),
      "lease must release when the outermost scope exits")

    // foreign live holder → loud refusal naming it
    sfs.atomicWrite(StoreFs.LeaseName,
      s"otherhost:999:dead-beef\n${System.currentTimeMillis()}".getBytes)
    val e = intercept[IllegalStateException] { sfs.withWriterLease() { fail() } }
    assert(e.getMessage.contains("otherhost:999:dead-beef") &&
      e.getMessage.contains("write-locked"), e.getMessage)

    // crashed-holder takeover: once the heartbeat is older than staleMs
    // the next writer breaks the lease and proceeds
    sfs.atomicWrite(StoreFs.LeaseName,
      s"otherhost:999:dead-beef\n${System.currentTimeMillis() - 10000}".getBytes)
    var tookOver = false
    sfs.withWriterLease(staleMs = 1000) { tookOver = true }
    assert(tookOver && !sfs.exists(StoreFs.LeaseName))

    // explicit operator takeover for a live-looking but known-dead holder
    sfs.atomicWrite(StoreFs.LeaseName,
      s"otherhost:999:dead-beef\n${System.currentTimeMillis()}".getBytes)
    sfs.breakWriterLease()
    sfs.withWriterLease() { tookOver = true }

    // an exception inside the scope still releases (in-JVM failures must
    // not wedge the store; only a process CRASH leaves the lock behind)
    intercept[RuntimeException] {
      sfs.withWriterLease() { throw new RuntimeException("boom") }
    }
    assert(!sfs.exists(StoreFs.LeaseName))

    // opt-in bounded wait: a live foreign holder that RELEASES within
    // the window is waited out instead of crashed on (the double-firing
    // scheduler convenience); one that doesn't still refuses loudly
    sfs.atomicWrite(StoreFs.LeaseName,
      s"otherhost:999:dead-beef\n${System.currentTimeMillis()}".getBytes)
    val releaser = new Thread(() => { Thread.sleep(1500); sfs.breakWriterLease() })
    releaser.start()
    var waited = false
    sfs.withWriterLease(waitMs = 10000) { waited = true }
    releaser.join()
    assert(waited && !sfs.exists(StoreFs.LeaseName))
    sfs.atomicWrite(StoreFs.LeaseName,
      s"otherhost:999:dead-beef\n${System.currentTimeMillis()}".getBytes)
    val e2 = intercept[IllegalStateException] {
      sfs.withWriterLease(waitMs = 1200) { fail() }
    }
    assert(e2.getMessage.contains("write-locked"))
    sfs.breakWriterLease()
  }

  test("writer lease: a second THREAD in the same JVM blocks until the " +
    "holder finishes — never rides — and the lock always releases") {
    val uri = freshUri("graft_test_storefs_lease_thr")
    val sfs = StoreFs(spark, uri)
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val aIn = new java.util.concurrent.CountDownLatch(1)
    val aGo = new java.util.concurrent.CountDownLatch(1)
    val tA = new Thread(() => sfs.withWriterLease() {
      order.add("A-in"); aIn.countDown(); aGo.await(); order.add("A-out")
    })
    val tB = new Thread(() => {
      aIn.await()
      order.add("B-wait")
      sfs.withWriterLease() { order.add("B-in") }
    })
    tA.start(); tB.start()
    aIn.await()
    // B must BLOCK while A holds — two server threads interleaving
    // manifest read-modify-writes is exactly what the lease prevents
    Thread.sleep(200)
    assert(!order.contains("B-in"), s"thread B rode A's lease: $order")
    aGo.countDown(); tA.join(10000); tB.join(10000)
    assert(order.toArray.toSeq == Seq("A-in", "B-wait", "A-out", "B-in"),
      order.toString)
    // whichever thread exits last, the file is gone
    assert(!sfs.exists(StoreFs.LeaseName))
  }

  test("writer lease: store mutators are guarded — a foreign lock makes " +
    "append/compact fail fast, and a finished writer leaves no lock") {
    import spark.implicits._
    val uri = freshUri("graft_test_storefs_lease_store")
    val store = new PointStore(spark, uri,
      keys = Seq("k"), sums = Seq("n"), maxes = Nil)
    val batch = Seq(("a", 1L)).toDF("k", "n")
    store.append(batch)
    val sfs = StoreFs(spark, uri)
    assert(!sfs.exists(StoreFs.LeaseName), "no lock after a completed append")

    // a concurrent (foreign, live) writer blocks every mutator...
    sfs.atomicWrite(StoreFs.LeaseName,
      s"otherhost:999:dead-beef\n${System.currentTimeMillis()}".getBytes)
    intercept[IllegalStateException] { store.append(batch) }
    intercept[IllegalStateException] { store.appendTagged("t1", batch) }
    intercept[IllegalStateException] { store.compact() }
    intercept[IllegalStateException] { store.vacuum() }
    // ...but never a reader (many-reader contract)
    assert(store.snapshot.collect().length == 1)

    sfs.breakWriterLease()
    store.appendTagged("t1", batch)
    assert(store.snapshot.agg(sum(col("n"))).head().getLong(0) == 2L)
  }

  test("writer lease: a refused acquire never deletes the live holder's " +
    "lock (the healthy-operation half of the stale-break path)") {
    val uri = freshUri("graft_test_storefs_lease_keep")
    val sfs = StoreFs(spark, uri)
    val hb = System.currentTimeMillis()
    sfs.atomicWrite(StoreFs.LeaseName, s"otherhost:999:live-holder\n$hb".getBytes)
    intercept[IllegalStateException] { sfs.withWriterLease() { fail() } }
    // the foreign FRESH lock must survive the refusal byte-for-byte: a
    // delete here (the pre-r13 None-branch behavior reachable when the
    // holder releases mid-read) would let two writers hold concurrently
    assert(sfs.leaseHolder().contains(("otherhost:999:live-holder", hb)),
      s"refused acquire disturbed the live lock: ${sfs.leaseHolder()}")
    sfs.breakWriterLease()
  }

  test("writer lease: a commit after a mid-hold takeover aborts loudly " +
    "instead of interleaving manifest writes") {
    val uri = freshUri("graft_test_storefs_lease_lost")
    val sfs = StoreFs(spark, uri)
    intercept[IllegalStateException] {
      sfs.withWriterLease() {
        // a commit while the lease still names us goes through…
        sfs.atomicWrite("_PROBE", "ok".getBytes)
        // …then simulate a staleMs takeover: a second writer judged our
        // once-written heartbeat stale and installed its own lock (raw fs
        // delete+create, the takeover's own path — atomicWrite's nio move
        // would desync the checksummed local FS's .crc sidecar)
        sfs.fs.delete(new org.apache.hadoop.fs.Path(
          sfs.pathOf(StoreFs.LeaseName)), false)
        val out = sfs.fs.create(new org.apache.hadoop.fs.Path(
          sfs.pathOf(StoreFs.LeaseName)), false)
        try out.write(
          s"otherhost:999:usurper\n${System.currentTimeMillis()}".getBytes)
        finally out.close()
        val e = intercept[IllegalStateException] {
          sfs.atomicWrite("_MANIFEST", "torn".getBytes)
        }
        assert(e.getMessage.contains("lease") && e.getMessage.contains("lost"),
          e.getMessage)
        assert(!sfs.exists("_MANIFEST"), "the lost-lease commit must not land")
        throw e // surface: the write aborted, the night fails loudly
      }
    }
    // release must not remove the usurper's lock either
    assert(sfs.leaseHolder().exists(_._1 == "otherhost:999:usurper"))
    sfs.breakWriterLease()
  }
}

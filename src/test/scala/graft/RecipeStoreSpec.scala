package graft

import graft.sources.{Recipe, RecipeStore, StoreFs}

/** The versioned assembly-recipe store: exactly-once commits, version
  * time travel, exact double round-trips, lease-guarded mutation, and
  * membership in the store family (cloneTo, self-describing open). */
class RecipeStoreSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("recipes").toString

  private val r1 = Recipe(Seq("en" -> 1.0), 0.5, "seed-a", 1024L, 256L)
  private val r2 = Recipe(
    Seq("en" -> 2.3, "de" -> 1.5, "fr" -> 1.0, "es" -> 0.5),
    0.25, "graft-r12", 2048L, 512L)

  test("commit / version axis / time travel / exactly-once redelivery") {
    val store = RecipeStore(spark, tmpRoot("graft_rcp"))
    assert(store.version == 0L)
    assertThrows[IllegalArgumentException](store.current)

    assert(store.commit("n1", r1))
    assert(store.commit("n2", r2))
    assert(store.version == 2L)
    // at-least-once redelivery: committed=false, version axis unmoved
    assert(!store.commit("n2", r2))
    assert(store.version == 2L)

    // time travel reads the version asked for, not the latest
    assert(store.recipeAt(1L) == r1)
    assert(store.recipeAt(2L) == r2)
    assert(store.current == r2)
    // version → tag provenance link
    assert(store.tagOf(1L).contains("n1") && store.tagOf(2L).contains("n2"))
    // unknown versions fail loudly
    assertThrows[IllegalArgumentException](store.recipeAt(3L))
    assertThrows[IllegalArgumentException](store.recipeAt(0L))
  }

  test("deprecate recalls a version without rewriting history: reads " +
      "surface it, assembleAt refuses unless forced, commits preserve it") {
    val store = RecipeStore(spark, tmpRoot("graft_rcp_dep"))
    store.commit("n1", r1)
    store.commit("n2", r2)
    val corpus = Tables.documents(spark, sf)

    assert(store.deprecate(1L, "seed collision with run 7"))
    assert(!store.deprecate(1L, "second reason"), "re-deprecation no-ops")
    assert(store.deprecatedVersions == Set(1L))
    // the FIRST reason wins; provenance reads stay intact
    assert(store.deprecationOf(1L).contains("seed collision with run 7"))
    assert(store.recipeAt(1L) == r1, "history must stay readable")
    assert(store.tagOf(1L).contains("n1"))

    // replay refuses loudly, quoting the reason — unless forced
    val e = intercept[IllegalArgumentException](store.assembleAt(corpus, 1L))
    assert(e.getMessage.contains("deprecated") &&
      e.getMessage.contains("seed collision"), e.getMessage)
    assert(store.assembleAt(corpus, 1L, force = true).columns.nonEmpty)
    assert(store.assembleAt(corpus, 2L).columns.nonEmpty,
      "live versions replay unaffected")

    // the marker survives later commits (the manifest rebuild) and a
    // reopen; unknown versions and multi-line reasons refuse
    store.commit("n3", r1)
    val reopened = RecipeStore(spark, store.root)
    assert(reopened.deprecatedVersions == Set(1L))
    assert(reopened.deprecationOf(1L).contains("seed collision with run 7"))
    assertThrows[IllegalArgumentException](store.deprecate(9L, "x"))
    assertThrows[IllegalArgumentException](store.deprecate(2L, "a\nb"))
  }

  test("recipes round-trip EXACTLY, including doubles that do not print " +
      "prettily — one ulp of weight drift would move the mix keep set") {
    val ugly = Recipe(
      Seq("en" -> 0.1, "de" -> (1.0 / 3.0), "fr" -> 2.0000000000000004),
      1e-9, "s.1:x-2_Y", Long.MaxValue, 1L << 62)
    val store = RecipeStore(spark, tmpRoot("graft_rcp_ulp"))
    store.commit("t", ugly)
    val back = RecipeStore(spark, store.root).recipeAt(1L)
    assert(back == ugly) // case-class equality: bit-exact doubles
    assert(back.epochs.map(_._2).zip(ugly.epochs.map(_._2)).forall {
      case (a, b) =>
        java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b) })
  }

  test("a fresh handle opens with ZERO configuration — the store is " +
      "fully self-describing") {
    val root = tmpRoot("graft_rcp_open")
    RecipeStore(spark, root).commit("n1", r2)
    val reopened = RecipeStore(spark, root)
    assert(reopened.version == 1L && reopened.current == r2)
    assert(!reopened.commit("n1", r1)) // the tag ledger traveled too
  }

  test("malformed inputs refuse loudly: bad strata, seeds, tags, and a " +
      "non-recipe file") {
    val store = RecipeStore(spark, tmpRoot("graft_rcp_bad"))
    assertThrows[IllegalArgumentException](
      Recipe(Seq("en us" -> 1.0), 0.5, "s", 10L, 10L))
    assertThrows[IllegalArgumentException](
      Recipe(Nil, 0.5, "bad seed!", 10L, 10L))
    assertThrows[IllegalArgumentException](
      Recipe(Nil, 0.5, "s", 0L, 10L))
    // weights validate at COMMIT, not at replay: NaN/Infinity/out-of-
    // band values parse via toDouble but can never assemble (mixOf's
    // [0,64] guard) and NaN doesn't even serialize as JSON
    assertThrows[IllegalArgumentException](
      Recipe(Seq("en" -> Double.NaN), 0.5, "s", 10L, 10L))
    assertThrows[IllegalArgumentException](
      Recipe(Seq("en" -> Double.PositiveInfinity), 0.5, "s", 10L, 10L))
    assertThrows[IllegalArgumentException](
      Recipe(Seq("en" -> -0.25), 0.5, "s", 10L, 10L))
    assertThrows[IllegalArgumentException](
      Recipe(Seq("en" -> 65.0), 0.5, "s", 10L, 10L))
    assertThrows[IllegalArgumentException](
      Recipe(Nil, Double.NaN, "s", 10L, 10L))
    assertThrows[IllegalArgumentException](store.commit("a:b", r1))
    assertThrows[IllegalArgumentException](store.commit("", r1))
    val sfs = StoreFs(spark, store.root)
    sfs.atomicWrite("recipe-1", "not a recipe".getBytes("UTF-8"))
    sfs.atomicWrite(sources.RecipeStore.ManifestName,
      "recipe-1\n#tag:x\n#log:1:x".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](store.recipeAt(1L))
    assert(e.getMessage.contains("recipe-1"))
  }

  test("commits run under the family writer lease: a foreign live lock " +
      "refuses naming the holder; reads never block") {
    val store = RecipeStore(spark, tmpRoot("graft_rcp_lease"))
    store.commit("n1", r1)
    val sfs = StoreFs(spark, store.root)
    sfs.atomicWrite(StoreFs.LeaseName,
      s"otherhost:9:zz\n${System.currentTimeMillis()}".getBytes("UTF-8"))
    try {
      val e = intercept[IllegalStateException](store.commit("n2", r2))
      assert(e.getMessage.contains("otherhost:9:zz"))
      assert(store.version == 1L && store.current == r1) // reads fine
    } finally sfs.breakWriterLease()
    assert(store.commit("n2", r2)) // and the lease releases cleanly
  }

  test("assembleAt replays the EXACT layout of the version asked for — " +
      "and cloneTo backs the store up like every family member") {
    val docs = Tables.documents(spark, sf)
    val root = tmpRoot("graft_rcp_asm")
    val store = RecipeStore(spark, root)
    store.commit("n1", r1)
    store.commit("n2", r2)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    // v1 and v2 produce DIFFERENT layouts (different seed + weights)…
    val v1 = key(store.assembleAt(docs, 1L))
    val v2 = key(store.assembleAt(docs, 2L))
    assert(v1 != v2)
    // …and each equals running assembleWith under that recipe directly
    assert(v2 == key(r2.assemble(docs)))
    assert(v1 == key(r1.assemble(docs)))
    // the clone answers identically and is independent thereafter
    val cl = root + "-bk"
    StoreFs.cloneTo(spark, root, cl)
    val clone = RecipeStore(spark, cl)
    assert(clone.version == 2L && clone.recipeAt(1L) == r1)
    store.commit("n3", r1)
    assert(clone.version == 2L && store.version == 3L)
  }
}

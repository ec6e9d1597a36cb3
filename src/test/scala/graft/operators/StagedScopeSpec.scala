package graft.operators

import org.apache.spark.storage.StorageLevel

/** Lifecycle contract of [[Dedup.stagedScope]] — the one shared
  * pin/track/release path every scratch-caching operator now runs
  * through. The throw path is what the per-operator variants twice
  * mis-implemented; it gets pinned here so a future edit cannot
  * silently reintroduce the leak. */
class StagedScopeSpec extends graft.SparkSpec {

  private def cachedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("success path: scratch released, result cached") {
    import spark.implicits._
    val before = cachedIds
    val res = Dedup.stagedScope { s =>
      val a = s.pin(Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text"))
      a.groupBy().count()
    }
    assert(res.storageLevel != StorageLevel.NONE, "result must stay cached")
    assert(res.count() == 1L)
    res.unpersist(false)
    assert(cachedIds == before, "scratch pin must not outlive the scope")
  }

  test("throw path: every pinned frame is released, the cause survives") {
    import spark.implicits._
    val before = cachedIds
    val boom = intercept[IllegalStateException] {
      Dedup.stagedScope { s =>
        val a = s.pin(Seq((1L, "x")).toDF("doc_id", "text"))
        a.count() // materialize the pin so there is a real block to leak
        require(cachedIds != before, "pin must be live inside the scope")
        throw new IllegalStateException("designed exit")
      }
    }
    assert(boom.getMessage == "designed exit")
    assert(cachedIds == before, "throw path leaked a pinned cache")
  }

  test("a body that returns its own pinned frame keeps that cache") {
    import spark.implicits._
    val res = Dedup.stagedScope { s =>
      // pinned because it feeds several consumers AND is the output —
      // the release list must exclude it or the combinator would drop
      // the result's cache right after materializing it
      s.pin(Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text"))
    }
    assert(res.storageLevel != StorageLevel.NONE,
      "returned pinned frame lost its cache to the scope release")
    assert(res.count() == 2L)
    res.unpersist(false)
  }
}

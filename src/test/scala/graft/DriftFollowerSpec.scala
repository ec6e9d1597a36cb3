package graft

import graft.operators.Profile
import graft.sources.{DriftFollower, PointStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The push-shaped drift alerter: each poll's frame must equal the
  * on-demand two-snapshot drift of exactly that upstream window — across
  * upstream compaction, a follower restart, mirror compaction, and an
  * upstream vacuum that forces the loud fall-behind + resync path. */
class DriftFollowerSpec extends SparkSpec {

  private def freshRoot(name: String): java.io.File = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"), name)
    PointStore.deleteRec(f); f.mkdirs(); f
  }

  private def profileStore(path: String) = new PointStore(spark, path,
    keys = Seq("column"),
    sums = Seq("n_rows", "n_null", "sum_len"),
    maxes = Seq("max_num", "max_str"),
    sketches = Seq("dsk"),
    mins = Seq("min_num", "min_str"))

  private def dm(df: DataFrame): Map[String, Seq[String]] =
    df.collect().map(r => r.getString(0) ->
      (1 until r.length).map(i => String.valueOf(r.get(i)))).toMap

  test("per-window drift across upstream compaction and a restart; " +
      "gate verdicts ride the same poll; caught-up and baseline = None") {
    val root = freshRoot("graft_test_driftfollow")
    val up = profileStore(s"$root/up")
    val docs = Tables.documents(spark, sf)
    def night(n: Int) = Profile.profilePartial(
      docs.filter(col("doc_id") % 4 === n))

    up.appendTagged("n0", night(0))
    val f = new DriftFollower(spark, up, s"$root/down")
    assert(f.poll().isEmpty, "first fold is the baseline, not a drift")
    assert(f.poll().isEmpty, "caught up must be None")

    // night 1: the window's drift ≡ driftBetween of the upstream
    // endpoints (captured eagerly — upstream compacts later)
    val preSnap = up.snapshot
    up.appendTagged("n1", night(1))
    val expected1 = dm(Profile.driftBetween(preSnap, up.snapshot))
    val d1 = f.poll()
    assert(d1.isDefined && dm(d1.get) == expected1)

    // upstream compacts its member history; the changefeed window is
    // still readable, and a RESTARTED wrapper resumes from the ledger
    up.compact()
    val preSnap2 = up.snapshot
    up.appendTagged("n2", night(2))
    up.appendTagged("n3", night(3))
    val expected2 = dm(Profile.driftBetween(preSnap2, up.snapshot))
    val f2 = new DriftFollower(spark, up, s"$root/down")
    val d2 = f2.poll()
    // ONE poll covers both nights — a window, not a night list
    assert(d2.isDefined && dm(d2.get) == expected2)
    assert(f2.checkpoint == up.version)

    // the gate face: a fresh upstream night, verdicts in the long
    // format with every drift rule present
    up.appendTagged("n4",
      Profile.profilePartial(docs.filter(col("doc_id") % 7 === 3)))
    val g = f2.pollGate()
    assert(g.isDefined)
    val rules = g.get.collect().map(_.getString(0)).toSet
    assert(Set("rows_grew", "null_surge", "cardinality_stalled",
      "len_collapse").subsetOf(rules))
    assert(f2.pollGate().isEmpty, "caught up again")
  }

  test("mirror compaction is deferred and lossless; falling past the " +
      "upstream retention fails loudly and resync re-baselines") {
    val root = freshRoot("graft_test_driftfollow2")
    val up = profileStore(s"$root/up")
    val docs = Tables.documents(spark, sf)
    val f = new DriftFollower(spark, up, s"$root/down", compactEvery = 2)
    for (n <- 0 until 4) {
      up.appendTagged(s"n$n",
        Profile.profilePartial(docs.filter(col("doc_id") % 5 === n)))
      f.poll()
    }
    // the deferred compaction ran at some poll start; the mirror still
    // equals the upstream content exactly (identity derive, all five
    // measure classes folded through)
    assert(dm(Profile.profileFromStored(f.store.snapshot)) ==
      dm(Profile.profileFromStored(up.snapshot)))

    // vacuum the upstream past the follower's checkpoint: the next
    // poll after another append must fail LOUDLY, and resync rebuilds
    up.appendTagged("n4",
      Profile.profilePartial(docs.filter(col("doc_id") % 5 === 4)))
    up.compact(); up.vacuum()
    up.appendTagged("n5",
      Profile.profilePartial(docs.filter(col("doc_id") % 11 === 0)))
    val e = intercept[IllegalArgumentException] { f.poll() }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    f.resync()
    assert(dm(Profile.profileFromStored(f.store.snapshot)) ==
      dm(Profile.profileFromStored(up.snapshot)))
    // drift resumes from the resync baseline
    val preSnap = up.snapshot
    up.appendTagged("n6",
      Profile.profilePartial(docs.filter(col("doc_id") % 11 === 1)))
    val d = f.poll()
    assert(d.isDefined &&
      dm(d.get) == dm(Profile.driftBetween(preSnap, up.snapshot)))
  }
}

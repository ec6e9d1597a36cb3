package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench drift detector must see what the rep-spread detector
  * cannot: SUSTAINED host contention (every rep equally slow — zero
  * spread) around heavy single-rep lifecycle entries, the exact failure
  * mode that made the r9 driver artifact record 33 s for a 2 s query
  * with nothing flagged. */
class BenchDriftSpec extends AnyFunSuite {

  import Bench.Drift._

  test("median: odd, even, empty") {
    assert(median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(median(Nil) == 0.0)
  }

  test("a quiet session flags nothing") {
    val probes = IndexedSeq.fill(11)(0.05)
    assert(windowFlags(probes, 10).forall(!_))
  }

  test("normal probe jitter below 2x stays unflagged") {
    val probes = IndexedSeq(0.05, 0.06, 0.04, 0.09, 0.05, 0.051)
    assert(windowFlags(probes, 5).forall(!_))
  }

  test("synthetic contention window flags exactly the queries inside it") {
    // 10 queries, flat 50 ms probes except a contended stretch covering
    // probes 4-6 (the probes bracketing queries 3-6 read 4-6x). This is
    // the r9 shape — a SUSTAINED window, not a mid-query spike, so a
    // per-query rep spread is flat and sees nothing.
    val probes = IndexedSeq(
      0.05, 0.05, 0.05, 0.05, 0.22, 0.30, 0.25, 0.05, 0.05, 0.05, 0.05)
    val flags = windowFlags(probes, 10)
    assert(flags.zipWithIndex.collect { case (true, i) => i } == Seq(3, 4, 5, 6))
  }

  test("a heavy single-rep entry inside the window is flagged despite zero spread") {
    // one lifecycle query (index 2 of 5) with contention through its
    // whole window: both bracketing probes slow -> flagged, which is
    // what earns it the retry the single rep otherwise never gets
    val probes = IndexedSeq(0.05, 0.05, 0.24, 0.26, 0.05, 0.05)
    val flags = windowFlags(probes, 5)
    assert(flags(2))
    assert(flags.count(identity) == 3) // its neighbors share a bracketing probe
  }

  test("one slow probe is attributed to both queries it brackets") {
    val probes = IndexedSeq(0.05, 0.05, 0.30, 0.05, 0.05)
    val flags = windowFlags(probes, 4)
    assert(flags == IndexedSeq(false, true, true, false))
  }

  test("probe count must bracket the queries") {
    intercept[IllegalArgumentException] { windowFlags(IndexedSeq(0.1, 0.1), 3) }
  }

  test("an all-zero probe series (degenerate clock) flags nothing") {
    assert(windowFlags(IndexedSeq.fill(4)(0.0), 3).forall(!_))
  }
}

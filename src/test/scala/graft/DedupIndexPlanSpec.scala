package graft

import graft.operators.{Dedup, DedupIndex}
import org.apache.spark.sql.functions._

/** Plan shape of the persisted-index read paths: the band side must
  * never read the shingle arrays and the posting side must never read
  * the signatures — at 100 TB each stored column is corpus-sized, so a
  * pruning miss doubles the scan. */
class DedupIndexPlanSpec extends SparkSpec {

  private lazy val idx = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_test_dedupindex_plan")
    graft.sources.PointStore.deleteRec(d)
    DedupIndex.build(Tables.documents(spark, sf), d.getPath, 3)
  }

  test("allPairs' band-table scan prunes the shingle column") {
    val plan = Dedup.minhashCandidates(
      idx.index.select(col("doc_id") +:
        (0 until Dedup.NumHashes).map(i =>
          element_at(col("sig"), i + 1).as(s"m$i")): _*))
      .queryExecution.executedPlan.toString
    // the candidate plan reads members for bands only: sig yes, sh no
    // match to end of line: the naive struct<([^>]*)> form truncates at
    // array<bigint>'s first '>' and would mask an unpruned column
    val reads = "ReadSchema: ([^\\n]*)".r.findAllMatchIn(plan)
      .map(_.group(1)).toList
    assert(reads.nonEmpty, plan.take(500))
    reads.foreach { r =>
      assert(r.contains("sig") && !r.contains("sh:"),
        s"band scan must read sig and prune sh, got: $r")
    }
  }

  test("probe's verify reads shingles without signatures on the stored side") {
    val probeDf = Tables.documents(spark, sf).filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
    val plan = idx.probe(probeDf, 0.5).queryExecution.executedPlan.toString
    // every parquet ReadSchema over the index members must be a proper
    // subset of the stored columns (doc_id+sig for bands, doc_id+sh for
    // postings) — never all three at once
    val reads = "ReadSchema: ([^\\n]*)".r.findAllMatchIn(plan)
      .map(_.group(1)).filter(s => s.contains("sig:") || s.contains("sh:"))
      .toList
    assert(reads.nonEmpty, "no member scans found in the probe plan")
    reads.foreach { r =>
      assert(!(r.contains("sig:") && r.contains("sh:")),
        s"a member scan reads BOTH stored payload columns: $r")
    }
  }
}

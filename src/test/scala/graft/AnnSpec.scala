package graft

import graft.operators.Ann

/** IVF invariants: probing all cells degenerates to exact brute force;
  * partial probes trade recall for the cell-pruned scan. */
class AnnSpec extends SparkSpec {

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("ivf with nprobe = all cells equals brute-force top-k") {
    val exact = resultSet(Ann.annTopk(spark, sf))
    val full  = resultSet(Ann.ivfTopk(spark, sf, nprobe = Ann.Cells))
    assert(full == exact)
  }

  test("ivf partial probe returns k rows per query with measurable recall") {
    val exact = resultSet(Ann.annTopk(spark, sf))
      .map { case (q, _, n) => (q, n) }
    val part = Ann.annIvf(spark, sf).collect()
    val queries = part.map(_.getLong(0)).distinct
    assert(queries.nonEmpty)
    val counts = part.groupBy(_.getLong(0)).values.map(_.length)
    assert(counts.forall(_ <= Ann.K))
    val hits = part.count(r => exact.contains((r.getLong(0), r.getLong(2))))
    val recall = hits.toDouble / exact.size
    info(f"ann_ivf recall@${Ann.K} nprobe=${Ann.NProbe}/${Ann.Cells}: $recall%.3f")
    assert(recall > 0.0) // partial probe must still find some true neighbors
  }

  test("brute-force top-k is k-deep and self-free") {
    val rows = Ann.annTopk(spark, sf).collect()
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length == Ann.K))
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("dedup_embedding equals the all-pairs answer WITHOUT a nested-loop join") {
    import graft.functions.VectorOps._
    import org.apache.spark.sql.functions._

    val bucketed = Ann.dedupEmbedding(spark, sf)

    // the cell cover must be exact: same pairs as a literal all-pairs scan
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), normalize(toDouble(col("embedding"))).as("nv"))
    val brute = emb.select(col("vec_id").as("id_a"), col("nv").as("na"))
      .crossJoin(emb.select(col("vec_id").as("id_b"), col("nv").as("nb")))
      .filter(col("id_a") < col("id_b") &&
        dot(col("na"), col("nb")) >= Ann.DupThreshold)
      .select("id_a", "id_b")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(bucketed) == pairs(brute))
    assert(pairs(bucketed).nonEmpty)

    // and the corpus pair join must stay the hinted cell EQUI-join — the
    // one nested-loop allowed is the Cells-row metadata self-join that
    // births the candidate cell-pair list distributed (r11); an
    // all-pairs nested loop between corpus sides would also plan a
    // second BNLJ, caught by the count
    val physical = bucketed.queryExecution.executedPlan.toString
    physical.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach { l =>
        assert(l.toLowerCase.contains("acos"),
          s"a nested-loop join that is NOT the cover-metadata self-join " +
            s"(its condition would carry the acos bound) leaked in:\n$l")
      }
    assert(physical.contains("ShuffledHashJoin"),
      s"corpus pair join is no longer the hinted cell equi-join:\n$physical")
    assert(!physical.contains("CartesianProduct"))
  }
}

package graft

import graft.operators.CurateStore
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan shape of a curate-store night, captured live off every action
  * the fold runs: document TEXT may only ever be scanned from the
  * delta's files (the O(delta) kernel claim at the plan level — the
  * corpus contributes columnar stored state only), and no signature-
  * index member scan reads both stored payload columns at once (the
  * DedupIndexPlanSpec pruning rule, re-checked through this caller). */
class CurateStorePlanSpec extends SparkSpec {

  test("a night scans text only from the delta files; member scans stay pruned") {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_test_curate_plan")
    val deltaDir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_test_curate_plan_delta")
    graft.sources.PointStore.deleteRec(dir)
    graft.sources.PointStore.deleteRec(deltaDir)
    val docs = Tables.documents(spark, sf)
    val store = CurateStore.build(docs.filter(col("doc_id") <= 399), dir.getPath)
    docs.filter(col("doc_id") > 399).write.parquet(deltaDir.getPath)
    val delta = spark.read.parquet(deltaDir.getPath)

    val plans = scala.collection.mutable.ListBuffer.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      store.curateNight("n1", delta)
      // the listener is async: wait for the capture to quiesce
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(300)
        val now = plans.synchronized(plans.size)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    } finally spark.listenerManager.unregister(listener)

    val captured = plans.synchronized(plans.toList)
    assert(captured.nonEmpty, "listener captured no night plans")

    // 1. every file scan whose ReadSchema includes the text column must
    // be rooted at the DELTA's files — corpus text is never re-read
    val scanRe = "FileScan parquet [^\\n]*".r
    val textScans = captured.flatMap(p => scanRe.findAllIn(p))
      .filter(_.contains("text"))
    assert(textScans.nonEmpty, "no delta text scans found — wrong capture")
    textScans.foreach { s =>
      assert(s.contains(deltaDir.getName),
        s"a night plan scans text outside the delta files: $s")
    }

    // 2. signature-index member scans never read sig and sh together
    captured.flatMap(p => scanRe.findAllIn(p))
      .filter(s => s.contains("sigindex"))
      .foreach { s =>
        assert(!(s.contains("sig:") && s.contains("sh:")),
          s"a sigindex member scan reads BOTH payload columns: $s")
      }

    // 3. the heavy stored rows — window arrays (w, whs) and shingle
    // sets (sh) — never cross a shuffle: their restriction joins must
    // broadcast the delta-derived id/probe side instead. Exchange
    // output schemas in the plan string carry the column list.
    val exchRe = "Exchange hashpartitioning[^\\n]*".r
    // word-start match: `content_hash#…` must not trip the `sh#` check
    val arrayCol = "(?<![A-Za-z0-9_])(whs|sh)#[0-9]".r
    captured.flatMap(p => exchRe.findAllIn(p)).foreach { e =>
      assert(arrayCol.findFirstIn(e).isEmpty,
        s"a stored array column crossed a shuffle exchange: $e")
    }
  }
}

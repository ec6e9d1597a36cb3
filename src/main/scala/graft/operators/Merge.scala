package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental additive-merge semantics (crunch_global.sql:58-75,
  * worker.js:119-165).
  *
  * The reference folds each batch of participants into point tables with
  * `ON DUPLICATE KEY UPDATE x = x + VALUES(x)`. The distributed
  * re-expression: aggregate each batch independently to the dimension
  * tuple, then merge batches by re-aggregating on the same key — a pure
  * shuffle-on-key combine with no driver state and no collect(). The
  * defining law (tested in MergeSpec and by the `upsert_merge` oracle):
  * crunch(A) ⊕ crunch(B) == crunch(A ∪ B).
  */
object Merge {

  /** Per-batch point aggregation at the dimension tuple. */
  private[graft] def pointAgg(batch: DataFrame): DataFrame =
    batch
      .groupBy(col("l_returnflag").as("game_mode"), col("l_linestatus").as("role"))
      .agg(
        count(lit(1)).as("played"),
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("wins"),
        sum(dec(col("l_quantity"))).as("time_spent_d"),
        sum(dec(col("l_extendedprice"))).as("gold_d"),
        max(col("l_orderkey")).as("last_match"))

  /** Additive merge of point partials: sums add, max folds — the exact
    * column-wise ON DUPLICATE semantics, as one distributed re-agg. */
  def merge(points: Seq[DataFrame]): DataFrame =
    points.reduce(_ unionByName _)
      .groupBy(col("game_mode"), col("role"))
      .agg(
        sum(col("played")).as("played"),
        sum(col("wins")).as("wins"),
        sum(col("time_spent_d")).as("time_spent_d"),
        sum(col("gold_d")).as("gold_d"),
        max(col("last_match")).as("last_match"))

  private[graft] def finish(df: DataFrame): DataFrame =
    df.select(
      col("game_mode"), col("role"), col("played"), col("wins"),
      col("time_spent_d").cast("double").as("time_spent"),
      col("gold_d").cast("double").as("gold"),
      col("last_match"))

  /** `upsert_merge`: split lineitem into two batches on the order key,
    * crunch each, merge — the oracle computes the one-shot aggregate, so a
    * hash match proves the merge law end-to-end. */
  def upsertMerge(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 =!= 0)
    finish(merge(Seq(pointAgg(a), pointAgg(b))))
  }

  /** The one definition of the point-aggregate oracle SELECT (and its
    * hash-stability casts), shared by every query whose content is
    * [[pointAgg]]-derived — upsert_merge, batch_driver, and the three
    * point-store lifecycle queries. `keySelect` picks the grain,
    * `where` the batch subset. */
  def pointOracle(keySelect: Seq[String] =
                    Seq("l_returnflag AS game_mode", "l_linestatus AS role"),
                  where: String = ""): String = s"""
    SELECT ${keySelect.mkString(", ")},
      count(*) AS played,
      CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS wins,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS time_spent,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gold,
      max(l_orderkey) AS last_match
    FROM lineitem
    $where
    GROUP BY ${(1 to keySelect.size).mkString(", ")}"""

  def upsertMergeOracle: String = pointOracle()

  /** Batch driver (worker.js:119-165): buffers ids to BATCHSIZE, flushes a
    * crunch per batch, merges results — `batch_driver` runs it over match
    * ids split into reference-sized batches. The queue transport is
    * environment; the batch/flush/merge semantics and the failed-batch
    * routing (worker.js's nack-to-failed-queue) are what's preserved: a
    * batch whose crunch plan fails to materialize is routed whole to
    * [[failed]] for redelivery instead of poisoning the merge. */
  /** `accept` is the per-MESSAGE ingest guard (worker.js:129-137: an
    * oversized/malformed payload is nack-dropped before it ever reaches
    * the buffer — only the one message dies, unlike a crunch failure
    * which routes the whole batch to [[Cruncher.failed]]).
    *
    * `reliability` is worker.js:139-143's RELIABILITY knob: below 1.0,
    * messages are probabilistically nack-dropped at consume time (load
    * shedding), routing exactly like guard rejections — dropped alone,
    * never buffered, never remembered. The coin is a seeded splitmix64
    * hash of the id, so a shed set is deterministic per (seed, corpus)
    * and replayable in tests, unlike the reference's Math.random().
    *
    * `onUpdate` is worker.js:184-190's batch-completion publish: a
    * message may carry a notify topic, and when its batch's crunch
    * succeeds (the ack point), `onUpdate(topic)` fires once per
    * notifying message — a failed batch nacks and notifies nothing. */
  final class Cruncher(s: SparkSession, d: String, batchSize: Int = 1000,
                       validate: DataFrame => DataFrame = identity,
                       loadTimeoutMs: Long = Long.MaxValue,
                       now: () => Long = () => System.nanoTime() / 1000000L,
                       accept: Long => Boolean = _ => true,
                       reliability: Double = 1.0,
                       shedSeed: Long = 42L,
                       onUpdate: String => Unit = _ => ()) {
    private var pending = Vector.empty[Long]
    private var pendingNotifies = Vector.empty[String]
    private var crunched = Vector.empty[DataFrame]
    private var failedBatches = Vector.empty[Vector[Long]]
    private var oldestPendingAt = Long.MaxValue
    /** Batches whose materialization is running concurrently — the queue
      * transport's prefetch: a worker need not drain batch N before
      * batch N+1 starts crunching, and the merge law (MergeSpec: any
      * split, any order) makes completion order irrelevant to the
      * result. Outcomes are collected, in submission order, in
      * [[result]]. */
    private var inFlight = Vector.empty[(Vector[Long], Vector[String],
      Option[DataFrame], scala.concurrent.Future[Unit])]
    private implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // per-batch scans re-read the fact parquet (Catalyst prunes to the
    // point-schema columns); A/B-measured against pinning the slice in
    // the block manager and the scan wins for one-shot batch runs —
    // columnar-cache encode costs more than the pruned re-reads
    private val li = lineitem(s, d)

    private var rejectedMsgs = Vector.empty[Long]

    /** Buffer an id; flush when the batch fills OR the oldest buffered id
      * has waited past loadTimeoutMs (worker.js's LOAD_TIMEOUT flush —
      * latency bound for a trickling queue; `now` injectable for tests).
      * A message failing the ingest guard is dropped alone ([[rejected]]);
      * re-delivered duplicates collapse ACROSS batches: an id accepted
      * into any batch — buffered, in flight, or already crunched — is
      * dropped on re-delivery, so its rows are never summed twice across
      * merged partials. The one exception is a FAILED batch: its ids are
      * forgotten when the batch routes to [[failed]], because the nack
      * contract means the queue redelivers them for retry. The accepted
      * set is driver state sized by the run's distinct ids — the same
      * order as the id queue this class simulates; a production dedup
      * store lives off-driver. */
    private var seenIds = Set.empty[Long]

    def submit(matchId: Long): Unit = submit(matchId, None)

    /** Submit with an optional notify topic (worker.js's per-message
      * `notify` header): fires `onUpdate(topic)` when this message's
      * batch completes successfully. */
    def submit(matchId: Long, notify: Option[String]): Unit = {
      if (!accept(matchId)) { rejectedMsgs :+= matchId; return }
      if (reliability < 1.0 && shedCoin(matchId) >= reliability) {
        shedMsgs :+= matchId; return
      }
      if (seenIds(matchId)) return
      if (pending.isEmpty) oldestPendingAt = now()
      pending :+= matchId
      pendingNotifies ++= notify
      seenIds += matchId
      if (pending.size >= batchSize || now() - oldestPendingAt >= loadTimeoutMs)
        flush()
    }

    /** Ids nack-dropped by the ingest guard, in arrival order. */
    def rejected: Seq[Long] = rejectedMsgs

    /** Ids nack-dropped by RELIABILITY shedding, in arrival order. */
    def shed: Seq[Long] = shedMsgs

    private var shedMsgs = Vector.empty[Long]

    /** splitmix64 of (seed ^ id) → uniform [0, 1): the deterministic
      * stand-in for worker.js's Math.random() shed coin. */
    private def shedCoin(id: Long): Double = {
      var z = (shedSeed ^ id) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      (z >>> 11).toDouble / (1L << 53).toDouble
    }

    def flush(): Unit = if (pending.nonEmpty) {
      import s.implicits._
      val batchIds = pending
      val batchNotifies = pendingNotifies
      pending = Vector.empty
      pendingNotifies = Vector.empty
      oldestPendingAt = Long.MaxValue
      // Plan CONSTRUCTION (validate + eager Dataset analysis) can throw
      // just like execution — a validator raising synchronously or an
      // AnalysisException at resolution time. The buffer is already
      // cleared by now, so an escaping throw would lose the batch from
      // both queues; instead a NON-FATAL failure enters [[inFlight]] as
      // an already-failed outcome and [[result]] routes it to [[failed]]
      // in submission order, exactly like a runtime crunch failure
      // (worker.js's nack contract). Fatal JVM errors (OOM, stack
      // overflow) still propagate by design: a dying worker doesn't
      // file its own nack — the broker's redelivery of the unacked
      // batch is the recovery path, in worker.js and here alike.
      scala.util.Try {
        val ids = batchIds.toDF("id")
        val point = pointAgg(validate(
          li.join(broadcast(ids), col("l_orderkey") === col("id"), "left_semi")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // Force FULL materialization of the batch plan as planned:
        // df.count() re-optimizes and PRUNES the aggregate measures (so a
        // row failing inside a measure column never evaluates), and
        // isEmpty/take(1) stops at the first non-empty partition. toRdd
        // executes every column of every partition — and because the frame
        // is persisted first, this one execution BUILDS the cached partial
        // that result()'s merge reuses: fault isolation and the merge share
        // a single computation of each batch (the r3 double-compute fix).
        // Materialization runs as a concurrent Spark job (queue prefetch);
        // [[result]] collects success/failure per batch.
        val fut = scala.concurrent.Future { point.queryExecution.toRdd.count(); () }
        (point, fut)
      } match {
        case scala.util.Success((point, fut)) =>
          inFlight :+= ((batchIds, batchNotifies, Some(point), fut))
        case scala.util.Failure(e) =>
          inFlight :+= ((batchIds, batchNotifies, None,
            scala.concurrent.Future.failed(e)))
      }
    }

    /** Failed-queue contents, in arrival order (worker.js failed routing). */
    def failed: Seq[Seq[Long]] = failedBatches

    /** Await the in-flight batch materializations (in submission order:
      * failed-queue ordering is part of the routing contract), then merge
      * over the cached partials. The partials stay cached so the caller's
      * consumption reuses the one execution [[flush]] paid for; they are
      * dimension-tuple-grain rows (a handful per batch), not data-sized
      * scratch — call [[release]] to drop them once the merged result has
      * been consumed. */
    def result(): DataFrame = {
      flush()
      // Notifications fire AFTER the commit loop, outside the
      // failure-routing try: a throwing onUpdate (a flaky broker) must
      // lose at most notifications — never route an already-merged batch
      // to the failed queue, whose redelivery would double-count it.
      var toNotify = Vector.empty[String]
      inFlight.foreach { case (batchIds, notifies, point, fut) =>
        try {
          scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration.Inf)
          crunched :+= point.get
          toNotify ++= notifies
        } catch { case scala.util.control.NonFatal(_) =>
          point.foreach(_.unpersist(false))
          failedBatches :+= batchIds
          seenIds --= batchIds // nack: the queue redelivers a failed batch
        }
      }
      inFlight = Vector.empty
      // the ack point: publish crunch_update per notifying message
      // (worker.js:184-190); a failed batch nacks and never notifies.
      // Each publish is individually fault-isolated: one flaky-broker
      // throw loses THAT notification only (at-most-once, same as the
      // reference's publish-after-ack) — never the later notifications
      // and never the merged result the caller is owed.
      toNotify.foreach(t => try onUpdate(t)
        catch { case scala.util.control.NonFatal(_) => () })
      // every batch failed (or nothing was submitted): the merge over
      // the healthy batches is the EMPTY point frame, not a reduce crash
      if (crunched.isEmpty)
        finish(pointAgg(lineitem(s, d).filter(lit(false))))
      else finish(merge(crunched))
    }

    /** Drop the cached batch partials (after consuming [[result]]). */
    def release(): Unit = { crunched.foreach(_.unpersist(false)); crunched = Vector.empty }

    /** Full lifecycle reset for a long-lived driver: [[release]] the
      * cached partials AND clear the accepted-id dedup set, the failed
      * queue, the reject log, and any unflushed buffer — the complete
      * driver state, so a Cruncher reused across runs does not leak
      * memory with the corpus's distinct-id count. Call between runs,
      * after consuming [[result]] (any still-in-flight batch is awaited
      * and discarded, so no future races a cleared cache). */
    def reset(): Unit = {
      inFlight.foreach { case (_, _, point, fut) =>
        scala.util.Try(
          scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration.Inf))
        point.foreach(_.unpersist(false))
      }
      inFlight = Vector.empty
      release()
      seenIds = Set.empty
      failedBatches = Vector.empty
      rejectedMsgs = Vector.empty
      shedMsgs = Vector.empty
      pending = Vector.empty
      pendingNotifies = Vector.empty
      oldestPendingAt = Long.MaxValue
    }
  }

  def batchDriver(s: SparkSession, d: String): DataFrame = {
    // deterministic "queue": every even order id at this SF. The id
    // stream STAYS an iterator — toLocalIterator over sorted partitions
    // holds one partition of longs on the driver at a time, so the queue
    // stand-in itself survives a 100× id count (a collect() here was
    // ~1.2 GB of driver ids at that scale).
    val src = orders(s, d).filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"))
    val n = src.count()
    // Batch size scales with the queue so the merged plan stays a handful
    // of scans at any SF — MergeSpec proves the merge law holds for ANY
    // split, so batch count is purely a throughput knob (the reference's
    // BATCHSIZE=1000 plays the same role for its upsert round-trips).
    // clamp before toInt: at the 100x id counts this rewrite targets,
    // n/4 can exceed Int.MaxValue and a wrapped negative batch size
    // would flush every message as its own batch
    val c = new Cruncher(s, d,
      batchSize = math.min(math.max(1000L, n / 4), Int.MaxValue.toLong).toInt)
    import scala.jdk.CollectionConverters._
    src.orderBy("o_orderkey").toLocalIterator().asScala
      .foreach(r => c.submit(r.getLong(0)))
    c.result()
  }

  def batchDriverOracle: String = pointOracle(where = """
    WHERE l_orderkey % 2 = 0
      AND l_orderkey IN (SELECT o_orderkey FROM orders)""")
}

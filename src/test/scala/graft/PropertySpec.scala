package graft

import graft.operators.{AsOf, Merge}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (raw ScalaCheck generators, deterministic
  * seeds) of the two algebraic claims the engine's incremental and
  * temporal semantics rest on. */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("merge law holds for arbitrary modulus splits") {
    val li = Tables.lineitem(spark, sf)
    val oneShot = rows(Merge.finish(Merge.merge(Seq(Merge.pointAgg(li)))))
    for (m <- 2 to 6) {
      val parts = (0 until m).map(i => li.filter(col("l_orderkey") % m === i))
      val merged = rows(Merge.finish(Merge.merge(parts.map(Merge.pointAgg))))
      assert(merged == oneShot, s"split modulus $m")
    }
  }

  test("as-of join (composed and native) agrees with brute force on random data") {
    import spark.implicits._
    val pairGen = Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 50L))
    for (seed <- 1L to 4L) {
      val evs  = sample(Gen.listOfN(40, pairGen), seed)
      val ords = sample(Gen.listOfN(25, pairGen), seed + 100)
      val ev = evs.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "event_id")
      val ord = ords.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong, (k * 100 + t).toDouble) }
        .toDF("k", "t", "o_orderkey", "o_totalprice")

      // brute force: latest order at-or-before; on time ties the greatest
      // tieBreak (o_orderkey = index) wins
      val expected = evs.zipWithIndex.map { case ((k, t), i) =>
        val cand = ords.zipWithIndex
          .filter { case ((ok, ot), _) => ok == k && ot <= t }
        val best = if (cand.isEmpty) None
          else Some(cand.maxBy { case ((_, ot), oi) => (ot, oi) }._2.toLong)
        (i.toLong, best)
      }.toSet

      for (variant <- Seq("composed", "native")) {
        val joined = variant match {
          case "composed" => AsOf.join(ev, ord, "k", "t", "o_orderkey",
            Seq("o_orderkey", "o_totalprice"))
          case _ => AsOf.joinNative(spark, ev, ord, "k", "t", "o_orderkey",
            Seq("o_orderkey", "o_totalprice"))
        }
        val got = joined.select(col("event_id"), col("o_orderkey"))
          .collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toSet
        assert(got == expected, s"$variant variant, seed $seed")
      }
    }
  }

  test("funnel reaches agree with the in-memory chained fold on random " +
      "event streams (duplicate timestamps and all orderings included)") {
    import spark.implicits._
    val steps = Seq("a", "b", "c")
    // small time domain on purpose: duplicate timestamps and same-step
    // repeats must be common, they are the edge the strict-> law lives on
    val evGen = Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 12L),
      Gen.oneOf(steps ++ Seq("noise")))
    // horizonSec = None is the unbounded law; 3 s binds hard on a
    // 12-second domain (chained deadlines reject most later steps)
    for (seed <- 1L to 6L; horizonSec <- Seq(None, Some(3L))) {
      val evs = sample(Gen.listOfN(60, evGen), seed)
      val df = evs.map { case (u, t, s) =>
        (u, new java.sql.Timestamp(t * 1000L), s) }
        .toDF("user_id", "ts", "event_type")
      // reference: per user, the chained first-occurrence law applied
      // to the sorted stream — t_k = min step-k time strictly after
      // (and within horizon of, inclusive) t_(k-1); step 1 unbounded
      val expected = steps.indices.map { k =>
        evs.groupBy(_._1).flatMap { case (u, es) =>
          steps.take(k + 1).zipWithIndex
            .foldLeft(Option(Long.MinValue)) { case (bound, (s, j)) =>
              bound.flatMap(b => es.filter(e => e._3 == s && e._2 > b &&
                  (j == 0 || horizonSec.forall(h => e._2 <= b + h)))
                .map(_._2).minOption)
            }.map(t => (u, t))
        }.toSet
      }
      val got = graft.operators.Windows
        .funnelOf(df, steps, horizonSec.map(_ * 1000L)).map(
        _.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L))
          .toSet)
      assert(got == expected, s"seed $seed horizon $horizonSec")
    }
  }

  test("segmented funnel payload agrees with the in-memory entry-sample " +
      "law on random streams — duplicate (ts, seg) entry ties included, " +
      "and the sample never disturbs the reach times") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val steps = Seq("a", "b", "c")
    val segs = Seq("s1", "s2", "s3")
    // small domains on purpose: duplicate timestamps AND duplicate
    // (ts, seg) pairs must be common — the tie law is the edge
    val evGen = Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 12L),
      Gen.oneOf(steps ++ Seq("noise")), Gen.oneOf(segs))
    for (seed <- 1L to 6L; horizonSec <- Seq(None, Some(3L))) {
      val evs = sample(Gen.listOfN(60, evGen), seed)
      val df = evs.map { case (u, t, s, g) =>
        (u, new java.sql.Timestamp(t * 1000L), s, g) }
        .toDF("user_id", "ts", "event_type", "seg")
      // reference: the plain chained-law reach times (the segment is a
      // PAYLOAD — it must never change who converts or when), with the
      // entry segment = the seg of the user's minimum (ts, seg)
      // step-1 pair riding every stage
      val entrySeg = evs.groupBy(_._1).flatMap { case (u, es) =>
        es.filter(_._3 == steps.head).map(e => (e._2, e._4)).minOption
          .map(p => u -> p._2) }
      val expected = steps.indices.map { k =>
        evs.groupBy(_._1).flatMap { case (u, es) =>
          steps.take(k + 1).zipWithIndex
            .foldLeft(Option(Long.MinValue)) { case (bound, (s, j)) =>
              bound.flatMap(b => es.filter(e => e._3 == s && e._2 > b &&
                  (j == 0 || horizonSec.forall(h => e._2 <= b + h)))
                .map(_._2).minOption)
            }.map(t => (u, entrySeg(u), t))
        }.toSet
      }
      val got = graft.operators.Windows
        .funnelOf(df, steps, horizonSec.map(_ * 1000L),
          by = Some(col("seg")))
        .map(_.collect().map(r => (r.getLong(0), r.getString(2),
          r.getTimestamp(1).getTime / 1000L)).toSet)
      assert(got == expected, s"seed $seed horizon $horizonSec")
    }
  }

  test("excluded funnel agrees with the in-memory void law on random " +
      "streams — the excluded event voids only in the OPEN interval, " +
      "greedy first-occurrence never rescued, horizon composed") {
    import spark.implicits._
    val steps = Seq("a", "b", "c")
    val ex = Map(2 -> "x", 3 -> "x")
    // excluded events as common as steps: the void path must fire often
    val evGen = Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 12L),
      Gen.oneOf(steps ++ Seq("x", "noise")))
    for (seed <- 1L to 6L; horizonSec <- Seq(None, Some(3L))) {
      val evs = sample(Gen.listOfN(60, evGen), seed)
      val df = evs.map { case (u, t, s) =>
        (u, new java.sql.Timestamp(t * 1000L), s) }
        .toDF("user_id", "ts", "event_type")
      // reference: the chained law with one extra test per hop — the
      // candidate reach t_k (FIRST in-order step-k event, horizon
      // applied) voids iff an excluded event lies strictly between
      // t_(k-1) and t_k; a voided user leaves the funnel (greedy — no
      // later clean pair rescues)
      val expected = steps.indices.map { k =>
        evs.groupBy(_._1).flatMap { case (u, es) =>
          steps.take(k + 1).zipWithIndex
            .foldLeft(Option(Long.MinValue)) { case (bound, (s, j)) =>
              bound.flatMap { b =>
                es.filter(e => e._3 == s && e._2 > b &&
                    (j == 0 || horizonSec.forall(h => e._2 <= b + h)))
                  .map(_._2).minOption
                  .filter(tk => j == 0 ||
                    !es.exists(e => e._3 == "x" && e._2 > b && e._2 < tk))
              }
            }.map(t => (u, t))
        }.toSet
      }
      val got = graft.operators.Windows
        .funnelOf(df, steps, horizonSec.map(_ * 1000L), exclude = ex).map(
        _.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L))
          .toSet)
      assert(got == expected, s"seed $seed horizon $horizonSec")
    }
  }

  test("filtered funnel (stepWhere) agrees with the in-memory law on " +
      "random streams — the predicate narrows the candidate set BEFORE " +
      "the chained min, horizon composed on the narrowed set") {
    import spark.implicits._
    val steps = Seq("a", "b", "c")
    val evGen = Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 12L),
      Gen.oneOf(steps :+ "noise"), Gen.choose(0, 10))
    for (seed <- 1L to 6L; horizonSec <- Seq(None, Some(3L))) {
      val evs = sample(Gen.listOfN(60, evGen), seed)
      val df = evs.map { case (u, t, s, v) =>
        (u, new java.sql.Timestamp(t * 1000L), s, v.toDouble) }
        .toDF("user_id", "ts", "event_type", "value")
      // predicate on steps 2 and 3: the event's value must exceed 5 —
      // with values uniform on 0..10 the narrowed min shifts often
      val where = Map(2 -> (col("value") > 5.0), 3 -> (col("value") > 5.0))
      def qualifies(j: Int, v: Int) = j == 0 || v > 5
      val expected = steps.indices.map { k =>
        evs.groupBy(_._1).flatMap { case (u, es) =>
          steps.take(k + 1).zipWithIndex
            .foldLeft(Option(Long.MinValue)) { case (bound, (s, j)) =>
              bound.flatMap { b =>
                es.filter(e => e._3 == s && qualifies(j, e._4) &&
                    e._2 > b &&
                    (j == 0 || horizonSec.forall(h => e._2 <= b + h)))
                  .map(_._2).minOption
              }
            }.map(t => (u, t))
        }.toSet
      }
      val got = graft.operators.Windows
        .funnelOf(df, steps, horizonSec.map(_ * 1000L), stepWhere = where)
        .map(_.collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L))
          .toSet)
      assert(got == expected, s"seed $seed horizon $horizonSec")
    }
  }

  test("deepest-funnel exclusions agree with the in-memory per-anchor " +
      "void law on random streams — an excluded event voids an anchor's " +
      "hop only in the OPEN interval between that anchor's reaches, " +
      "other anchors search on") {
    import spark.implicits._
    val steps = Seq("a", "b", "c")
    val ex = Map(2 -> "x", 3 -> "x")
    val evGen = Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 12L),
      Gen.oneOf(steps ++ Seq("x", "noise")))
    for (seed <- 1L to 6L; horizonSec <- Seq(3L, 5L)) {
      val evs = sample(Gen.listOfN(60, evGen), seed)
      val df = evs.map { case (u, t, s) =>
        (u, new java.sql.Timestamp(t * 1000L), s) }
        .toDF("user_id", "ts", "event_type")
      // reference: per (user, anchor) the greedy chain within the
      // anchor's deadline, each hop's candidate voided iff an excluded
      // event lies strictly between the previous reach and it
      val expected = steps.indices.map { k =>
        // groupBy gives a Map — flatMap must run on a Seq of groups, or
        // the (u, t1) result pairs would collapse to one anchor per user
        evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
          es.filter(_._3 == steps.head).map(_._2).distinct.flatMap { t1 =>
            val deadline = t1 + horizonSec
            steps.take(k + 1).zipWithIndex
              .foldLeft(Option(Long.MinValue)) { case (bound, (s, j)) =>
                bound.flatMap { b =>
                  if (j == 0) Some(t1)
                  else es.filter(e => e._3 == s && e._2 > b &&
                      e._2 <= deadline)
                    .map(_._2).minOption
                    .filter(tk => !es.exists(e => e._3 == "x" &&
                      e._2 > b && e._2 < tk))
                }
              }.map(_ => (u, t1))
          }
        }.toSet
      }
      val got = graft.operators.Windows
        .funnelDeepestOf(df, steps, horizonSec * 1000L, exclude = ex)
        .map(_.select("user_id", "t1").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L))
          .toSet)
      assert(got == expected, s"seed $seed horizon $horizonSec")
    }
  }

  test("trigram backoff probe agrees with the in-memory estimator on " +
      "random corpora (unseen contexts at every order, short docs absent, " +
      "identical decimal-before-sum rounding)") {
    import spark.implicits._
    import graft.operators.TextOps
    // tiny vocabulary so all three backoff levels fire: common words
    // dominate the history, rares appear only in the probe batch
    val word = Gen.frequency(8 -> Gen.oneOf("a", "b", "c", "d"),
      2 -> Gen.oneOf("x", "y", "zz"))
    val docGen = Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, word))
    def dec6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    for (seed <- 1L to 4L) {
      val docs = sample(Gen.listOfN(30, docGen), seed).zipWithIndex
        .map { case (ws, i) => (i.toLong + 1, ws) }
      val hist = docs.filter(_._1 % 3 != 0)
      val batch = docs.filter(_._1 % 3 == 0)
      def tris(ws: Seq[String]) = ws.sliding(3).filter(_.size == 3)
        .map { case Seq(a, b, c) => (a, b, c) }.toSeq
      val c3 = hist.flatMap(d => tris(d._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c12 = c3.groupBy(t => (t._1._1, t._1._2)).view
        .mapValues(_.values.sum).toMap
      val c23 = c3.groupBy(t => (t._1._2, t._1._3)).view
        .mapValues(_.values.sum).toMap
      val c2 = c3.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val cu = c3.groupBy(_._1._3).view.mapValues(_.values.sum).toMap
      val n = c3.values.sum
      val v = c3.keySet.map(_._3).size
      def score(t: (String, String, String)): Double = {
        val (w1, w2, w3) = t
        if (c12.contains((w1, w2)))
          math.log((c3.getOrElse(t, 0L) + 1).toDouble / (c12((w1, w2)) + v))
        else if (c2.contains(w2))
          math.log(0.4 * (c23.getOrElse((w2, w3), 0L) + 1).toDouble /
            (c2(w2) + v))
        else math.log(0.16 * (cu.getOrElse(w3, 0L) + 1).toDouble / (n + v))
      }
      val expected = batch.flatMap { case (id, ws) =>
        val ts = tris(ws)
        if (ts.isEmpty) None
        else Some(id -> ((ts.map(t => dec6(score(t))).sum.toDouble / ts.size,
          ts.size.toLong)))
      }.toMap
      val counts = TextOps.trigramCountsOf(
        hist.map(d => (d._1, d._2.mkString(" "))).toDF("doc_id", "text"))
      val got = TextOps.perplexityTrigramProbeAgainst(counts,
          batch.map(d => (d._1, d._2.mkString(" "))).toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
        .toMap
      assert(got == expected, s"seed $seed")
      // the sweep must actually exercise the backoff: some batch
      // trigram context is unseen
      assert(batch.flatMap(d => tris(d._2))
        .exists(t => !c12.contains((t._1, t._2))), s"seed $seed too tame")
    }
  }

  test("session funnel agrees with the in-memory per-visit fold on random " +
      "event streams (gap boundaries, duplicate timestamps, empty visits)") {
    import spark.implicits._
    val steps = Seq("a", "b", "c")
    val evGen = Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 30L),
      Gen.oneOf(steps ++ Seq("noise")))
    val gapSec = 5L
    for (seed <- 1L to 5L) {
      val evs = sample(Gen.listOfN(50, evGen), seed).zipWithIndex
        .map { case ((u, t, s), i) => (u, t, i.toLong, s) }
      // in-memory reference: the sessionizer's law (new visit when the
      // gap strictly exceeds gapSec), then the chained first-occurrence
      // law per (user, session)
      val expected: Seq[Set[(Long, Long, Long)]] = {
        val cells = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
          val sorted = es.sortBy(e => (e._2, e._3))
          var sid = 0L; var prev = Long.MinValue
          sorted.map { e =>
            if (prev == Long.MinValue || e._2 - prev > gapSec) sid += 1
            prev = e._2
            (u, sid, e._2, e._4)
          }
        }
        steps.indices.map { k =>
          cells.groupBy(c => (c._1, c._2)).flatMap { case ((u, sid), cs) =>
            steps.take(k + 1).foldLeft(Option(Long.MinValue)) { (bound, s) =>
              bound.flatMap(b => cs.filter(c => c._4 == s && c._3 > b)
                .map(_._3).minOption)
            }.map(t => (u, sid, t))
          }.toSet
        }
      }
      val df = evs.map { case (u, t, i, s) =>
        (u, new java.sql.Timestamp(t * 1000L), i, s) }
        .toDF("user_id", "ts", "event_id", "event_type")
      val got = graft.operators.Windows
        .funnelSessionsOf(df, steps, gapSec * 1000L)
        .map(_.collect().map(r => (r.getStruct(0).getLong(0),
          r.getStruct(0).getLong(1), r.getTimestamp(1).getTime / 1000L))
          .toSet)
      assert(got == expected, s"seed $seed")
    }
  }

  test("session funnel STREAMING state machine agrees with the in-memory " +
      "per-visit fold on random streams under random chunking and " +
      "watermark progression — cells exactly-once, first_user exact") {
    import graft.streaming.StreamingFunnelSessions
    import graft.streaming.StreamingFunnelSessions.{Ev, Reach, SessState}
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val steps = Seq("a", "b", "c")
    val evGen = Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 30L),
      Gen.oneOf(steps ++ Seq("noise")))
    val gapSec = 5L
    for (seed <- 1L to 6L) {
      val evs = sample(Gen.listOfN(60, evGen), seed)
      val states = scala.collection.mutable.Map.empty[Long, SessState]
      val cells = scala.collection.mutable.ArrayBuffer.empty[Reach]
      // random chunking makes some events genuinely LATE (below the
      // watermark at arrival): the gap law cannot absorb those (they
      // would regress the session frontier), so the step function
      // drops them — the reference is the fold over the ADMITTED set
      val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
      def runBatch(batch: Seq[(Long, Long, String)], wmMs: Long): Unit = {
        val admissible = batch.filter(_._2 * 1000L >= wmMs)
        admitted ++= admissible
        val byUser = admissible.groupBy(_._1)
        (byUser.keySet ++ states.keySet).foreach { u => // timeout superset
          val s = TestGroupState.create[SessState](
            states.get(u).map(Optional.of[SessState]).getOrElse(Optional.empty()),
            GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(wmMs), false)
          val it = byUser.getOrElse(u, Nil)
            .map { case (_, t, ty) =>
              Ev(u, new java.sql.Timestamp(t * 1000L), ty) }.iterator
          StreamingFunnelSessions.step(gapSec * 1000L, steps)(u, it, s)
            .foreach(cells += _)
          if (s.isRemoved) states.remove(u)
          else if (s.isUpdated) states(u) = s.get
        }
      }
      val chunks = (0 until 3).map(c =>
        evs.zipWithIndex.filter(t => (t._2 + seed) % 3 == c).map(_._1))
      var maxMs = 0L; var wm = 0L
      chunks.foreach { chunk =>
        runBatch(chunk, wm)
        if (chunk.nonEmpty)
          maxMs = math.max(maxMs, chunk.map(_._2).max * 1000L)
        wm = math.max(0L, maxMs - 2000L) // a 2 s slack on the 30 s domain
      }
      runBatch(Nil, Long.MaxValue)
      // exactly-once at the (user, sid, step) cell grain
      assert(cells.map(r => (r.user_id, r.sid, r.step)).distinct.size ==
        cells.size, s"seed $seed")
      // in-memory reference: gap-sessionize the admitted events in
      // (t, stepIdx) order — the step function's own sort — then the
      // chained first-occurrence law per session
      val expected: Map[(Long, Int), Seq[Long]] = admitted.toSeq
        .groupBy(_._1).toSeq.flatMap { case (u, es) =>
          val sorted = es.map(e => (e._2, steps.indexOf(e._3))).sorted
          var prev = Long.MinValue
          val sessions = scala.collection.mutable
            .ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[(Long, Int)]]
          sorted.foreach { e =>
            if (prev == Long.MinValue || e._1 - prev > gapSec)
              sessions += scala.collection.mutable.ArrayBuffer(e)
            else sessions.last += e
            prev = e._1
          }
          sessions.flatMap { ses =>
            val fin = Array.fill(steps.size)(-1L)
            ses.foreach { case (t, i) =>
              if (i >= 0 && fin(i) < 0 &&
                  (i == 0 || (fin(i - 1) >= 0 && t > fin(i - 1)))) fin(i) = t
            }
            fin.zipWithIndex.collect { case (t, i) if t >= 0 => (u, i + 1, t) }
          }
        }.groupBy(c => (c._1, c._2))
        .view.mapValues(_.map(_._3).sorted.toSeq).toMap
      val got = cells.groupBy(r => (r.user_id, r.step))
        .view.mapValues(_.map(_.ts.getTime / 1000L).sorted.toSeq).toMap
      assert(got == expected, s"seed $seed")
      // first_user fires exactly once per reached (user, step), on the
      // EARLIEST reach — what makes the users measure additive
      cells.groupBy(r => (r.user_id, r.step)).foreach { case (k, rs) =>
        assert(rs.count(_.first_user) == 1, s"seed $seed $k")
        assert(rs.minBy(_.ts.getTime).first_user, s"seed $seed $k")
      }
    }
  }

  test("deepest-chain funnel: the batch operator AND the streaming twin's " +
      "state machine agree with in-memory brute force on random streams " +
      "under random arrival chunking and watermark progression") {
    import spark.implicits._
    import graft.streaming.StreamingFunnelDeepest
    import graft.streaming.StreamingFunnelDeepest.{DeepState, Ev}
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val steps = Seq("view", "click", "purchase")
    val evGen = Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 12L),
      Gen.oneOf(steps ++ Seq("noise")))
    for (seed <- 1L to 5L; hSec <- Seq(3L, 6L)) {
      val evs = sample(Gen.listOfN(60, evGen), seed)
      // brute force: depth = max over step-1 anchors of the greedy
      // in-order chain inside [a, a+h] (greedy is optimal per anchor —
      // the operator's exchange argument)
      def userDepth(es: Seq[(Long, String)]): Int = {
        val anchors = es.collect { case (t, s) if s == steps.head => t }.distinct
        val depths = anchors.map { a =>
          var t = a; var d = 1; var stuck = false
          steps.drop(1).foreach { s =>
            if (!stuck)
              es.collect { case (et, e) if e == s && et > t && et <= a + hSec => et }
                .minOption match {
                case Some(n) => t = n; d += 1
                case None => stuck = true
              }
          }
          d
        }
        (depths :+ 0).max
      }
      val expected: Map[Long, Int] = evs.groupBy(_._1).view
        .mapValues(es => userDepth(es.map(e => (e._2, e._3)))).toMap
      def usersAtLeast(k: Int) = expected.filter(_._2 >= k).keySet

      // the batch operator
      val df = evs.map { case (u, t, s) =>
        (u, new java.sql.Timestamp(t * 1000L), s) }
        .toDF("user_id", "ts", "event_type")
      val got = graft.operators.Windows
        .funnelDeepestOf(df, steps, hSec * 1000L)
        .zipWithIndex.map { case (d, i) =>
          (i + 1) -> d.select("user_id").as[Long].collect().toSet }.toMap
      (1 to 3).foreach(k => assert(got(k) == usersAtLeast(k),
        s"batch seed $seed h=$hSec step $k"))

      // the streaming state machine, driven directly: random 3-way
      // arrival chunks, the engine's late-drop + watermark contract
      // simulated per batch, a final saturating-watermark drain
      val states = scala.collection.mutable.Map.empty[Long, DeepState]
      val reaches = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      // random chunking makes some events genuinely LATE (below the
      // watermark at arrival) — the engine drops those, so the stream's
      // reference is brute force over the ADMITTED subset
      val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
      def runBatch(batch: Seq[(Long, Long, String)], wmMs: Long): Unit = {
        val admissible = batch.filter(_._2 * 1000L >= wmMs) // engine late-drop
        admitted ++= admissible
        val byUser = admissible.groupBy(_._1)
        (byUser.keySet ++ states.keySet).foreach { u => // timeout superset
          val s = TestGroupState.create[DeepState](
            states.get(u).map(Optional.of[DeepState]).getOrElse(Optional.empty()),
            GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(wmMs), false)
          val it = byUser.getOrElse(u, Nil)
            .map { case (_, t, ty) => Ev(u, new java.sql.Timestamp(t * 1000L), ty) }
            .iterator
          StreamingFunnelDeepest.step(steps, hSec * 1000L)(u, it, s)
            .foreach(r => reaches += ((r.user_id, r.step)))
          if (s.isRemoved) states.remove(u)
          else if (s.isUpdated) states(u) = s.get
        }
      }
      val chunks = (0 until 3).map(c =>
        evs.zipWithIndex.filter(t => (t._2 + seed) % 3 == c).map(_._1))
      var maxMs = 0L; var wm = 0L
      chunks.foreach { chunk =>
        runBatch(chunk, wm)
        if (chunk.nonEmpty)
          maxMs = math.max(maxMs, chunk.map(_._2).max * 1000L)
        wm = math.max(0L, maxMs - 2000L) // a 2 s delay on the 12 s domain
      }
      runBatch(Nil, Long.MaxValue)
      assert(reaches.size == reaches.distinct.size,
        s"duplicate stream reaches seed $seed h=$hSec: $reaches")
      val expectedAdm: Map[Long, Int] = admitted.toSeq.groupBy(_._1).view
        .mapValues(es => userDepth(es.map(e => (e._2, e._3)))).toMap
      val byStep = reaches.groupBy(_._2).view
        .mapValues(_.map(_._1).toSet).toMap.withDefaultValue(Set.empty[Long])
      (1 to 3).foreach { k =>
        val want = expectedAdm.filter(_._2 >= k).keySet
        assert(byStep(k) == want,
          s"stream seed $seed h=$hSec step $k: got ${byStep(k)} want $want")
      }
    }
  }

  test("retention matrices (classic and rolling) agree with the in-memory " +
      "fold on random event streams (sparse users, duplicate periods)") {
    import spark.implicits._
    // small day domain: users with gappy activity, so classic and
    // rolling genuinely diverge
    val evGen = Gen.zip(Gen.choose(1L, 8L), Gen.choose(0L, 20L))
    for (seed <- 1L to 5L) {
      val evs = sample(Gen.listOfN(50, evGen), seed)
      val df = evs.map { case (u, d) =>
        (u, new java.sql.Timestamp(d * 86400000L + 3600000L)) }
        .toDF("user_id", "ts")
      val byUser = evs.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
      def cohort(u: Long) = byUser(u).min
      val expClassic = byUser.toSeq.flatMap { case (u, ds) =>
        ds.map(d => (cohort(u), (d - cohort(u)).toInt)) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expRolling = byUser.toSeq.flatMap { case (u, ds) =>
        (0 to (ds.max - cohort(u)).toInt).map(k => (cohort(u), k)) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      def dayOf(s: String) =
        java.time.LocalDateTime.parse(s.replace(" ", "T"))
          .toLocalDate.toEpochDay - java.time.LocalDate
          .parse("1970-01-01").toEpochDay
      def got(rolling: Boolean) = (if (rolling)
          graft.operators.Windows.retentionRollingOf(df, "day")
        else graft.operators.Windows.retentionOf(df, "day"))
        .collect().map(r => (dayOf(r.getString(0)), r.getInt(1)) -> r.getLong(2))
        .toMap
      assert(got(false) == expClassic, s"classic seed $seed")
      assert(got(true) == expRolling, s"rolling seed $seed")
    }
  }

  test("rolling retention: the streaming frontier twin agrees with " +
      "in-memory brute force on random streams under random arrival " +
      "chunking and watermark progression") {
    import graft.streaming.StreamingRetention
    import graft.streaming.StreamingRetention.{Ev, RollState}
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // (user, minute over a 6-day domain): gappy activity so the
    // frontier genuinely jumps over inactive days
    val evGen = Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 6L * 1440L))
    for (seed <- 1L to 8L) {
      val evs = sample(Gen.listOfN(50, evGen), seed)
      val states = scala.collection.mutable.Map.empty[Long, RollState]
      val cells = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      // random chunking makes some events genuinely LATE — the engine
      // drops those, so the reference is brute force over the ADMITTED
      // subset (the deepest-twin sweep's contract)
      val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      def runBatch(batch: Seq[(Long, Long)], wmMs: Long): Unit = {
        val admissible = batch.filter(_._2 * 60000L >= wmMs)
        admitted ++= admissible
        val byUser = admissible.groupBy(_._1)
        (byUser.keySet ++ states.keySet).foreach { u =>
          val s = TestGroupState.create[RollState](
            states.get(u).map(Optional.of[RollState]).getOrElse(Optional.empty()),
            GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(wmMs), false)
          val it = byUser.getOrElse(u, Nil)
            .map { case (_, m) => Ev(u, new java.sql.Timestamp(m * 60000L)) }
            .iterator
          StreamingRetention.stepRolling("day")(u, it, s)
            .foreach(c => cells += ((c.user_id, c.cohort.getTime, c.offset)))
          if (s.isRemoved) states.remove(u)
          else if (s.isUpdated) states(u) = s.get
        }
      }
      val chunks = (0 until 3).map(c =>
        evs.zipWithIndex.filter(t => (t._2 + seed) % 3 == c).map(_._1))
      var maxMs = 0L; var wm = 0L
      chunks.foreach { chunk =>
        runBatch(chunk, wm)
        if (chunk.nonEmpty)
          maxMs = math.max(maxMs, chunk.map(_._2).max * 60000L)
        wm = math.max(0L, maxMs - 30 * 60000L) // 30 min delay, 6 day domain
      }
      runBatch(Nil, Long.MaxValue)
      assert(cells.size == cells.distinct.size,
        s"duplicate rolling cells seed $seed")
      def dayOf(ms: Long) = java.time.LocalDate.ofInstant(
        java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC).toEpochDay
      val expected = admitted.toSeq.groupBy(_._1).view.mapValues { es =>
        val ms = es.map(_._2 * 60000L)
        val cd = dayOf(ms.min)
        (cd, ms.map(m => (dayOf(m) - cd).toInt).max)
      }.toMap.flatMap { case (u, (cd, mx)) =>
        (0 to mx).map(k => (u, java.time.LocalDate.ofEpochDay(cd)
          .atStartOfDay.toInstant(java.time.ZoneOffset.UTC).toEpochMilli, k))
      }.toSet
      assert(cells.toSet == expected,
        s"seed $seed: got ${cells.toSet} want $expected")
    }
  }

  test("path transitions (raw and gap-bounded) agree with the in-memory " +
      "fold on random streams with duplicate timestamps") {
    import spark.implicits._
    val evGen = Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 30L),
      Gen.oneOf("a", "b", "c"))
    for (seed <- 1L to 5L) {
      val evs = sample(Gen.listOfN(40, evGen), seed).zipWithIndex
        .map { case ((u, t, s), i) => (u, t, i.toLong, s) }
      val df = evs.map { case (u, t, id, s) =>
        (u, new java.sql.Timestamp(t * 60000L), id, s) }
        .toDF("user_id", "ts", "event_id", "event_type")
      val gapMin = 5L
      def exp(bounded: Boolean) = evs.groupBy(_._1).toSeq.flatMap {
        case (_, es) =>
          es.sortBy(e => (e._2, e._3)).sliding(2).collect {
            case Seq(x, y) if !bounded || (y._2 - x._2) * 60000L <=
              gapMin * 60000L => (x._4, y._4)
          }
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      def got(gap: Option[Long]) = graft.operators.Windows
        .pathTransitionsOf(df, gap)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got(None) == exp(false), s"raw seed $seed")
      assert(got(Some(gapMin * 60000L)) == exp(true), s"bounded seed $seed")
    }
  }

  test("changefeed chain converges under random append/compact/poll interleavings") {
    import graft.sources.{ChangefeedFollower, PointStore}
    val li = Tables.lineitem(spark, sf)
    def batch(m: Int, parts: Int) = Merge.pointAgg(li.filter(col("l_orderkey") % parts === m))
    def rollup(c: org.apache.spark.sql.DataFrame) =
      c.groupBy(col("game_mode")).agg(
        sum(col("played")).as("played"), sum(col("wins")).as("wins"),
        sum(col("time_spent_d")).as("time_spent_d"),
        sum(col("gold_d")).as("gold_d"), max(col("last_match")).as("last_match"))

    for (seed <- 1L to 3L) {
      val dir = new java.io.File("/tmp", s"graft_prop_cdc_$seed")
      PointStore.deleteRec(dir); dir.mkdirs()
      val up = new PointStore(spark, s"$dir/up",
        keys = Seq("game_mode", "role"),
        sums = Seq("played", "wins", "time_spent_d", "gold_d"),
        maxes = Seq("last_match"))
      val f = new ChangefeedFollower(spark, up, s"$dir/down", rollup,
        Seq("game_mode"), Seq("played", "wins", "time_spent_d", "gold_d"),
        Seq("last_match"))
      val parts = 5
      // random interleaving of the 5 appends with compactions and polls
      // (ops 0=compact, 1=poll, 2=duplicate-poll); every batch appended
      // exactly once, order decided by the seeded generator
      val extraOps = sample(Gen.listOfN(8, Gen.choose(0, 2)), seed)
      val appendAt = sample(Gen.pick(parts, 0 until (parts + 8)), seed + 50).toSet
      var nextBatch = 0
      for (slot <- 0 until (parts + 8)) {
        if (appendAt(slot)) { up.append(batch(nextBatch, parts)); nextBatch += 1 }
        else extraOps(slot % extraOps.size) match {
          case 0 => up.compact()
          case 1 => f.poll(compactEvery = 2)
          case 2 => { f.poll(compactEvery = 2); f.poll(compactEvery = 2) }
        }
      }
      assert(nextBatch == parts)
      f.poll(compactEvery = 2) // drain the tail window
      val expect = rows(rollup(Merge.pointAgg(li)))
      assert(rows(f.result.get) == expect, s"seed $seed diverged")
      // and the upstream snapshot itself is batch-order invariant
      assert(rows(Merge.finish(up.snapshot))
        == rows(Merge.finish(Merge.merge(Seq(Merge.pointAgg(li))))))
    }
  }

  test("bloom filter admits every inserted key for arbitrary sets and sizings") {
    import graft.functions.{Bloom, BloomBuffer}
    for (seed <- 1L to 6L) {
      val n = sample(Gen.choose(1, 4000), seed)
      val keys = sample(Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue)),
        seed + 10)
      val fpp = sample(Gen.oneOf(0.001, 0.01, 0.1), seed + 20)
      val (words, hashes) = Bloom.optimal(keys.size, fpp)
      val buf = new BloomBuffer(hashes, new Array[Long](words))
      keys.foreach(buf.add)
      // serialize round-trip preserves the filter exactly
      val rt = Bloom.deserialize(Bloom.serialize(buf))
      keys.foreach { k =>
        assert(buf.mightContain(k), s"seed $seed: false negative $k")
        assert(rt.mightContain(k), s"seed $seed: round-trip lost $k")
      }
      // and an OR-merge of a random split equals the one-shot filter
      val cut = sample(Gen.choose(0, keys.size), seed + 30)
      val (ka, kb) = keys.splitAt(cut)
      val a = new BloomBuffer(hashes, new Array[Long](words))
      val b = new BloomBuffer(hashes, new Array[Long](words))
      ka.foreach(a.add); kb.foreach(b.add)
      assert(a.orInPlace(b).words.sameElements(buf.words), s"seed $seed merge")
    }
  }

  test("ngram pair recall is invariant across replication factor × DF cutoff") {
    import graft.operators.Dedup
    import spark.implicits._
    // The hub cutoff drops high-DF shingles from candidate GENERATION
    // only; verification completes hub co-occurrences per pair, and DF
    // is measured at DISTINCT-SET grain, so neither mass replication
    // (which cannot raise any set-grain DF) nor the cutoff's position
    // relative to a hub's DF may cost a single true pair. This sweeps
    // both knobs through the regimes that used to matter — cutoff below
    // and above the stop phrase's DF (24), replication from none to far
    // past every cutoff — asserting exact brute-force equality in each.
    val stop = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val page = "omega psi chi phi upsilon tau sigma rho"
    for (repl <- Seq(1, 15, 40); cutoff <- Seq(5, 10, 25)) {
      val rows: Seq[(Long, String)] =
        (0 until 12).flatMap { k =>
          val tail = s"a$k b$k c$k d$k e$k f$k g$k"
          Seq((2L * k, s"$stop $tail one"), (2L * k + 1, s"$stop $tail two"))
        } ++
          (0 until repl).map(i => (100L + i, page)) :+
          ((500L, s"$page sigma2 tau2 rho2"))
      val docs = rows.toDF("doc_id", "text")
      val sets = docs
        .select(col("doc_id"), Dedup.shingleArr(col("text"), 4).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).sortBy(_._1)
      val expected = (for {
        i <- sets.indices; j <- (i + 1) until sets.length
        (a, sa) = sets(i); (b, sb) = sets(j)
        inter = (sa & sb).size if inter > 0
        jac = inter.toDouble / (sa.size + sb.size - inter) if jac >= 0.5
      } yield (a, b)).toSet
      assert(expected.nonEmpty, s"degenerate corpus repl=$repl")
      val got = Dedup.ngramDedup(docs, 4, 0.5, cutoff)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"repl=$repl cutoff=$cutoff: recall broke (got ${got.size}, " +
          s"want ${expected.size})")
    }
  }

  test("chunking invariants hold for arbitrary document lengths") {
    import graft.operators.TextOps
    import graft.operators.TextOps.{ChunkStride, ChunkTokens}
    import spark.implicits._
    val lens = (1L to 60L).map(seed => sample(Gen.choose(1, 400), seed))
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, (0 until n).map(j => s"t$j").mkString(" ")) }
    // THE registered operator (chunkDocuments delegates here), driven
    // at arbitrary lengths — a formula change in TextOps fails THIS test
    val got = TextOps.chunkDocumentsOf(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
    lens.zipWithIndex.foreach { case (n, i) =>
      val cs = got(i.toLong).sortBy(_._2).map(_._3.split(" "))
      val expectChunks =
        if (n <= ChunkTokens) 1 else (n - ChunkTokens + ChunkStride - 1) / ChunkStride + 1
      assert(cs.length == expectChunks, s"doc $i len $n count")
      assert(cs.last.nonEmpty && cs.last.head.nonEmpty, s"doc $i empty tail")
      // stride-prefixes + tail reconstruct the document exactly
      val rebuilt = cs.init.flatMap(_.take(ChunkStride)) ++ cs.last
      assert(rebuilt.toSeq == (0 until n).map(j => s"t$j"), s"doc $i len $n coverage")
    }
  }

  test("wire takedown ≡ never-ingested under random events, drop splits, " +
      "and rosters — the purge-rebuild-flip law at arbitrary shapes") {
    import graft.streaming.Maintained
    import spark.implicits._
    val steps = graft.operators.Windows.FunnelSteps
    val types = steps ++ Seq("browse", "search") // non-step noise rides along
    val cols = Seq("user_id", "ts", "event_id", "event_type")
    for (seed <- 1L to 2L) {
      // random events over three days, TIME-SLICED into drops (the
      // nightly-order contract a wire ingest promises)
      val nUsers = sample(Gen.choose(5, 9), seed)
      val events = (1L to nUsers).flatMap { u =>
        val n = sample(Gen.choose(1, 6), seed * 100 + u)
        (0 until n).map { i =>
          val day = sample(Gen.choose(1, 3), seed * 1000 + u * 10 + i)
          val sec = sample(Gen.choose(0, 86399), seed * 9000 + u * 100 + i)
          val typ = types(sample(Gen.choose(0, types.size - 1),
            seed * 7000 + u * 100 + i))
          (u, new java.sql.Timestamp(
            java.sql.Timestamp.valueOf(s"2024-01-0$day 00:00:00").getTime +
              sec * 1000L), (u * 100 + i).toLong, typ)
        }
      }
      // the roster: a random 1-3 users, present or not (an absent
      // user's takedown must commit with removed == 0 and change nothing)
      val roster = (1L to (nUsers + 2L))
        .filter(u => sample(Gen.choose(0, 3), seed * 31 + u) == 0) match {
        case Seq() => Seq(1L)
        case r => r.take(3)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_tkdprop$seed")
        .resolve("report").toFile
      val cfg = Maintained.configOf("funnel")
      (1 to 3).foreach { day =>
        val start = java.sql.Timestamp
          .valueOf(s"2024-01-0$day 00:00:00").getTime
        val night = events.filter(e =>
          e._2.getTime >= start && e._2.getTime < start + 86400000L)
        Maintained.ingestDrop(spark, dir, cfg, s"n$day",
          night.toDF(cols: _*))
      }
      Maintained.ingestDrop(spark, dir, cfg, "s1",
        Seq((Maintained.SentinelUser,
          java.sql.Timestamp.valueOf("2024-01-09 00:00:00"), 0L,
          Maintained.SentinelType)).toDF(cols: _*))
      val td = Maintained.takedownUsers(spark, dir,
        roster.toDF("user_id"), "req")
      val expectRemoved = events.count(e => roster.contains(e._1))
      assert(td.committed && td.removed == expectRemoved,
        s"seed $seed: $td, expected removed=$expectRemoved")
      val got = Maintained
        .funnelReportFrom(spark, graft.sources.PointStore.open(spark, dir.getPath))
        .orderBy(col("step")).collect().map(_.mkString("|")).toSeq
      val survivors = events.filterNot(e => roster.contains(e._1))
      val want = graft.operators.Windows
        .funnelOf(survivors.toDF(cols: _*), steps, None)
        .zip(steps).zipWithIndex.map { case ((df, n), i) =>
          df.agg(count(lit(1)).as("users"))
            .select(lit(i + 1).cast("int").as("step"),
              lit(n).as("step_name"), col("users")) }
        .reduce(_ unionByName _)
        .orderBy(col("step")).collect().map(_.mkString("|")).toSeq
      assert(got == want, s"seed $seed: got $got want $want")
    }
  }
}

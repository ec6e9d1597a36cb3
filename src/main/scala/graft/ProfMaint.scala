package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch measurement harness for the r20 optimization round (guide §1:
  * measure first). Times one maintained lifecycle phase by phase and
  * A/Bs candidate fold tunings on fresh run dirs. Not a declared query;
  * carries no oracle. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProfMaint /root/testdata/sf0.1"
  */
object ProfMaint {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) taskMs.addAndGet(te.taskInfo.duration)
    })

    def phase[T](name: String)(body: => T): T = {
      val j0 = jobs.get(); val tm0 = taskMs.get()
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events lag; give them a beat before reading counters
      Thread.sleep(200)
      println(f"[prof] $name%-42s ${sec}%7.2fs jobs=${jobs.get - j0}%4d taskMs=${taskMs.get - tm0}%7d")
      r
    }

    // warm: fixture + JVM (exactly what Bench does untimed)
    phase("warm fixture + entry") {
      try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
      graft.streaming.Maintained.warmLifecycleFixture(spark, d)
    }

    // one full funnel_maintained, as registered (warm run 2x)
    (1 to 2).foreach { i =>
      phase(s"funnel_maintained run$i (as registered)") {
        graft.streaming.Maintained.funnelMaintained(spark, d).count()
      }
    }

    // decomposed drive: fresh store, per-cycle timing
    val fold = graft.streaming.Maintained.foldOf(spark, "funnel")
    def drive(tag: String, confs: Map[String, String]): Unit = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val root = graft.operators.DedupIndex.freshRunDir(s"graft_prof${tag}_", d)
        val watched = new java.io.File(root, "drops"); watched.mkdirs()
        val store = new graft.sources.PointStore(spark,
          new java.io.File(root, "report").getPath,
          keys = fold.keys, sums = fold.sums, maxes = Nil,
          quantiles = fold.quantiles)
        val ckpt = new java.io.File(root, "ckpt").getPath
        // the same five-night choreography driveMaintained(PerNight) runs
        val src = graft.streaming.Maintained.stagedDropsDirFor(spark, d)
        Seq("n0", "n1", "n2", "s1", "s2").foreach { n =>
          phase(s"[$tag] cycle $n") {
            java.nio.file.Files.createLink(
              new java.io.File(watched, s"$n.parquet").toPath,
              new java.io.File(src, s"$n.parquet").toPath)
            graft.streaming.Maintained.maintainOnce(spark, fold, store,
              watched.getPath, ckpt)
          }
        }
        phase(s"[$tag] report+count") {
          graft.streaming.Maintained.funnelReportFrom(spark, store).count()
        }
        phase(s"[$tag] snapshot only") { store.snapshot.count() }
      } finally saved.foreach { case (k, vOpt) =>
        vOpt.fold(spark.conf.unset(k))(v => spark.conf.set(k, v)) }
    }

    // the tuned default (derived = 1 partition at this SF, no checksums)
    drive("tuned", Map.empty)
    drive("tuned2", Map.empty)

    // bare-engine floor: an AvailableNow stream over ONE tiny file,
    // stateless, foreachBatch counts — everything else is the fold's
    import org.apache.spark.sql.streaming.Trigger
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    (1 to 3).foreach { i =>
      phase(s"bare engine cycle $i") {
        val root = graft.operators.DedupIndex.freshRunDir("graft_profbare_", d)
        val w = new java.io.File(root, "drops"); w.mkdirs()
        val src = graft.streaming.Maintained.stagedDropsDirFor(spark, d)
        java.nio.file.Files.createLink(
          new java.io.File(w, "s1.parquet").toPath,
          new java.io.File(src, "s1.parquet").toPath)
        val st = spark.readStream
          .schema("user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")
          .parquet(w.getPath)
        val q = st.writeStream
          .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => { b.count(); () })
          .option("checkpointLocation", new java.io.File(root, "ckpt").getPath)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    // stateful but store-less: the registered wire fold, foreachBatch counts
    (1 to 3).foreach { i =>
      phase(s"fold engine cycle (no store) $i") {
        val root = graft.operators.DedupIndex.freshRunDir("graft_proffold_", d)
        val w = new java.io.File(root, "drops"); w.mkdirs()
        val src = graft.streaming.Maintained.stagedDropsDirFor(spark, d)
        java.nio.file.Files.createLink(
          new java.io.File(w, "n0.parquet").toPath,
          new java.io.File(src, "n0.parquet").toPath)
        val st = spark.readStream
          .schema(fold.schema)
          .parquet(w.getPath)
        val q = fold.wire(st).writeStream
          .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => { b.count(); () })
          .option("checkpointLocation", new java.io.File(root, "ckpt").getPath)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }

    spark.stop()
  }
}

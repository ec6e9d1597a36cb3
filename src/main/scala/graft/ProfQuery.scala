package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import scala.collection.concurrent.TrieMap

/** Scratch measurement harness (r20 optimization, guide §1): run one
  * declared query and print every Spark job's wall time and call site,
  * so a lifecycle drive's seconds decompose into its component jobs.
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProfQuery /root/testdata/sf0.1 dedup_incremental"
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).headOption.getOrElse("funnel_maintained").split(",").toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "2").toInt
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

    val starts = TrieMap[Int, (Long, String)]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '+').trim))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          jobLog.add((je.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
    })

    // warmups, as Bench does
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try graft.operators.CurateStore.warmLifecycleFixture(spark, d) catch { case _: Throwable => () }
    try graft.operators.DedupIndex.warmLifecycleFixture(spark, d) catch { case _: Throwable => () }
    try graft.operators.Ann.warmLifecycleFixture(spark, d) catch { case _: Throwable => () }
    try graft.streaming.Maintained.warmLifecycleFixture(spark, d) catch { case _: Throwable => () }

    // optional per-rep conf A/B: SPARK_GRAFT_PROF_AB="key=v1|v2"
    // alternates the conf value across reps (cancels band drift)
    val ab = sys.env.get("SPARK_GRAFT_PROF_AB").map { s =>
      val Array(k, vs) = s.split("=", 2); (k, vs.split("\\|").toSeq)
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        ab.foreach { case (k, vs) =>
          val v = vs((rep - 1) % vs.size)
          if (v == "") spark.conf.unset(k) else spark.conf.set(k, v)
          println(s"[ab] $k=$v")
        }
        jobLog.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"\n==== $name rep$rep: $sec%.2fs rows=$n ====")
        import scala.jdk.CollectionConverters._
        val jobs = jobLog.asScala.toSeq.sortBy(_._1)
        val bySite = jobs.groupBy(_._3).map { case (s, js) =>
          (js.map(_._2).sum, js.size, s) }.toSeq.sortBy(-_._1)
        println(f"  jobs=${jobs.size} jobWallSum=${jobs.map(_._2).sum}%.2fs")
        bySite.take(20).foreach { case (sum, n2, site) =>
          println(f"  $sum%7.3fs x$n2%-4d $site") }
      }
    }
    spark.stop()
  }
}

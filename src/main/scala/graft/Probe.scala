package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway timing probe (not part of the library surface). */
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val t = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        t.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val ms = (System.nanoTime() - t.getOrDefault(j.jobId, System.nanoTime())) / 1e6
        if (ms > 300) System.err.println(f"[job] ${j.jobId}%4d ${ms}%9.0fms")
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(0L)
        if (ms > 300) {
          val m = i.taskMetrics
          System.err.println(f"[stage] ${i.stageId}%4d ${ms}%7dms tasks=${i.numTasks}%3d " +
            f"cpu=${m.executorCpuTime / 1e9}%6.1fs run=${m.executorRunTime / 1e3}%6.1fs " +
            f"gc=${m.jvmGCTime / 1e3}%5.1fs in=${m.inputMetrics.bytesRead / 1e6}%7.0fMB " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%6.0fMB spill=${m.diskBytesSpilled / 1e6}%5.0fMB " +
            i.name.take(60))
        }
      }
    })
    // Mimic Bench's prologue: entry warmup + dedup_exact first.
    try time("entry warmup")(SparkEntry.entry(spark).count()) catch { case _: Throwable => () }
    time("dedup_exact")(Dedup.dedupExact(spark, d).count())
    val docs = Tables.documents(spark, d)
    time("docs scan")(docs.count())
    val sh = Dedup.hashedShingles(docs, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("hashedShingles(3) pin")(sh.count())
    val sig = Dedup.minhashSignaturesOf(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("signatures pin")(sig.count())
    time("candidates")(Dedup.minhashCandidates(sig).count())
    time("verify")(Dedup.verifyJaccardOf(Dedup.minhashCandidates(sig), sh, 0.5).count())
    sig.unpersist(); sh.unpersist()
    time("full minhash cold")(Dedup.dedupMinhash(spark, d).count())
    time("full minhash again")(Dedup.dedupMinhash(spark, d).count())
    spark.stop()
  }
}

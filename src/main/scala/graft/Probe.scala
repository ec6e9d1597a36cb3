package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val t = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        t.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val ms = (System.nanoTime() - t.getOrDefault(j.jobId, System.nanoTime())) / 1e6
        System.err.println(f"[job] ${j.jobId}%4d ${ms}%9.0fms end@${System.nanoTime() / 1e9 % 10000}%9.2f")
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(0L)
        if (ms > 100) {
          val m = i.taskMetrics
          System.err.println(f"[stage] ${i.stageId}%4d ${ms}%7dms tasks=${i.numTasks}%3d " +
            f"cpu=${m.executorCpuTime / 1e9}%6.1fs in=${m.inputMetrics.bytesRead / 1e6}%7.0fMB " +
            i.name.take(60))
        }
      }
    })
    if (sys.env.contains("PROBE_BATCH")) {
      time("warm lineitem")(Tables.lineitem(spark, d).count())
      time("batch_driver")(graft.operators.Merge.batchDriver(spark, d).count())
      time("batch_driver again")(graft.operators.Merge.batchDriver(spark, d).count())
      spark.stop(); return
    }
    if (sys.env.contains("PROBE_IVF")) {
      import graft.operators.Ann
      try time("entry warmup")(SparkEntry.entry(spark).count()) catch { case _: Throwable => () }
      time("centroid train")(Ann.cachedCentroids(spark, d))
      time("ann_ivf cold")(Ann.annIvf(spark, d).count())
      time("ann_ivf warm")(Ann.annIvf(spark, d).count())
      spark.stop(); return
    }
    import graft.operators.Ann
    import graft.functions.VectorOps._

    val emb = Tables.embeddings(spark, d)
    time("emb count")(System.err.println("n = " + emb.count()))
    val cents = time("centroids")(Ann.cachedCentroids(spark, d))
    val nemb = emb.select(col("vec_id"), normalize(toDouble(col("embedding"))).as("nv"))
      .repartition(col("vec_id"))
    val scored = cents.map { case (c, vec) =>
      struct(dot(col("nv"), typedLit(vec.toSeq)).as("s"), (-lit(c)).as("nc")) }
    val best = array_max(array(scored: _*))
    val assigned = nemb.select(col("vec_id"), col("nv"),
      best.getField("s").as("cdot"), (best.getField("nc") * -1).as("cell"))
    val stats = time("cell stats")(
      assigned.groupBy("cell").agg(count(lit(1)).as("n"), min("cdot").as("mindot"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1))
    stats.foreach { case (c, n, md) =>
      System.err.println(f"[cell] $c%3d n=$n%7d mindot=$md%7.3f radius=${math.toDegrees(math.acos(math.max(-1, math.min(1, md))))}%6.1f°") }
    val radius = stats.map { case (c, _, md) =>
      c -> math.acos(math.max(-1.0, math.min(1.0, md))) }.toMap
    val sizes = stats.map { case (c, n, _) => c -> n }.toMap
    def angle(u: Array[Double], v: Array[Double]) = {
      val d0 = u.indices.foldLeft(0.0)((a, i) => a + u(i) * v(i))
      math.acos(math.max(-1.0, math.min(1.0, d0)))
    }
    val thetaThr = math.acos(Ann.DupThreshold)
    val cand = for {
      (i, ci) <- cents.toSeq; (j, cj) <- cents.toSeq
      ri <- radius.get(i); rj <- radius.get(j)
      if angle(ci, cj) - ri - rj <= thetaThr + 1e-9
    } yield (i, j)
    val work = cand.map { case (i, j) => sizes(i) * sizes(j) }.sum
    val n = sizes.values.sum
    System.err.println(f"[pairs] surviving cell pairs = ${cand.size}/${cents.length * cents.length}, work = $work%,d vs n² = ${n * n}%,d")
    time("dedup_embedding")(Ann.dedupEmbedding(spark, d).count())
    time("dedup_embedding again")(Ann.dedupEmbedding(spark, d).count())
    spark.stop()
  }
}

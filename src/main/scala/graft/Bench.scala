package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Repetitions per query, min taken: a single timed run is at the
    // mercy of transient host contention (BENCH_r03/r04 each carried a
    // 10×+ spike on code that measured flat when re-run alone); the min
    // of 2 discards one-off noise while still charging every real cost —
    // plan analysis, codegen, shuffle, scan — on each rep (nothing is
    // cached across reps except the JVM/JIT warmth a steady-state
    // deployment has anyway).
    // Default 3 since r7: three rounds running (r3, r4, r6) BOTH reps of
    // a query landed inside one host-contention window, poisoning the
    // official artifact; a third rep makes that coincidence much rarer,
    // and the contamination flag below makes a surviving spike
    // machine-visible instead of silently grading as a regression.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // one untimed scan+agg so JVM/codegen/readers warm up outside the
    // first query's timing
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // lifecycle drives (store chains, iterative loops, the composed
      // funnel) run ONCE: each rep would redo real I/O work and widen
      // the host-drift window without re-measuring a plan
      val qreps = if (SparkEntry.lifecycleQueries(name)) 1 else reps
      val runs = (1 to qreps).map { _ =>
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // min over SUCCESSFUL reps: a transiently-failed rep must not
      // contribute its (fast, bogus) time; rows=-1 only if every rep died
      val ok = runs.filter(_._2 >= 0)
      val (sec, n) = (if (ok.nonEmpty) ok else runs).minBy(_._1)
      // contamination flag: a max/min rep spread beyond 3× means at least
      // one rep sat in a host-contention window — the min is still the
      // honest entry, but the artifact records that this query's timings
      // were turbulent when it ran
      val times = (if (ok.nonEmpty) ok else runs).map(_._1)
      val contaminated = times.max / times.min.max(1e-9) > 3.0
      System.err.println(f"[bench] $name%-20s $sec%8.2fs rows=$n" +
        runs.map(r => f"${r._1}%.2f").mkString(" (reps: ", " ", ")") +
        (if (qreps == 1 && reps > 1) "  LIFECYCLE(1 rep)" else "") +
        (if (contaminated) "  CONTAMINATED" else ""))
      (name, sec, contaminated)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val contaminatedQs = results.collect { case (k, _, true) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"contaminated":$contaminatedQs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

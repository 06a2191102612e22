package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev profiler: per-query wall time + Spark job/task counts, N passes
  * (min-of-warm basis, the Bench policy) — the deterministic,
  * window-immune signal for A/B'ing a query's fixed-cost shape.
  * args: <sfDir> <n> <query...>  (env SPARK_GRAFT_CPUS, default 32) */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet(); ()
        }
      })
    for (name <- names) {
      val times = (1 to n).map { i =>
        val j0 = jobs.get(); val k0 = tasks.get()
        val t0 = System.nanoTime()
        val c = graft.SparkEntry.queries(name)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        // drain the async listener bus until the counters are STABLE
        // for two consecutive intervals (a fixed sleep let late events
        // bleed into the next pass's deltas on a loaded box)
        var stable = 0
        var last = (jobs.get(), tasks.get())
        while (stable < 2) {
          Thread.sleep(100)
          val cur = (jobs.get(), tasks.get())
          if (cur == last) stable += 1 else { stable = 0; last = cur }
        }
        println(f"$name pass$i: $dt%.3f s rows=$c jobs=${jobs.get() - j0} tasks=${tasks.get() - k0}")
        dt
      }
      val warm = times.drop(1)
      println(f"$name MIN-WARM: ${if (warm.nonEmpty) warm.min else times.min}%.3f s")
    }
    spark.stop()
  }
}

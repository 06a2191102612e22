package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev probe: per-JOB duration + task count for one declared query —
  * finds the hot job and its stage width (the AQE-coalescing signal).
  * args: <sfDir> <n passes> <query>; prints jobs of the LAST pass. */
object QJobs {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val n = args(1).toInt; val name = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    @volatile var report = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(j.jobId, (j.time, j.stageInfos.map(_.numTasks).sum)); ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, nt) = starts.getOrDefault(j.jobId, (j.time, -1))
          if (report)
            println(s"  job ${j.jobId}: ${j.time - t0}ms tasks=$nt")
        }
      })
    (1 to n).foreach { i =>
      report = i == n
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      Thread.sleep(300)
      println(f"$name pass$i: $dt%.3f s rows=$c")
    }
    spark.stop()
  }
}

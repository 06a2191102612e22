package graft.tools_dev

/** Dev runner: BatchConcurrency at bench scale (validates wiring +
  * gives the PERF.md numbers). */
object ConcurrencyRun {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warm the subset once (Bench calls this after its triple sweep)
    graft.BatchConcurrency.mix.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    println("BC_JSON " + graft.BatchConcurrency.json(spark, sfDir))
    spark.stop()
  }
}

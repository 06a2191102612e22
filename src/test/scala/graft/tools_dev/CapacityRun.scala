package graft.tools_dev

/** Dev runner: the stream_capacity saturation sweep, both replica modes. */
object CapacityRun {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT warmup discard (the capacity sweep compares points WITHIN a
    // JVM, but the first streaming queries pay whole-JVM compile cost)
    graft.streaming.StreamBench.run(spark, batches = 12, warmupBatches = 6)
    for (mor <- Seq(true, false)) {
      val c = graft.streaming.StreamBench.capacity(spark, mor)
      println(s"CAPACITY $c")
    }
    spark.stop()
  }
}

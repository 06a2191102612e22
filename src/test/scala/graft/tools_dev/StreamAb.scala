package graft.tools_dev

/** Dev A/B: stream_e2e latency under trigger cadence / state-partition
  * variants (round-11 sub-900ms hunt). */
object StreamAb {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def go(label: String, triggerMs: Int, parts: Int): Unit = {
      val r = graft.streaming.StreamBench.run(spark,
        triggerMs = triggerMs, statePartitions = parts)
      println(s"AB $label trigger=$triggerMs parts=$parts -> $r")
    }
    go("warm-jit", 100, 4) // discard: pays whole-JVM JIT
    go("t25p2-a", 25, 2)
    go("t25p4-a", 25, 4)
    go("t100p4-a", 100, 4)
    go("t25p2-b", 25, 2)
    go("t25p4-b", 25, 4)
    go("t100p4-b", 100, 4)
    spark.stop()
  }
}

package graft.tools_dev

/** Dev A/B: round-12 warmup/pool variants vs round-11 defaults. */
object StreamAb2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def go(label: String, batches: Int, wu: Int, wuMs: Int): Unit = {
      val r = graft.streaming.StreamBench.run(spark,
        batches = batches, warmupBatches = wu, warmupFeedIntervalMs = wuMs)
      println(f"AB2 $label p50=${r.p50Ms}%.0f p95=${r.p95Ms}%.0f rps=${r.rowsPerSec}%.0f")
    }
    go("r11-fresh   (30,10,400)", 30, 10, 400)
    go("r11-warm    (30,10,400)", 30, 10, 400)
    go("r12-warm    (44,24,150)", 44, 24, 150)
    go("r11-warm2   (30,10,400)", 30, 10, 400)
    go("r12-warm2   (44,24,150)", 44, 24, 150)
    spark.stop()
  }
}

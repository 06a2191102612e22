package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev probe: one verbose stream run — per-micro-batch progress lines
  * for latency decomposition. */
object StreamVerbose {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = graft.streaming.StreamBench.run(spark, verbose = true)
    println(f"RESULT p50=${r.p50Ms}%.0f p95=${r.p95Ms}%.0f")
    spark.stop()
  }
}

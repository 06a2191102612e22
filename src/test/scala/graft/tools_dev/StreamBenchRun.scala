package graft.tools_dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev runner: measure StreamBench at bench-default size. */
object StreamBenchRun {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val durs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        durs.add(e.time - s)
      }
    })
    val r1 = graft.streaming.StreamBench.run(spark)
    val r = graft.streaming.StreamBench.run(spark, verbose = true)
    println(s"RUN1 $r1")
    println(s"STREAM_E2E $r")
    import scala.jdk.CollectionConverters._
    val d = durs.asScala.toArray.sorted
    println(s"JOBS n=${d.length} p50=${d(d.length / 2)}ms " +
      s"p90=${d((d.length * 9) / 10)}ms max=${d.last}ms " +
      s"sum=${d.sum / 1000.0}s")
    spark.stop()
  }
}

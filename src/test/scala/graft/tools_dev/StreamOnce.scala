package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev probe: one fresh-JVM stream_e2e measurement (two passes, like
  * Bench's stream phase) with the window anchor printed beside it —
  * for tmpdir / knob A/Bs outside the full sweep. */
object StreamOnce {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def anchor(): Double = {
      def pass(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 20000000L, 1L, 32)
          .selectExpr("bit_xor(xxhash64(id))").collect()
        (System.nanoTime() - t0) / 1e6
      }
      math.min(pass(), pass())
    }
    val sp = sys.env.getOrElse("SPARK_GRAFT_STREAM_SP", "1").toInt
    val trig = sys.env.getOrElse("SPARK_GRAFT_STREAM_TRIG", "25").toInt
    // Janino compilation counters (global codahale metrics): a
    // batch-invariant hot write plan compiles O(plan shapes) once; a
    // per-batch-literal plan compiles O(batches) — the per-pass deltas
    // prove which one is running (round-14 codegen-cache fix re-proof).
    import org.apache.spark.metrics.source.CodegenMetrics
    def compiles(): Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val a0 = anchor()
    val c0 = compiles()
    val r1 = graft.streaming.StreamBench.run(spark,
      statePartitions = sp, triggerMs = trig)
    val a1 = anchor()
    val c1 = compiles()
    val r2 = graft.streaming.StreamBench.run(spark,
      statePartitions = sp, triggerMs = trig)
    val a2 = anchor()
    val c2 = compiles()
    println(f"STREAM_ONCE anchor0=$a0%.1f p50a=${r1.p50Ms}%.0f p95a=${r1.p95Ms}%.0f " +
      f"anchor1=$a1%.1f p50b=${r2.p50Ms}%.0f p95b=${r2.p95Ms}%.0f anchor2=$a2%.1f " +
      f"compilesa=${c1 - c0} compilesb=${c2 - c1} " +
      f"tmpdir=${System.getProperty("java.io.tmpdir")}")
    spark.stop()
  }
}

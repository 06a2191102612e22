package graft // test-scope dev tool; lives beside tools_dev for discoverability

/** Dev smoke: exercise Bench.forkCapacityJson end-to-end with a tiny
  * sweep (env knobs read by CapacityMain). Verifies the fork finds the
  * classpath + module options, the child boots Spark, and the marker
  * line round-trips. Run with:
  *   SPARK_GRAFT_CAP_MAXRPB=250 SPARK_GRAFT_CAP_BATCHES=8 \
  *   SPARK_GRAFT_CAP_WARMUP=3 sbt "Test/runMain graft.CapacityForkSmoke"
  */
object CapacityForkSmoke {
  def main(args: Array[String]): Unit = {
    Bench.forkCapacityJson(timeoutMin = 10) match {
      case Some(json) => println(s"FORK_OK $json")
      case None => println("FORK_FAILED (fallback path would run)"); sys.exit(1)
    }
  }
}

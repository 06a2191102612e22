package graft.tools_dev
import org.apache.spark.sql.SparkSession
/** Dev helper: time one named query N times. args: <name> <sfDir> [n] */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(name)(spark, dir).count()
      println(s"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f".replace("%.2f","") + s"s rows=$c")
    }
    spark.stop()
  }
}

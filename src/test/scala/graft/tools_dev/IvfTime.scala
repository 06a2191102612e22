package graft.tools_dev
import org.apache.spark.sql.SparkSession
/** Dev probe: isolated x13 (IVF) timing at sf0.1. */
object IvfTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("x13_ann_ivf")(spark, "/root/testdata/sf0.1").count()
      println(f"x13: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

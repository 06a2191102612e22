package graft.tools_dev
import org.apache.spark.sql.SparkSession
/** Dev helper: print the formatted physical plan of named queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools_dev
import org.apache.spark.sql.SparkSession
object X43Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("x43_bm25_search")(spark, "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    println(p.linesIterator.filter(l => l.contains("arrays_overlap") ||
      l.contains("Exchange") || l.contains("FileScan") || l.contains("Generate"))
      .mkString("\n").take(3000))
    spark.stop()
  }
}

package graft.tools_dev
import org.apache.spark.sql.SparkSession
object X54Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("x54_dup_gram_spans")(spark, "/root/testdata/sf0.01")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}

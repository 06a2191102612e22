package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev helper: physical plan of the bucket-pruned C11 disassociation —
  * the doomed-key resolve (semi+anti join) and the pruned destroy. */
object C11Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val children = spark.range(0, 1000000)
      .select($"id".as("synced_id"), ($"id" % 100000).as("order_id"),
        lit(1.0).as("qty"))
    val incoming = Seq((1L, 10L), (1L, 11L), (2L, 20L))
      .toDF("order_id", "synced_id")
    val doomed = graft.consumer.Persistor.disassociatedChildKeys(
      children, incoming, "order_id", "synced_id")
    println("=== doomed-key resolve (C11 incremental) ===")
    doomed.explain("formatted")
    spark.stop()
  }
}

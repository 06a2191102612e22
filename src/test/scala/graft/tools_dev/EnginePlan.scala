package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev helper: print the physical plans of the engine's registry-derived
  * producer projection and sideload embed (batch analogues of the
  * streaming frames — same operators, same join shapes). */
object EnginePlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.registry._
    import graft.producer.Serializers

    val orders = graft.queries.Q.tbl(spark, dir, "orders")
      .select(col("o_orderkey").as("id"), col("o_totalprice").as("total"),
        col("o_orderdate").cast("timestamp").as("__ts"))
    val lines = graft.queries.Q.tbl(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(sum(col("l_quantity")).cast("double").as("qty"),
        max(col("l_shipdate")).cast("timestamp").as("__ts"))
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        col("l_orderkey").as("order_id"), col("qty"), col("__ts"))
    val child = ModelDef("order_line",
      attributes = Seq(Attribute("order_id",
        org.apache.spark.sql.types.LongType),
        Attribute("qty", org.apache.spark.sql.types.DoubleType)))
    val childPayload = Serializers.wirePayload(child,
      col("__ts"), col("__ts"), lit(null).cast("timestamp"))
    val nested = lines
      .select(col("order_id").cast("long").as("__pk"),
        struct(col("id").cast("long").as("k"), childPayload.as("p")).as("__kp"))
      .groupBy(col("__pk"))
      .agg(sort_array(collect_list(col("__kp"))).as("__kids"))
    val joined = orders.join(nested,
      col("id").cast("long") === col("__pk"), "left")
    println("=== sideload embed (stream-static analogue) ===")
    joined.explain("formatted")
    spark.stop()
  }
}

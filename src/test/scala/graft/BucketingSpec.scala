package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Evidence for the 100 TB replica-layout claim (README): bucketing both
  * sides of a key equi-join by the join key removes the per-query shuffle
  * entirely — the layout pays the partitioning cost once at write time.
  * This is how the replica table and its hot FK joins should be stored at
  * scale (Delta/Iceberg bucket transforms in production; Spark-native
  * bucketed tables here).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join plans with zero shuffle exchanges") {
    val li = graft.queries.Q.tbl(spark, sf(), "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val o = graft.queries.Q.tbl(spark, sf(), "orders")
      .select($"o_orderkey", $"o_totalprice")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    // the in-memory catalog forgets tables across JVMs but their warehouse
    // dirs persist — remove them so saveAsTable can recreate
    for (t <- Seq("b_lineitem", "b_orders")) {
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("q"), first($"o_totalprice").as("p"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"bucketed join+agg must not shuffle, found: ${shuffles.size}")

    // and the result matches the unbucketed plan
    val want = li.join(o, $"l_orderkey" === $"o_orderkey").count()
    assert(joined.count() > 0)
    assert(spark.table("b_lineitem")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey").count() == want)
  }
}

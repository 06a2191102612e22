package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev helper: end-to-end registry engine wall time over the events table
  * at a given SF — produce+consume all topics, report rows. */
object EngineTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft-et").toString
    val src = s"$tmp/src"
    new java.io.File(src).mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))

    final class B(sourceDir: String) extends graft.Engine.ModelBindings {
      def changes(s: SparkSession, m: graft.registry.ModelDef) = {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.readStream.schema(s.read.parquet(sourceDir).schema).parquet(sourceDir)
          .transform(graft.queries.Q.normalizeEventTs)
          .filter(col("event_type") === m.name)
          .select(col("user_id").as("id"), col("value"),
            lit("update").as("__op"),
            lit(null).cast("timestamp").as("__old_canceled"),
            when(col("event_type") === "error", col("ts")).as("__new_canceled"),
            col("ts").as("__ts"))
      }
      def snapshot(s: SparkSession, m: graft.registry.ModelDef) = ???
    }
    val t0 = System.nanoTime()
    val res = graft.Engine.runAvailableNow(spark,
      graft.queries.ProducerQueries.registry, new B(src), s"$tmp/work")
    val rows = res.replicas.map { case (m, r) => m -> r.read().count() }
    println(f"engine e2e: ${(System.nanoTime() - t0) / 1e9}%.1fs  " +
      s"replicas=$rows  sf=$dir")
    spark.stop()
  }
}

package graft.tools_dev

import org.apache.spark.sql.functions._

/** Dev A/B: synced_data as STRING (get_json_object) vs VARIANT
  * (try_variant_get) on x-scale payloads — the round-12 mandate's
  * measured comparison. Payloads are realistic CDC row images: every
  * lineitem column (16 fields incl. dates/decimals/comments) plus a
  * nested object, ~400 B of JSON per row, sf0.1 = ~600k rows.
  * Measures storage size and 1-field / 6-field extraction scans over
  * each stored mode, plus the parse-at-read alternative. min-of-2
  * warm passes after a discarded cold pass (Bench policy). */
object VariantAb {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("defaultCharset=" + java.nio.charset.Charset.defaultCharset())
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tmp = java.nio.file.Files.createTempDirectory("graft-variant-ab").toString

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val payload = li.select(
      monotonically_increasing_id().as("synced_id"),
      to_json(struct(
        (li.columns.map(col) :+
          struct(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
            col("l_suppkey").as("sk")).as("keys")): _*)).as("synced_data"))

    payload.write.mode("overwrite").parquet(s"$tmp/str")
    spark.read.parquet(s"$tmp/str")
      .withColumn("synced_data", parse_json(col("synced_data")))
      .write.mode("overwrite").parquet(s"$tmp/var")

    def dirMB(p: String): Double = {
      def sz(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles()).getOrElse(Array.empty).map(sz).sum
      sz(new java.io.File(p)) / 1e6
    }
    println(f"SIZE str=${dirMB(s"$tmp/str")}%.1f MB var=${dirMB(s"$tmp/var")}%.1f MB")

    val strT = spark.read.parquet(s"$tmp/str")
    val varT = spark.read.parquet(s"$tmp/var")
    val fields6 = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_shipdate", "l_returnflag", "l_comment")

    def time(label: String)(thunk: => Unit): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
      }
      once() // cold
      println(f"AB $label%-28s ${math.min(once(), once())}%.3f s")
    }

    time("str-1field") {
      strT.select(sum(length(get_json_object(col("synced_data"), "$.l_comment"))))
        .collect(); ()
    }
    time("var-1field") {
      varT.select(sum(length(try_variant_get(col("synced_data"), "$.l_comment", "string"))))
        .collect(); ()
    }
    time("str-6field") {
      strT.select(fields6.map(f =>
          sum(length(get_json_object(col("synced_data"), s"$$.$f"))).as(f)): _*)
        .collect(); ()
    }
    time("var-6field") {
      varT.select(fields6.map(f =>
          sum(length(try_variant_get(col("synced_data"), s"$$.$f", "string"))).as(f)): _*)
        .collect(); ()
    }
    time("str-parse-at-read-6field") {
      strT.withColumn("v", parse_json(col("synced_data")))
        .select(fields6.map(f =>
          sum(length(try_variant_get(col("v"), s"$$.$f", "string"))).as(f)): _*)
        .collect(); ()
    }
    time("var-nested-field") {
      varT.select(sum(try_variant_get(col("synced_data"), "$.keys.ok", "long")))
        .collect(); ()
    }
    time("str-nested-field") {
      strT.select(sum(get_json_object(col("synced_data"), "$.keys.ok").cast("long")))
        .collect(); ()
    }

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(tmp))
    spark.stop()
  }
}

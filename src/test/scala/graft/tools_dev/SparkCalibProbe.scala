package graft.tools_dev

object SparkCalibProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      spark.range(0L, 20000000L, 1L, 32)
        .selectExpr("bit_xor(xxhash64(id))").collect()
      println(f"SPARKCALIB pass$i = ${(System.nanoTime()-t0)/1e6}%.1f ms")
    }
    spark.stop()
  }
}

package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SigTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (i <- 1 to 2) {
      var t0 = System.nanoTime()
      val sh = docs.select(col("doc_id").as("id"), graft.ext.TextDedup.simhash(col("text")).as("sh"))
      val n1 = sh.count()
      println(s"signatures: ${(System.nanoTime()-t0)/1e9}s rows=$n1")
      t0 = System.nanoTime()
      val banded = sh.select(col("id"), col("sh"),
        explode(array((0 until 4).map(b => struct(lit(b).as("band"),
          shiftright(col("sh"), b*16).bitwiseAND(0xFFFFL).as("bits"))): _*)).as("bk"))
      val cands = banded.as("x").join(banded.as("y"), col("x.bk") === col("y.bk"))
        .filter(col("x.id") < col("y.id")).count()
      println(s"cands: ${(System.nanoTime()-t0)/1e9}s rows=$cands")
    }
    spark.stop()
  }
}

package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object X2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val sig = graft.ext.TextDedup.minhashSignatures(docs, "doc_id", "text", 16, 2)
      .localCheckpoint(false)
    val bandKeys = (0 until 8).map { bd =>
      val cols = (bd*2 until (bd+1)*2).map(i => col(s"mh_$i"))
      struct(lit(bd).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val bucketed = sig.select(col("id"), explode(array(bandKeys: _*)).as("bk"))
    var t0 = System.nanoTime()
    val raw = bucketed.as("x").join(bucketed.as("y"), col("x.bk") === col("y.bk"))
      .filter(col("x.id") < col("y.id")).count()
    println(s"raw candidate rows: $raw  (${(System.nanoTime()-t0)/1e9}s)")
    t0 = System.nanoTime()
    val dist = bucketed.as("x").join(bucketed.as("y"), col("x.bk") === col("y.bk"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct().count()
    println(s"distinct pairs: $dist  (${(System.nanoTime()-t0)/1e9}s)")
    spark.stop()
  }
}

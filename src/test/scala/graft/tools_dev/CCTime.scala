package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev helper: decompose x16 cost — pairs vs edges vs CC loop. */
object CCTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (round <- 1 to 3) {
      println(s"--- pass $round")
      val pairs = graft.ext.TextDedup.ngramJaccardPairs(
        graft.queries.Q.tbl(spark, dir, "documents"),
        "doc_id", "text", blockCol = "source", n = 1, threshold = 0.9)
      t("pairs.count")(pairs.count())
      val p0 = t("p0 ckpt")(
        pairs.select(col("id_a"), col("id_b")).localCheckpoint(true))
      val edges = t("edges ckpt")(
        p0.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(p0.select(col("id_b").as("src"), col("id_a").as("dst")))
          .distinct().localCheckpoint(true))
      t("cc")(graft.ext.TextDedup.connectedComponents(pairs).count())
      println(s"edges=${edges.count()}")
    }
    spark.stop()
  }
}

package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: where does x21 decontamination spend? */
object X21Decomp {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = graft.queries.Q.tbl(spark, dir, "documents")
    for (p <- 1 to 2) {
      println(s"--- pass $p")
      t("gram build corpus")(docs.filter(col("doc_id") % 19 =!= 0)
        .select(array_distinct(graft.ext.Curation.ngrams(col("text"), 5)).as("g"))
        .count())
      t("gram build + explode")(docs.filter(col("doc_id") % 19 =!= 0)
        .select(array_distinct(graft.ext.Curation.ngrams(col("text"), 5)).as("g"))
        .select(explode(col("g")).as("ng")).count())
      t("full")(graft.ext.Curation.contamination(
        docs.filter(col("doc_id") % 19 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 19 === 0), "text", n = 5).count())
    }
    spark.stop()
  }
}

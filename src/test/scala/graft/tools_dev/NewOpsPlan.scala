package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: physical-plan shapes of the round-3 curation operators. */
object NewOpsPlan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Q.tbl(spark, dir, "documents")
    def shape(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val ex = p.linesIterator.count(_.contains("Exchange"))
      val bc = p.linesIterator.count(_.contains("BroadcastExchange"))
      val wsc = p.linesIterator.count(_.contains("*(")) // "+- *(n) Op" lines
      println(s"== $label: exchanges=$ex (broadcast=$bc) codegenOps=$wsc")
      p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Window") ||
        l.contains("Join") || l.contains("HashAggregate"))
        .take(12).foreach(l => println("   " + l.trim.take(150)))
    }
    shape("x24 packing")(graft.ext.Curation.sequencePacking(
      docs, "doc_id", "text", budget = 512, shards = 8))
    shape("x25 domainCap")(graft.ext.Curation.domainCap(
      docs, "doc_id", "source", cap = 15))
    shape("x26 crossDocRepeats")(graft.ext.Curation.crossDocRepeats(
      docs, "doc_id", "text", n = 5, minDocs = 2))
    spark.stop()
  }
}

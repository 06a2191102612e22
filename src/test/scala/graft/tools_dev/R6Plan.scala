package graft.tools_dev
import org.apache.spark.sql.SparkSession
/** Dev probe: physical-plan shapes of the round-6 query additions. */
object R6Plan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("x35_semantic_dedup", "x36_knn_label_vote",
        "x37_vocab_growth", "x38_embedding_outliers", "x39_tfidf_keywords",
        "x40_quantization_audit", "x41_source_dup_matrix",
        "x42_dim_truncation_recall")) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"== $q: WindowGroupLimit=${p.contains("WindowGroupLimit")}" +
        s" Cartesian=${p.contains("CartesianProduct")}" +
        s" BNLJ=${p.contains("BroadcastNestedLoopJoin")}" +
        s" BHJ=${p.linesIterator.count(_.contains("BroadcastHashJoin"))}" +
        s" SMJ=${p.linesIterator.count(_.contains("SortMergeJoin"))}" +
        s" Exch=${p.linesIterator.count(_.contains("Exchange"))}")
    }
    spark.stop()
  }
}

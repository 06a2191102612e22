package graft.tools_dev

import org.apache.spark.sql.functions._

/** Dev A/B: x68's one-shot bm25TopK vs the standing-index form. */
object X68Ab {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.queries.Q.tbl(spark, dir, "documents")
    val qs = docs
      .filter(col("doc_id") % 50 === 0 && col("doc_id") <= 2500)
      .select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("q"))
      .collect().map(r => (r.getLong(0).toInt, r.getString(1)))
      .toSeq.sortBy(_._1)
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      r
    }
    def audit(scored: org.apache.spark.sql.DataFrame): Long =
      scored.groupBy(col("qid"))
        .agg(coalesce(
            min(when(col("nid") === col("qid").cast("long"), col("rnk"))),
            lit(0)).cast("long").as("self_rank"),
          count(lit(1)).as("n_results"))
        .count()
    (1 to 3).foreach { p =>
      time(s"oneshot pass$p") {
        audit(graft.ext.TextSearch.bm25TopK(docs, "doc_id", "text", qs, k = 10))
      }
      time(s"index pass$p") {
        val idx = graft.ext.TextSearch.buildBm25Index(docs, "doc_id", "text")
        audit(graft.ext.TextSearch.bm25TopKOnIndex(idx, qs, k = 10))
      }
      time(s"index-reuse pass$p") {
        // the standing-deployment shape: postings persisted once (here:
        // cached), both the stats and the batch read the artifact
        val idx = graft.ext.TextSearch.buildBm25Index(docs, "doc_id", "text")
        val cached = idx.copy(postings = idx.postings.cache())
        val n1 = audit(graft.ext.TextSearch.bm25TopKOnIndex(cached, qs, k = 10))
        val n2 = audit(graft.ext.TextSearch.bm25TopKOnIndex(cached, qs, k = 10))
        n1 + n2
      }
    }
    // equality check
    val a = graft.ext.TextSearch.bm25TopK(docs, "doc_id", "text", qs, k = 10)
      .collect().map(_.toString).sorted
    val idx = graft.ext.TextSearch.buildBm25Index(docs, "doc_id", "text")
    val b = graft.ext.TextSearch.bm25TopKOnIndex(idx, qs, k = 10)
      .collect().map(_.toString).sorted
    println(s"EQUAL ${a.sameElements(b)} (${a.length} rows)")
    spark.stop()
  }
}

package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-phase + per-job decomposition of x147 (chunk-corpus
  * BM25 retrieval) — cache fill vs probe collect vs scoring pass. Runs
  * the SAME plan pieces as the declared query. Not part of the suite. */
object X147Phases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(j.jobId, j.time)
          descs.put(j.jobId, j.stageInfos.map(s =>
            s"${s.name.takeWhile(_ != '(').trim}/${s.numTasks}").mkString("+"))
          ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val d = j.time - starts.getOrDefault(j.jobId, j.time)
          println(s"  job ${j.jobId}: ${d}ms [${descs.getOrDefault(j.jobId, "?")}]")
        }
      })
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      println(f"PHASE $tag $dt%.2f s")
      r
    }
    (1 to 3).foreach { pass =>
      val docs = graft.queries.Q.tbl(spark, sfDir, "documents")
      val chunks = graft.ext.TextAnalysis
        .chunkWindowTokens(graft.queries.Q.wide(docs), "doc_id", "text",
          window = 16, stride = 8)
        .select((col("doc_id") * 1000L + col("chunk_no")).as("nid"),
          col("tk"))
        .cache()
      val qs = t(s"p$pass-qs-collect") {
        docs.filter(col("doc_id") % 50 === 0 && col("doc_id") <= 2500)
          .select(col("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 9, 5)).as("q"))
          .collect().map(r => (r.getLong(0).toInt, r.getString(1)))
          .toSeq.sortBy(_._1)
      }
      t(s"p$pass-cache-fill") {
        chunks.write.format("noop").mode("overwrite").save()
      }
      t(s"p$pass-bm25") {
        val r = graft.ext.TextSearch.bm25TopKTokens(chunks, qs, k = 5,
            pinPostings = true)
          .groupBy(col("qid"))
          .agg(
            coalesce(min(when(expr("nid div 1000") === col("qid").cast("long"),
              col("rnk"))), lit(0)).cast("long").as("self_rank"),
            count(when(expr("nid div 1000") === col("qid").cast("long"),
              lit(1))).as("self_hits"),
            count(lit(1)).as("n_results"))
          .orderBy(col("qid")).count()
        println(s"  rows=$r")
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    spark.stop()
  }
}

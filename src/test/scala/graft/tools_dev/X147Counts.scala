package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: row volumes through x147's BM25 tf pipeline. */
object X147Counts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Q.tbl(spark, sfDir, "documents")
    val chunks = graft.ext.TextAnalysis
      .chunkWindowTokens(graft.queries.Q.wide(docs), "doc_id", "text",
        window = 16, stride = 8)
      .select((col("doc_id") * 1000L + col("chunk_no")).as("nid"), col("tk"))
    val qs = docs.filter(col("doc_id") % 50 === 0 && col("doc_id") <= 2500)
      .select(concat_ws(" ", slice(split(col("text"), " "), 9, 5)).as("q"))
      .collect().map(_.getString(0))
    val qterms = qs.flatMap(_.split(" ")).distinct.toSeq
    println(s"COUNT qterms=${qterms.size}")
    println(s"COUNT docs=${docs.count()} chunks=${chunks.count()}")
    val pre = chunks.filter(exists(col("tk"), t => t.isin(qterms: _*)))
    println(s"COUNT prefiltered_chunks=${pre.count()}")
    val exploded = pre.select(col("nid"), explode(col("tk")).as("tok"))
    println(s"COUNT exploded=${exploded.count()}")
    val kept = exploded.filter(col("tok").isin(qterms: _*))
    println(s"COUNT kept=${kept.count()}")
    val tf = kept.groupBy(col("nid"), col("tok")).count()
    println(s"COUNT tf=${tf.count()}")
    spark.stop()
  }
}

package graft.tools_dev

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev runner: wall-clock scale curves for the RETRIEVAL family at
  * sf0.1 ×1/×8 (the PERF.md round-11 numbers) — the round-10 ANN/graph
  * construction applied to BM25-on-index and the x147 chunk pipeline.
  *
  * Corpus growth is VOCABULARY-DISJOINT (copy c appends `~c` to every
  * token, the round-9 dedup construction): a copy-0 probe batch then
  * matches only copy-0 postings, so the isin-pruned candidate set is
  * provably IDENTICAL at ×1 and ×8 (EngineScaleSpec pins the counts) —
  * what grows is only the postings scan the pruning filter walks. */
object RetrievalScaleTime {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ext.{TextAnalysis, TextSearch}
    val dir = "/root/testdata/sf0.1"
    val docs = graft.queries.Q.tbl(spark, dir, "documents")
      .select($"doc_id".cast("long").as("doc_id"), $"text")
    def corpusX(times: Int): DataFrame =
      (0 until times).map { c =>
        if (c == 0) docs
        else docs.select(($"doc_id" + c * 10000000L).as("doc_id"),
          regexp_replace($"text", "(\\S+)", "$1~" + c).as("text"))
      }.reduce(_ unionByName _)
    // copy-0 probes (x145's leading-5-token needles)
    val probes = docs
      .filter($"doc_id" % 50 === 0 && $"doc_id" <= 2500)
      .select($"doc_id", concat_ws(" ",
        slice(split($"text", " "), 1, 5)).as("q"))
      .collect().map(r => (r.getLong(0).toInt, r.getString(1)))
      .toSeq.sortBy(_._1)
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      r
    }
    for (x <- Seq(1, 8)) {
      val c = corpusX(x)
      (1 to 2).foreach { pass =>
        // standing-index lifecycle, phases timed apart: the build is the
        // linear-in-corpus part, the probe is what must stay sublinear
        val idx0 = TextSearch.buildBm25Index(c, "doc_id", "text")
        val idx = idx0.copy(postings = idx0.postings.cache())
        time(s"bm25-index-build x$x pass$pass") { idx.postings.count() }
        time(s"bm25-probe-on-index x$x pass$pass") {
          TextSearch.bm25TopKOnIndex(idx, probes, k = 10).count()
        }
        idx.postings.unpersist(false)
        time(s"x147-chunk-pipeline x$x pass$pass") {
          val chunks = TextAnalysis.chunkWindows(
              graft.ext.Par.widen(c), "doc_id", "text",
              window = 16, stride = 8)
            .select(($"doc_id" * 1000L + $"chunk_no").as("chunk_id"),
              $"chunk")
            .cache()
          val n = TextSearch.bm25TopK(chunks, "chunk_id", "chunk",
            probes, k = 5).count()
          chunks.unpersist(false)
          n
        }
      }
    }
    spark.stop()
  }
}

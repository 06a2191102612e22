package graft.tools_dev

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev runner: wall-clock scale curves for ANN probe and graph rounds at
  * sf0.1 x1/x8 (the PERF.md round-10 numbers). */
object ScaleTime {
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
    import graft.ext.{Graphs, Similarity}
    val dir = "/root/testdata/sf0.1"
    val emb = graft.queries.Q.tbl(spark, dir, "embeddings")
      .select($"vec_id".cast("long").as("id"),
        $"embedding".cast("array<double>").as("embedding"))
    def corpusX(times: Int): DataFrame =
      (0 until times).map(c =>
        emb.select(($"id" + c * 10000000L).as("id"), $"embedding"))
        .reduce(_ unionByName _)
    val queries = emb.filter($"id" < 64)
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // Bench hygiene: drop cache entries AND orphaned localCheckpoint
      // blocks between measurements, or block-manager pressure from one
      // op inflates the next (observed: labelProp pass2 2x pass1)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      r
    }
    for (x <- Seq(1, 8)) {
      val c = corpusX(x)
      (1 to 2).foreach { pass =>
        time(s"ivfTopK x$x pass$pass") {
          Similarity.ivfTopK(c, queries, "id", "embedding",
            k = 10, nCentroids = 16, nProbe = 4).count()
        }
        time(s"pqTopK x$x pass$pass") {
          Similarity.pqTopK(c, queries, "id", "embedding", k = 10).count()
        }
      }
    }
    val docs = graft.queries.Q.tbl(spark, dir, "documents")
      .select($"doc_id".cast("long").as("doc_id"))
    def edgesX(times: Int): DataFrame = {
      val e1 = Graphs.syntheticEdges(docs, "doc_id")
      (0 until times).map(c =>
        e1.select(($"src" + c * 10000000L).as("src"),
          ($"dst" + c * 10000000L).as("dst")))
        .reduce(_ unionByName _)
    }
    for (x <- Seq(1, 8)) {
      val e = edgesX(x)
      (1 to 2).foreach { pass =>
        time(s"pageRank-cp8 x$x pass$pass") {
          Graphs.pageRankInt(e, iters = 5, checkpointEvery = 8).count()
        }
        time(s"pageRank-cp1 x$x pass$pass") {
          Graphs.pageRankInt(e, iters = 5, checkpointEvery = 1).count()
        }
        time(s"kCoreRounds x$x pass$pass") {
          Graphs.kCoreRounds(e, k = 3, rounds = 3).count()
        }
        time(s"labelProp x$x pass$pass") {
          Graphs.labelPropagation(e, iters = 5).select($"label")
            .distinct().count()
        }
        time(s"labelProp-cp2 x$x pass$pass") {
          Graphs.labelPropagation(e, iters = 5, checkpointEvery = 2)
            .select($"label").distinct().count()
        }
        time(s"labelProp-cp1 x$x pass$pass") {
          Graphs.labelPropagation(e, iters = 5, checkpointEvery = 1)
            .select($"label").distinct().count()
        }
      }
    }
    spark.stop()
  }
}

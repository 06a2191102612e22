package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: does the persisted index layout actually prune?
  * Builds + saves both standing indexes at the given sf, probes the
  * RELOADED layout, and prints per-scan (files read, rows read) from
  * the executed plan's FileSourceScan metrics, flat vs bucketed. */
object IndexStoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // AQE wraps the executed plan in an opaque AdaptiveSparkPlanExec,
      // hiding the scans from collectWithSubqueries; the pruning under
      // measurement is planning-time and AQE-independent
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Functions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = "/tmp/graft-devidx"

    def scanMetrics(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      scans.foreach { s =>
        val m = s.metrics
        println(f"$label%-28s files=${m.get("filesNum").orElse(m.get("numFiles")).map(_.value).getOrElse(-1L)}%5d " +
          s"rows=${m.get("numOutputRows").map(_.value).getOrElse(-1L)} " +
          s"loc=${s.relation.location.getClass.getSimpleName} " +
          s"part=[${s.partitionFilters.mkString(", ").take(120)}]")
      }
    }

    // ---- BM25 ----
    // scorePostings localCheckpoints its input (the parquet scan runs in
    // the checkpoint job, invisible to the final plan), so measure the
    // PRUNED-POSTINGS scan itself — the part the layout changes.
    val bm = graft.ext.TextSearch.buildBm25Index(docs, "doc_id", "text")
    graft.ext.TextSearch.saveBm25Index(bm, s"$base/bm25", tokBuckets = 64)
    // baseline: the same postings saved flat (pre-layout deployment)
    bm.postings.write.mode("overwrite").parquet(s"$base/bm25flat")
    val stored = graft.ext.TextSearch.loadBm25Index(spark, s"$base/bm25")
    val qs = docs.filter(col("doc_id") % 50 === 0 && col("doc_id") <= 2500)
      .select(col("doc_id"), concat_ws(" ",
        slice(split(col("text"), " "), 1, 5)).as("q"))
      .collect().map(r => (r.getLong(0).toInt, r.getString(1))).toSeq.sortBy(_._1)
    val qterms = qs.flatMap(_._2.split(" ")).distinct
    val buckets = qterms.map(t => graft.ext.TextSearch.tokBucket(t, 64)).distinct
    println(s"bm25 qterms=${qterms.size} buckets=${buckets.size}/64 " +
      s"totalPostings=${bm.postings.count()}")
    scanMetrics(spark.read.parquet(s"$base/bm25flat")
      .filter(col("tok").isin(qterms: _*)), "bm25 flat scan")
    scanMetrics(stored.postings
      .filter(col("tok_bucket").isin(buckets.map(Integer.valueOf): _*))
      .filter(col("tok").isin(qterms: _*)), "bm25 bucket-pruned scan")
    // rare-term workload (df == 1 tokens): the case where row-group
    // pruning matters — common Zipf terms carry most of the posting
    // mass into their buckets, rare terms don't
    val rare = bm.postings.groupBy(col("tok")).agg(count(lit(1)).as("d"))
      .orderBy(col("d"), col("tok")).limit(10)
      .collect().map(_.getString(0)).toSeq
    val rareBuckets = rare.map(t => graft.ext.TextSearch.tokBucket(t, 64)).distinct
    scanMetrics(spark.read.parquet(s"$base/bm25flat")
      .filter(col("tok").isin(rare: _*)), "bm25 flat rare-scan")
    scanMetrics(stored.postings
      .filter(col("tok_bucket").isin(rareBuckets.map(Integer.valueOf): _*))
      .filter(col("tok").isin(rare: _*)), "bm25 bucket rare-scan")
    // correctness cross-check while we're here
    val a = graft.ext.TextSearch.bm25TopKOnIndex(bm, qs, k = 10)
      .collect().map(_.toString).sorted
    val c = graft.ext.TextSearch.bm25TopKOnStoredIndex(stored, qs, k = 10)
      .collect().map(_.toString).sorted
    println(s"bm25 stored==memory: ${a.sameElements(c)} (${a.length} rows)")

    // ---- IVF-PQ ----
    val ivf = graft.ext.Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCentroids = 16, m = 4, codebookSize = 16, seed = 42L)
    graft.ext.Similarity.saveIvfPqIndex(ivf, s"$base/ivf")
    val lidx = graft.ext.Similarity.loadIvfPqIndex(spark, s"$base/ivf")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    println(s"ivfpq totalCodes=${ivf.codes.count()} " +
      s"codesFiles=${new java.io.File(s"$base/ivf/codes").listFiles().count(_.getName.startsWith("cell="))} cells")
    scanMetrics(graft.ext.Similarity.ivfPqTopKOnIndex(lidx, queries,
      "vec_id", "embedding", k = 5, nProbe = 4), "ivfpq loaded-probe")
    val m1 = graft.ext.Similarity.ivfPqTopKOnIndex(ivf, queries,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(_.toString).sorted
    val m2 = graft.ext.Similarity.ivfPqTopKOnIndex(lidx, queries,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(_.toString).sorted
    println(s"ivfpq stored==memory: ${m1.sameElements(m2)} (${m1.length} rows)")

    // ---- stored MinHash (round 13) ----
    // measure the bands scan for a small ingest probe batch, flat
    // (exploded band rows saved unpartitioned — the pre-layout
    // deployment) vs bb-partitioned; the verification docs/ scan is
    // candidate-bounded either way.
    val mh = graft.ext.TextDedup.minhashIndex(docs, "doc_id", "text")
    graft.ext.TextDedup.saveMinhashIndex(mh, s"$base/mh", bandBuckets = 64)
    val smh = graft.ext.TextDedup.loadMinhashIndex(spark, s"$base/mh")
    smh.idxBands.write.mode("overwrite").parquet(s"$base/mhflat")
    val probeBatch = docs.filter(col("doc_id") % 500 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    println(s"minhash bandRows=${smh.idxBands.count()} probeDocs=${probeBatch.count()}")
    // flat baseline: the same candidate join with no partition column
    val flatIdx = spark.read.parquet(s"$base/mhflat")
    scanMetrics(graft.ext.TextDedup.nearDupAgainstStoredIndex(
      probeBatch, "doc_id", "text",
      smh.copy(idxBands = flatIdx.drop("bb")
        .withColumn("bb", pmod(xxhash64(col("band"), col("bh")),
          lit(64L)).cast("int"))), 0.8), "minhash flat probe")
    scanMetrics(graft.ext.TextDedup.nearDupAgainstStoredIndex(
      probeBatch, "doc_id", "text", smh, 0.8), "minhash bucket probe")
    // single-doc probe: ≤ bands distinct buckets — the floor of the
    // pruning curve (bandBuckets ≫ probe band keys is the 100 TB shape)
    scanMetrics(graft.ext.TextDedup.nearDupAgainstStoredIndex(
      probeBatch.limit(1), "doc_id", "text", smh, 0.8),
      "minhash bucket 1-doc")
    val mm = graft.ext.TextDedup.nearDupAgainstIndex(probeBatch,
      "doc_id", "text", mh).collect().map(_.toString).sorted
    val ms = graft.ext.TextDedup.nearDupAgainstStoredIndex(probeBatch,
      "doc_id", "text", smh).collect().map(_.toString).sorted
    println(s"minhash stored==memory: ${mm.sameElements(ms)} (${mm.length} rows)")
    spark.stop()
  }
}

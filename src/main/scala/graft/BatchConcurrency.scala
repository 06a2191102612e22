package graft

import org.apache.spark.sql.SparkSession

/** Concurrent-query capacity for the BATCH side — the bench evidence
  * through round 11 was entirely sequential, but a 100 TB deployment
  * runs N analysts' queries at once on shared executors, and the number
  * an operator needs is how aggregate throughput and per-query latency
  * move as concurrency rises.
  *
  * Method: a fixed MIXED subset of the declared queries (scan-heavy
  * TPC-H aggregates, a shuffle-heavy salted join, dedup/LSH, ANN, BM25,
  * an iterative graph op — one per family, moderate runtimes) runs
  * once sequentially for the per-query baseline, then K threads run the
  * SAME subset concurrently for K ∈ {2,4,8}, each thread in its own
  * FAIR scheduler pool (undeclared pools share fairly with weight 1 —
  * exactly the multi-tenant default) and each thread starting at a
  * rotated offset so the mix stays heterogeneous at every instant
  * rather than K copies of the same plan in lockstep.
  *
  * Reported per level: wall seconds, `agg_qps_x` = (K × seq_total) /
  * wall (1.0 = concurrency bought nothing, K = perfect scaling), and
  * the p50/p95 per-query slowdown vs the sequential baseline. Two
  * honesty notes measured into the shape: (a) the DataFrame cache is
  * cleared BETWEEN levels, not between queries — mid-flight clears
  * would yank another thread's persisted iteration state, and a shared
  * CacheManager is what a real shared cluster has (identical concurrent
  * plans legitimately share cache entries); (b) queries keep their
  * Bench semantics (same fn, same `.count()` action), so levels compare
  * apples to apples with the sequential sweep. */
object BatchConcurrency {

  /** One query per workload family, moderate sequential runtimes
    * (~0.2-1.3 s at sf0.1) so an 8-way level still finishes in tens of
    * seconds: TPC-H agg + join, window top-k, salted skew agg, exact +
    * LSH dedup, brute + IVF ANN, BM25, KL drift, edit-distance fuzzy
    * join, PageRank. */
  val mix: Seq[String] = Seq(
    "q01_pricing_summary", "q25_tpch_q3", "q05_window_topn",
    "q13_salted_agg", "x01_dedup_exact", "x02_dedup_minhash_lsh",
    "x05_ann_cosine_topk", "x13_ann_ivf", "x43_bm25_search",
    "x63_domain_shift_kl", "x85_fuzzy_ed1_join", "x97_pagerank")

  /** `altP95Slowdown` is NaN for single-observation levels; a retried
    * (degraded-window) level records the DISCARDED observation's p95
    * here so the artifact shows which levels were sampled best-of-2
    * (the stream-capacity retry convention, round 15). */
  final case class Level(k: Int, wallS: Double, aggQpsX: Double,
      p50Slowdown: Double, p95Slowdown: Double, failures: Int,
      anchorBeforeMs: Double, anchorAfterMs: Double, degraded: Boolean,
      altP95Slowdown: Double = Double.NaN)
  final case class Result(queries: Seq[String], seqTotalS: Double,
      seqS: Map[String, Double], seqAnchorMs: Double, levels: Seq[Level])

  private def clearCaches(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }

  /** The constant-shape window anchor (Bench's `calibSpark` twin,
    * min-of-2): ~70-100 ms warm on a nominal box. Run before AND after
    * every concurrency level — the round-13 driver artifact recorded a
    * K=8 p95 slowdown of 66× inside a window whose single PHASE anchor
    * read clean, which is indistinguishable from a real contention knee;
    * bracketing each level makes every recorded row self-adjudicating. */
  private def anchorMs(spark: SparkSession): Double = {
    def pass(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 20000000L, 1L, 32)
        .selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e6
    }
    math.min(pass(), pass())
  }

  /** A level is flagged `degraded` when either of its bracketing
    * anchors reads > `DegradedX` × the cleanest anchor observed in this
    * run: the box was contended during the level, so its numbers
    * measure the neighbor, not the engine — report the row, mark it,
    * never average it into a verdict. */
  private val DegradedX = 2.5

  def measure(spark: SparkSession, sfDir: String,
      ks: Seq[Int] = Seq(2, 4, 8)): Result = {
    val qs = mix.filter(SparkEntry.queries.contains)
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // sequential baseline — queries are already triple-warmed by the
    // main sweep when Bench calls this, so one pass is a steady-state
    // number; caches cleared per query to match the sweep's hygiene
    val seqAnchor = anchorMs(spark)
    val seq = qs.map { n =>
      val t = runOne(n); clearCaches(spark); n -> t
    }.toMap
    val seqTotal = seq.values.sum

    def runLevel(k: Int): Level = {
      clearCaches(spark)
      val before = anchorMs(spark)
      val times = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
      val failures = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val threads = (0 until k).map { i =>
        val t = new Thread(() => {
          // per-thread FAIR pool = the multi-tenant scheduling shape;
          // rotated start offset keeps the in-flight mix heterogeneous
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"bc$i")
          val rotated = qs.drop(i % qs.size) ++ qs.take(i % qs.size)
          rotated.foreach { n =>
            try { times.add(n -> runOne(n)); () }
            catch { case e: Throwable =>
              failures.incrementAndGet()
              System.err.println(s"BENCH WARN batch_concurrency k=$k $n: ${e.getMessage}")
            }
          }
        }, s"bc-$k-$i")
        t.start(); t
      }
      threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val after = anchorMs(spark)
      import scala.jdk.CollectionConverters._
      val slowdowns = times.asScala.toSeq
        .map { case (n, t) => t / math.max(1e-9, seq(n)) }.sorted
      def pct(p: Double): Double =
        if (slowdowns.isEmpty) Double.NaN
        else slowdowns(math.min(slowdowns.size - 1, (p * slowdowns.size).toInt))
      Level(k, wall, k * seqTotal / math.max(1e-9, wall),
        pct(0.50), pct(0.95), failures.get(), before, after,
        degraded = false) // gated below against the whole run's floor
    }
    val raw = ks.map(runLevel)
    clearCaches(spark)
    // nominal = the cleanest anchor this run saw (including the seq
    // baseline's) — a relative gate, robust to slow-but-steady boxes
    def worst(l: Level) = math.max(l.anchorBeforeMs, l.anchorAfterMs)
    val floor0 = (seqAnchor +: raw.flatMap(l =>
      Seq(l.anchorBeforeMs, l.anchorAfterMs))).min
    // ONE retry per degraded-window level (the stream-capacity rule,
    // round 15): real contention knees are REPRODUCIBLE at the same K
    // while a shared box's burst is not, so a level whose bracketing
    // anchors convict its window gets one more chance at a cleaner one.
    // The cleaner-anchored observation is the measurement; the
    // discarded one's p95 rides along so the artifact shows the
    // sampling. The retry's anchors also join the floor: a retry can
    // only make the gate stricter, never launder the first reading.
    val retried = raw.map { l =>
      if (worst(l) <= DegradedX * floor0) l
      else {
        System.err.println(
          f"BENCH WARN batch_concurrency k=${l.k}: window degraded " +
            f"(anchors ${l.anchorBeforeMs}%.0f/${l.anchorAfterMs}%.0f vs " +
            f"floor $floor0%.0f) — retrying once")
        val second = runLevel(l.k)
        if (worst(second) < worst(l))
          second.copy(altP95Slowdown = l.p95Slowdown)
        else l.copy(altP95Slowdown = second.p95Slowdown)
      }
    }
    val floor = (floor0 +: retried.flatMap(l =>
      Seq(l.anchorBeforeMs, l.anchorAfterMs))).min
    val levels = retried.map(l => l.copy(degraded =
      worst(l) > DegradedX * floor))
    Result(qs, seqTotal, seq, seqAnchor, levels)
  }

  /** BENCH JSON fragment; "null" on any failure (never kills the line). */
  def json(spark: SparkSession, sfDir: String): String =
    try {
      val r = measure(spark, sfDir)
      val lv = r.levels.map(l =>
        f"""{"k":${l.k},"wall_s":${l.wallS}%.2f,"agg_qps_x":${l.aggQpsX}%.2f,""" +
          f""""p50_slowdown":${l.p50Slowdown}%.2f,"p95_slowdown":${l.p95Slowdown}%.2f,""" +
          f""""failures":${l.failures},"anchor_before_ms":${l.anchorBeforeMs}%.1f,""" +
          f""""anchor_after_ms":${l.anchorAfterMs}%.1f,"degraded":${l.degraded},""" +
          s""""alt_p95_slowdown":${
            if (l.altP95Slowdown.isNaN) "null"
            else f"${l.altP95Slowdown}%.2f"}}""")
        .mkString("[", ",", "]")
      f"""{"n_queries":${r.queries.size},"seq_total_s":${r.seqTotalS}%.2f,""" +
        f""""seq_anchor_ms":${r.seqAnchorMs}%.1f,"levels":$lv}"""
    } catch {
      case e: Throwable =>
        System.err.println(s"BENCH ERROR batch_concurrency: ${e.getMessage}")
        "null"
    }
}

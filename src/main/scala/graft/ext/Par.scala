package graft.ext

import org.apache.spark.sql.DataFrame

/** Parallelism-shape helpers. */
object Par {

  /** Widen a byte-small dataset for a CPU-bound stage. A single-file
    * scan of a few hundred KB is ONE task, and AQE's byte-based
    * coalescing keeps every later exchange at one partition too — so
    * work whose cost is per-row CPU (deep BPE folds, per-word hashing,
    * levenshtein over candidate pairs) serializes onto a single core
    * however many the cluster has. Round-robin REPARTITION_BY_NUM is
    * exempt from AQE coalescing (and, unlike a hash repartition on an
    * upstream grouping key, can never be collapsed into an existing
    * coalescible exchange); the partition-count guard keeps this a
    * no-op whenever the source is already at least shuffle-width
    * parallel — the 100 TB case, where an unconditional repartition
    * would ship the whole corpus through an exchange for nothing.
    *
    * SCAN-ROOTED BY CONTRACT (enforced): the guard reads
    * `df.rdd.getNumPartitions`, which forces physical planning and —
    * under AQE — can eagerly materialize upstream shuffle stages at
    * construction time. That is free for this helper's intended inputs
    * (a scan-rooted projection — leaf file scans under Project/Filter/
    * Union only, where planning is metadata-only) and a trap for
    * anything downstream of an exchange; widen the SCAN, not the
    * aggregated result. Call sites in this repo (Q.wide) wrap `tbl()`
    * reads, projections over them (x121's tokenized projection, the
    * x141–x143 media columns), and unions of such projections (x142) —
    * all scan-rooted. [[graft.plans.PlanLint.assertScanRooted]] makes
    * the contract fail fast instead of silently eager-materializing. */
  def widen(df: DataFrame): DataFrame = {
    graft.plans.PlanLint.assertScanRooted(df)
    val target =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Output sharding for tokenized-dataset export: a distributed global
  * row_number and a snake-balanced shard planner built on it.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY collapses the
  * whole input into ONE task in Spark — the canonical single-partition
  * window anti-pattern. The scale-correct form is the classic two-pass
  * rank: range-partition on the sort key (so partition i holds globally
  * smaller keys than partition i+1), sort within partitions, then add
  * per-partition row offsets. `RDD.zipWithIndex` IS that algorithm (one
  * lightweight count job for the offsets, then a map) — this is the
  * narrow case where dropping to the RDD layer is the right tool, and
  * the output comes straight back to a DataFrame.
  */
object Sharding {

  /** Global 1-based row number under `order` (which must be a total
    * order — include a unique tiebreak column). Appended as `rn`.
    *
    * Two jobs: the range-partitioner's sample + zipWithIndex's count
    * are both O(partitions) driver-side; no stage ever sees more than
    * one partition's rows. Deterministic for a total order no matter
    * where the sampled range boundaries land. */
  def globalRowNumber(df: DataFrame, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add("rn", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Dense stable id assignment for incremental ingest: every `incoming`
    * row gets `max(existing id) + its global rank` under `order` — new
    * ids are dense, deterministic, and disjoint from the standing
    * corpus, so repeated ingest batches never collide and a replay
    * assigns the same ids. The offset is ONE bounded aggregation action
    * (a single long); ranking is the range-partitioned two-pass above —
    * no single-task window, no sequence bottleneck (the classic
    * auto-increment scale trap). */
  def assignDenseIds(existing: DataFrame, idCol: String,
      incoming: DataFrame, order: Seq[Column]): DataFrame = {
    val offset = existing.agg(max(col(idCol))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    globalRowNumber(incoming, order)
      .withColumn("new_id", col("rn") + lit(offset))
      .drop("rn")
  }

  /** Snake-balanced shard plan: documents ordered by descending token
    * count are dealt to `shards` boustrophedon-style (0..S-1, then
    * S-1..0, …), the classic LPT-flavored greedy that keeps every
    * shard's token total within one max-document of the mean — the
    * export planner for "write N training files of equal work".
    *
    * Returns one row per shard: `shard, n_docs, tokens`. The only
    * corpus-sized operations are the range-partitioned rank above and
    * one partial-combined aggregation down to S rows. */
  def shardPlan(df: DataFrame, idCol: String, tokens: Column,
      shards: Int): DataFrame = {
    require(shards > 0)
    val ranked = globalRowNumber(
      df.select(col(idCol), tokens.cast("long").as("n_tok")),
      Seq(col("n_tok").desc, col(idCol)))
    ranked
      .withColumn("__r0", col("rn") - 1L)
      .withColumn("shard",
        when(pmod(expr(s"__r0 div $shards"), lit(2)) === 0,
          pmod(col("__r0"), lit(shards)))
          .otherwise(lit(shards - 1) - pmod(col("__r0"), lit(shards))))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      .orderBy("shard")
  }

  /** Column-encoding advisor: per-column storage statistics — exact
    * distinct ratio, average value width, and run count under the
    * table's natural sort key — mapped to a parquet encoding
    * recommendation (DICT / RLE / PLAIN_ZSTD / PLAIN). At 100 TB the
    * difference between a dictionary-encoded and a plain 18-char column
    * is the difference between a 4 TB and a 40 TB scan, and this is the
    * one-pass audit that catches it BEFORE the write.
    *
    * `cols` are (name, string-valued expression) pairs — cast to string
    * by the caller so the width statistic is the serialized width.
    * Runs are counted within each `groupKey` partition under `orderKey`
    * (a run "starts" on the partition's first row or any value change):
    * the window partitions on the group key, never globally — no
    * single-task sort at any scale.
    *
    * Plan: one unpivot (`stack` — scan-local row expansion), one
    * window shuffle on (col_name, group), one partial-combined
    * aggregation with an exact distinct expansion. All ratio outputs
    * are exact scaled integers (see tools/README on round() bans). */
  def encodingAdvisor(df: DataFrame, groupKey: Column, orderKey: Column,
      cols: Seq[(String, Column)], dictBp: Long = 100L,
      rleBp: Long = 2500L, wideLenX100: Long = 3200L): DataFrame = {
    require(cols.nonEmpty)
    val base = df.select(
      (Seq(groupKey.as("__g"), orderKey.as("__o")) ++
        cols.map { case (n, c) => c.cast("string").as(n) }): _*)
    val stackArgs = cols.map { case (n, _) => s"'$n', $n" }
      .mkString(s"stack(${cols.size}, ", ", ", ") as (col_name, val)")
    val stacked = base.select(col("__g"), col("__o"), expr(stackArgs))
    // (group, order) need not be unique in arbitrary inputs — `val` as
    // the final tiebreak makes the run count deterministic (equal
    // values sort adjacent, so ties can never split or merge a run
    // differently across engines/retries)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name"), col("__g"))
      .orderBy(col("__o"), col("val"))
    stacked
      .withColumn("__rs",
        when(lag(col("val"), 1).over(w).isNull ||
          lag(col("val"), 1).over(w) =!= col("val"), 1L).otherwise(0L))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("val")).as("n_distinct"),
        sum(length(col("val"))).cast("long").as("total_chars"),
        sum(col("__rs")).as("runs"))
      .select(col("col_name"), col("n_rows"), col("n_distinct"),
        col("runs"),
        expr("(20000 * n_distinct + n_rows) div (2 * n_rows)")
          .as("distinct_bp"),
        expr("(200 * total_chars + n_rows) div (2 * n_rows)")
          .as("avg_len_x100"),
        expr("(20000 * runs + n_rows) div (2 * n_rows)").as("runs_bp"))
      .withColumn("advice",
        when(col("distinct_bp") <= dictBp, lit("DICT"))
          .when(col("runs_bp") <= rleBp, lit("RLE"))
          .when(col("avg_len_x100") >= wideLenX100, lit("PLAIN_ZSTD"))
          .otherwise(lit("PLAIN")))
  }

  /** Range-partition planner: quantile boundaries over `valueCol` plus
    * the bucket histogram the split would produce — the audit to run
    * BEFORE a global sort / range-partitioned write, where one
    * overweight bucket is one straggler executor. Spark's own
    * `RangePartitioner` does exactly this with a reservoir sample;
    * `exact = true` (the verification mode) computes exact interpolated
    * percentiles instead so the plan is engine-portable and
    * deterministic — flip to false at 100 TB for one sampled pass
    * (`approx_percentile`, accuracy 10k) with the identical output
    * shape.
    *
    * Bucket membership: `bucket = #{boundaries strictly below value}` —
    * a scan-local HOF count against the broadcast boundary array; one
    * aggregation shuffle down to `buckets` rows. */
  def rangePartitionPlan(df: DataFrame, valueCol: Column, buckets: Int,
      exact: Boolean = true): DataFrame = {
    require(buckets >= 2)
    val qs = (1 until buckets).map(_.toDouble / buckets)
    val qsLit = array(qs.map(lit): _*)
    val pct =
      if (exact) percentile(valueCol, qsLit)
      else percentile_approx(valueCol, qsLit, lit(10000))
    val bounds = df.agg(pct.cast("array<double>").as("bounds"))
    df.select(valueCol.cast("double").as("__v"))
      .crossJoin(broadcast(bounds))
      .select(size(filter(col("bounds"), b => col("__v") > b))
        .cast("long").as("bucket"), col("__v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__v")).as("min_v"), max(col("__v")).as("max_v"))
  }

  /** Z-order (Morton) clustering key over `dims.size` non-negative
    * integer dimensions, `bits` low bits each: bit i of dimension j
    * lands at output bit `i * dims.size + j`. Sorting/range-bucketing
    * by this key co-locates rows that are close in EVERY dimension —
    * the multi-column data-layout key (a `ZORDER BY` in lakehouse
    * engines) that lets min/max file statistics prune on all dims at
    * once, where a lexicographic sort key prunes only its leading
    * column.
    *
    * Pure scan-local bit algebra (shifts/AND/integer sum of disjoint
    * bits ≡ OR), codegen-friendly, portable to any ANSI engine. Caller
    * maps dims into [0, 2^bits) first — typically `value % 2^bits` for
    * dense ids or a rank/quantile for arbitrary distributions. */
  def zOrderKey(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits >= 1 && dims.size * bits <= 63,
      s"${dims.size} dims x $bits bits must fit in a positive long")
    val parts = for {
      (d, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(d.cast("long"), i).bitwiseAND(lit(1L)),
      i * dims.size + j)
    parts.reduce(_ + _)
  }

  /** Small-file compaction plan: next-fit bin packing of an ordered
    * file manifest into target-size output files. `binFor(f) =
    * floor(cumulative bytes before f / targetBytes)` — files stay in
    * manifest order (preserving any existing sort/cluster order, the
    * reason compaction uses next-fit rather than best-fit), every bin
    * except the last holds at least `targetBytes` minus one file of
    * slack, and the whole plan is one prefix-sum window over the
    * manifest — which is FILE-count sized, not row-count sized, so the
    * single-partition running-sum window is driver-cheap even for a
    * 100 TB table (a million files is a million rows).
    *
    * Returns the manifest with `bin` appended. */
  def compactionPlan(manifest: DataFrame, orderCol: Column,
      sizeCol: Column, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    // `div`, not `/`+floor-cast: long `/` is double division in Spark
    // and the mantissa-rounded quotient can floor one off (same rule as
    // Graphs.pageRankInt)
    manifest.withColumn("__cum", coalesce(sum(sizeCol).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum div ${targetBytes}L"))
      .drop("__cum")
  }

  /** Highest-random-weight (rendezvous) shard assignment: shard(key) =
    * argmax over s < `shards` of a per-(key, shard) weight. Growing the
    * fleet k → k+1 moves ONLY the keys whose new shard wins their old
    * maximum — an expected 1/(k+1) of keys, every one of them moving TO
    * the new shard — where modulo sharding (`key % k`) reshuffles
    * (k-1)/k of the corpus. The stability contract that makes online
    * re-sharding of a 100 TB keyed store an incremental copy instead of
    * a full rewrite.
    *
    * The weight is portable integer arithmetic (no engine-specific hash):
    * `w(key, s) = ((key + 1) mod P) * A_s mod P`, `P = 1e9+7`,
    * `A_s = 2654435761 * (s + 1) mod P` — products stay under 2^60, so
    * Spark and any ANSI engine agree bit-for-bit (a native xxhash64
    * would be stronger but is not oracle-portable; swap it in when both
    * sides are Spark). Scan-local: an array of `shards` weight
    * expressions and one argmax, no join, no shuffle. */
  def hrwShard(key: Column, shards: Int): Column = {
    require(shards >= 1 && shards <= 1024)
    val P = 1000000007L
    val weights = array((0 until shards).map { s =>
      val a = (2654435761L * (s + 1)) % P
      pmod(key.cast("long") + 1, lit(P)) * lit(a) % lit(P)
    }: _*)
    // array_position is 1-based; first max wins ties (deterministic)
    (array_position(weights, array_max(weights)) - 1).cast("long")
  }

  /** DuckDB twin of [[hrwShard]] (same weights, same first-max tie
    * rule) for oracle SQL: greatest() + a first-match CASE. The inner
    * mod is emitted in positive form — `((x % P) + P) % P` — because
    * DuckDB's `%` follows the dividend's sign while the Spark side
    * uses `pmod`; plain `%` would diverge for negative keys. */
  def hrwShardSql(keyExpr: String, shards: Int): String = {
    if (shards == 1) return "0" // degenerate fleet: greatest() needs >1 arg
    val P = 1000000007L
    val ws = (0 until shards).map { s =>
      val a = (2654435761L * (s + 1)) % P
      s"((((($keyExpr) + 1) % $P) + $P) % $P * $a) % $P"
    }
    val g = ws.mkString("greatest(", ", ", ")")
    // nested CASE checks s = 0 outermost → lowest shard wins ties,
    // matching array_position's first-occurrence rule
    ws.zipWithIndex.reverse.foldLeft("NULL") { case (acc, (w, s)) =>
      s"CASE WHEN $w = $g THEN $s ELSE $acc END"
    }
  }
}

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
}

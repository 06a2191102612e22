package graft.producer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Outbox-table operators: fetch (P4), pending-topic discovery (P5),
  * consecutive-duplicate collapse (P6), ack/retry bookkeeping (P12),
  * latency aggregation (P22).
  *
  * The outbox is a columnar table partitioned by `topic` — the reference's
  * per-topic polling loop plus its partial index on `published_at IS NULL`
  * (README.md:352) become partition pruning plus data skipping. All
  * operators below are declarative so Catalyst pushes the filters into the
  * scan; at 100 TB the `published_at IS NULL` slice is the small live head
  * of the table, so the scan stays proportional to the backlog, not the
  * history.
  */
object OutboxOps {

  /** P4 — publishable batch: reference scope `fetch_publishable`
    * (lib/dionysus/producer/outbox/model.rb:15-26):
    * `published_at IS NULL AND topic = ? AND (retry_at IS NULL OR retry_at
    * <= now) [AND created_at <= now - delay] ORDER BY created_at LIMIT n`.
    */
  def fetchPublishable(
      outbox: DataFrame,
      topic: String,
      now: Column,
      batchSize: Int = 100,
      publishingDelaySeconds: Long = 0): DataFrame = {
    val base = outbox
      .filter(col("published_at").isNull && col("topic") === topic)
      .filter(col("retry_at").isNull || col("retry_at") <= now)
    val delayed =
      if (publishingDelaySeconds > 0)
        base.filter(col("created_at") <= now - expr(s"INTERVAL $publishingDelaySeconds SECOND"))
      else base
    delayed.orderBy(col("created_at"), col("resource_id")).limit(batchSize)
  }

  /** P5 — pending-topic discovery (reference: model.rb:32-34). On a
    * topic-partitioned table this is a metadata-sized aggregation. */
  def pendingTopics(outbox: DataFrame): DataFrame =
    outbox.filter(col("published_at").isNull).select("topic").distinct()

  /** P6 — collapse *runs* of consecutive duplicates, keeping the last of
    * each run (reference: lib/dionysus/producer/outbox/duplicates_filter.rb:15-25).
    *
    * The Ruby semantics are adjacency in the per-topic publish sequence; we
    * implement exactly that with `lead` over a per-topic window ordered by
    * `(created_at, resource_id)`. The window partitions by `topic`, so at
    * scale each topic is one sort — matching the reference's per-topic
    * single-writer ordering (SURVEY §7.4.1). A run's last row is the row
    * whose next row has a different duplicate key. */
  def collapseConsecutiveDuplicates(outbox: DataFrame): DataFrame = {
    val key = concat_ws("§",
      col("resource_class"), col("resource_id"), col("event_name"))
    val w = Window.partitionBy(col("topic"))
      .orderBy(col("created_at"), col("resource_id"))
    outbox
      .withColumn("__next_key", lead(key, 1).over(w))
      .filter(col("__next_key").isNull || col("__next_key") =!= key)
      .drop("__next_key")
  }

  /** P12 — ack/retry bookkeeping merged back into the outbox. `published`
    * and `failed` are keyed subsets of the fetched batch; the retry
    * schedule is `now + 5·2^attempts` seconds (reference:
    * records_processor.rb:11-55, model.rb:69-78, exponential_backoff.rb:4-6).
    * Returns the updated outbox frame (the storage layer rewrites only the
    * affected partitions). */
  def acknowledge(
      outbox: DataFrame,
      published: DataFrame,
      failed: DataFrame,
      now: Column,
      errorClass: Column = lit("PublishError"),
      errorMessage: Column = lit("publish failed")): DataFrame = {
    val key = Seq("resource_class", "resource_id", "event_name", "topic", "created_at")
    val pub = published.select(key.map(col): _*).withColumn("__pub", lit(true))
    val fail = failed.select(key.map(col): _*).withColumn("__fail", lit(true))
    // success clears the whole error state, matching the reference's
    // mark_as_published UPDATE (records_processor.rb:50-55: published_at
    // set, error_class/error_message/failed_at/retry_at nulled)
    outbox
      .join(broadcast(pub), key, "left")
      .join(broadcast(fail), key, "left")
      .withColumn("published_at",
        when(col("__pub"), now).otherwise(col("published_at")))
      .withColumn("attempts",
        when(col("__fail"), col("attempts") + 1).otherwise(col("attempts")))
      .withColumn("failed_at",
        when(col("__pub"), lit(null).cast("timestamp"))
          .when(col("__fail"), now).otherwise(col("failed_at")))
      .withColumn("retry_at",
        when(col("__pub"), lit(null).cast("timestamp"))
          .when(col("__fail"),
            now + make_dt_interval(lit(0), lit(0), lit(0),
              lit(5) * pow(lit(2), col("attempts"))))
          .otherwise(col("retry_at")))
      .withColumn("error_class",
        when(col("__pub"), lit(null).cast("string"))
          .when(col("__fail"), errorClass).otherwise(col("error_class")))
      .withColumn("error_message",
        when(col("__pub"), lit(null).cast("string"))
          .when(col("__fail"), errorMessage).otherwise(col("error_message")))
      .drop("__pub", "__fail")
  }

  /** P13 — per-topic writer serialization. The reference takes a Redlock
    * so at most one worker publishes a topic at a time (runner.rb:52-77);
    * Spark gets the same guarantee structurally: repartition by topic puts
    * each topic in exactly one task, and the checkpointed sink gives
    * single-writer-per-partition ordering — no distributed lock. */
  def partitionByTopic(outbox: DataFrame): DataFrame =
    outbox.repartition(col("topic"))

  /** P22 — latency aggregation over the last interval (reference:
    * lib/dionysus/producer/outbox/latency_tracker.rb:15-42):
    * min/max/avg(published_at − created_at) over rows published in the
    * window, plus `now − min(created_at)` over still-unpublished rows. */
  def latencyStats(outbox: DataFrame, now: Column, intervalSeconds: Long = 60): DataFrame = {
    val published = outbox
      .filter(col("published_at").isNotNull &&
        col("published_at") >= now - expr(s"INTERVAL $intervalSeconds SECOND"))
      .agg(
        min(unix_timestamp(col("published_at")) - unix_timestamp(col("created_at"))).as("min_latency"),
        max(unix_timestamp(col("published_at")) - unix_timestamp(col("created_at"))).as("max_latency"),
        avg(unix_timestamp(col("published_at")) - unix_timestamp(col("created_at"))).as("avg_latency"))
    val oldest = outbox
      .filter(col("published_at").isNull)
      .agg((unix_timestamp(now) - min(unix_timestamp(col("created_at"))))
        .as("highest_since_creation"))
    published.crossJoin(oldest)
  }
}

package graft.producer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The outbox worker "tick" — one iteration of the reference's poll loop
  * (runner.rb:15-35 → outbox/producer.rb:11-17 → records_processor.rb:11-55),
  * set-oriented: for every pending topic, fetch the publishable batch (P4),
  * collapse consecutive duplicates (P6), publish through the sink (P11),
  * and write back ack/retry state (P12).
  *
  * The reference loops topic-by-topic under a distributed lock; here all
  * topics process in one plan (each topic is its own partition/task — P13)
  * and ordering comes from the per-topic sort inside the batch. A live
  * deployment calls this from a `Trigger.ProcessingTime("200 milliseconds")`
  * streaming query over the outbox table — the 0.2 s poll (I5).
  */
object OutboxWorker {

  /** One tick. `publish` receives the deduped batch (all topics) and
    * returns the subset that failed (empty frame = all succeeded).
    * Returns the updated outbox. */
  def tick(
      outbox: DataFrame,
      now: Column,
      batchSizePerTopic: Int = 100,
      publish: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // P4 across all pending topics at once: rank per topic by created_at
    // and keep the head batch — the set-oriented form of per-topic LIMIT
    val pending = outbox
      .filter(col("published_at").isNull &&
        (col("retry_at").isNull || col("retry_at") <= now))
    val w = Window.partitionBy(col("topic"))
      .orderBy(col("created_at"), col("resource_id"))
    val batch = pending
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= batchSizePerTopic)
      .drop("__rn")

    // P6: collapse consecutive duplicates before hitting the sink. NOTE
    // the reference marks the FULL batch (minus failures) as published —
    // collapsed duplicates are acked without being sent
    // (records_processor.rb:24-26: published = records - failed)
    val checkpointedBatch = batch.localCheckpoint(eager = true)
    val deduped = OutboxOps.collapseConsecutiveDuplicates(checkpointedBatch)

    // P11/P12: publish, then write back ack/retry state
    val failed = publish(deduped).localCheckpoint(eager = true)
    val succeeded = checkpointedBatch.join(failed,
      Seq("resource_class", "resource_id", "event_name", "topic", "created_at"),
      "left_anti")
    OutboxOps.acknowledge(outbox, succeeded, failed, now)
  }
}

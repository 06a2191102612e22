package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.producer.OutboxOps

/** P4/P6/P13/P22 unit coverage beyond the oracle queries. */
class OutboxOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val outbox = Seq(
    // (class, id, event, topic, pubAt, retryAt, attempts, createdAt)
    ("A", "1", "a_created", "t1", null.asInstanceOf[Timestamp],
      null.asInstanceOf[Timestamp], 0, ts("2026-01-01 00:00:00")),
    ("A", "2", "a_created", "t1", null.asInstanceOf[Timestamp],
      ts("2026-01-03 00:00:00"), 2, ts("2026-01-01 00:01:00")), // future retry
    ("A", "3", "a_created", "t1", ts("2026-01-01 01:00:00"),
      null.asInstanceOf[Timestamp], 0, ts("2026-01-01 00:02:00")), // published
    ("A", "4", "a_created", "t2", null.asInstanceOf[Timestamp],
      null.asInstanceOf[Timestamp], 0, ts("2026-01-01 00:03:00"))) // other topic
    .toDF("resource_class", "resource_id", "event_name", "topic",
      "published_at", "retry_at", "attempts", "created_at")

  test("P4 fetchPublishable: unpublished, retry-due, right topic, ordered") {
    val got = OutboxOps.fetchPublishable(outbox, "t1",
        now = lit("2026-01-02 00:00:00").cast("timestamp"), batchSize = 10)
      .select("resource_id").as[String].collect().toSeq
    assert(got == Seq("1"), s"got $got") // 2 retry-future, 3 published, 4 other topic
    // after the retry deadline passes, record 2 becomes eligible
    val later = OutboxOps.fetchPublishable(outbox, "t1",
        now = lit("2026-01-04 00:00:00").cast("timestamp"), batchSize = 10)
      .select("resource_id").as[String].collect().toSeq
    assert(later == Seq("1", "2"))
  }

  test("P22 latencyStats: window stats over published + oldest pending age") {
    val now = lit("2026-01-01 01:00:30").cast("timestamp")
    val row = OutboxOps.latencyStats(outbox, now, intervalSeconds = 60).collect()(0)
    // only record 3 published within the window: latency 58 min = 3480 s
    assert(row.getAs[Long]("min_latency") == 3480L)
    assert(row.getAs[Long]("max_latency") == 3480L)
    // oldest unpublished is record 1 @ 00:00:00 → 3630 s old
    assert(row.getAs[Long]("highest_since_creation") == 3630L)
  }

  test("OutboxWorker.tick: publishes pending, acks successes, schedules retries") {
    import graft.producer.OutboxWorker
    val full = outbox
      .withColumn("partition_key", lit(null).cast("string"))
      .withColumn("failed_at", lit(null).cast("timestamp"))
      .withColumn("error_class", lit(null).cast("string"))
      .withColumn("error_message", lit(null).cast("string"))
      .withColumn("updated_at", col("created_at"))
      .withColumn("changeset", lit(null).cast("string"))
    val now = lit("2026-01-04 00:00:00").cast("timestamp")
    var publishedKeys = Seq.empty[String]
    val after = OutboxWorker.tick(full, now, batchSizePerTopic = 10,
      publish = batch => {
        publishedKeys = batch.select("resource_id").as[String].collect().toSeq
        batch.filter($"resource_id" === "2") // simulate failure of record 2
      })
    val byId = after.select("resource_id", "published_at", "attempts", "retry_at")
      .collect().map(r => r.getString(0) ->
        (r.getTimestamp(1), r.getInt(2), r.getTimestamp(3))).toMap
    assert(publishedKeys.toSet == Set("1", "2", "4"))
    assert(byId("1")._1 != null && byId("4")._1 != null, "successes acked")
    assert(byId("2")._1 == null && byId("2")._2 == 3, "failure keeps pending, attempts+1")
    assert(byId("2")._3 != null && byId("2")._3.after(ts("2026-01-04 00:00:00")),
      "failure scheduled for backoff retry")
    assert(byId("3")._1 == ts("2026-01-01 01:00:00"), "already-published untouched")
  }

  test("P13 partitionByTopic: each topic lands in exactly one partition") {
    val parts = OutboxOps.partitionByTopic(outbox)
      .select(col("topic"), spark_partition_id().as("p"))
      .distinct().groupBy("topic").count()
      .as[(String, Long)].collect().toMap
    assert(parts.values.forall(_ == 1L), s"got $parts")
  }
}

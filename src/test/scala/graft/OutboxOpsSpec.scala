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

  test("P13 partitionByTopic: each topic lands in exactly one partition") {
    val parts = OutboxOps.partitionByTopic(outbox)
      .select(col("topic"), spark_partition_id().as("p"))
      .distinct().groupBy("topic").count()
      .as[(String, Long)].collect().toMap
    assert(parts.values.forall(_ == 1L), s"got $parts")
  }
}

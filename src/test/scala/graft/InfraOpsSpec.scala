package graft

import org.apache.spark.sql.functions._
import graft.consumer.ConsumerOps
import graft.metrics.Monitor
import graft.producer.{Genesis, Suppressor}

/** P18 genesis window event, P21 suppression gate, C14 consumed-event
  * publication, I1/I2 monitor + health. */
class InfraOpsSpec extends SparkSpec {
  import spark.implicits._

  test("P18: genesis Performed window event carries the padded window") {
    val start = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val row = Genesis.performedEvent(spark, "booking", "app", "v1_bookings",
      start, numberOfDays = 2).collect()(0)
    assert(row.getString(0) == "genesis_performed")
    val data = row.getString(1)
    assert(data.contains("\"model\":\"booking\"") && data.contains("v1_bookings"))
    // end_at = start + 2 days + 60 s safety delay
    assert(data.contains("2026-01-03T00:01:00"))
  }

  test("P21: suppression gate empties publish plans built while suppressed") {
    val df = Seq(1, 2, 3).toDF("x")
    assert(Suppressor.gate(df).count() == 3)
    val gated = Suppressor.suppressing { Suppressor.gate(df) }
    assert(gated.count() == 0)
    assert(Suppressor.gate(df).count() == 3, "gate must reopen")
  }

  test("C14: consumed events carry names, payload json, local changes") {
    val batch = Seq((1L, "updated", 5.0), (2L, "destroyed", 6.0))
      .toDF("synced_id", "event_type", "value")
    val lc = Seq((1L, Map("value" -> Seq("4.0", "5.0"))))
      .toDF("synced_id", "local_changes")
    val got = ConsumerOps.consumedEvents(batch, "v1_events", "event", Some(lc))
      .orderBy("synced_id").collect()
    assert(got(0).getAs[String]("event_name") == "event_updated")
    assert(got(1).getAs[String]("event_name") == "event_destroyed")
    assert(got(0).getAs[String]("transformed_data").contains("\"value\":5.0"))
    assert(got(0).getAs[String]("local_changes").contains("4.0"))
    assert(got(1).getAs[String]("local_changes") == null)
  }

  test("I1/I2: monitor captures lifecycle events; health reflects activity") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mon").toString
    val monitor = new Monitor
    spark.streams.addListener(monitor)
    try {
      Seq(1L, 2L).toDF("x").write.mode("overwrite").parquet(s"$tmp/in")
      val q = spark.readStream
        .schema(spark.read.parquet(s"$tmp/in").schema).parquet(s"$tmp/in")
        .writeStream.format("memory").queryName("mon_out")
        .option("checkpointLocation", s"$tmp/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(Monitor.healthy(q))
      q.awaitTermination()
      // listener delivery is async; drain with a grace period
      val deadline = System.currentTimeMillis() + 10000
      var names = monitor.drain().map(_.name)
      while (!names.contains("outbox_producer.stopped")
          && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); names = monitor.drain().map(_.name)
      }
      assert(names.contains("outbox_producer.started"))
      assert(names.contains("outbox_producer.stopped"))
      assert(!Monitor.healthy(q), "terminated query is unhealthy")
    } finally spark.streams.removeListener(monitor)
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.{ParquetReplica, StatefulLww, StreamingPipeline}

/** End-to-end Structured Streaming replication over a file topic, plus the
  * stateful LWW fallback and registry validation. */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("produce → file topic → consume → replica matches batch truth") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val topic = s"$tmp/topic"
    val replica = new ParquetReplica(spark, s"$tmp/replica",
      "synced_id LONG, synced_updated_at TIMESTAMP, synced_created_at TIMESTAMP, " +
        "synced_canceled_at TIMESTAMP, value DOUBLE, synced_data STRING")

    // stage the change stream into a directory (file-source contract)
    val src = s"$tmp/src"
    new java.io.File(src).mkdirs()
    Files.copy(java.nio.file.Paths.get(s"${sf()}/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    StreamingPipeline.produce(spark, src, topic, s"$tmp/cp1")
    StreamingPipeline.consume(spark, topic, replica, s"$tmp/cp2")

    val got = replica.read()
      .select($"synced_id", $"value", $"synced_canceled_at".isNotNull.as("canceled"))
      .as[(Long, Double, Boolean)].collect()
      .map { case (k, v, c) => k -> (v, c) }.toMap

    // batch truth: latest event per user (ties by event id are absent at
    // this scale); canceled iff latest event_type is error
    val truth = graft.queries.Q.tbl(spark, sf(), "events")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts").desc, $"event_id".desc)))
      .filter($"rn" === 1)
      .select($"user_id", $"value", ($"event_type" === "error").as("canceled"))
      .as[(Long, Double, Boolean)].collect()
      .map { case (k, v, c) => k -> (v, c) }.toMap

    assert(got.keySet == truth.keySet)
    for ((k, (v, c)) <- truth) {
      assert(got(k)._1 == v, s"value for user $k")
      assert(got(k)._2 == c, s"canceled flag for user $k")
    }

    // idempotency: replaying the same topic into the replica converges
    StreamingPipeline.consume(spark, topic, replica, s"$tmp/cp3")
    val replayed = replica.read()
      .select($"synced_id", $"value").as[(Long, Double)].collect().toMap
    assert(replayed == got.map { case (k, (v, _)) => k -> v })
  }

  test("StatefulLww drops stale events across micro-batches") {
    val tmp = Files.createTempDirectory("graft-lww").toString
    // two files = two micro-batches with MaxFilesPerTrigger(1):
    // batch 1 carries the NEWER event, batch 2 the stale one
    Seq(StatefulLww.Rec(1L, 2000L, 2.0, "updated"))
      .toDF().write.parquet(s"$tmp/in/f1")
    Seq(StatefulLww.Rec(1L, 1000L, 1.0, "updated"))
      .toDF().write.parquet(s"$tmp/in/f2")
    val schema = spark.read.parquet(s"$tmp/in/f1").schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val out = StatefulLww(in.as[StatefulLww.Rec])
    val q = out.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("lww_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("lww_out").as[StatefulLww.Rec].collect()
    // the newer event must be applied; the stale one must never overwrite
    assert(rows.map(_.updated_us).max == 2000L)
    assert(rows.count(_.updated_us == 1000L) == 0,
      s"stale event leaked: ${rows.mkString(",")}")
  }

  test("streaming event-time window agg with watermark matches batch") {
    val tmp = Files.createTempDirectory("graft-win").toString
    val batchEvents = graft.queries.Q.tbl(spark, sf(), "events")
      .select($"ts", $"event_type")
    batchEvents.write.parquet(s"$tmp/in")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in").schema).parquet(s"$tmp/in")
    val agg = in.withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w"), $"event_type", $"n")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("win_out")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (w, t, n) => (w.getTime, t) -> n }.toMap
    val want = batchEvents
      .groupBy(window($"ts", "1 hour"), $"event_type").agg(count(lit(1)).as("n"))
      .select($"window.start".as("w"), $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (w, t, n) => (w.getTime, t) -> n }.toMap
    assert(got.nonEmpty, "watermark must close and emit windows")
    // append mode emits only closed windows; every emitted window must
    // match the batch truth exactly
    got.foreach { case (k, n) => assert(want(k) == n, s"window $k") }
    // and all but the final (still-open) windows must have been emitted
    assert(got.size >= want.size - 5, s"${got.size} vs ${want.size}")
  }

  test("Engine: registry → one replica per topic with routed models") {
    val tmp = Files.createTempDirectory("graft-engine").toString
    val src = s"$tmp/src"
    new java.io.File(src).mkdirs()
    Files.copy(java.nio.file.Paths.get(s"${sf()}/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val reg = graft.queries.ProducerQueries.registry // v1: events/purchases/alerts
    val states = Engine.runAvailableNow(spark, reg, src, s"$tmp/work")
    assert(states.keySet == Set("v1_events", "v1_purchases", "v1_alerts"))
    val all = states("v1_events").replica.read()
    val purchases = states("v1_purchases").replica.read()
    val alerts = states("v1_alerts").replica.read()
    assert(all.count() > 0 && purchases.count() > 0 && alerts.count() > 0)
    // routing: purchases replica only holds users whose purchase events
    // exist; every purchase-topic user appears in the full events replica
    val purchaseUsers = purchases.select("synced_id").as[Long].collect().toSet
    val allUsers = all.select("synced_id").as[Long].collect().toSet
    assert(purchaseUsers.subsetOf(allUsers))
    // alerts topic only ever sees 'error' events → every row soft-deleted
    assert(alerts.filter($"synced_canceled_at".isNull).count() == 0)
  }

  test("registry validation: observer attrs + genesis dependency guard") {
    import graft.registry._
    val reg = Registry("v9", Seq(
      TopicDef("orders", models = Seq(
        ModelDef("order", attributes = Seq(Attribute("total")),
          sideloads = Seq("order_line"),
          observers = Seq(ObserverDef("order", Seq("total"), "customer")))))))
    reg.validate() // fine
    assert(reg.topicsFor("order") == Seq("v9_orders"))
    assert(reg.dependencyOnlyModels == Set("order_line"))
    intercept[IllegalArgumentException](reg.requireGenesisAllowed("order_line"))
    val bad = Registry("v9", Seq(
      TopicDef("orders", models = Seq(
        ModelDef("order", attributes = Seq(Attribute("total")),
          observers = Seq(ObserverDef("order", Seq("nope"), "customer")))))))
    intercept[IllegalArgumentException](bad.validate())
  }
}

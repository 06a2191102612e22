package graft

import org.apache.spark.sql.functions._
import graft.consumer.ConsumerOps
import graft.metrics.Monitor
import graft.producer.{Genesis, Suppressor}

/** P18 genesis window event, P21 suppression gate, C14 consumed-event
  * publication, I1/I2 monitor + health. */
class InfraOpsSpec extends SparkSpec {
  import spark.implicits._

  test("driver contract: query-category maps never collide or shadow") {
    // SparkEntry.allEntries merges the four category maps with `++` — a
    // duplicate key would silently drop a query from the correctness gate
    val parts = Seq(graft.queries.StandardQueries.all,
      graft.queries.ProducerQueries.all,
      graft.queries.ConsumerQueries.all,
      graft.queries.ExtQueries.all)
    assert(SparkEntry.queries.size == parts.map(_.size).sum,
      "a query key is declared twice across category maps")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

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

  test("P17: dense batching matches the sorted form; plan has no global sort") {
    // dense contiguous ids → identical assignment to the window form
    val df = spark.range(0, 1000).select(($"id" + 500).as("id"))
    def grab(d: org.apache.spark.sql.DataFrame) =
      d.select($"id", $"__batch", $"__delay_seconds")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val parity = grab(Genesis.assignBatches(df, "id", 100, 3600))
    val dense = grab(Genesis.assignBatchesDense(df, "id", 100, 3600))
    assert(dense == parity)
    // the dense plan must be a pure projection: no window, no
    // single-partition exchange
    val plan = Genesis.assignBatchesDense(df, "id", 100, 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SinglePartition"), plan)
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

  test("changeset: null-safe diff of old/new images feeds observer match") {
    import graft.producer.EventClassifier
    import graft.registry.ObserverDef
    val df = Seq(
      (1L, "a", "a", 1.0, 2.0),   // price changed
      (2L, "a", "b", 1.0, 1.0),   // name changed
      (3L, "a", "a", 1.0, 1.0),   // nothing changed
      (4L, null.asInstanceOf[String], "a", 1.0, 1.0)) // null → value
      .toDF("id", "old_name", "new_name", "old_price", "new_price")
      .withColumn("changeset", EventClassifier.changeset(Seq(
        ("name", col("old_name"), col("new_name")),
        ("price", col("old_price"), col("new_price")))))
    val keys = df.select($"id", map_keys($"changeset").as("ks"))
      .as[(Long, Seq[String])].collect().toMap
    assert(keys(1L) == Seq("price") && keys(2L) == Seq("name"))
    assert(keys(3L).isEmpty && keys(4L) == Seq("name"))
    // observer on price fires only for row 1
    val fired = df.filter(graft.producer.Observers.matches($"changeset",
      ObserverDef("m", Seq("price"), "x"))).select("id").as[Long].collect()
    assert(fired.toSeq == Seq(1L))
  }

  test("P11: genesis-replica fan-out doubles topics; genesis_only skips primary") {
    import graft.registry._
    import graft.producer.Serializers
    val reg = Registry("v2", Seq(
      TopicDef("bookings", Seq(ModelDef("booking")), genesisReplica = true),
      TopicDef("fees", Seq(ModelDef("fee")))))
    val df = Seq("booking", "fee").toDF("model_name")
    def topics(genesisOnly: Boolean) =
      Serializers.topicFanout(df, reg, genesisOnly = genesisOnly)
        .select("model_name", "topic").as[(String, String)].collect().toSet
    assert(topics(false) == Set(
      ("booking", "v2_bookings"), ("booking", "v2_bookings_genesis"),
      ("fee", "v2_fees")))
    assert(topics(true) == Set(
      ("booking", "v2_bookings_genesis"), ("fee", "v2_fees")))
  }

  test("aggregate schema embeds sideloads and bounds nesting depth") {
    import graft.registry._
    val fee = ModelDef("fee", attributes = Seq(Attribute("amount")))
    val booking = ModelDef("booking", attributes = Seq(Attribute("name")),
      sideloads = Seq("fee"))
    val reg = Registry("v1", Seq(TopicDef("bookings", Seq(booking, fee))))
    val agg = booking.aggregateSchema(reg)
    assert(agg.fieldNames.contains("fee"))
    val feeField = agg("fee").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(feeField.fieldNames.contains("amount"))
    // self-referential sideload must hit the depth bound loudly
    val node = ModelDef("node", sideloads = Seq("node"))
    val cyc = Registry("v1", Seq(TopicDef("nodes", Seq(node))))
    intercept[IllegalArgumentException](node.aggregateSchema(cyc, maxDepth = 3))
  }

  test("registry-derived payload schema parses a canonical payload") {
    import graft.registry._
    val m = ModelDef("booking",
      attributes = Seq(Attribute("name"),
        Attribute("amount", org.apache.spark.sql.types.DoubleType)),
      hasOne = Seq(Association("account", "account", "account_id")),
      hasMany = Seq(Association("fees", "fee", "booking_id")))
    val payload =
      """{"id": 7, "name": "x", "amount": 9.5,
        |"links": {"account": 2, "fees": [3, 4]}}""".stripMargin
    val row = Seq(payload).toDF("j")
      .select(from_json($"j", m.payloadSchema).as("r")).select($"r.*")
      .collect()(0)
    assert(row.getAs[Long]("id") == 7L)
    assert(row.getAs[Double]("amount") == 9.5)
    val links = row.getAs[org.apache.spark.sql.Row]("links")
    assert(links.getAs[Long]("account") == 2L)
    assert(links.getSeq[Long](links.fieldIndex("fees")).toList == List(3L, 4L))
  }

  test("C17: dead-letter pass-through quarantines poison batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dlq").toString
    val batch = Seq((1L, "ok")).toDF("id", "v")
    assert(ConsumerOps.withDeadLetter(batch, s"$tmp/dead")(_ => ()))
    val ok = ConsumerOps.withDeadLetter(batch, s"$tmp/dead")(_ =>
      throw new RuntimeException("boom"))
    assert(!ok)
    assert(spark.read.parquet(s"$tmp/dead").count() == 1)
  }

  test("TableIO: parquet/csv/json/orc round-trip the same rows") {
    import graft.sources.TableIO
    val tmp = java.nio.file.Files.createTempDirectory("graft-io").toString
    val df = graft.queries.Q.tbl(spark, sf(), "documents")
      .select($"doc_id", $"lang", $"n_chars")
    df.write.parquet(s"$tmp/p"); df.write.option("header", "true").csv(s"$tmp/c")
    df.write.json(s"$tmp/j"); df.write.orc(s"$tmp/o")
    val want = df.orderBy($"doc_id").collect().toSeq
    val schema = df.schema
    for (src <- Seq(TableIO.Parquet(s"$tmp/p"),
        TableIO.Csv(s"$tmp/c", Some(schema)),
        TableIO.JsonLines(s"$tmp/j", Some(schema)),
        TableIO.Orc(s"$tmp/o"))) {
      val got = src.read(spark).select($"doc_id", $"lang", $"n_chars")
        .orderBy($"doc_id").collect().toSeq
      assert(got == want, src.toString)
    }
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

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.streaming.{FileTopics, KafkaTopics}

/** Topic-transport wiring (SURVEY §1.1): the engine targets the
  * TopicSink/TopicSource traits; the deployment picks files or Kafka by
  * constructor. No broker exists in this container, so the Kafka side is
  * verified at the wiring level — the writer must target `format("kafka")`
  * with the broker + topic options, and the reader must request the kafka
  * source by name (mirroring the reference's spec/integration_spec.rb
  * surface, which is a live-broker round trip).
  */
class TopicsSpec extends SparkSpec {
  import spark.implicits._

  private def field[A](w: DataStreamWriter[Row], name: String): A = {
    val f = w.getClass.getDeclaredField(name)
    f.setAccessible(true)
    f.get(w).asInstanceOf[A]
  }
  private def source(w: DataStreamWriter[Row]): String =
    field[String](w, "source")
  private def options(w: DataStreamWriter[Row]): Map[String, String] =
    field[scala.collection.Map[String, String]](w, "extraOptions").toMap

  private def writer: DataStreamWriter[Row] = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-topics").toString
    Seq(("k", "v")).toDF("kafka_key", "value").write.parquet(s"$tmp/in")
    spark.readStream.schema(spark.read.parquet(s"$tmp/in").schema)
      .parquet(s"$tmp/in").writeStream
  }

  test("KafkaTopics sink wires format/broker/topic; key maps to kafka key") {
    val kt = new KafkaTopics("broker1:9092,broker2:9092")
    val w = kt.apply(writer, "v1_events")
    assert(source(w) == "kafka")
    val opts = options(w)
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("topic") == "v1_events")
    // the wire frame projects onto Kafka's key/value column contract
    val prepared = kt.prepare(
      Seq(("Event:1", "p", "{}", "x")).toDF("kafka_key", "partition_key", "value", "ts"))
    assert(prepared.columns.toSeq == Seq("key", "value"))
    // with a known partition count, partition_key drives an explicit
    // partition column (P10 affinity); same key → same partition
    val kt2 = new KafkaTopics("b:9092", numPartitions = Some(12))
    val p2 = kt2.prepare(Seq(
      ("Event:1", "acct-7", "{}", "x"), ("Event:2", "acct-7", "{}", "x"))
      .toDF("kafka_key", "partition_key", "value", "ts"))
    assert(p2.columns.toSeq == Seq("key", "value", "partition"))
    val parts = p2.select("partition").as[Int].collect()
    assert(parts.toSet.size == 1 && parts.forall(p => p >= 0 && p < 12))
  }

  test("KafkaTopics prepare preserves tombstones and partition affinity") {
    // a null value row (P20 tombstone) must survive the projection onto
    // Kafka's key/value contract — log compaction deletes by key
    val frame = Seq(
      ("thing:1", "acct-1", Some("{}"), "x"),
      ("thing:2", "acct-2", None: Option[String], "x"))
      .toDF("kafka_key", "partition_key", "value", "ts")
    val kt = new KafkaTopics("b:9092")
    val prepared = kt.prepare(frame)
    assert(prepared.filter($"value".isNull).select("key").as[String]
      .collect().toSeq == Seq("thing:2"))
    // with explicit partitioning the tombstone still routes by its
    // partition_key — the delete lands in the same partition as the
    // record it expunges
    val kt2 = new KafkaTopics("b:9092", numPartitions = Some(8))
    val p = kt2.prepare(frame).select($"key", $"partition").as[(String, Int)]
      .collect().toMap
    assert(p.keySet == Set("thing:1", "thing:2"))
    assert(p.values.forall(x => x >= 0 && x < 8))
    // distinct partition keys spread (not all collapsed to one partition)
    val many = kt2.prepare((1 to 64).map(i =>
        (s"thing:$i", s"acct-$i", Some("{}"), "x"))
        .toDF("kafka_key", "partition_key", "value", "ts"))
      .select("partition").as[Int].collect().toSet
    assert(many.size > 1, s"all rows collapsed to $many")
  }

  test("KafkaTopics batch append targets the kafka sink") {
    // no connector in this container: the failure must come from the
    // 'kafka' source lookup, proving appendBatch wires the right format
    val err = intercept[Exception](
      new KafkaTopics("b:9092").appendBatch(
        Seq(("k", "p", "{}", "x"))
          .toDF("kafka_key", "partition_key", "value", "ts"), "v1_events"))
    assert(err.getMessage.toLowerCase.contains("kafka"), err.getMessage)
  }

  test("KafkaTopics source requests the kafka format by name") {
    // without the connector on the classpath the lookup itself must be for
    // 'kafka' — the failure message proves the source wiring
    val err = intercept[Exception](
      new KafkaTopics("broker1:9092").open(spark, "v1_events"))
    assert(err.getMessage.toLowerCase.contains("kafka"), err.getMessage)
  }

  test("FileTopics sink/source round-trip shares the per-topic directory") {
    val root = java.nio.file.Files.createTempDirectory("graft-ft").toString
    val topics = new FileTopics(root)
    // streaming writes route through foreachBatch appends (no
    // _spark_metadata ownership — batch and streaming writers can mix)
    val w = topics.apply(writer, "v1_events")
    assert(field[AnyRef](w, "foreachBatchWriter") != null)
    // batch append lands in the same per-topic directory the source reads
    topics.appendBatch(
      Seq(("k1", "p", "{}", new java.sql.Timestamp(0)))
        .toDF("kafka_key", "partition_key", "value", "ts"), "v1_events")
    assert(new java.io.File(s"$root/v1_events").listFiles()
      .exists(_.getName.endsWith(".parquet")))
  }
}

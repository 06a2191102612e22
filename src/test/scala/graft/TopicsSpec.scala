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
    val w = topics.apply(writer, "v1_events")
    assert(source(w) == "parquet")
    assert(options(w)("path") == s"$root/v1_events")
  }
}

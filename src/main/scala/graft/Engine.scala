package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.codec.EnvelopeCodec
import graft.consumer.ConsumerOps
import graft.registry.Registry
import graft.streaming.ParquetReplica

/** The thin entry point wiring a [[Registry]] into streaming queries — the
  * Spark analogue of `Dionysus.initialize_application!`
  * (reference: lib/dionysus.rb:23-41; SURVEY §7.1): one producer query and
  * one consumer query per declared topic, file-topic transport, replica
  * tables per topic.
  *
  * `Trigger.AvailableNow` drains everything and returns (the test/backfill
  * mode); a live deployment passes `Trigger.ProcessingTime("200
  * milliseconds")` — the reference's 0.2 s outbox poll loop (I5) — and
  * keeps the returned queries running.
  */
object Engine {

  final case class TopicState(topic: String, replica: ParquetReplica)

  private val replicaSchema =
    "synced_id LONG, synced_updated_at TIMESTAMP, synced_created_at TIMESTAMP, " +
      "synced_canceled_at TIMESTAMP, value DOUBLE, synced_data STRING"

  /** Run the full registry over a change-stream directory: per topic,
    * producer (classify models → envelope → topic dir) then consumer
    * (decode → dedup → LWW merge into the topic's replica). Returns the
    * replica handle per topic name. */
  def runAvailableNow(
      spark: SparkSession,
      registry: Registry,
      sourceDir: String,
      workDir: String,
      modelCol: String = "event_type"): Map[String, TopicState] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(sourceDir).schema

    registry.topics.map { t =>
      val topicName = registry.topicName(t)
      val models = t.models.map(_.name)
      val topicDir = s"$workDir/topics/$topicName"

      // producer half: model filter (registry-routed), upsert/cancel
      // classification, envelope encode
      val events = spark.readStream.schema(schema).parquet(sourceDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .filter(col(modelCol).isin(models: _*))
      val wire = EnvelopeCodec.encode(events.select(
          when(col(modelCol) === "error", lit("event_destroyed"))
            .otherwise(lit("event_updated")).as("event"),
          lit("Event").as("model_name"),
          array(to_json(struct(
            col("user_id").as("id"),
            col(modelCol).as("event_type"), col("value"),
            unix_micros(col("ts")).as("updated_us")))).as("data"),
          col("ts")))
        .withColumn("kafka_key",
          concat(lit("Event:"), get_json_object(element_at(col("data"), 1), "$.id")))
        .select("kafka_key", "value", "ts")
      val pq = wire.writeStream.format("parquet")
        .option("path", topicDir)
        .option("checkpointLocation", s"$workDir/cp/produce/$topicName")
        .trigger(Trigger.AvailableNow()).start()
      pq.awaitTermination()

      // consumer half: decode → in-batch keep-latest → idempotent merge
      val replica = new ParquetReplica(spark, s"$workDir/replicas/$topicName",
        replicaSchema)
      val topicSchema = spark.read.parquet(topicDir).schema
      val decoded = ConsumerOps.decodeRecords(
          spark.readStream.schema(topicSchema).parquet(topicDir)
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark("kafka_key", "value"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id LONG, event_type STRING, value DOUBLE, updated_us LONG"))
        .select(
          regexp_extract(col("event"), "event_(.*)", 1).as("event_type"),
          col("rec.id").as("synced_id"),
          col("rec.value").as("value"),
          timestamp_micros(col("rec.updated_us")).as("synced_updated_at"),
          col("synced_data"))
        .withColumn("synced_created_at", col("synced_updated_at"))
        .withColumn("canceled_at",
          when(col("event_type") === "destroyed", col("synced_updated_at")))
      val cq = decoded.writeStream.outputMode("append")
        .option("checkpointLocation", s"$workDir/cp/consume/$topicName")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          replica.merge(ConsumerOps.keepLatest(batch,
            keyCols = Seq("synced_id"), orderCol = "synced_updated_at"))
        }
        .trigger(Trigger.AvailableNow()).start()
      cq.awaitTermination()

      topicName -> TopicState(topicName, replica)
    }.toMap
  }
}

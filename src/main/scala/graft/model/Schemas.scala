package graft.model

import org.apache.spark.sql.types._

/** Core wire/storage schemas of the engine.
  *
  * The reference (dionysus-rb) has no schema system of its own — payloads are
  * schemaless Ruby hashes. The two fixed structures it does define are the
  * message envelope (reference: lib/dionysus/producer/karafka_responder_generator.rb:42-57)
  * and the transactional-outbox table (reference: README.md:336-360,
  * lib/dionysus/producer/outbox/model.rb:7). Both become concrete
  * `StructType`s here; per-model payload schemas are registry-derived
  * (see [[graft.registry.Registry]]).
  */
object Schemas {

  /** One event inside an envelope: `(event, model_name, data)`.
    * `data` carries one JSON object per record. The payload stays a JSON
    * string at the envelope level because its schema is per-model; the
    * consumer parses it with a registry-derived `StructType`
    * ([[graft.consumer.Decode]]), keeping the raw string alongside so
    * undeclared attributes survive (reference: README.md:932-937).
    */
  val event: StructType = StructType(Seq(
    StructField("event", StringType, nullable = false),
    StructField("model_name", StringType, nullable = false),
    StructField("data", ArrayType(StringType), nullable = true)))

  /** Wire envelope `{"message":[{event,model_name,data:[…]}…]}`
    * (reference: karafka_responder_generator.rb:57). A Kafka tombstone is a
    * null value under a key (tombstone_publisher.rb:14-21) → a null
    * `value` column at the topic boundary, never a null `message` element.
    */
  val envelope: StructType = StructType(Seq(
    StructField("message", ArrayType(event), nullable = true)))

  /** Transactional-outbox table (reference: README.md:336-360 + changeset
    * column README.md:606). At scale the storage layout is partitioned by
    * `topic` (the reference's per-topic polling + partial index on
    * `published_at IS NULL` becomes partition pruning + data skipping).
    */
  val outbox: StructType = StructType(Seq(
    StructField("resource_class", StringType, nullable = false),
    StructField("resource_id", StringType, nullable = false),
    StructField("event_name", StringType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("partition_key", StringType),
    StructField("published_at", TimestampType),
    StructField("failed_at", TimestampType),
    StructField("retry_at", TimestampType),
    StructField("error_class", StringType),
    StructField("error_message", StringType),
    StructField("attempts", IntegerType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("updated_at", TimestampType, nullable = false),
    StructField("changeset", StringType)))

  /** Topic-boundary wire frame (SURVEY §1.1): message key, partitioner
    * input, envelope JSON (null = tombstone), event time. Fixed schema so
    * a consumer can open a topic before its first message exists. */
  val wire: StructType = StructType(Seq(
    StructField("kafka_key", StringType),
    StructField("partition_key", StringType),
    StructField("value", StringType),
    StructField("ts", TimestampType)))

  /** Reserved payload attributes (reference: deserializer.rb:149). */
  val reservedAttrs: Seq[String] =
    Seq("links", "id", "created_at", "updated_at", "canceled_at")

  /** Consumer-side reserved-attribute renames (C5; reference:
    * deserializer.rb:41-52, README.md:731-738). */
  val reservedRenames: Map[String, String] = Map(
    "id" -> "synced_id",
    "created_at" -> "synced_created_at",
    "updated_at" -> "synced_updated_at",
    "canceled_at" -> "synced_canceled_at")

  /** Event-name suffixes (reference: outbox/event_name.rb:11-25). */
  object EventType {
    val Created = "created"
    val Updated = "updated"
    val Destroyed = "destroyed"
    def name(model: String, tpe: String): String = s"${model}_$tpe"
  }
}

/** Canonical typed event, the consumer's IR after envelope decode
  * (reference: lib/dionysus/consumer/dionysus_event.rb:6-12). */
final case class DionysusEvent(
    event: String,
    modelName: String,
    payloadJson: String)

/** Typed outbox row (see [[Schemas.outbox]]). */
final case class OutboxRecord(
    resource_class: String,
    resource_id: String,
    event_name: String,
    topic: String,
    partition_key: Option[String],
    published_at: Option[java.sql.Timestamp],
    failed_at: Option[java.sql.Timestamp],
    retry_at: Option[java.sql.Timestamp],
    error_class: Option[String],
    error_message: Option[String],
    attempts: Int,
    created_at: java.sql.Timestamp,
    updated_at: java.sql.Timestamp,
    changeset: Option[String])

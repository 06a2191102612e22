package graft.codec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Wire codec for the message envelope
  * `{"message":[{event,model_name,data:[payload…]}…]}`.
  *
  * Reference: serialization at lib/dionysus/producer/base_responder.rb:43-45
  * (`to_json`), parsing at lib/dionysus/consumer/params_batch_processor.rb:15-17.
  * JSON exists only at the topic boundary; inside the engine everything is
  * columnar (SURVEY §1.1) — so encode is the *last* step before the sink and
  * decode the *first* after the source, keeping the hot path in Tungsten.
  */
object EnvelopeCodec {

  /** Assemble the envelope `value` for a frame that has
    * `event`, `model_name`, `data: array<string>` columns. One event per
    * message, matching the reference's per-record publish
    * (karafka_responder_generator.rb:42-55). */
  def encode(df: DataFrame): DataFrame =
    df.withColumn("value",
      to_json(struct(
        array(struct(col("event"), col("model_name"), col("data"))).as("message"))))

  /** Kafka-style message key `"Model:id"`
    * (reference: lib/dionysus/producer/key.rb:11-13). */
  def messageKey(modelName: Column, id: Column): Column =
    concat(modelName, lit(":"), id.cast("string"))

  /** P20 — tombstone rows: a null `value` under the resource key expunges
    * the record from a compacted topic
    * (reference: tombstone_publisher.rb:14-21). */
  def tombstones(df: DataFrame, modelName: Column, idCol: Column): DataFrame =
    df.select(messageKey(modelName, idCol).as("kafka_key"),
      lit(null).cast("string").as("value"))

  /** Decode a topic frame with a `value` JSON column back into one row per
    * event: `(event, model_name, data)`. Null values are tombstones and are
    * skipped, as the consumer does (params_batch_processor.rb:20-24).
    * General path: handles any number of events per envelope and records
    * per event (foreign batch producers). */
  def decode(topicFrame: DataFrame): DataFrame =
    topicFrame
      .filter(col("value").isNotNull)
      .select(from_json(col("value"), Schemas.envelope).as("env"))
      .select(explode(col("env.message")).as("m"))
      .select(col("m.event"), col("m.model_name"), col("m.data"))

  /** Fast-path decode for single-record envelopes, fused with the record
    * explode: one event with one record per message — the shape [[encode]]
    * writes and the reference's per-record publish produces
    * (karafka_responder_generator.rb:42-55). Extracts the three fields by
    * JSON path (`get_json_object`) instead of materializing the nested
    * envelope struct, and needs NO generator at all — measured ~5-8×
    * faster than `decode` + [[explodeRecords]] (the envelope `from_json`
    * and the Generate operator each cost more than the whole path-extract
    * projection). Tombstones skip; an envelope carrying a second event or
    * record FAILS LOUDLY (no silent truncation) — consume such topics with
    * the general [[decode]] (`TopicDef(singleRecordWire = false)`); an
    * envelope carrying NO record (empty `data`, missing `message`) yields
    * no row, exactly as the general path's explode of an empty array. */
  def decodeSingleRecords(topicFrame: DataFrame): DataFrame = {
    // cardinality probes, not element-presence probes: a trailing JSON
    // null slot (`data:["x",null]`, `message:[{…},null]`) makes
    // `$.…[1]` extract null exactly like a missing slot would, so only
    // the array LENGTH can tell one record from two
    val multi =
      coalesce(json_array_length(
        get_json_object(col("value"), "$.message")), lit(0)) > 1 ||
        coalesce(json_array_length(
          get_json_object(col("value"), "$.message[0].data")), lit(0)) > 1
    // `when(multi, raise_error).isNull` is a pure predicate: it raises on
    // ANY multi envelope (even one whose first record slot is JSON null,
    // which the row-drop term alone would silently discard) and, living
    // in the filter, it cannot be column-pruned away by a downstream
    // projection that never reads payload_json. Short-circuit order
    // matters: the guard runs before the tombstone drop.
    val multiGuard = when(multi, raise_error(concat(
        lit("multi-record envelope on the single-record decode path " +
          "(declare TopicDef(singleRecordWire = false)): "),
        col("value"))))
      .isNull
    topicFrame
      // zero-record / malformed envelopes produce no record row — the
      // general path drops them via the explode of an empty array, and a
      // null payload must never reach the merge as a null-key upsert.
      // All terms are raw-value JSON probes: extracting through the
      // projected column instead would fall out of codegen (interpreted
      // JSON parsing per row — measured 4× slower end to end).
      .filter(col("value").isNotNull && multiGuard &&
        get_json_object(col("value"), "$.message[0].data[0]").isNotNull)
      .select(
        get_json_object(col("value"), "$.message[0].event").as("event"),
        get_json_object(col("value"), "$.message[0].model_name").as("model_name"),
        get_json_object(col("value"), "$.message[0].data[0]").as("payload_json"))
  }

  /** Explode the per-event `data` array into one row per record payload,
    * keeping the raw JSON string (undeclared attributes must survive,
    * reference: README.md:932-937). */
  def explodeRecords(events: DataFrame): DataFrame =
    events.select(col("event"), col("model_name"),
      explode(col("data")).as("payload_json"))
}

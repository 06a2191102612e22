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
    * (karafka_responder_generator.rb:42-55). The envelope is read by ONE
    * raw-capture `from_json` (no nested payload parsing, no Generate
    * operator); the optimizer inlines the parse into its consumers, and
    * whole-stage codegen's subexpression elimination shares the work at
    * runtime — measured faster than both the full `decode` +
    * [[explodeRecords]] (~5×) and the previous five-JSON-path probe form
    * (1.04 s vs 1.84 s on c03 at sf0.1), because every per-expression
    * `get_json_object` re-scanned the whole envelope string. Tombstones skip; an envelope
    * carrying a second event or record — including a trailing JSON-null
    * slot (`data:["x",null]`), which an element-presence probe would read
    * as absent but `size` counts — FAILS LOUDLY (no silent truncation):
    * consume such topics with the general [[decode]]
    * (`TopicDef(singleRecordWire = false)`). An envelope carrying NO
    * record (empty `data`, missing `message`) yields no row, exactly as
    * the general path's explode of an empty array (`try_element_at`: an
    * out-of-bounds slot is a skipped row, not an ANSI error). */
  def decodeSingleRecords(topicFrame: DataFrame): DataFrame = {
    val m0 = try_element_at(col("__msgs"), lit(1))
    val multi = size(col("__msgs")) > 1 || size(m0.getField("data")) > 1
    val err = concat(
      lit("multi-record envelope on the single-record decode path " +
        "(declare TopicDef(singleRecordWire = false)): "),
      col("value"))
    // `when(multi, raise_error).isNull` is a pure predicate: it raises on
    // ANY multi envelope (even one whose extra slots are JSON null, which
    // the row-drop term alone would silently discard)
    val multiGuard = when(multi, raise_error(err)).isNull
    // the guard must not depend on the optimizer keeping the filter's And
    // conjuncts in written order: the row-keep term below never drops a
    // multi row (`multi ||`), and every output column ALSO routes through
    // the guard — so a split/reordered filter, or one elided entirely,
    // still raises the moment any surviving column of a multi row is read
    def guarded(c: Column): Column =
      when(multi, raise_error(err)).otherwise(c)
    topicFrame
      .filter(col("value").isNotNull)
      // the SAME Schemas.envelope the general path parses with — its
      // `data` elements are declared string, so Jackson captures each
      // payload's JSON text verbatim (subtree-to-text): one flat parse
      // yields the message count, the per-message fields AND the raw
      // payload, with no payload-schema knowledge at this layer
      .select(col("value"),
        from_json(col("value"), Schemas.envelope).getField("message").as("__msgs"))
      // zero-record / malformed envelopes produce no record row — a null
      // payload must never reach the merge as a null-key upsert. Multi
      // rows are KEPT by this predicate (left term) so the raise cannot
      // be preempted by the presence term dropping the row first.
      .filter(multiGuard && (multi ||
        try_element_at(m0.getField("data"), lit(1)).isNotNull))
      .select(
        guarded(m0.getField("event")).as("event"),
        guarded(m0.getField("model_name")).as("model_name"),
        guarded(try_element_at(m0.getField("data"), lit(1))).as("payload_json"))
  }

  /** Explode the per-event `data` array into one row per record payload,
    * keeping the raw JSON string (undeclared attributes must survive,
    * reference: README.md:932-937). */
  def explodeRecords(events: DataFrame): DataFrame =
    events.select(col("event"), col("model_name"),
      explode(col("data")).as("payload_json"))
}

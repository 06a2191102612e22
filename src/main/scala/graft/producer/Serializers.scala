package graft.producer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.registry.{ModelDef, Registry}

/** Serialization operators: projection/rename (P7), aggregate sideload
  * (P8), deleted-record projection (P9), partition-key/message-key
  * resolution (P10), topic fan-out (P3).
  *
  * The reference's `ModelSerializer` DSL
  * (lib/dionysus/producer/model_serializer.rb:13-49) declares attributes /
  * has_one / has_many per model; here a serializer is a *column-expression
  * builder* — a projection list Catalyst can prune against the scan. The
  * `serialize: false` bulk-delete bypass (karafka_responder_generator.rb:72-75)
  * and deleted-record projection (deleted_record_serializer.rb:4-16) are
  * then literally column pruning: the scan reads only the primary key.
  */
object Serializers {

  /** P7 — model row → payload struct: declared attributes + reserved
    * timestamps + `links` (FK ids, reference: model_serializer.rb:63-89).
    * `fkToOne`/`fkToMany` name FK columns already present on the frame
    * (to-many link arrays come from the sideload join, P8). */
  def payload(m: ModelDef, extra: Seq[(String, Column)] = Nil): Column = {
    val attrs = m.attributes.map(a => a.computed.getOrElse(col(a.name)).as(a.name))
    val linkFields =
      m.hasOne.map(a => col(a.fk).as(a.name)) ++
        extra.map { case (n, c) => c.as(n) }
    val links =
      if (linkFields.isEmpty) Nil
      else Seq(struct(linkFields: _*).as("links"))
    struct((col(m.primaryKey).as("id") +: attrs) ++ links: _*)
  }

  /** ISO-ish timestamp wire format — castable back to TimestampType with
    * full µs precision (reference serializes ActiveRecord timestamps as
    * strings; the exact format is an implementation detail of the codec). */
  private def iso(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** P7+P8 — full registry-derived wire payload matching
    * [[ModelDef.payloadSchema]]/[[ModelDef.aggregateSchema]]: declared
    * attributes + reserved timestamps + `links` (to-one FKs from the row,
    * to-many id arrays from the sideload join) + embedded sideload payload
    * arrays. This is the column-expression analogue of the reference's
    * generated per-model serializer (karafka_responder_generator.rb:16-68 +
    * model_serializer.rb:63-89). */
  def wirePayload(
      m: ModelDef,
      createdAt: Column,
      updatedAt: Column,
      canceledAt: Column,
      manyIds: Seq[(String, Column)] = Nil,
      embedded: Seq[(String, Column)] = Nil): Column = {
    // computed attributes: the custom-serializer slot — derived at
    // publish time, carried on the wire under the declared name/type
    val attrs = m.attributes.map(a => a.computed.getOrElse(col(a.name)).as(a.name))
    val linkFields =
      m.hasOne.map(a => col(a.fk).as(a.name)) ++
        manyIds.map { case (n, c) => c.as(n) }
    val links =
      if (linkFields.isEmpty) Nil
      else Seq(struct(linkFields: _*).as("links"))
    struct(
      (col(m.primaryKey).cast("long").as("id") +: attrs) ++ Seq(
        iso(createdAt).as("created_at"),
        iso(updatedAt).as("updated_at"),
        iso(canceledAt).as("canceled_at")) ++ links ++
        embedded.map { case (n, c) => c.as(n) }: _*)
  }

  /** P9-adjacent — wire payload for a destroyed record: primary key plus
    * the reserved timestamps. The reference serializes deletions as
    * `{primary_key}` only (deleted_record_serializer.rb:4-16, the
    * [[deletedProjection]] operator); the engine's wire form keeps the
    * event timestamps so set-oriented LWW replay stays deterministic —
    * without them a replayed old destroy would rank as "always persist"
    * and could cancel a newer update. */
  def destroyedPayload(m: ModelDef, createdAt: Column, updatedAt: Column,
      canceledAt: Column): Column =
    struct(
      col(m.primaryKey).cast("long").as("id"),
      iso(createdAt).as("created_at"),
      iso(updatedAt).as("updated_at"),
      iso(canceledAt).as("canceled_at"))

  /** P8 — aggregate sideload: embed dependency records as nested arrays in
    * the parent payload (reference: serializer.rb:17-51, README.md:120,135).
    *
    * `left join parent→children on FK` then
    * `groupBy(parent pk).agg(collect_list(struct(child.*)))`. The child
    * aggregation happens *before* the join (map-side combine on the child
    * table, one shuffle each side keyed on the FK); with the parent big and
    * children small, mark the aggregated child side broadcastable.
    * Ordering inside the nested array is made deterministic by sorting on
    * the child key — the reference inherits DB order, which is unspecified.
    */
  def sideloadToMany(
      parent: DataFrame,
      parentKey: String,
      child: DataFrame,
      childFk: String,
      as: String,
      childCols: Seq[String]): DataFrame = {
    val nested = child
      .groupBy(col(childFk).as("__pk"))
      .agg(sort_array(collect_list(struct(childCols.map(col): _*))).as(as))
    parent.join(nested, parent(parentKey) === col("__pk"), "left")
      .drop("__pk") // null `as` column = parent with no children
  }

  /** P9 — destroyed records serialize as `{primary_key: value}` only
    * (reference: deleted_record_serializer.rb:4-16). */
  def deletedProjection(df: DataFrame, m: ModelDef): DataFrame =
    df.select(col(m.primaryKey).as("id"))

  /** P10 — Kafka partition key: per-topic lambda, attribute, or default
    * `account_id` (reference: partition_key.rb:12-41, config.rb:33-35).
    * The lambda form ([[graft.registry.TopicDef.partitionKeyFn]]) is
    * applied to the RESOURCE packed as ONE struct column — the Spark
    * analogue of the reference calling the user lambda with the resource
    * (partition_key.rb:34-36) — and its result is cast to string, null
    * staying null (the reference's `&.to_s`). When the model is known,
    * the struct is built from its declared shape (primary key + declared
    * attributes, in declaration order), NOT `struct(col("*"))`: the raw
    * row differs per call site (wire vs tombstone vs `serialize: false`
    * paths) and carries engine-internal `__`-prefixed columns, while the
    * reference lambda always sees the same resource object. The
    * model-less `struct(col("*"))` form survives only for ad-hoc frames
    * with no registry model. The attribute form stays a plain column
    * cast. */
  def partitionKey(attr: Option[String], default: String = "account_id"): Column =
    partitionKey(None, attr, default)

  def partitionKey(fn: Option[Column => Column], attr: Option[String],
      default: String): Column =
    partitionKey(fn, attr, default, None)

  def partitionKey(fn: Option[Column => Column], attr: Option[String],
      default: String, model: Option[ModelDef]): Column =
    fn.map { f =>
      val resource = model
        .map(m => struct(
          (m.primaryKey +: m.attributes.map(_.name)).distinct.map(col): _*))
        .getOrElse(struct(col("*")))
      f(resource).cast("string")
    }.getOrElse(col(attr.getOrElse(default)).cast("string"))

  /** P3/P11 — topic fan-out: one change → one outbox/publish row per
    * declared topic, plus the `_genesis` replica topic where declared
    * (reference: publishable.rb:71-84, outbox.rb:38-54; genesis replica
    * registry.rb:62-68, `genesis_only` skip karafka_responder_generator.rb:16-68).
    * Registry-driven `explode` of a literal topics array — no join, no
    * shuffle; the registry is plan-time metadata. */
  def topicFanout(df: DataFrame, registry: Registry,
      modelCol: String = "model_name", genesisOnly: Boolean = false): DataFrame = {
    def targets(model: String): Seq[String] =
      registry.topics.filter(_.models.exists(_.name == model)).flatMap { t =>
        val primary = if (genesisOnly && t.genesisReplica) Nil
          else Seq(registry.topicName(t))
        val replica = if (t.genesisReplica) Seq(registry.genesisTopicName(t)) else Nil
        primary ++ replica
      }
    val mapping = map(
      registry.allModels.flatMap { m =>
        Seq(lit(m.name), array(targets(m.name).map(lit): _*))
      }: _*)
    df.withColumn("topic", explode(element_at(mapping, col(modelCol))))
  }
}

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
    val attrs = m.attributes.map(a => col(a.name).as(a.name))
    val links = struct(
      (m.hasOne.map(a => col(a.fk).as(a.name)) ++
        extra.map { case (n, c) => c.as(n) }): _*)
    struct(
      (col(m.primaryKey).as("id") +: attrs) ++ Seq(links.as("links")): _*)
  }

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

  /** P10 — Kafka partition key: per-topic attribute or function, default
    * `account_id` (reference: partition_key.rb:12-41, config.rb:33-35).
    * An opaque user lambda becomes a Scala function registered in the
    * registry; the common declarative case stays a column. */
  def partitionKey(attr: Option[String], default: String = "account_id"): Column =
    col(attr.getOrElse(default)).cast("string")

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

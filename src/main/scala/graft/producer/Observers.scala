package graft.producer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.registry.ObserverDef

/** P14 — observer resolution (changeset → dependents) and
  * P15 — dependency-parent republish.
  *
  * Reference: `Producer.observers_with_responders_for(resource, changeset)`
  * (lib/dionysus/producer.rb:101-120) matches a changed model + changed
  * attribute set against declared `observe:` configs
  * (registry.rb:151-161: model-name equality ∧ attribute-set intersection),
  * then navigates the association to the dependent records and emits
  * `<dependent>_updated` for each (outbox/publisher.rb:41-61).
  *
  * Spark shape: the observer registry is plan-time metadata (a broadcast-
  * sized literal), the match is `arrays_overlap(map_keys(changeset),
  * attrs)` — pure column logic — and the association navigation is an FK
  * equi-join against the dependent table. The reference's >1000-dependent
  * spill to Genesis (config.rb:95-97) is unnecessary: Spark executes the
  * small and large cases identically; keep the threshold only for sink
  * rate shaping.
  */
object Observers {

  /** Changed-attribute match for one observer config: the changeset is a
    * `map<string, array<string>>` (attr → [old, new]); the observer fires
    * when any declared attribute changed
    * (reference: registry.rb:151-161). */
  def matches(changeset: Column, observer: ObserverDef): Column =
    arrays_overlap(map_keys(changeset),
      array(observer.attributes.map(lit): _*))

  /** P14 — resolve one observer: filter the change stream to matching rows
    * and join to the dependent records through the FK, emitting
    * `<dependent>_updated` events.
    *
    * `changes` needs `model_name`, `changeset`, and the join column;
    * `dependents` is the dependent model's table. At scale `dependents` is
    * the big side and `changes` the micro-batch → broadcast the filtered
    * changes, not the table. */
  def resolve(
      changes: DataFrame,
      observer: ObserverDef,
      dependentModel: String,
      changesJoinCol: String,
      dependents: DataFrame,
      dependentsJoinCol: String,
      dependentsIdCol: String): DataFrame = {
    val matched = changes
      .filter(col("model_name") === observer.model && matches(col("changeset"), observer))
      .select(col(changesJoinCol).as("__jk")).distinct()
    dependents
      .join(broadcast(matched), dependents(dependentsJoinCol) === col("__jk"))
      .select(col(dependentsIdCol).as("resource_id"),
        lit(s"${dependentModel}_updated").as("event_name"))
      .distinct()
  }

  /** P15 — dependency-parent republish: a change to a `with:` dependency
    * republishes the parent aggregate (`<parent>_updated`), resolving the
    * parent over the FK (reference: outbox/publisher.rb:80-105,
    * producer.rb:56-75). The parent re-serialization is then P7/P8. */
  def dependencyParentEvents(
      childChanges: DataFrame,
      childFkCol: String,
      parentModel: String): DataFrame =
    childChanges
      .select(col(childFkCol).as("resource_id"))
      .distinct()
      .withColumn("event_name", lit(s"${parentModel}_updated"))
}

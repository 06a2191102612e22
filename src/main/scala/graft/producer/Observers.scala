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

  /** One hop of an observer association path: join `fromCol` (on the
    * current frame) to `toCol` on `table`, carrying `carryCol` forward as
    * the next join key (or the final dependent id). */
  final case class Hop(table: DataFrame, fromCol: String, toCol: String, carryCol: String)

  /** P14 with a method-chain association (`"a.b.c"`,
    * reference: producer.rb:110-115, README.md:634): the dotted Ruby path
    * becomes a declared join chain, validated at registration
    * (validator.rb:82-102) and executed as successive FK equi-joins. The
    * matched change keys stay broadcast-sized (a micro-batch); each hop's
    * table is the big side. */
  def resolveChain(
      changes: DataFrame,
      observer: ObserverDef,
      dependentModel: String,
      changesJoinCol: String,
      hops: Seq[Hop]): DataFrame = {
    val matched = changes
      .filter(col("model_name") === observer.model && matches(col("changeset"), observer))
      .select(col(changesJoinCol).as("__k")).distinct()
    val resolved = hops.foldLeft(matched) { (acc, hop) =>
      hop.table
        .join(broadcast(acc), hop.table(hop.fromCol) === acc("__k"))
        .select(col(hop.carryCol).as("__k")).distinct()
    }
    resolved.select(col("__k").as("resource_id"),
      lit(s"${dependentModel}_updated").as("event_name"))
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

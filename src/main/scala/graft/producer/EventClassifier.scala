package graft.producer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.Schemas.EventType

/** P2 — event-type classifier (soft-delete state machine).
  *
  * Maps a row change plus the old/new image of the soft-delete column to a
  * published event type. Reference: lib/dionysus/producer/outbox.rb:16-26,
  * 74-102 and predicate helpers lib/dionysus/producer/outbox/publishable.rb:34-69:
  *
  *  - insert                         → `created`
  *  - delete                         → `destroyed`
  *  - update, ¬canceled → canceled   → `destroyed` (soft delete)
  *  - update, canceled → ¬canceled   → `created`   (restore / un-cancel)
  *  - update, canceled → canceled    → suppressed (unless
  *    `publish_updates_after_soft_delete`, outbox.rb:93-99)
  *  - update otherwise               → `updated`
  *
  * Pure column logic over a change feed carrying old/new images — a single
  * `select`, no shuffle, fully inside whole-stage codegen. This is the shape
  * Catalyst wants: the reference's Ruby callback state machine is just a
  * CASE expression.
  */
object EventClassifier {

  /** `op` ∈ {insert, update, delete}; oldCanceled/newCanceled are the
    * soft-delete column images (old is null for inserts). Returns the event
    * type or null when the change publishes nothing. */
  def eventType(
      op: Column,
      oldCanceled: Column,
      newCanceled: Column,
      publishUpdatesAfterSoftDelete: Boolean = false): Column = {
    val softDeleted = oldCanceled.isNotNull
    val nowDeleted = newCanceled.isNotNull
    when(op === "insert", lit(EventType.Created))
      .when(op === "delete", lit(EventType.Destroyed))
      .when(!softDeleted && nowDeleted, lit(EventType.Destroyed))
      .when(softDeleted && !nowDeleted, lit(EventType.Created))
      .when(softDeleted && nowDeleted,
        if (publishUpdatesAfterSoftDelete) lit(EventType.Updated)
        else lit(null).cast("string"))
      .otherwise(lit(EventType.Updated))
  }

  /** Full event name `<model>_<type>`
    * (reference: outbox/event_name.rb:11-25). */
  def eventName(modelName: Column, eventType: Column): Column =
    concat(modelName, lit("_"), eventType)

  /** Changeset construction from a change feed's old/new images: the
    * `attr → [old, new]` map of attributes that actually changed
    * (reference: `previous_changes` capture, outbox/publishable.rb:86-95).
    * Null-safe comparison so null→value and value→null both register.
    * Feeds observer matching (P14) and the outbox `changeset` column. */
  def changeset(pairs: Seq[(String, Column, Column)]): Column = {
    val entries = pairs.map { case (attr, oldC, newC) =>
      when(!(oldC <=> newC),
        struct(lit(attr).as("attr"),
          array(oldC.cast("string"), newC.cast("string")).as("change")))
    }
    map_from_entries(filter(array(entries: _*), (e: Column) => e.isNotNull))
  }
}

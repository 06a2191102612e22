package graft.codec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4/C5 — links classification and flattening.
  *
  * The reference classifies each entry of the payload's `links` hash by its
  * runtime JSON shape (lib/dionysus/consumer/deserializer.rb:219-229):
  * scalar → to-one (`synced_<rel>_id`), array → to-many
  * (`synced_<singular(rel)>_ids`), hash → polymorphic
  * (`synced_<rel>_id` + `synced_<rel>_type`). In Spark the shape is
  * declared (registry-derived schema), so classification happens at plan
  * time and flattening is a pure projection — no runtime type dispatch.
  */
object LinksFlattener {

  sealed trait LinkKind
  case object ToOne extends LinkKind
  case object ToMany extends LinkKind
  case object Polymorphic extends LinkKind

  /** ActiveSupport-style singularization for the cases that appear in
    * canonical payloads (deserializer_spec fixtures): bookings→booking,
    * taxes→tax, clients→client, messages→message, companies→company. */
  def singularize(s: String): String =
    if (s.endsWith("ies")) s.dropRight(3) + "y"
    else if (Seq("xes", "zes", "ches", "shes", "sses").exists(s.endsWith)) s.dropRight(2)
    else if (s.endsWith("s")) s.dropRight(1)
    else s

  /** Reserved consumer-side column name for a link
    * (reference: deserializer.rb:125-135). */
  def colName(rel: String, kind: LinkKind): String = kind match {
    case ToMany => s"synced_${singularize(rel)}_ids"
    case _ => s"synced_${rel}_id"
  }

  /** Flatten a parsed `links` struct column into `synced_*` columns. */
  def flatten(df: DataFrame, links: Seq[(String, LinkKind)],
      linksCol: String = "links"): DataFrame =
    links.foldLeft(df) { case (d, (rel, kind)) =>
      kind match {
        case ToOne =>
          d.withColumn(colName(rel, kind), col(s"$linksCol.$rel"))
        case ToMany =>
          d.withColumn(colName(rel, kind), col(s"$linksCol.$rel"))
        case Polymorphic =>
          d.withColumn(s"synced_${rel}_id", col(s"$linksCol.$rel.id"))
            .withColumn(s"synced_${rel}_type", col(s"$linksCol.$rel.type"))
      }
    }
}

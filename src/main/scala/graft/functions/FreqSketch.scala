package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SpaceSaving frequent-items sketch as a typed [[Aggregator]] — the
  * custom-aggregate form SURVEY §4 reserves for operators built-ins can't
  * express: exact heavy-hitters needs a full groupBy shuffle of every
  * distinct item; the sketch is single-pass, mergeable, and fixed-memory
  * (`capacity` counters per partition), so at 100 TB the per-item shuffle
  * disappears and only `capacity`-sized buffers move.
  *
  * Standard SpaceSaving semantics: an unseen item evicts the current
  * minimum counter (deterministic (count, key) tiebreak) and inherits its
  * count (+1), so reported counts overestimate by at most the evicted
  * minimum. Merge sums counters and re-trims to capacity.
  *
  * The buffer is an immutable map under an [[ExpressionEncoder]] — a
  * Tungsten map the shuffle can size and compare, not an opaque Kryo
  * blob; per-item update cost is bounded by `capacity`.
  */
final case class FreqSketchAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(v) => b.updated(item, v + 1L)
      case None if b.size < capacity => b.updated(item, 1L)
      case None =>
        val (minK, minV) = b.minBy { case (k, v) => (v, k) }
        (b - minK).updated(item, minV + 1L)
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (m.size > capacity)
      m.toSeq.sortBy { case (k, v) => (-v, k) }.take(capacity).toMap
    else m
  }

  def finish(b: Map[String, Long]): Map[String, Long] = b

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object FreqSketch {
  /** Column form: `freq_sketch(tokenCol)` → map item → approximate count. */
  def apply(col: Column, capacity: Int = 64): Column =
    udaf(FreqSketchAgg(capacity), Encoders.STRING).apply(col)
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** SpaceSaving frequent-items sketch as a typed [[Aggregator]] — the
  * custom-aggregate form SURVEY §4 reserves for operators built-ins can't
  * express: exact heavy-hitters needs a full groupBy shuffle of every
  * distinct item; the sketch is single-pass, mergeable, and fixed-memory
  * (`capacity` counters per partition), so at 100 TB the per-item shuffle
  * disappears and only `capacity`-sized buffers move.
  *
  * Standard SpaceSaving semantics: an unseen item evicts the current
  * minimum counter and inherits its count (+1), so reported counts
  * overestimate by at most the evicted minimum. Merge sums counters and
  * re-trims to capacity.
  */
final case class FreqSketchAgg(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {

  def zero: mutable.Map[String, Long] = mutable.Map.empty

  def reduce(b: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    if (b.contains(item)) b(item) += 1L
    else if (b.size < capacity) b(item) = 1L
    else {
      val (minK, minV) = b.minBy(_._2)
      b.remove(minK)
      b(item) = minV + 1L
    }
    b
  }

  def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, v) => a(k) = a.getOrElse(k, 0L) + v }
    if (a.size > capacity)
      mutable.Map(a.toSeq.sortBy { case (k, v) => (-v, k) }.take(capacity): _*)
    else a
  }

  def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap

  def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object FreqSketch {
  /** Column form: `freq_sketch(tokenCol)` → map item → approximate count. */
  def apply(col: Column, capacity: Int = 64): Column =
    udaf(FreqSketchAgg(capacity), Encoders.STRING).apply(col)
}

package graft.producer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** P21 — suppression gate: a switch that disables all publishing (used by
  * the reference in tests and bulk operations,
  * lib/dionysus/producer/suppressor.rb:7-17).
  *
  * The reference uses a thread-local; a distributed engine cannot — the
  * flag is plan-time configuration. Gating with `filter(lit(false))`
  * rather than skipping the pipeline keeps downstream wiring (sinks,
  * checkpoints) intact, and Catalyst folds the constant filter to an
  * empty relation so no work is scheduled.
  */
object Suppressor {
  @volatile private var suppressed = false

  def suppress(): Unit = { suppressed = true }
  def unsuppress(): Unit = { suppressed = false }
  def isSuppressed: Boolean = suppressed

  def suppressing[T](body: => T): T = {
    suppress()
    try body finally unsuppress()
  }

  /** Gate a publish frame: empty while suppressed (decided at plan time —
    * build plans inside [[suppressing]] to suppress them). */
  def gate(df: DataFrame): DataFrame =
    if (suppressed) df.filter(lit(false)) else df
}

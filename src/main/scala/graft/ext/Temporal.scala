package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-travel reconstruction over an append-only event/CDC log.
  *
  * A change log (the x-surface `events` table, or the producer outbox's
  * published history) admits "state as of T" queries: for each entity,
  * the last event at or before T is its state at T. Auditing several
  * cutoffs at once — the retention/compliance question "how did the
  * corpus composition evolve week over week" — naively replays the log
  * once per cutoff; at 100 TB that is k full scans and k shuffles.
  *
  * [[asOfStates]] does all cutoffs in ONE pass: a single per-key window
  * computes each event's validity interval [ts, next_ts), and a
  * broadcast join against the tiny cutoff list keeps exactly the rows
  * whose interval contains a cutoff. One exchange (the per-key window
  * sort), k·|keys| output rows, corpus scanned once regardless of k.
  */
object Temporal {

  /** For each `cutoffUs` (epoch-µs) and each key, the single event row
    * that is the key's state at that instant: the latest event with
    * `us <= cutoff`, ties broken by `tieCol` (a unique id). Keys with
    * no event at or before a cutoff simply have no row for it (they do
    * not exist yet at that instant).
    *
    * Output: `cutoff_us`, the key column, all of `stateCols` taken from
    * the state-defining event.
    *
    * Scale shape: one hash exchange on `keyCol` for the window; the
    * cutoff list rides a broadcast local relation; the post-filter
    * stream is at most |cutoffs| rows per key. No self-join, no
    * per-cutoff re-scan.
    */
  def asOfStates(events: DataFrame, keyCol: String, usCol: Column,
                 tieCol: Column, cutoffsUs: Seq[Long],
                 stateCols: Seq[(String, Column)]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(keyCol)).orderBy(usCol, tieCol)
    // validity interval [us, next_us): lead over (ts, tie) — the tie
    // column makes the interval chain total even under equal timestamps
    val iv = events
      .withColumn("__us", usCol)
      .withColumn("__next_us", lead(usCol, 1).over(w))
    val cuts = broadcast(cutoffsUs.toDF("cutoff_us"))
    iv.join(cuts,
        col("__us") <= col("cutoff_us") &&
          (col("__next_us").isNull || col("__next_us") > col("cutoff_us")))
      .select(col("cutoff_us") +: col(keyCol) +: stateCols.map {
        case (n, c) => c.as(n)
      }: _*)
  }
}

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

  /** Event-time disorder audit: how late do events arrive relative to
    * the newest event time already seen on their key? `lateness(e) =
    * max(event time over earlier arrivals of the key) - event time of
    * e`, arrival order given by `arrivalCol` (a monotone ingest id /
    * offset). The log2-bucketed histogram of positive lateness is
    * exactly the distribution a streaming deployment reads to size its
    * watermark delay (`withWatermark`): the bucket covering the p99.9
    * tail is the delay that loses 0.1% of events to lateness.
    *
    * Per-KEY disorder is the deliberate measurement: keyed state
    * (dedup, sessionization, `mapGroupsWithState`) evicts on the key's
    * own timeline, and a per-key running max needs only one hash
    * window — a GLOBAL running max would be a single-task window (the
    * anti-pattern; at 100 TB, global disorder is bounded by per-key
    * disorder + partition skew, both separately observable).
    *
    * Output: `lateness_bucket` (-1 = in-order, else floor(log2(lateness
    * seconds + 1))), `n_events`. */
  def latenessHistogram(events: DataFrame, keyCol: String, usCol: Column,
      arrivalCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(arrivalCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // floor(log2(n)) as INTEGER bit length (length(bin(n)) - 1) — libm
    // log2 on doubles is not bit-portable across engines at bucket
    // boundaries; bin() is exact in both Spark and DuckDB
    events
      .withColumn("__late_us",
        coalesce(max(usCol).over(w) - usCol, lit(Long.MinValue)))
      .select(when(col("__late_us") <= 0L, lit(-1L))
        .otherwise(length(bin(expr("__late_us div 1000000L") + lit(1L))) -
          lit(1))
        .cast("long").as("lateness_bucket"))
      .groupBy(col("lateness_bucket"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** One CDC op as a typed stream record: `offset` is the log position
    * (the CDC order), `op` ∈ {I, U, D}. */
  final case class CdcOp(key: Long, offset: Long, op: String, value: Double)

  /** The net change for a key (x110's output shape). */
  final case class CdcNet(key: Long, net_op: String,
      net_value: Option[Double], n_ops: Long)

  private[ext] final case class CdcState(firstOp: String, firstOff: Long,
      lastOp: String, lastOff: Long, lastValue: Double, n: Long)

  /** Streaming twin of the x110 batch minimizer: per-key
    * `flatMapGroupsWithState` keeps only (first op, last op, last
    * value, count) — 40 bytes of state per live key, independent of
    * how many ops the key has seen — and re-emits the key's current
    * net change each micro-batch it appears in (Update mode; the sink
    * upserts by key). First/last resolve by OFFSET comparison, so
    * out-of-order arrival WITHIN and ACROSS micro-batches converges to
    * exactly the batch operator's min_by/max_by answer
    * (TemporalSpec pins equality against a shuffled replay). */
  def cdcMinimizeStreaming(ds: org.apache.spark.sql.Dataset[CdcOp])
      : org.apache.spark.sql.Dataset[CdcNet] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
      OutputMode}
    implicit val netEnc = Encoders.product[CdcNet]
    implicit val stEnc = Encoders.product[CdcState]
    implicit val keyEnc = Encoders.scalaLong
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[CdcOp], state: GroupState[CdcState]) => {
          var st = state.getOption.orNull
          rows.foreach { r =>
            st =
              if (st == null)
                CdcState(r.op, r.offset, r.op, r.offset, r.value, 1L)
              else {
                val (fo, ff) =
                  if (r.offset < st.firstOff) (r.op, r.offset)
                  else (st.firstOp, st.firstOff)
                val (lo, lf, lv) =
                  if (r.offset > st.lastOff) (r.op, r.offset, r.value)
                  else (st.lastOp, st.lastOff, st.lastValue)
                CdcState(fo, ff, lo, lf, lv, st.n + 1L)
              }
          }
          if (st == null) Iterator.empty
          else {
            state.update(st)
            val netOp =
              if (st.firstOp == "I" && st.lastOp == "D") "none"
              else if (st.firstOp == "I") "insert"
              else if (st.lastOp == "D") "delete"
              else "update"
            Iterator.single(CdcNet(key, netOp,
              if (st.lastOp == "D") None else Some(st.lastValue), st.n))
          }
        })
  }
}

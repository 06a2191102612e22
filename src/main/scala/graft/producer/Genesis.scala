package graft.producer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Schemas.EventType

/** Genesis — the backfill scan (P16), its batching/rate-limiting (P17),
  * and the dependency guard (P19, enforced in
  * [[graft.registry.Registry.requireGenesisAllowed]]).
  *
  * Reference: lib/dionysus/producer/genesis/streamer.rb:28-56 (scan with
  * time-range / visibility / equality predicates),
  * streamer/standard_job.rb:13-42 (soft-deleted rows emit `_destroyed`,
  * others `_updated`), base_job.rb:8-37 + sidekiq_batched_job_distributor.rb:13-23
  * (id-batches of 1000 spread evenly over `number_of_days`).
  *
  * In Spark the scan is one declarative filter chain — Catalyst pushes every
  * predicate into the parquet/JDBC scan, which is exactly what the Ruby code
  * hand-builds with SQL strings. The Sidekiq batch scheduler becomes either
  * (a) trigger pacing on a streaming read of the table
  * (`Trigger.AvailableNow` + per-trigger caps) or (b) the explicit batch
  * assignment below when the caller wants the reference's evenly-spread
  * schedule.
  */
object Genesis {

  /** P16 — conditional backfill scan. All predicates optional, mirroring
    * `Streamer#stream(topic, model, from, to, options)`. */
  def scan(
      table: DataFrame,
      updatedAtCol: String = "updated_at",
      from: Option[Column] = None,
      to: Option[Column] = None,
      visibleOnly: Boolean = false,
      softDeleteCol: String = "canceled_at",
      conditions: Seq[(String, Column)] = Nil): DataFrame = {
    var df = table
    from.foreach(f => df = df.filter(col(updatedAtCol) >= f))
    to.foreach(t => df = df.filter(col(updatedAtCol) <= t))
    if (visibleOnly) df = df.filter(col(softDeleteCol).isNull)
    conditions.foreach { case (c, v) => df = df.filter(col(c) === v) }
    df
  }

  /** P16 — backfill event classification: already-soft-deleted rows emit
    * `_destroyed`, live rows `_updated` (standard_job.rb:34-38). */
  def backfillEventType(softDeleteCol: Column): Column =
    when(softDeleteCol.isNotNull, lit(EventType.Destroyed))
      .otherwise(lit(EventType.Updated))

  /** P18 — the `Genesis::Performed` control event: one message announcing
    * the backfill window `{model, service, topic, start_at, end_at}` where
    * `end_at = start_at + days + safety_delay` (reference: genesis.rb:38-47,
    * 60 s safety delay config.rb:73-75). Emitted once from the driver to a
    * control topic. */
  def performedEvent(
      spark: org.apache.spark.sql.SparkSession,
      model: String, service: String, topic: String,
      startAt: java.sql.Timestamp, numberOfDays: Int,
      safetyDelaySeconds: Int = 60): DataFrame = {
    import org.apache.spark.sql.functions.{to_json, struct}
    val endAt = new java.sql.Timestamp(
      startAt.getTime + numberOfDays * 86400000L + safetyDelaySeconds * 1000L)
    import spark.implicits._
    Seq((model, service, topic, startAt, endAt))
      .toDF("model", "service", "topic", "start_at", "end_at")
      .select(lit("genesis_performed").as("event"),
        to_json(struct(col("model"), col("service"), col("topic"),
          col("start_at"), col("end_at"))).as("data"))
  }

  /** P17 — batch assignment + schedule: id-ordered batches of `batchSize`,
    * batch *n* delayed by `n · time_per_batch` where
    * `time_per_batch = totalSeconds / ⌈rows/batchSize⌉`
    * (sidekiq_batched_job_distributor.rb:17-23).
    *
    * Emits `__batch` and `__delay_seconds` columns. The global id-ordered
    * `row_number` mirrors the reference's sorted id batching; at 100 TB the
    * same pacing is better expressed as trigger caps (no global sort), so
    * this operator is for reference-parity scheduling, and
    * `zipWithIndex`-free range batching (`id div batchSize`) is the scale
    * path when ids are dense. */
  def assignBatches(
      df: DataFrame,
      idCol: String,
      batchSize: Int = 1000,
      totalSeconds: Long = 24 * 3600): DataFrame = {
    val w = Window.orderBy(col(idCol))
    val withBatch = df.withColumn("__batch",
      floor((row_number().over(w) - 1) / batchSize))
    // count is a cheap metadata/agg pass; time_per_batch is a plan-time scalar
    val batches = math.max(1, math.ceil(df.count().toDouble / batchSize).toLong)
    val perBatch = totalSeconds.toDouble / batches
    withBatch.withColumn("__delay_seconds", (col("__batch") * perBatch).cast("double"))
  }

  /** P17 scale path — id-range batch assignment: `__batch = (id − min) div
    * batchSize`, a pure projection with no global sort and no
    * single-partition exchange (the min/max bounds are one cheap agg pass).
    * Identical to [[assignBatches]] when ids are dense and contiguous; with
    * gaps, batches are id *ranges* — exactly how the reference's
    * `in_batches(of:)` walks a clustered primary key, so sparse ranges
    * simply yield smaller batches. The schedule spreads the batch count
    * evenly over `totalSeconds` as in
    * sidekiq_batched_job_distributor.rb:17-23. */
  def assignBatchesDense(
      df: DataFrame,
      idCol: String,
      batchSize: Int = 1000,
      totalSeconds: Long = 24 * 3600): DataFrame = {
    val bounds = df.agg(
      min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).collect()(0)
    if (bounds.isNullAt(0))
      return df.withColumn("__batch", lit(null).cast("long"))
        .withColumn("__delay_seconds", lit(null).cast("double"))
    val (minId, maxId) = (bounds.getLong(0), bounds.getLong(1))
    val batches = (maxId - minId) / batchSize + 1
    val perBatch = totalSeconds.toDouble / batches
    df.withColumn("__batch",
        expr(s"(cast(`$idCol` as bigint) - ${minId}L) div ${batchSize}L"))
      .withColumn("__delay_seconds",
        (col("__batch") * perBatch).cast("double"))
  }
}

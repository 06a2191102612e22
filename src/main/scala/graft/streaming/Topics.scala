package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** The topic boundary behind one interface (SURVEY §7.2 step 7): the
  * engine's pipelines target [[TopicSink]]/[[TopicSource]], and the
  * deployment picks Kafka or files. Frames at this boundary carry
  * `kafka_key: string`, `value: string (nullable — null = tombstone)`, and
  * optionally `partition_key`/`ts`.
  */
trait TopicSink {
  /** Project the engine's wire frame (kafka_key, partition_key, value,
    * ts) onto the sink's column contract — Kafka requires `key`/`value`
    * names; files keep the full frame. Called before `apply`. */
  def prepare(df: DataFrame): DataFrame = df

  /** Attach the sink to a streaming writer for `topic`. */
  def apply(w: DataStreamWriter[Row], topic: String): DataStreamWriter[Row]

  /** Batch append to `topic` — the Genesis backfill path (P16/P17): the
    * whole-table scan is a batch job, not a stream. */
  def appendBatch(df: DataFrame, topic: String): Unit
}

trait TopicSource {
  /** Open the topic as a streaming frame with (kafka_key, value, ...). */
  def open(spark: SparkSession, topic: String): DataFrame
}

/** File-backed topic (one directory per topic) — the mode exercised in this
  * container. Per-topic ordering comes from file sequencing +
  * checkpointing; the P13 per-topic single-writer lock of the reference is
  * unnecessary because each topic has exactly one streaming query
  * (see [[graft.producer.OutboxOps.partitionByTopic]] for the
  * within-query equivalent). */
/** `maxFilesPerTrigger` is the consumption pacing knob — the streaming
  * analogue of the reference's batched backfill rate limit (P17): a
  * drained genesis topic replays in bounded micro-batches instead of one
  * giant batch. */
final class FileTopics(root: String, maxFilesPerTrigger: Option[Int] = None)
    extends TopicSink with TopicSource {
  /** Streaming writes go through foreachBatch plain appends, NOT the
    * FileStreamSink: the sink's `_spark_metadata` log is authoritative for
    * readers and would make batch appends (Genesis backfill, P16)
    * invisible, and a second writer lineage could never join the log. The
    * cost is at-least-once files on crash-replay — exactly the engine's
    * contract (at-least-once producer + idempotent LWW consumer,
    * SURVEY §7.4.7), so duplicates converge downstream. */
  def apply(w: DataStreamWriter[Row], topic: String): DataStreamWriter[Row] =
    w.foreachBatch { (b: DataFrame, _: Long) =>
      // ONE file per micro-batch append: a micro-batch is bounded by
      // the trigger, and writing it as N shuffle-partition fragments
      // triples the topic's file count — which the CONSUMER then pays
      // on every 25 ms poll (FileStreamSource re-lists the directory;
      // measured 45-90 ms per trigger as the file count grows). The
      // batch Genesis path below keeps its natural parallelism — a
      // backfill is corpus-sized and paced by paceFiles, not here.
      appendBatch(b.coalesce(1), topic)
    }

  def appendBatch(df: DataFrame, topic: String): Unit =
    df.write.mode("append").parquet(s"$root/$topic")

  def open(spark: SparkSession, topic: String): DataFrame = {
    val path = s"$root/$topic"
    // fixed wire schema (not inferred): a live consumer may open the
    // topic before the producer has written its first file; older topics
    // missing `partition_key` read it as null (parquet schema evolution)
    graft.storage.Hcfs.mkdirs(spark, path)
    val reader = spark.readStream.schema(graft.model.Schemas.wire)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(path)
  }
}

/** Kafka-backed topic — the production mode. Compiles against the stable
  * DataSource API by name; requires the spark-sql-kafka connector on the
  * classpath at runtime (not present in this container, so exercised only
  * through the shared interface contract). Keys map to Kafka message keys
  * (per-partition ordering), `partition_key` to the partitioner input, and
  * null `value` publishes a tombstone for log compaction. */
/** `numPartitions`, when the deployment knows the topic's partition
  * count, routes `partition_key` to an explicit `partition` column
  * (`pmod(hash(partition_key), n)`) — Spark's Kafka sink has no
  * partitioner-input concept, so without it messages partition by message
  * key and the reference's per-entity partition affinity (P10) is lost. */
final class KafkaTopics(bootstrapServers: String,
    numPartitions: Option[Int] = None) extends TopicSink with TopicSource {
  override def prepare(df: DataFrame): DataFrame = numPartitions match {
    case Some(n) =>
      df.select(col("kafka_key").as("key"), col("value"),
        pmod(hash(col("partition_key")), lit(n)).cast("int").as("partition"))
    case None => df.selectExpr("kafka_key AS key", "value")
  }

  def apply(w: DataStreamWriter[Row], topic: String): DataStreamWriter[Row] =
    w.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)

  def appendBatch(df: DataFrame, topic: String): Unit =
    prepare(df)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  def open(spark: SparkSession, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key").cast("string").as("kafka_key"),
        col("value").cast("string").as("value"),
        col("timestamp").as("ts"))
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.codec.EnvelopeCodec
import graft.consumer.{ConsumerOps, Persistor}
import graft.producer.EventClassifier

/** Structured Streaming form of the replication pipeline (P1/P11 producer
  * half, C1/C2/C7-C9 consumer half).
  *
  * The topic is a directory of JSON-envelope parquet files — the same
  * `TopicSink`/`TopicSource` shape a Kafka deployment uses
  * (`format("kafka")` + `subscribe`), swapped for the file source here
  * because no Kafka broker/connector exists in this container. Semantics
  * preserved from the reference:
  *
  *  - at-least-once producer + idempotent consumer (checkpointing + the
  *    C7 staleness guard inside the merge), never transactional Kafka
  *    (SURVEY §7.4.7);
  *  - per-key correctness never depends on arrival order — replays and
  *    reorderings are absorbed by LWW (SURVEY §7.4.1);
  *  - exact resends are dropped with watermark-bounded state
  *    (`dropDuplicatesWithinWatermark`), the streaming analogue of the C2
  *    in-batch dedup, so state size is bounded at 100 TB (SURVEY §7.4.8).
  */
object StreamingPipeline {

  /** Producer half: change-stream parquet dir → classified envelope rows →
    * file topic. `Trigger.AvailableNow` drains the backlog with bounded
    * batches (the rate-limited Genesis/backfill pacing knob is
    * `maxFilesPerTrigger`). */
  def produce(spark: SparkSession, sourceDir: String, topicDir: String,
      checkpointDir: String): Unit = {
    // events.ts is ns parquet: read as long, convert to µs timestamp
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(sourceDir).schema
    // file-source contract: sourceDir is a DIRECTORY of change files
    val events = spark.readStream.schema(schema).parquet(sourceDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

    // P2 classification needs the previous image; in true CDC the source
    // carries old/new images (Delta CDF / Debezium). The synthetic events
    // table has no images, so treat every event as an upsert of the user
    // aggregate ('error' = cancel), which is the P16 Genesis shape.
    val classified = events.select(
      when(col("event_type") === "error", lit("event_destroyed"))
        .otherwise(lit("event_updated")).as("event"),
      lit("Event").as("model_name"),
      array(to_json(struct(
        col("user_id").as("id"),
        col("event_type"), col("value"),
        unix_micros(col("ts")).as("updated_us")))).as("data"),
      col("ts"))

    val q = EnvelopeCodec.encode(classified)
      .withColumn("kafka_key", concat(lit("Event:"), get_json_object(element_at(col("data"), 1), "$.id")))
      .select("kafka_key", "value", "ts")
      .writeStream
      .format("parquet")
      .option("path", topicDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Consumer half: file topic → decode → watermarked exact-resend dedup →
    * per-batch keep-latest → idempotent merge into the replica store. */
  def consume(spark: SparkSession, topicDir: String, replica: ParquetReplica,
      checkpointDir: String): Unit = {
    val schema = spark.read.parquet(topicDir).schema
    val wire = spark.readStream.schema(schema).parquet(topicDir)

    val decoded = ConsumerOps.decodeRecords(
        wire.withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("kafka_key", "value"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "id LONG, event_type STRING, value DOUBLE, updated_us LONG"))
      .select(
        regexp_extract(col("event"), "event_(.*)", 1).as("event_type"),
        col("rec.id").as("synced_id"),
        col("rec.value").as("value"),
        timestamp_micros(col("rec.updated_us")).as("synced_updated_at"),
        // the full raw payload always rides along (README.md:932-937)
        col("synced_data"))
      .withColumn("synced_created_at", col("synced_updated_at"))
      .withColumn("canceled_at",
        when(col("event_type") === "destroyed", col("synced_updated_at")))

    val q = decoded.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deduped = ConsumerOps.keepLatest(batch,
          keyCols = Seq("synced_id"), orderCol = "synced_updated_at")
        replica.merge(deduped)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

/** C7 staleness guard as keyed streaming state — the non-storage-resident
  * fallback when the sink is not a transactional table (SURVEY §4):
  * per-key state holds the last-applied LWW timestamp; stale events are
  * dropped before they reach the sink. Prefer the storage-resident MERGE
  * at 100 TB (state lives in the table, not the state store); this exists
  * for sinks without merge support.
  */
object StatefulLww {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  final case class Rec(synced_id: Long, updated_us: Long, value: Double,
      event_type: String)

  def apply(ds: Dataset[Rec]): Dataset[Rec] = {
    implicit val enc = Encoders.product[Rec]
    implicit val longEnc = Encoders.scalaLong
    ds.groupByKey(_.synced_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[Rec], state: GroupState[Long]) => {
          val prev = state.getOption.getOrElse(Long.MinValue)
          // ties persist (>=), matching synchronizable_model.rb:16-26
          val fresh = rows.filter(_.updated_us >= prev).toSeq
          if (fresh.isEmpty) Iterator.empty
          else {
            val winner = fresh.maxBy(_.updated_us)
            state.update(winner.updated_us)
            Iterator.single(winner)
          }
        })
  }
}

/** Minimal snapshot-versioned parquet replica store — the pure-Parquet
  * stand-in for a transactional table (Delta `MERGE INTO` in production;
  * SURVEY §7.3). Each merge writes snapshot `v{n+1}` and flips a pointer
  * file; readers resolve the pointer. Merges are idempotent (LWW guard),
  * so at-least-once replay of a micro-batch converges to the same state.
  * At scale this layer is a transactional format; the operator on top
  * ([[Persistor.merge]]) is unchanged.
  */
final class ParquetReplica(spark: SparkSession, root: String,
    schemaDDL: String) {
  private val fs = new java.io.File(root)
  fs.mkdirs()

  private def pointer = new java.io.File(fs, "LATEST")

  def currentVersion: Int =
    if (pointer.exists)
      new String(java.nio.file.Files.readAllBytes(pointer.toPath)).trim.toInt
    else -1

  def read(): DataFrame = {
    val v = currentVersion
    if (v < 0)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schemaDDL))
    else spark.read.parquet(s"$root/v$v")
  }

  /** Apply an arbitrary state transition and publish the next version.
    * Serialized per replica root (JVM-wide lock): a model reachable through
    * several topics is merged by several concurrent streaming queries
    * ([[graft.Engine]]); a transactional table format serializes
    * concurrent MERGEs the same way at the storage layer. */
  def transform(f: DataFrame => DataFrame): Unit =
    ParquetReplica.lockFor(root).synchronized {
      val next = currentVersion + 1
      f(read()).write.mode("overwrite").parquet(s"$root/v$next")
      java.nio.file.Files.write(pointer.toPath, next.toString.getBytes)
    }

  /** LWW-merge `updates` (shaped per [[Persistor.merge]] contract) into the
    * current snapshot and publish the next version. */
  def merge(updates: DataFrame): Unit =
    transform(current => Persistor.merge(current, updates))
}

object ParquetReplica {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    locks.computeIfAbsent(root, _ => new Object)
}

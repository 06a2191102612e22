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

  /** Producer-half streaming PLAN: change-stream parquet dir → classified
    * envelope wire rows (kafka_key, value, ts). Shared by the
    * backlog-draining [[produce]] and the continuous-trigger
    * [[StreamBench]] latency harness. */
  def producePlan(spark: SparkSession, sourceDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    // file-source contract: sourceDir is a DIRECTORY of change files
    val events = graft.queries.Q.normalizeEventTs(
      spark.readStream.schema(schema).parquet(sourceDir))

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

    EnvelopeCodec.encode(classified)
      .withColumn("kafka_key", concat(lit("Event:"), get_json_object(element_at(col("data"), 1), "$.id")))
      .select("kafka_key", "value", "ts")
  }

  /** Producer half: change-stream parquet dir → classified envelope rows →
    * file topic. `Trigger.AvailableNow` drains the backlog with bounded
    * batches (the rate-limited Genesis/backfill pacing knob is
    * `maxFilesPerTrigger`). */
  def produce(spark: SparkSession, sourceDir: String, topicDir: String,
      checkpointDir: String): Unit = {
    // events.ts physical type varies by testdata generation (ns-int64 vs
    // native µs timestamp) — normalize by actual schema, not assumption
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(sourceDir).schema
    val q = producePlan(spark, sourceDir, schema)
      .writeStream
      .format("parquet")
      .option("path", topicDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Consumer-half streaming PLAN: file topic → decode → watermarked
    * exact-resend dedup → replica-shaped rows, ready for a per-batch
    * keep-latest + merge sink. Shared by [[consume]] and
    * [[StreamBench]]. */
  def consumePlan(spark: SparkSession, topicDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val wire = spark.readStream.schema(schema).parquet(topicDir)
    decodedWire(wire)
  }

  /** Consumer half: file topic → decode → watermarked exact-resend dedup →
    * per-batch keep-latest → idempotent merge into the replica store. */
  def consume(spark: SparkSession, topicDir: String, replica: Replica,
      checkpointDir: String): Unit = {
    val schema = spark.read.parquet(topicDir).schema
    val decoded = consumePlan(spark, topicDir, schema)
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

  private def decodedWire(wire: DataFrame): DataFrame = {
    ConsumerOps.decodeRecords(
        wire.withWatermark("ts", "1 hour")
          // fixed-width dedup state: key on a 64-bit payload hash, not the
          // raw envelope — megabyte-class payloads must never sit in the
          // state store for the whole watermark (same exact-resend
          // semantics; 64-bit collision odds are negligible for dedup)
          .withColumn("__vh", xxhash64(col("kafka_key"), col("value")))
          .dropDuplicatesWithinWatermark("kafka_key", "__vh")
          .drop("__vh"),
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

/** The consumer's storage surface — what `Persistor` needs from a replica
  * table. Two implementations here (the bucketed merge-on-read
  * [[ParquetReplica]] and the thin copy-on-write [[CowReplica]]); the
  * production swap-in is a transactional table format (Delta/Iceberg
  * `MERGE INTO` / copy-on-write commit) behind the same five operations.
  * Everything above this trait ([[graft.Engine]], [[Persistor]]) is
  * storage-agnostic. */
trait Replica {
  /** Current table state. */
  def read(): DataFrame

  /** Current rows, restricted to the storage units that can contain the
    * given keys (`keys` must carry a `synced_id` column). The default is
    * the full table — storage layouts that can prune (hash buckets,
    * partitions, a transactional format's file-level stats) override this
    * so key-local reads (C12 change capture, C11 key resolution) cost
    * O(batch ∩ buckets) I/O instead of O(table). Callers must still
    * filter/join: the result may contain rows for OTHER keys that share a
    * storage unit. */
  def readBuckets(keys: DataFrame): DataFrame = read()

  /** True when no commit has ever been published — a brand-new table.
    * Lets startup-time work (key-index bootstrap) skip a table read it
    * knows must be empty. The conservative default (`false`) makes
    * unknown storage pay the read instead of risking a skipped
    * bootstrap. */
  def neverCommitted: Boolean = false

  /** LWW-merge `updates` (shaped per [[Persistor.merge]] contract).
    * `prepare` may reshape the updates against the current rows first
    * (key-local by construction). */
  def merge(updates: DataFrame,
      prepare: (DataFrame, DataFrame) => DataFrame = Replica.identityPrepare): Unit

  /** Hard-delete every key in `ids`. */
  def destroy(ids: DataFrame, idCol: String = "synced_id"): Unit

  /** Apply an arbitrary state transition over the FULL table — the
    * whole-table escape hatch; incremental callers should resolve keys and
    * use [[destroy]]/[[merge]] instead. */
  def transform(f: DataFrame => DataFrame): Unit

  /** Reclaim versions no longer reachable (the `VACUUM` analogue). */
  def vacuum(retainVersions: Int = 0): Unit

  /** Run `f` under this replica's writer lock — for callers composing a
    * read-and-write atomically (C11 disassociation, C12 change capture).
    * Reentrant with every other operation. */
  def withLock[A](f: => A): A
}

object Replica {
  /** The canonical no-op `prepare`. A SENTINEL, not just a convenience:
    * merge-on-read implementations test `prepare eq identityPrepare` to
    * know the target will never be evaluated (pure map-only delta append)
    * versus a real prepare that joins against current rows (which then
    * gets a bucket-pruned slice, not the full-table reconcile). Callers
    * passing their own `(_, u) => u` lambda still get correct results —
    * just via the pruned-slice path. */
  val identityPrepare: (DataFrame, DataFrame) => DataFrame = (_, u) => u
}

object ParquetReplica {
  /** Phase-decomposition tracing for the micro-batch merge path —
    * stderr lines per [[ParquetReplica.deltaMerge]] phase when
    * `SPARK_GRAFT_MERGE_DEBUG` is set (dev measurement only). */
  private[streaming] val mergeDebug: Boolean =
    sys.env.contains("SPARK_GRAFT_MERGE_DEBUG")

  /** A/B knob (dev measurement only): restore the pre-round-14
    * per-epoch `__seq` literal in the delta write, so the
    * codegen-cache fix can be re-proven against the old shape in the
    * same window — the literal makes the hot write plan's generated
    * code differ per batch (fresh Janino compile each merge). Read
    * paths drop the stored column via their explicit schema, so the
    * variant is value-identical. Never set in bench/verify runs. */
  private[streaming] val seqLiteralAb: Boolean =
    sys.env.contains("SPARK_GRAFT_SEQ_LITERAL")
}

private[streaming] object ReplicaLocks {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def lockFor(root: String): Object =
    locks.computeIfAbsent(root, _ => new Object)
}

/** Hash-bucketed, manifest-versioned parquet replica store — the
  * pure-Parquet stand-in for a transactional table (Delta `MERGE INTO` in
  * production; SURVEY §7.3).
  *
  * Layout: rows live in per-bucket directories (`v{n}/__b={k}`, bucket =
  * `pmod(hash(synced_id), buckets)`); each version has a manifest mapping
  * bucket → directory, and `LATEST` points at the current manifest. A
  * merge rewrites ONLY the buckets containing updated keys — untouched
  * buckets are carried forward by reference, their files never rewritten
  * (the transaction-log pattern; O(batch ∩ buckets), not O(table), per
  * micro-batch). Merges are idempotent (LWW guard), so at-least-once
  * replay converges.
  *
  * At 100 TB this layer is a transactional table format with thousands of
  * buckets/partitions; the operator on top ([[Persistor.merge]]) and the
  * touched-bucket pruning are unchanged. The bucket count is a per-model
  * knob ([[graft.registry.ModelDef.buckets]]) recorded in each manifest
  * (so readers always hash with the count the layout was written with) and
  * changeable online via [[compact]].
  */
final class ParquetReplica(spark: SparkSession, root: String,
    schemaDDL: String, buckets: Int = 16,
    mergeOnRead: Boolean = false, compactEvery: Int = 8) extends Replica {
  require(buckets > 0)
  require(compactEvery > 0)
  // all pointer/manifest/marker I/O goes through the Hadoop FileSystem
  // API (graft.storage.Hcfs): the metadata plane opens anywhere Spark
  // itself can read — file:, hdfs:, s3a: — not just a local disk
  import graft.storage.Hcfs
  Hcfs.mkdirs(spark, root)

  private def pointer = s"$root/LATEST"

  def currentVersion: Int =
    if (Hcfs.exists(spark, pointer))
      Hcfs.readString(spark, pointer).trim.toInt
    else -1

  override def neverCommitted: Boolean = currentVersion < 0

  /** bucket → directory (relative to root) of the given version; empty
    * for versions whose manifest was vacuumed. */
  def manifest(v: Int): Map[Int, String] =
    manifestLines(v)
      .filterNot(l => l.startsWith("B\t") || l.startsWith("D\t"))
      .map { line =>
        val Array(b, path) = line.split("\t", 2)
        b.toInt -> path
      }.toMap

  /** Merge-on-read delta log of the given version: (seq, directory)
    * entries in apply order (manifest `D` lines). Always empty in
    * copy-on-write mode. */
  def deltaEntries(v: Int): Seq[(Long, String)] =
    manifestLines(v).filter(_.startsWith("D\t")).map { line =>
      val Array(_, s, path) = line.split("\t", 3)
      s.toLong -> path
    }.sortBy(_._1)

  /** Bucket count the given version was written with (manifest `B` header;
    * constructor default for pre-header manifests). */
  def bucketCount(v: Int): Int =
    manifestLines(v).collectFirst {
      case l if l.startsWith("B\t") => l.stripPrefix("B\t").trim.toInt
    }.getOrElse(buckets)

  private def manifestLines(v: Int): Seq[String] =
    if (v < 0 || !Hcfs.exists(spark, s"$root/v$v.manifest")) Nil
    else Hcfs.readString(spark, s"$root/v$v.manifest")
      .linesIterator.filter(_.nonEmpty).toSeq

  /** The current version's manifest, REQUIRED to exist: a pointer whose
    * manifest is missing is storage corruption, and treating it as an
    * empty table would silently drop every row on the next merge. */
  private def currentManifest(v: Int): Map[Int, String] = {
    if (v >= 0) require(Hcfs.exists(spark, s"$root/v$v.manifest"),
      s"replica $root: LATEST points at v$v but v$v.manifest is missing")
    manifest(v)
  }

  private def schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDDL)

  /** On-disk schema of the current version (parquet footer of one stored
    * base — or, for a delta-only version, delta — directory); None when
    * the replica has never committed or the version holds no data dirs.
    * One driver-side footer read, no job. */
  def storedSchema: Option[org.apache.spark.sql.types.StructType] = {
    val v = currentVersion
    if (v < 0) None
    else manifest(v).values.headOption
      .orElse(deltaEntries(v).headOption.map(_._2))
      .map(d => spark.read.parquet(s"$root/$d").schema)
  }

  /** Fail fast when the DECLARED schema's column types contradict what is
    * already stored — e.g. toggling `EngineOptions.syncedDataVariant` on a
    * workDir whose replicas hold the other encoding would otherwise make
    * every read force STRING parquet pages through a VARIANT reader (or
    * vice versa) and fail mid-merge with no indication of why. Columns
    * are matched by name; only columns present on BOTH sides are compared
    * (a pure column ADDITION is legitimate schema evolution — stored
    * files without the new column read back as nulls). Called by
    * [[graft.Engine]] on replica open; free on a fresh root. */
  def verifyStoredCompatible(): Unit =
    storedSchema.foreach { stored =>
      val storedTypes = stored.fields.map(f => f.name -> f.dataType).toMap
      schema.fields.foreach { f =>
        storedTypes.get(f.name).foreach { st =>
          if (st != f.dataType) throw new IllegalStateException(
            s"replica $root: column '${f.name}' is declared " +
              s"${f.dataType.sql} but v$currentVersion stores ${st.sql}. " +
              "If this is a synced_data STRING<->VARIANT mode change, " +
              "migrate the stored data first (Engine.migrateSyncedData / " +
              "ParquetReplica.migrateColumn) instead of toggling the " +
              "option on an existing workDir.")
        }
      }
    }

  /** Whole-table column-type migration: re-reads the CURRENT state under
    * `storedDdl` (the schema the data was actually written with), applies
    * `convert` to `colName`, and publishes the result as the next version
    * under THIS instance's declared schema — after which reads and merges
    * use the new type. MoR delta epochs are folded by the read, so the
    * new version starts delta-free; bucket count is preserved. A no-op
    * on a never-committed replica. */
  def migrateColumn(storedDdl: String, colName: String,
      convert: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
    ReplicaLocks.lockFor(root).synchronized {
      val v = currentVersion
      if (v >= 0) {
        val old = new ParquetReplica(spark, root, storedDdl, buckets,
          mergeOnRead, compactEvery)
        val nb = bucketCount(v)
        val next = v + 1
        val migrated = old.read()
          .withColumn(colName, convert(col(colName)))
          .select(schema.fieldNames.map(col).toSeq: _*)
        publish(next, writeBuckets(migrated, next, nb), nb)
      }
    }

  private def empty: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def readDirs(dirs: Seq[String]): DataFrame =
    if (dirs.isEmpty) empty
    else spark.read.schema(schema).parquet(dirs.map(d => s"$root/$d"): _*)

  def read(): DataFrame = {
    val v = currentVersion
    reconcile(readDirs(currentManifest(v).values.toSeq), deltaEntries(v))
  }

  /** Bucket-pruned read: only the bucket directories the given keys hash
    * into are opened (one bounded collect for the bucket set, exactly as
    * [[merge]]/[[destroy]] compute theirs). The rows of those buckets are
    * returned unfiltered — callers join/filter down to their keys. In MoR
    * mode the (unbucketed) delta log is read in full and reconciled on
    * top; keys OUTSIDE the requested set may then surface with a
    * delta-only (unreconciled-against-base) image — within the contract,
    * since callers filter to their keys, but the reason this method's
    * result must never be treated as a full-table read. */
  override def readBuckets(keys: DataFrame): DataFrame = {
    val v = currentVersion
    val nb = bucketCount(v)
    val man = currentManifest(v)
    val touched = keys
      .select(bucketOf(col("synced_id"), nb).as("__b")).distinct()
      .collect().map(_.getInt(0)).toSet
    reconcile(readDirs(man.filter(t => touched(t._1)).values.toSeq),
      deltaEntries(v))
  }

  /** Read-time LWW resolution of base rows + delta-log rows (MoR mode;
    * identity when the delta log is empty — the CoW fast path).
    *
    * The C7 staleness rule is ORDER-DEPENDENT across merge epochs: a
    * null-timestamp source row persists over anything already stored
    * ("ties and NULLs persist" — it ranks +∞ while applying) but loses
    * to ANY later merge (stored with its null timestamp, it ranks −∞ as
    * a target). No static per-row sort key reproduces that — e.g.
    * ts=100@epoch4, null@epoch5, ts=1@epoch6 resolves to ts=1 though
    * ts=100 beats it pairwise — so the reconciliation REPLAYS the fold:
    * rows of a key sort by (epoch, effective-ts) and fold left with the
    * exact pairwise rule `x wins iff coalesce(x.ts, +∞) >=
    * coalesce(acc.ts, −∞)`. All codegen'd (array_sort + aggregate over a
    * collect_list), group size bounded by `compactEvery` (≤ 1 row per
    * key per epoch after the in-batch winner agg). */
  private def reconcile(base: DataFrame,
      deltas: Seq[(Long, String)]): DataFrame = {
    if (deltas.isEmpty) return base
    // `__seq` derives from the manifest per delta directory (the write
    // path stopped storing it — see deltaMerge's codegen-cache note); a
    // pre-round-14 epoch that still stores the column reads fine — the
    // explicit schema drops it and the manifest value is identical.
    // ONE multi-path scan, not an N-way unionByName of per-directory
    // reads (round-15): per-read analysis/planning grew linearly in the
    // delta-log length — bounded by compactEvery, but a stalled
    // compactor at scale made every MoR read progressively costlier to
    // PLAN. The epoch seq is recovered from each row's source directory
    // (`delta-<seq>`, the name [[deltaMerge]] writes — verified against
    // the manifest below, which stays authoritative: any mismatch falls
    // back to the per-directory union).
    val dirEncodesSeq = deltas.forall { case (sq, dir) =>
      dir.split("/").last == s"delta-$sq" }
    val d =
      if (dirEncodesSeq)
        spark.read.schema(schema)
          .parquet(deltas.map { case (_, dir) => s"$root/$dir" }: _*)
          .withColumn("__seq",
            regexp_extract(input_file_name(), "delta-([0-9]+)/[^/]*$", 1)
              .cast("long"))
      else deltas
        .map { case (sq, dir) => spark.read.schema(schema)
          .parquet(s"$root/$dir").withColumn("__seq", lit(sq)) }
        .reduce(_ unionByName _)
    val cols = schema.fieldNames.toSeq
    val maxTs = lit("9999-12-31 00:00:00").cast("timestamp")
    val minTs = lit("0001-01-01 00:00:00").cast("timestamp")
    val all = base.withColumn("__seq", lit(-1L)).unionByName(d)
      .withColumn("__lww",
        Persistor.lwwTimestamp(col("synced_updated_at"), col("synced_created_at")))
    // VARIANT columns (the Spark-4 synced_data mode) are not orderable,
    // so the default array_sort — which compares the packed struct
    // including the full row `r` — fails analysis. The variant branch
    // packs a canonical JSON rendering `k` of the row as the
    // deterministic tiebreak (the role `r` plays in the default
    // ordering: rows of one key in ONE epoch with equal timestamps must
    // sort the same way on every executor, or the fold's winner flips
    // between reads) and sorts with an explicit (s, o, l, k) comparator
    // that never touches the variant itself. String mode keeps the
    // default ordering bit-for-bit.
    val hasVariant = schema.exists(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.VariantType])
    // sort key: epoch first, then effective-ts with null AS +∞ (within
    // one epoch the in-batch rule is the same max — null persists)
    val packed =
      if (hasVariant) struct(
        col("__seq").as("s"), coalesce(col("__lww"), maxTs).as("o"),
        col("__lww").as("l"),
        to_json(struct(cols.map(col): _*)).as("k"),
        struct(cols.map(col): _*).as("r"))
      else struct(
        col("__seq").as("s"), coalesce(col("__lww"), maxTs).as("o"),
        col("__lww").as("l"), struct(cols.map(col): _*).as("r"))
    val grouped = all.groupBy(col("synced_id"))
      .agg(collect_list(packed).as("__rows"))
    // fold the WHOLE sorted array from a null seed — the sorted array
    // is referenced exactly once, so it sorts once per key per read
    // (the earlier slice+element_at form inlined array_sort twice, and
    // a let-binding projection can be collapsed right back by the
    // optimizer)
    val packedType = grouped.schema("__rows").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    // null `l` sorts FIRST in the comparator branch (matching the
    // default struct ordering's nulls-first) and `k` breaks remaining
    // ties totally — same epoch + same effective ts + same rendered row
    // means the rows are interchangeable for the fold
    val sortedRows =
      if (hasVariant) expr("""array_sort(__rows, (a, b) -> CASE
        WHEN a.s < b.s THEN -1 WHEN a.s > b.s THEN 1
        WHEN a.o < b.o THEN -1 WHEN a.o > b.o THEN 1
        WHEN a.l IS NULL AND b.l IS NOT NULL THEN -1
        WHEN a.l IS NOT NULL AND b.l IS NULL THEN 1
        WHEN a.l < b.l THEN -1 WHEN a.l > b.l THEN 1
        WHEN a.k < b.k THEN -1 WHEN a.k > b.k THEN 1
        ELSE 0 END)""")
      else expr("array_sort(__rows)")
    grouped
      .select(aggregate(
        sortedRows,
        lit(null).cast(packedType),
        (acc, x) => when(acc.isNull, x).otherwise(when(
          coalesce(x.getField("l"), maxTs) >= coalesce(acc.getField("l"), minTs),
          x).otherwise(acc))).getField("r").as("w"))
      .select(col("w.*"))
  }

  private def bucketOf(c: org.apache.spark.sql.Column, nb: Int) =
    pmod(hash(c), lit(nb))

  /** Write `df` bucket-partitioned under `v{next}` and return the bucket →
    * directory entries actually written (empty buckets leave no dir).
    * Repartitioned BY bucket first so each bucket directory holds one
    * file per version — without it every shuffle partition spills a
    * fragment into every bucket (a small-file explosion at any scale). */
  private def writeBuckets(df: DataFrame, next: Int, nb: Int): Map[Int, String] =
    writeBucketsTo(df, s"v$next", nb)

  private def writeBucketsTo(df: DataFrame, dirName: String,
      nb: Int): Map[Int, String] = {
    df.withColumn("__b", bucketOf(col("synced_id"), nb))
      .repartition(nb, col("__b"))
      .write.partitionBy("__b").mode("overwrite").parquet(s"$root/$dirName")
    Hcfs.listNames(spark, s"$root/$dirName")
      .collect { case (name, true) if name.startsWith("__b=") =>
        name.stripPrefix("__b=").toInt -> s"$dirName/$name"
      }.toMap
  }

  /** Manifest + pointer publish, both via temp-file + ATOMIC_MOVE: a
    * reader can never observe a truncated manifest or an empty pointer
    * mid-write (the transaction-log commit rule; a crashed writer leaves
    * only a stray temp file and the previous version stays current). */
  private def publish(next: Int, man: Map[Int, String], nb: Int,
      deltas: Seq[(Long, String)] = Nil): Unit = {
    val body = (s"B\t$nb" +:
      (man.toSeq.sorted.map { case (b, p) => s"$b\t$p" } ++
        deltas.sortBy(_._1).map { case (s, p) => s"D\t$s\t$p" }))
      .mkString("\n")
    Hcfs.writeAtomic(spark, s"$root/v$next.manifest", body)
    Hcfs.writeAtomic(spark, pointer, next.toString)
  }

  /** Run `f` under this replica's writer lock — for callers that must
    * compose a read-and-merge atomically (e.g. C12 change capture).
    * Reentrant with [[merge]]/[[transform]]/[[vacuum]]. */
  def withLock[A](f: => A): A =
    ReplicaLocks.lockFor(root).synchronized(f)

  /** Apply an arbitrary state transition over the FULL table and publish
    * the next version (whole-table operations only — compaction-style
    * maintenance; the consumer hot path is [[merge]]/[[destroy]], both
    * touched-bucket-incremental). Serialized per replica root (JVM-wide
    * lock): a model reachable through several topics is merged by several
    * concurrent streaming queries ([[graft.Engine]]); a transactional
    * table format serializes concurrent MERGEs the same way at the
    * storage layer. */
  def transform(f: DataFrame => DataFrame): Unit =
    ReplicaLocks.lockFor(root).synchronized {
      val v = currentVersion
      val next = v + 1
      val nb = bucketCount(v)
      publish(next, writeBuckets(f(read()), next, nb), nb)
    }

  /** Re-bucket the table to `newBuckets` buckets in one full rewrite —
    * the small-file / skew maintenance operation (Delta `OPTIMIZE`
    * analogue). Readers hash with the manifest's recorded count, so the
    * switch is atomic with the version publish. */
  def compact(newBuckets: Int): Unit = {
    require(newBuckets > 0)
    ReplicaLocks.lockFor(root).synchronized {
      val next = currentVersion + 1
      publish(next, writeBuckets(read(), next, newBuckets), newBuckets)
    }
  }

  /** Bucket-pruned hard delete: remove every key in `ids`, rewriting only
    * the buckets those keys hash into (import-mode destroy, C10). */
  def destroy(ids: DataFrame, idCol: String = "synced_id"): Unit =
    ReplicaLocks.lockFor(root).synchronized {
      // the anti-join below reads base buckets DIRECTLY — fold any MoR
      // delta log first so no pending upsert escapes the delete
      compactDeltasLocked()
      val v = currentVersion
      val next = v + 1
      val nb = bucketCount(v)
      val man = currentManifest(v)
      val keyed = ids.select(col(idCol).as("synced_id"))
      val touched = keyed
        .select(bucketOf(col("synced_id"), nb).as("__b")).distinct()
        .collect().map(_.getInt(0)).toSet
      // an empty id set touches nothing: no version bump, no extra Spark
      // job — callers may destroy unconditionally (the emptiness probe is
      // the bucket collect this method needs anyway)
      if (touched.isEmpty) return
      val target = readDirs(man.filter(t => touched(t._1)).values.toSeq)
      val written = writeBuckets(
        target.join(keyed, Seq("synced_id"), "left_anti"), next, nb)
      publish(next, (man -- touched) ++ written, nb)
    }

  /** Drop version directories and manifests no longer reachable from the
    * newest `retainVersions + 1` manifests — the Delta `VACUUM` analogue.
    * `retainVersions = 0` reclaims everything but the current version
    * (safe once writers/readers are drained); a positive retention keeps a
    * window for in-flight readers whose lazy plans still reference recent
    * versions. Concurrent writers are excluded by the root lock. */
  def vacuum(retainVersions: Int = 0): Unit =
    ReplicaLocks.lockFor(root).synchronized {
      val current = currentVersion
      if (current < 0) return
      val floor = math.max(0, current - retainVersions)
      val live = (floor to current).flatMap { v =>
        (manifest(v).values ++ deltaEntries(v).map(_._2))
          .map(_.split("/")(0)).toSeq :+ s"v$v"
      }.toSet
      Hcfs.listNames(spark, root).foreach { case (name, isDir) =>
        // an in-flight background compaction's half-written compact-v*
        // dir is legitimately unreferenced until its locked publish —
        // deleting it mid-write would hand the publish a manifest of
        // missing files. Skip compact dirs while one is running (the
        // publish also re-checks its dir, so even a foreign-instance
        // vacuum degrades to an abandoned compaction, never data loss).
        val isOldVersionDir = isDir &&
          (name.matches("v\\d+") ||
            (name.matches("compact-v\\d+") && !compacting.get())) &&
          !live.contains(name)
        val isOldManifest = name.matches("v\\d+\\.manifest") &&
          name.stripPrefix("v").stripSuffix(".manifest").toInt < floor
        if (isOldVersionDir || isOldManifest)
          Hcfs.delete(spark, s"$root/$name")
      }
    }

  /** LWW-merge `updates` (shaped per [[Persistor.merge]] contract) into
    * the replica, rewriting only the buckets that contain updated keys;
    * every other bucket is carried forward by reference. `prepare` may
    * reshape the updates against the current rows of the touched buckets
    * first (key-local by construction — e.g. the destroy path preserving
    * current attributes). */
  def merge(updates: DataFrame,
      prepare: (DataFrame, DataFrame) => DataFrame = Replica.identityPrepare): Unit =
    mergeTouched(updates, None, prepare)

  /** The bucket count the CURRENT version's layout was written with —
    * callers computing their own touched-bucket sets (see
    * [[mergeTouched]]) must hash with this, never a remembered
    * constructor argument ([[compact]] changes it online). */
  def currentBucketCount: Int = bucketCount(currentVersion)

  /** [[merge]] with a caller-supplied touched-bucket set. A caller that
    * already materialized the update keys driver-side (a bounded
    * micro-batch it collected for its own bookkeeping — e.g.
    * [[StreamBench]]'s per-row lag stamps, or an import manifest) can
    * compute `pmod(hash(synced_id), currentBucketCount)` in that same
    * pass and skip this method's distinct+collect job — one fewer
    * Spark action per merge, which is real latency on a sub-second
    * micro-batch path (in MoR mode the set isn't used for pruning but
    * still answers the empty-batch check without an action). The set
    * must cover every key in `updates` (hashed with
    * [[currentBucketCount]]); a MISSING bucket would leave its current
    * rows out of the rewrite, silently dropping the unmerged rows of
    * that bucket, so over-approximation is safe, under-approximation
    * never is — and because the caller hashes OUTSIDE this method's
    * lock, a concurrent [[compact]] to a different bucket count makes
    * any precomputed set stale: only pass one when nothing re-buckets
    * this replica concurrently (StreamBench owns its replica; an
    * import manifest runs in a maintenance window). */
  def mergeTouched(updates: DataFrame, precomputedTouched: Option[Set[Int]],
      prepare: (DataFrame, DataFrame) => DataFrame = Replica.identityPrepare): Unit =
    ReplicaLocks.lockFor(root).synchronized {
      if (mergeOnRead) {
        // MoR doesn't prune by bucket, but a caller-provided key set
        // still answers the empty-batch question for free. WITHOUT one,
        // the emptiness check is deferred to AFTER the write: deltaMerge
        // reads the written files' parquet footers (driver-local
        // metadata, no Spark job) and publishes nothing for an empty
        // epoch — so the sub-second latency path pays exactly ONE Spark
        // job per micro-batch (the delta write), with no isEmpty/take(1)
        // probe job in front of it, while an idle stream's
        // watermark-advancing empty batches still never append epochs,
        // bump versions, or trigger pointless compactions
        if (!precomputedTouched.exists(_.isEmpty))
          deltaMerge(updates, precomputedTouched, prepare)
        return
      }
      val v = currentVersion
      val next = v + 1
      val nb = bucketCount(v)
      val man = currentManifest(v)
      // Pin `updates` when WE derive the touched set from it: the
      // collect and the rewrite below must see the SAME rows — a
      // nondeterministic updates plan re-evaluated at write time could
      // land rows in buckets the collect never saw, and the manifest
      // swap `(man -- touched) ++ written` would then REPLACE such a
      // bucket with only the new rows (silent loss of its current
      // rows). localCheckpoint (lazy) materializes on the collect and
      // the write reuses the blocks — evaluated once, or fail loudly.
      val ups = if (precomputedTouched.isEmpty)
        updates.localCheckpoint(eager = false) else updates
      // bounded driver-side collect: at most `buckets` distinct values
      val touched = precomputedTouched.getOrElse(ups
        .select(bucketOf(col("synced_id"), nb).as("__b")).distinct()
        .collect().map(_.getInt(0)).toSet)
      // empty micro-batch slice: nothing to merge, keep the version stable
      if (touched.isEmpty) return
      val target = readDirs(man.filter(t => touched(t._1)).values.toSeq)
      val written =
        writeBuckets(Persistor.merge(target, prepare(target, ups)), next, nb)
      publish(next, (man -- touched) ++ written, nb)
    }

  /** MoR-mode merge: append the rowwise-shaped updates as one delta-log
    * epoch and publish — a map-only write of O(batch) bytes, never the
    * CoW path's O(touched buckets) rewrite. This is the write-
    * amplification trade a transactional table format calls
    * merge-on-read: at a 0.2 s micro-batch cadence CoW rewrites each hot
    * bucket 5×/second regardless of batch size, while the delta append
    * keeps the apply path at batch size and defers the rewrite to one
    * compaction per `compactEvery` epochs. Reads pay the reconcile
    * ([[reconcile]]) until then — the same bound.
    *
    * With the default [[Replica.identityPrepare]] the target is never
    * even constructed and the path stays map-only. A REAL prepare (the
    * Engine's attribute-preserving join — key-local by contract) gets the
    * BUCKET-PRUNED reconciled slice of the base, not the full table:
    * without the pruning, every micro-batch would re-read and re-fold the
    * whole replica, forfeiting exactly the O(batch) apply MoR exists for.
    * The delta log itself is unbucketed and folds in full, but its size
    * is bounded by `compactEvery`. */
  private def deltaMerge(updates: DataFrame,
      precomputedTouched: Option[Set[Int]],
      prepare: (DataFrame, DataFrame) => DataFrame): Unit = {
    // phase decomposition for the sub-second merge path (stderr, only
    // when SPARK_GRAFT_MERGE_DEBUG is set — zero cost otherwise)
    val dbg = ParquetReplica.mergeDebug
    var tMark = System.nanoTime()
    def mark(phase: String): Unit = if (dbg) {
      val now = System.nanoTime()
      System.err.println(f"[deltaMerge $root] $phase ${(now - tMark) / 1e6}%.1f ms")
      tMark = now
    }
    val v = currentVersion
    val next = v + 1
    val nb = bucketCount(v)
    val man = currentManifest(v)
    val ds = deltaEntries(v)
    val seq = ds.lastOption.map(_._1).getOrElse(-1L) + 1L
    val dir = s"v$next/delta-$seq"
    mark("manifest-read")
    // Pin `updates` on the real-prepare path when WE derive the touched
    // set: the collect and the write must see the SAME rows, or a
    // nondeterministic updates plan could hash re-evaluated rows into
    // buckets the collect missed — prepare would then find no current
    // row for those keys and silently fall back to update values. The
    // identity-prepare latency path is untouched (updates evaluated
    // exactly once there, no pin needed).
    val needsTouched = !(prepare eq Replica.identityPrepare) &&
      precomputedTouched.isEmpty
    val ups = if (needsTouched) updates.localCheckpoint(eager = false)
      else updates
    val target =
      if (prepare eq Replica.identityPrepare)
        // never evaluated — placeholder so the signature stays uniform
        empty
      else {
        // one bounded collect (≤ buckets values), the same cost the CoW
        // path pays; prepare joins on synced_id, so all rows for the
        // update keys live in these buckets
        val touched = precomputedTouched.getOrElse(ups
          .select(bucketOf(col("synced_id"), nb).as("__b")).distinct()
          .collect().map(_.getInt(0)).toSet)
        reconcile(readDirs(man.filter(t => touched(t._1)).values.toSeq), ds)
      }
    // overwrite (the writeBucketsTo rule): a crash between this write
    // and publish() leaves an orphan dir at the SAME next/seq, and the
    // micro-batch replay must clobber it, not wedge on ErrorIfExists.
    // Cast to the replica schema BEFORE writing: the shape null-fills
    // target columns absent from the payload, which as untyped lit(null)
    // (NullType) parquet rejects — CoW never sees this because
    // Persistor.merge unions with the typed target, but the delta epoch
    // writes the shaped rows directly.
    // NO per-epoch `__seq` literal in the written rows: the epoch seq is
    // already authoritative in the manifest (`D <seq> <dir>`), and
    // [[reconcile]] re-derives the column per delta directory at read
    // time. Embedding it here as `lit(seq)` made the write plan's
    // generated code differ per micro-batch (Literal codegen inlines
    // primitive values into the Java source), so EVERY delta append paid
    // a fresh Janino compile instead of hitting the codegen cache —
    // pure fixed latency on the sub-second merge path (round-14
    // optimization; the hot write plan is now batch-invariant).
    // shapeForMergeTyped = the shape + cast + __event-drop as ONE
    // projection (one analyzer pass — this path runs per micro-batch)
    val shaped0 = Persistor.shapeForMergeTyped(schema, prepare(target, ups))
    val shaped = if (ParquetReplica.seqLiteralAb)
      shaped0.withColumn("__seq", lit(seq)) else shaped0
    mark("plan-construct")
    shaped.write.mode("overwrite").parquet(s"$root/$dir")
    mark("write-job")
    // deferred emptiness check: the parquet FOOTERS of the files just
    // written carry exact row counts — a driver-local metadata read, no
    // Spark job. An empty micro-batch leaves no epoch and no version.
    if (!Hcfs.parquetHasRows(spark, s"$root/$dir")) {
      Hcfs.delete(spark, s"$root/$dir")
      return
    }
    mark("footer-count")
    publish(next, man, nb, ds :+ (seq -> dir))
    mark("publish")
    if (ds.size + 1 >= compactEvery) compactDeltasAsync()
  }

  // one background compaction at a time; failures clear the flag and
  // leave the (still fully correct, just longer) delta log in place
  private val compacting = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Background compaction with SNAPSHOT isolation — the versioned
    * manifest makes it free: fold the deltas of the CURRENT version
    * outside the lock (merges keep appending new epochs meanwhile, the
    * heavy bucket rewrite stalls no micro-batch), then publish the
    * folded base plus exactly the epochs appended since the snapshot.
    * Sound because the log is append-only and the read-time fold is
    * left-associative: fold(base, d₁..dₙ₊ₖ) = fold(fold(base, d₁..dₙ),
    * dₙ₊₁..dₙ₊ₖ). Abandoned (log stays, nothing lost) if a concurrent
    * maintenance op rewrote the bucket layout mid-flight. */
  private def compactDeltasAsync(): Unit = {
    if (!compacting.compareAndSet(false, true)) return
    val snapV = currentVersion
    val snapDeltas = deltaEntries(snapV)
    if (snapDeltas.isEmpty) { compacting.set(false); return }
    val snapMaxSeq = snapDeltas.last._1
    val nb = bucketCount(snapV)
    val t = new Thread(() => {
      try {
        // heavy part — NO lock held: reconcile the snapshot and write
        // the folded buckets to a compaction-private directory
        val folded = reconcile(
          readDirs(manifest(snapV).values.toSeq), snapDeltas)
        val written = writeBucketsTo(folded, s"compact-v$snapV", nb)
        ReplicaLocks.lockFor(root).synchronized {
          val cur = currentVersion
          // the snapshot's last epoch still in the log proves no other
          // base rewrite (sync compact / CoW merge / destroy) folded it
          // already — publishing over one would resurrect the old base.
          // The dir existence check covers a foreign-instance vacuum
          // that reclaimed the half-written compaction output.
          if (bucketCount(cur) == nb &&
              deltaEntries(cur).exists(_._1 == snapMaxSeq) &&
              Hcfs.exists(spark, s"$root/compact-v$snapV")) {
            val remaining = deltaEntries(cur).filter(_._1 > snapMaxSeq)
            publish(cur + 1, written, nb, remaining)
          } // else: layout changed under us — abandon, log is still whole
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[replica $root] async compaction failed: ${e.getMessage}")
      } finally compacting.set(false)
    }, s"replica-compact-$root")
    t.setDaemon(true)
    t.start()
  }

  /** Fold the delta log into the base buckets (one CoW rewrite) and
    * publish a delta-free version. No-op when the log is empty. Runs
    * under the caller's lock — [[destroy]] and bucket-rewriting
    * maintenance call it first so their direct base-bucket reads see a
    * complete table. */
  private def compactDeltasLocked(): Unit = {
    val v = currentVersion
    if (deltaEntries(v).isEmpty) return
    val next = v + 1
    val nb = bucketCount(v)
    publish(next, writeBuckets(read(), next, nb), nb)
  }
}

/** Thin copy-on-write replica: every commit writes a complete new table
  * directory and atomically repoints `LATEST` — the copy-on-write commit
  * mode of a transactional table format. Exists to prove the [[Replica]]
  * surface is storage-agnostic (the contract suite runs against both
  * implementations); [[ParquetReplica]] remains the scale path — this one
  * pays O(table) per COMMIT by design. Reads still prune: each version is
  * laid out in `__b=` bucket directories (hashed on `synced_id`) with the
  * count recorded in a per-version `_buckets` marker, so [[readBuckets]]
  * opens only the touched buckets — always hashing with the count the
  * layout was written with — and the engine's zero-full-read guarantee
  * (C11/C12) holds on this backend too. Versions without the marker
  * (legacy flat layouts, foreign writers) read correctly unpruned. */
final class CowReplica(spark: SparkSession, root: String,
    schemaDDL: String, buckets: Int = 16) extends Replica {
  require(buckets > 0)
  import graft.storage.Hcfs
  Hcfs.mkdirs(spark, root)
  private def pointer = s"$root/LATEST"

  def currentVersion: Int =
    if (Hcfs.exists(spark, pointer))
      Hcfs.readString(spark, pointer).trim.toInt
    else -1

  override def neverCommitted: Boolean = currentVersion < 0

  private def schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDDL)

  private def empty: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Bucket-dir paths (relative to root) of version `v`. */
  private def bucketDirs(v: Int): Seq[String] =
    Hcfs.listNames(spark, s"$root/v$v")
      .collect { case (name, true) if name.startsWith("__b=") =>
        s"v$v/$name"
      }

  /** Bucket count the given version was written with (`_buckets` marker;
    * Spark's reader ignores underscore-prefixed files). None = a layout
    * written before bucketing existed, or by a different tool — readers
    * must not assume any hash layout for it. */
  private def bucketCountOf(v: Int): Option[Int] =
    if (Hcfs.exists(spark, s"$root/v$v/_buckets"))
      Some(Hcfs.readString(spark, s"$root/v$v/_buckets").trim.toInt)
    else None

  private def readDirs(dirs: Seq[String]): DataFrame =
    if (dirs.isEmpty) empty
    else spark.read.schema(schema).parquet(dirs.map(d => s"$root/$d"): _*)

  def read(): DataFrame = {
    val v = currentVersion
    if (v < 0) empty
    else {
      val dirs = bucketDirs(v)
      // no bucket dirs: an empty bucketed commit, or a legacy flat layout
      // (rows directly under v{n}) — both read correctly as the plain dir
      if (dirs.nonEmpty) readDirs(dirs)
      else spark.read.schema(schema).parquet(s"$root/v$v")
    }
  }

  override def readBuckets(keys: DataFrame): DataFrame = {
    val v = currentVersion
    if (v < 0) return empty
    bucketCountOf(v) match {
      case Some(nb) =>
        val touched = keys
          .select(pmod(hash(col("synced_id")), lit(nb)).as("__b")).distinct()
          .collect().map(_.getInt(0)).toSet
        readDirs(bucketDirs(v).filter(d =>
          touched(d.split("/").last.stripPrefix("__b=").toInt)))
      // unknown layout (legacy flat, foreign writer): correct, unpruned
      case None => read()
    }
  }

  def withLock[A](f: => A): A = ReplicaLocks.lockFor(root).synchronized(f)

  def transform(f: DataFrame => DataFrame): Unit = withLock {
    val next = currentVersion + 1
    f(read()).withColumn("__b", pmod(hash(col("synced_id")), lit(buckets)))
      .repartition(buckets, col("__b"))
      .write.partitionBy("__b").mode("overwrite").parquet(s"$root/v$next")
    // record the hash layout BEFORE publishing the version: readBuckets
    // only ever prunes with the count the layout was actually written with
    Hcfs.writeAtomic(spark, s"$root/v$next/_buckets", buckets.toString)
    Hcfs.writeAtomic(spark, pointer, next.toString)
  }

  def merge(updates: DataFrame,
      prepare: (DataFrame, DataFrame) => DataFrame = Replica.identityPrepare): Unit =
    transform(current => Persistor.merge(current, prepare(current, updates)))

  def destroy(ids: DataFrame, idCol: String = "synced_id"): Unit =
    transform(_.join(ids.select(col(idCol).as("synced_id")),
      Seq("synced_id"), "left_anti"))

  def vacuum(retainVersions: Int = 0): Unit = withLock {
    val current = currentVersion
    if (current < 0) return
    val floor = math.max(0, current - retainVersions)
    Hcfs.listNames(spark, root).foreach { case (name, isDir) =>
      if (isDir && name.matches("v\\d+") &&
          name.stripPrefix("v").toInt < floor)
        Hcfs.delete(spark, s"$root/$name")
    }
  }
}

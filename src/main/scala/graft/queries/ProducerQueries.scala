package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Q._
import graft.producer.{EventClassifier, Genesis, Observers, OutboxOps, OutboxWorker, Serializers}
import graft.registry._

/** Producer-side operators (SURVEY §2.1) exercised over the test tables.
  *
  * The `events` table plays the change stream; a derived outbox frame plays
  * the `dionysus_outboxes` table. Each query calls the actual library
  * operator — the oracle re-states the semantics in ANSI SQL.
  */
object ProducerQueries {

  /** The running example registry: event types as "models". */
  private def eventModel(n: String) = ModelDef(n,
    attributes = Seq(Attribute("value", org.apache.spark.sql.types.DoubleType)))
  val registry = Registry("v1", Seq(
    TopicDef("events", models = Seq("click", "view", "signup", "purchase", "error").map(eventModel)),
    TopicDef("purchases", models = Seq(eventModel("purchase"))),
    TopicDef("alerts", models = Seq(eventModel("error")))))

  /** Derived outbox frame over `events` — deterministic synthetic
    * publish/retry state so P4/P5/P6/P12 have something to chew on. */
  private def outboxFrame(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events").select(
      lit("Event").as("resource_class"),
      col("event_id").cast("string").as("resource_id"),
      col("event_type").as("event_name"),
      concat(lit("v1_"), col("event_type")).as("topic"),
      col("user_id").cast("string").as("partition_key"),
      when(col("event_id") % 3 === 0, lit(null).cast("timestamp"))
        .otherwise(col("ts")).as("published_at"),
      lit(null).cast("timestamp").as("failed_at"),
      when(col("event_id") % 5 === 0, lit("2040-01-01 00:00:00").cast("timestamp"))
        .otherwise(lit(null).cast("timestamp")).as("retry_at"),
      lit(null).cast("string").as("error_class"),
      lit(null).cast("string").as("error_message"),
      (col("event_id") % 5).cast("int").as("attempts"),
      col("ts").as("created_at"),
      col("ts").as("updated_at"),
      lit(null).cast("string").as("changeset"),
      col("event_id"))

  private val outboxSql =
    """SELECT 'Event' AS resource_class, CAST(event_id AS VARCHAR) AS resource_id,
      | event_type AS event_name, 'v1_' || event_type AS topic,
      | CAST(user_id AS VARCHAR) AS partition_key,
      | CASE WHEN event_id % 3 = 0 THEN NULL ELSE ts END AS published_at,
      | CASE WHEN event_id % 5 = 0 THEN TIMESTAMP '2040-01-01' ELSE NULL END AS retry_at,
      | CAST(event_id % 5 AS INT) AS attempts, ts AS created_at, event_id
      |FROM events""".stripMargin

  val all: Map[String, Entry] = Map(

    // P2 — soft-delete state machine over a per-key ordered change stream:
    // 'error' plays the canceled state; first event per user is the insert.
    "p02_event_classifier" -> entry(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val ev = tbl(s, dir, "events")
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        val op = when(col("prev_type").isNull, "insert").otherwise("update")
        val oldCanceled = when(col("prev_type") === "error", lit("x"))
        val newCanceled = when(col("event_type") === "error", lit("x"))
        ev.withColumn("event_name",
            EventClassifier.eventType(op, oldCanceled, newCanceled))
          .filter(col("event_name").isNotNull)
          .select(col("event_id"), col("user_id"), col("event_name"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, user_id, event_name FROM (
        | SELECT event_id, user_id,
        |  CASE WHEN prev_type IS NULL THEN 'created'
        |       WHEN prev_type <> 'error' AND event_type = 'error' THEN 'destroyed'
        |       WHEN prev_type = 'error' AND event_type <> 'error' THEN 'created'
        |       WHEN prev_type = 'error' AND event_type = 'error' THEN NULL
        |       ELSE 'updated' END AS event_name
        | FROM (SELECT event_id, user_id, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
        |       FROM events))
        |WHERE event_name IS NOT NULL ORDER BY event_id""".stripMargin),

    // P3 — registry-driven topic fan-out: a plan-time literal map + explode,
    // no join, no shuffle.
    "p03_topic_fanout" -> entry(
      (s, dir) => {
        val ev = tbl(s, dir, "events")
          .withColumn("model_name", col("event_type"))
        Serializers.topicFanout(ev, registry)
          .select(col("event_id"), col("topic"))
          .orderBy(col("event_id"), col("topic"))
      },
      """SELECT event_id, topic FROM (
        | SELECT event_id, 'v1_events' AS topic FROM events
        | UNION ALL SELECT event_id, 'v1_purchases' FROM events WHERE event_type = 'purchase'
        | UNION ALL SELECT event_id, 'v1_alerts' FROM events WHERE event_type = 'error')
        |ORDER BY event_id, topic""".stripMargin),

    // P4 — publishable-batch fetch: filter + order + limit. The filters are
    // exactly the reference scope; Catalyst pushes them into the scan and
    // the ordered limit runs as TakeOrderedAndProject.
    "p04_outbox_fetch" -> entry(
      (s, dir) => {
        OutboxOps.fetchPublishable(
            outboxFrame(s, dir), topic = "v1_purchase",
            now = lit("2026-01-01 00:00:00").cast("timestamp"), batchSize = 100)
          .select(col("resource_id"), col("event_name"),
            unix_micros(col("created_at")).as("created_us"))
      },
      s"""SELECT resource_id, event_name, epoch_us(created_at) AS created_us
        |FROM ($outboxSql)
        |WHERE published_at IS NULL AND topic = 'v1_purchase'
        |  AND (retry_at IS NULL OR retry_at <= TIMESTAMP '2026-01-01')
        |ORDER BY created_at, resource_id LIMIT 100""".stripMargin),

    // P5 — pending-topic discovery: DISTINCT over the unpublished slice; on
    // a topic-partitioned outbox this prunes to partition metadata.
    "p05_pending_topics" -> entry(
      (s, dir) =>
        OutboxOps.pendingTopics(outboxFrame(s, dir)).orderBy(col("topic")),
      s"""SELECT DISTINCT topic FROM ($outboxSql)
        |WHERE published_at IS NULL ORDER BY topic""".stripMargin),

    // P6 — collapse runs of consecutive duplicates (keep last of each run),
    // per-topic ordering — one window, partitioned by topic.
    "p06_consecutive_dedup" -> entry(
      (s, dir) => {
        val ob = outboxFrame(s, dir)
          // duplicate key: same user publishing the same event type
          .withColumn("resource_id", col("partition_key"))
          .withColumn("created_at", col("event_id"))
        OutboxOps.collapseConsecutiveDuplicates(ob)
          .select(col("topic"), col("resource_id"), col("event_id"))
          .orderBy(col("event_id"))
      },
      s"""SELECT topic, resource_id, event_id FROM (
        | SELECT topic, partition_key AS resource_id, event_id,
        |  lead(resource_class || '§' || partition_key || '§' || event_name)
        |    OVER (PARTITION BY topic ORDER BY event_id, partition_key) AS next_key,
        |  resource_class || '§' || partition_key || '§' || event_name AS key
        | FROM ($outboxSql))
        |WHERE next_key IS NULL OR next_key <> key ORDER BY event_id""".stripMargin),

    // P10 — message key "Model:id" + partition-key resolution.
    "p10_partition_key" -> entry(
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        ev.select(
            col("event_id"),
            graft.codec.EnvelopeCodec.messageKey(lit("Event"), col("event_id")).as("kafka_key"),
            Serializers.partitionKey(Some("user_id")).as("partition_key"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, 'Event:' || CAST(event_id AS VARCHAR) AS kafka_key,
        | CAST(user_id AS VARCHAR) AS partition_key
        |FROM events ORDER BY event_id""".stripMargin),

    // P10 lambda form — an opaque per-topic key function over the
    // resource struct (reference partition_key.rb:34-36), here a
    // user-shard lambda: the partition key is user_id % 8 stringified.
    "p10_partition_key_fn" -> entry(
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        ev.select(
            col("event_id"),
            Serializers.partitionKey(
              Some((r: org.apache.spark.sql.Column) =>
                pmod(r.getField("user_id"), lit(8))),
              None, "user_id").as("partition_key"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, CAST(user_id % 8 AS VARCHAR) AS partition_key
        |FROM events ORDER BY event_id""".stripMargin),

    // P12 — retry bookkeeping: exponential backoff 5·2^attempts seconds.
    // Pure integral arithmetic in µs for exact cross-engine equality.
    "p12_retry_backoff" -> entry(
      (s, dir) => {
        tbl(s, dir, "events")
          .withColumn("attempts", (col("event_id") % 5).cast("int"))
          .select(col("event_id"), col("attempts"),
            (unix_micros(col("ts")) +
              lit(5L) * call_function("shiftleft", lit(1L), (col("event_id") % 5).cast("int")) * lit(1000000L))
              .as("retry_us"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, CAST(event_id % 5 AS INT) AS attempts,
        | epoch_us(ts) + 5 * (1 << CAST(event_id % 5 AS INT)) * 1000000 AS retry_us
        |FROM events ORDER BY event_id""".stripMargin),

    // P7 — serializer as projection: declared attributes + links (FK ids),
    // built from the registry ModelDef and flattened for comparison.
    "p07_serializer_projection" -> entry(
      (s, dir) => {
        val m = ModelDef("order", primaryKey = "o_orderkey",
          attributes = Seq(Attribute("o_totalprice"), Attribute("o_orderstatus")),
          hasOne = Seq(Association("customer", "customer", "o_custkey")))
        tbl(s, dir, "orders")
          .select(Serializers.payload(m).as("p"))
          .select(col("p.id").as("id"),
            col("p.o_totalprice").as("o_totalprice"),
            col("p.o_orderstatus").as("o_orderstatus"),
            col("p.links.customer").as("links_customer"))
          .orderBy(col("id"))
      },
      """SELECT o_orderkey AS id, o_totalprice, o_orderstatus,
        | o_custkey AS links_customer
        |FROM orders ORDER BY id""".stripMargin),

    // P8 — aggregate sideload: children nested under the parent (join +
    // sorted collect_list), flattened to count + ordered id list.
    "p08_aggregate_sideload" -> entry(
      (s, dir) => {
        val nested = Serializers.sideloadToMany(
          tbl(s, dir, "orders"), "o_orderkey",
          tbl(s, dir, "lineitem"), "l_orderkey",
          as = "items", childCols = Seq("l_linenumber"))
        nested.select(col("o_orderkey"),
            coalesce(size(col("items")), lit(0)).cast("long").as("n_items"),
            when(col("items").isNull, lit(""))
              .otherwise(concat_ws(",",
                transform(col("items"), x => x.getField("l_linenumber").cast("string"))))
              .as("lines"))
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey, coalesce(n, 0) AS n_items, coalesce(lines, '') AS lines
        |FROM orders LEFT JOIN (
        | SELECT l_orderkey, count(*) AS n,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
        | FROM lineitem GROUP BY l_orderkey) ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin),

    // P9 — destroyed records serialize as {primary_key} only: the wire
    // form a consumer's destroy path keys on (p20 covers the tombstone
    // envelope around it).
    "p09_deleted_projection" -> entry(
      (s, dir) => {
        val m = ModelDef("order", primaryKey = "o_orderkey")
        Serializers.deletedProjection(
            tbl(s, dir, "orders").filter(col("o_orderkey") % 10 === 3), m)
          .orderBy(col("id"))
      },
      """SELECT o_orderkey AS id FROM orders
        |WHERE o_orderkey % 10 = 3 ORDER BY id""".stripMargin),

    // P12 — publish ack/retry bookkeeping: successes stamped published_at,
    // failures get attempts+1 and exponential-backoff retry_at.
    "p12_acknowledge" -> entry(
      (s, dir) => {
        val ob = outboxFrame(s, dir)
        val now = lit("2026-01-01 00:00:00").cast("timestamp")
        val published = ob.filter(col("published_at").isNull && col("event_id") % 2 === 1)
        val failed = ob.filter(col("published_at").isNull && col("event_id") % 10 === 6)
        OutboxOps.acknowledge(ob, published, failed, now)
          .select(col("event_id"), col("resource_id"), col("attempts"),
            unix_micros(col("published_at")).as("pub_us"),
            unix_micros(col("retry_at")).as("retry_us"),
            col("error_class"))
          .orderBy(col("event_id"))
      },
      s"""SELECT event_id, resource_id,
        | CASE WHEN published_at IS NULL AND event_id % 10 = 6
        |      THEN attempts + 1 ELSE attempts END AS attempts,
        | CASE WHEN published_at IS NULL AND event_id % 2 = 1
        |      THEN epoch_us(TIMESTAMP '2026-01-01') ELSE epoch_us(published_at) END AS pub_us,
        | CASE WHEN published_at IS NULL AND event_id % 2 = 1 THEN NULL
        |      WHEN published_at IS NULL AND event_id % 10 = 6
        |      THEN epoch_us(TIMESTAMP '2026-01-01'
        |                    + to_seconds(5 * (1 << (attempts + 1))))
        |      ELSE epoch_us(retry_at) END AS retry_us,
        | CASE WHEN published_at IS NULL AND event_id % 10 = 6
        |      THEN 'PublishError' END AS error_class
        |FROM ($outboxSql) ORDER BY event_id""".stripMargin),

    // P4+P6+P12 composed — one outbox worker tick across all pending
    // topics in a single plan: per-topic head batch, consecutive-duplicate
    // collapse (acked but not resent, matching the reference), success
    // acknowledgment clearing error state.
    "p12_worker_tick" -> entry(
      (s, dir) => {
        OutboxWorker.tick(outboxFrame(s, dir),
            now = lit("2026-01-01 00:00:00").cast("timestamp"),
            batchSizePerTopic = 50,
            publish = b => b.filter(lit(false)))
          .select(col("event_id"), col("resource_id"),
            unix_micros(col("published_at")).as("pub_us"),
            unix_micros(col("retry_at")).as("retry_us"))
          .orderBy(col("event_id"))
      },
      s"""WITH ob AS ($outboxSql),
        |r AS (SELECT event_id,
        |       row_number() OVER (PARTITION BY topic ORDER BY created_at, resource_id) AS rn
        |      FROM ob
        |      WHERE published_at IS NULL
        |        AND (retry_at IS NULL OR retry_at <= TIMESTAMP '2026-01-01'))
        |SELECT ob.event_id, ob.resource_id,
        | CASE WHEN r.rn <= 50 THEN epoch_us(TIMESTAMP '2026-01-01')
        |      ELSE epoch_us(ob.published_at) END AS pub_us,
        | CASE WHEN r.rn <= 50 THEN NULL ELSE epoch_us(ob.retry_at) END AS retry_us
        |FROM ob LEFT JOIN r ON ob.event_id = r.event_id
        |ORDER BY ob.event_id""".stripMargin),

    // P14 — observer resolution: changed-attribute match against the
    // observer registry, then FK join to the dependents.
    "p14_observers" -> entry(
      (s, dir) => {
        val changes = tbl(s, dir, "orders").select(
          lit("order").as("model_name"),
          when(col("o_orderkey") % 4 === 0,
            map(lit("o_totalprice"), array(lit("old"), lit("new"))))
            .otherwise(map(lit("o_orderpriority"), array(lit("old"), lit("new"))))
            .as("changeset"),
          col("o_custkey"))
        Observers.resolve(changes,
            ObserverDef("order", Seq("o_totalprice"), "customer"),
            dependentModel = "customer",
            changesJoinCol = "o_custkey",
            dependents = tbl(s, dir, "customer"),
            dependentsJoinCol = "c_custkey", dependentsIdCol = "c_custkey")
          .orderBy(col("resource_id"))
      },
      """SELECT DISTINCT c_custkey AS resource_id, 'customer_updated' AS event_name
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderkey % 4 = 0)
        |ORDER BY resource_id""".stripMargin),

    // P14 — observer with a method-chain association ("customer.nation"):
    // the dotted path becomes a validated two-hop join chain.
    "p14_observer_chain" -> entry(
      (s, dir) => {
        val changes = tbl(s, dir, "orders").select(
          lit("order").as("model_name"),
          when(col("o_orderkey") % 5 === 0,
            map(lit("o_totalprice"), array(lit("old"), lit("new"))))
            .otherwise(map(lit("o_orderpriority"), array(lit("old"), lit("new"))))
            .as("changeset"),
          col("o_custkey"))
        Observers.resolveChain(changes,
            ObserverDef("order", Seq("o_totalprice"), "customer.nation"),
            dependentModel = "nation",
            changesJoinCol = "o_custkey",
            hops = Seq(
              Observers.Hop(tbl(s, dir, "customer"), "c_custkey", "c_custkey", "c_nationkey"),
              Observers.Hop(tbl(s, dir, "nation"), "n_nationkey", "n_nationkey", "n_nationkey")))
          .orderBy(col("resource_id"))
      },
      """SELECT DISTINCT n_nationkey AS resource_id, 'nation_updated' AS event_name
        |FROM nation WHERE n_nationkey IN (
        |  SELECT c_nationkey FROM customer WHERE c_custkey IN (
        |    SELECT o_custkey FROM orders WHERE o_orderkey % 5 = 0))
        |ORDER BY resource_id""".stripMargin),

    // P15 — dependency-parent republish: child changes → distinct parent
    // ids, emitted as <parent>_updated.
    "p15_dependency_parent" -> entry(
      (s, dir) => {
        Observers.dependencyParentEvents(
            tbl(s, dir, "lineitem").filter(col("l_partkey") % 10 === 0),
            childFkCol = "l_orderkey", parentModel = "order")
          .orderBy(col("resource_id"))
      },
      """SELECT DISTINCT l_orderkey AS resource_id, 'order_updated' AS event_name
        |FROM lineitem WHERE l_partkey % 10 = 0
        |ORDER BY resource_id""".stripMargin),

    // P20 — tombstones: null value under the resource key.
    "p20_tombstone" -> entry(
      (s, dir) => {
        graft.codec.EnvelopeCodec.tombstones(
            tbl(s, dir, "events").filter(col("event_id") % 7 === 0),
            lit("Event"), col("event_id"))
          .orderBy(col("kafka_key"))
      },
      """SELECT 'Event:' || CAST(event_id AS VARCHAR) AS kafka_key,
        | CAST(NULL AS VARCHAR) AS value
        |FROM events WHERE event_id % 7 = 0
        |ORDER BY kafka_key""".stripMargin),

    // P16 — Genesis backfill scan: range + equality predicates (pushed to
    // the scan) and destroyed/updated classification of soft-deleted rows
    // ('F' status plays the canceled state).
    "p16_genesis_scan" -> entry(
      (s, dir) => {
        val scanned = Genesis.scan(
          tbl(s, dir, "orders"),
          updatedAtCol = "o_orderdate",
          from = Some(lit("1996-01-01").cast("timestamp")),
          to = Some(lit("1999-01-01").cast("timestamp")),
          conditions = Seq("o_orderpriority" -> lit("1-URGENT")))
        scanned.select(col("o_orderkey"),
            Genesis.backfillEventType(when(col("o_orderstatus") === "F", lit("x"))).as("event_type"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("updated_us"))
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey,
        | CASE WHEN o_orderstatus = 'F' THEN 'destroyed' ELSE 'updated' END AS event_type,
        | epoch_us(o_orderdate) AS updated_us
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate <= TIMESTAMP '1999-01-01'
        |  AND o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin),

    // P17 — backfill batching: id-ordered batches of 1000 spread evenly
    // over a day (reference pacing formula).
    "p17_batch_distribution" -> entry(
      (s, dir) => {
        Genesis.assignBatches(tbl(s, dir, "orders"), "o_orderkey",
            batchSize = 1000, totalSeconds = 86400)
          .select(col("o_orderkey"), col("__batch").as("batch"),
            col("__delay_seconds").as("delay_s"))
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey, CAST(floor((rn - 1) / 1000) AS BIGINT) AS batch,
        | CAST(floor((rn - 1) / 1000) * (86400.0 / ceil(n / 1000.0)) AS DOUBLE) AS delay_s
        |FROM (SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn,
        |       count(*) OVER () AS n
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin),

    // P17 scale path — id-range batching: pure projection, no global sort.
    // The oracle restates the same closed form over min/max bounds.
    "p17_dense_batches" -> entry(
      (s, dir) => {
        Genesis.assignBatchesDense(tbl(s, dir, "orders"), "o_orderkey",
            batchSize = 1000, totalSeconds = 86400)
          .select(col("o_orderkey"), col("__batch").as("batch"),
            col("__delay_seconds").as("delay_s"))
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey, (o_orderkey - mn) // 1000 AS batch,
        | CAST(((o_orderkey - mn) // 1000) * (86400.0 / ((mx - mn) // 1000 + 1)) AS DOUBLE) AS delay_s
        |FROM orders, (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders)
        |ORDER BY o_orderkey""".stripMargin),

    // P22 — latency aggregation: min/max/avg publish latency per topic.
    // Latency carried as exact integral cents (round(value·100)).
    "p22_latency_agg" -> entry(
      (s, dir) => {
        tbl(s, dir, "events")
          .withColumn("lat_cents", round(col("value") * 100).cast("long"))
          .groupBy(col("event_type"))
          .agg(
            min(col("lat_cents")).as("min_lat"),
            max(col("lat_cents")).as("max_lat"),
            (sum(col("lat_cents")) / count(lit(1))).as("avg_lat"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      """SELECT event_type,
        | CAST(min(lat_cents) AS BIGINT) AS min_lat,
        | CAST(max(lat_cents) AS BIGINT) AS max_lat,
        | CAST(sum(lat_cents) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_lat,
        | count(*) AS n
        |FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS lat_cents FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  )
}

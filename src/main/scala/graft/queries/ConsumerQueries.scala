package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Q._
import graft.consumer.{ConsumerOps, Persistor}
import graft.codec.EnvelopeCodec

/** Consumer-side operators (SURVEY §2.2) exercised over the test tables.
  * `events` plays the incoming topic; per-user latest state plays the local
  * replica. All LWW decisions run on epoch-µs integers (see [[Q]]).
  */
object ConsumerQueries {

  /** events + epoch-µs column, the common base frame. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events").withColumn("us", unix_micros(col("ts")))

  /** Split `events` into a "local replica" (latest state per user before
    * the id midpoint) and an "incoming batch" (events after it). The
    * midpoint is a broadcast scalar, not a collect. */
  private def splitAtMidpoint(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = ev(s, dir)
    val cut = e.agg(floor(max(col("event_id")) / 2.0).as("cut"))
    val withCut = e.crossJoin(broadcast(cut))
    (withCut.filter(col("event_id") < col("cut")),
      withCut.filter(col("event_id") >= col("cut")))
  }

  private val latestSql = (pred: String) =>
    s"""SELECT user_id, us, value FROM (
       | SELECT r.user_id, r.us, r.value,
       |  row_number() OVER (PARTITION BY r.user_id ORDER BY r.us DESC, r.event_id DESC) AS rn
       | FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events) r, c
       | WHERE $pred) WHERE rn = 1""".stripMargin

  val all: Map[String, Entry] = Map(

    // C2 — keep-latest dedup within a batch: row_number over (key) ordered
    // by updated_at DESC with a deterministic tiebreak.
    "c02_keep_latest" -> entry(
      (s, dir) => {
        ConsumerOps.keepLatest(ev(s, dir),
            keyCols = Seq("user_id", "event_type"),
            orderCol = "us", tiebreak = Seq(col("event_id")))
          .select(col("user_id"), col("event_type"), col("event_id"),
            col("value"), col("us"))
          .orderBy(col("user_id"), col("event_type"))
      },
      """SELECT user_id, event_type, event_id, value, us FROM (
        | SELECT user_id, event_type, event_id, value, epoch_us(ts) AS us,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |                     ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        | FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),

    // C3/C4 — envelope codec round trip: encode rows into the wire JSON
    // envelope, decode back, parse payloads. The oracle is the identity
    // projection — decode(encode(x)) must equal x.
    "c03_envelope_roundtrip" -> entry(
      (s, dir) => {
        val payload = ev(s, dir).select(
          lit("event_created").as("event"),
          lit("Event").as("model_name"),
          array(to_json(struct(
            col("event_id"), col("event_type"), col("value"),
            get_json_object(col("props"), "$.k").cast("long").as("k")))).as("data"))
        // the engine's consume path for its own wire: single-record
        // envelopes decode via the fused no-generator fast path. The wire
        // is materialized between the halves — producer and consumer are
        // separate queries over a real topic, never one fused expression
        // tree (fused, Catalyst would inline the encode into every
        // decode-side JSON path reference and re-encode per reference)
        val wire = EnvelopeCodec.encode(payload).select("value")
          .localCheckpoint(eager = false)
        val decoded = EnvelopeCodec.decodeSingleRecords(wire)
        decoded
          .withColumn("rec", from_json(col("payload_json"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "event_id LONG, event_type STRING, value DOUBLE, k LONG")))
          .select(col("rec.event_id").as("event_id"),
            col("rec.event_type").as("event_type"),
            col("rec.value").as("value"), col("rec.k").as("k"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, event_type, value, CAST(props->>'$.k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin),

    // C5 — reserved-attribute mapping: pure projection renames.
    "c05_reserved_attrs" -> entry(
      (s, dir) => {
        val base = ev(s, dir).select(
          col("event_id").as("id"),
          col("ts").as("created_at"), col("ts").as("updated_at"),
          lit(null).cast("timestamp").as("canceled_at"),
          col("event_type"))
        ConsumerOps.mapReservedAttrs(base)
          .select(col("synced_id"),
            unix_micros(col("synced_created_at")).as("created_us"),
            unix_micros(col("synced_updated_at")).as("updated_us"),
            col("event_type"))
          .orderBy(col("synced_id"))
      },
      """SELECT event_id AS synced_id, epoch_us(ts) AS created_us,
        | epoch_us(ts) AS updated_us, event_type
        |FROM events ORDER BY synced_id""".stripMargin),

    // C6 — message filter with quarantine side-output: the kept flow.
    "c06_message_filter" -> entry(
      (s, dir) => {
        val (kept, _) = ConsumerOps.messageFilter(ev(s, dir),
          drop = col("value") > 150.0 || col("event_type") === "error")
        kept.select(col("event_id"), col("event_type"), col("value"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, event_type, value FROM events
        |WHERE NOT (value > 150.0 OR event_type = 'error')
        |ORDER BY event_id""".stripMargin),

    // C7+C8 — the idempotency core: merge an incoming batch into the
    // replica under the staleness guard (stale events dropped, ties and
    // missing rows persist). Set-oriented single-shuffle merge.
    "c07_merge_lww" -> entry(
      (s, dir) => {
        val (before, after) = splitAtMidpoint(s, dir)
        val target = ConsumerOps.keepLatest(before, Seq("user_id"), "us", Seq(col("event_id")))
          .select(col("user_id").as("synced_id"),
            col("ts").as("synced_updated_at"), col("ts").as("synced_created_at"),
            lit(null).cast("timestamp").as("synced_canceled_at"),
            col("value"))
        val updates = ConsumerOps.keepLatest(after, Seq("user_id"), "us", Seq(col("event_id")))
          .select(col("user_id").as("synced_id"),
            col("ts").as("synced_updated_at"), col("ts").as("synced_created_at"),
            lit(null).cast("timestamp").as("canceled_at"),
            lit("updated").as("event_type"),
            col("value"))
        Persistor.merge(target, updates)
          .select(col("synced_id"), col("value"),
            unix_micros(col("synced_updated_at")).as("state_us"))
          .orderBy(col("synced_id"))
      },
      s"""WITH c AS (SELECT CAST(floor(max(event_id) / 2.0) AS BIGINT) AS cut FROM events),
        |loc AS (${latestSql("r.event_id < c.cut")}),
        |inc AS (${latestSql("r.event_id >= c.cut")})
        |SELECT coalesce(inc.user_id, loc.user_id) AS synced_id,
        | CASE WHEN inc.user_id IS NOT NULL AND (loc.user_id IS NULL OR inc.us >= loc.us)
        |      THEN inc.value ELSE loc.value END AS value,
        | CASE WHEN inc.user_id IS NOT NULL AND (loc.user_id IS NULL OR inc.us >= loc.us)
        |      THEN inc.us ELSE loc.us END AS state_us
        |FROM loc FULL JOIN inc ON loc.user_id = inc.user_id
        |ORDER BY synced_id""".stripMargin),

    // C9 — soft-delete resolution: latest event per user decides the
    // canceled state ('error' plays _destroyed); a later live event
    // restores (clears) it.
    "c09_soft_delete" -> entry(
      (s, dir) => {
        ConsumerOps.keepLatest(ev(s, dir), Seq("user_id"), "us", Seq(col("event_id")))
          .select(col("user_id"),
            when(col("event_type") === "error", col("us")).as("canceled_us"),
            col("event_type").as("last_event"))
          .orderBy(col("user_id"))
      },
      """SELECT user_id,
        | CASE WHEN event_type = 'error' THEN us END AS canceled_us,
        | event_type AS last_event
        |FROM (SELECT user_id, event_type, epoch_us(ts) AS us,
        |       row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin),

    // C11 — to-many disassociation: children of touched parents not in the
    // incoming id list are dropped (anti-join), untouched parents keep all.
    "c11_antijoin_disassoc" -> entry(
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        val o = tbl(s, dir, "orders")
        val incoming = li
          .join(o.filter(col("o_orderstatus") === "O"),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
          .filter(col("l_linenumber") <= 3)
          .select(col("l_orderkey"), col("l_linenumber"))
        Persistor.disassociateMissingChildren(
            li.select(col("l_orderkey"), col("l_linenumber")),
            incoming, "l_orderkey", "l_linenumber")
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      """WITH touched AS (
        | SELECT DISTINCT l_orderkey FROM lineitem
        | WHERE l_linenumber <= 3
        |   AND l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'))
        |SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_orderkey NOT IN (SELECT l_orderkey FROM touched)
        |UNION ALL
        |SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_orderkey IN (SELECT l_orderkey FROM touched) AND l_linenumber <= 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // C12 — change tracking: diff post-merge state against the pre-merge
    // snapshot, one row per changed attribute.
    "c12_local_changes" -> entry(
      (s, dir) => {
        val (before, after) = splitAtMidpoint(s, dir)
        val pre = ConsumerOps.keepLatest(before, Seq("user_id"), "us", Seq(col("event_id")))
          .select(col("user_id").as("synced_id"), col("value"))
        val post = ConsumerOps.keepLatest(
            before.unionByName(after), Seq("user_id"), "us", Seq(col("event_id")))
          .select(col("user_id").as("synced_id"), col("value"))
        Persistor.localChanges(pre, post, Seq("value"))
          .select(col("synced_id"), explode(col("local_changes")).as(Seq("attr", "change")))
          .select(col("synced_id"), col("attr"),
            element_at(col("change"), 1).as("old"), element_at(col("change"), 2).as("new"))
          .orderBy(col("synced_id"), col("attr"))
      },
      s"""WITH c AS (SELECT CAST(floor(max(event_id) / 2.0) AS BIGINT) AS cut FROM events),
        |pre AS (${latestSql("r.event_id < c.cut")}),
        |post AS (${latestSql("TRUE")})
        |SELECT post.user_id AS synced_id, 'value' AS attr,
        | CAST(pre.value AS VARCHAR) AS old, CAST(post.value AS VARCHAR) AS new
        |FROM post LEFT JOIN pre ON post.user_id = pre.user_id
        |WHERE pre.value IS DISTINCT FROM post.value
        |ORDER BY synced_id, attr""".stripMargin),

    // C10 — bulk destroy (import mode): soft-delete every key in the
    // incoming id set, set-oriented.
    "c10_bulk_destroy" -> entry(
      (s, dir) => {
        val replica = tbl(s, dir, "customer").select(
          col("c_custkey").as("synced_id"), col("c_name"),
          lit(null).cast("timestamp").as("synced_canceled_at"))
        val ids = tbl(s, dir, "customer")
          .filter(col("c_acctbal") < 0).select(col("c_custkey").as("synced_id"))
        Persistor.bulkDestroy(replica, ids, hard = false,
            now = lit("2026-01-01 00:00:00").cast("timestamp"))
          .select(col("synced_id"), col("c_name"),
            unix_micros(col("synced_canceled_at")).as("canceled_us"))
          .orderBy(col("synced_id"))
      },
      """SELECT c_custkey AS synced_id, c_name,
        | CASE WHEN c_acctbal < 0 THEN epoch_us(TIMESTAMP '2026-01-01') END AS canceled_us
        |FROM customer ORDER BY synced_id""".stripMargin),

    // C16 — backfill local columns from the stored raw payload JSON.
    "c16_synced_data_backfill" -> entry(
      (s, dir) => {
        val withPayload = ev(s, dir).withColumn("synced_data", col("props"))
        ConsumerOps.backfillFromSyncedData(withPayload, Seq("k"))
          .select(col("event_id"), col("k").cast("long").as("k"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin),

    // C16 in VARIANT mode (SURVEY §7.4 hard-part 3's idiomatic Spark-4
    // choice for synced_data): the payload is parsed ONCE into the
    // binary variant encoding and fields are extracted with
    // try_variant_get — no per-extraction JSON re-parse. Same oracle as
    // the STRING mode: scalar extraction must be mode-invariant.
    "c16_variant_backfill" -> entry(
      (s, dir) => {
        val withPayload = ev(s, dir)
          .withColumn("synced_data", parse_json(col("props")))
        ConsumerOps.backfillFromSyncedData(withPayload, Seq("k"))
          .select(col("event_id"), col("k").cast("long").as("k"))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin)
  )
}

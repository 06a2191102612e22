package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.consumer.ConsumerOps
import graft.streaming.ParquetReplica

/** Spark-4 VARIANT mode for `synced_data` (SURVEY §7.4 hard-part 3's
  * idiomatic choice): the replica stores the raw payload as the binary
  * variant encoding instead of a JSON STRING. These tests pin the
  * contract that makes the mode safe to swap in:
  *
  *  1. the full merge lifecycle (fresh win / stale loss / null-ts
  *     persist / soft delete) produces the SAME state in both modes,
  *     CoW and MoR — including MoR reads that fold a live delta log
  *     through the variant-aware reconcile comparator;
  *  2. C16 backfill extraction of scalar fields is mode-invariant
  *     (get_json_object over STRING ≡ try_variant_get over VARIANT)
  *     across the awkward JSON shapes (missing keys, explicit nulls,
  *     quotes/unicode/escapes, numbers);
  *  3. the variant reconcile stays DETERMINISTIC when one epoch holds
  *     several rows of a key with equal LWW timestamps — repeated
  *     reads return one stable winner (the default-mode guarantee the
  *     canonical-JSON tiebreak `k` replaces).
  */
class VariantReplicaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val stringDdl =
    "synced_id BIGINT, synced_updated_at TIMESTAMP, " +
      "synced_created_at TIMESTAMP, synced_canceled_at TIMESTAMP, " +
      "value DOUBLE, synced_data STRING"
  private val variantDdl = stringDdl.replace(
    "synced_data STRING", "synced_data VARIANT")

  /** Shaped update rows with a JSON payload column (STRING form). */
  private def upd(rows: (Long, String, String, Double, String)*): DataFrame =
    rows.toSeq
      .map { case (id, u, e, v, json) =>
        (id, ts(u), ts(u), null.asInstanceOf[Timestamp], e, v, json) }
      .toDF("synced_id", "synced_updated_at", "synced_created_at",
        "canceled_at", "event_type", "value", "synced_data")

  private def asVariant(df: DataFrame): DataFrame =
    df.withColumn("synced_data", parse_json(col("synced_data")))

  /** Canonical readback: variant rendered through its extracted scalars
    * so both modes compare on identical types. */
  private def canon(df: DataFrame): Set[(Long, Long, Boolean, Double, String, String)] =
    ConsumerOps.backfillFromSyncedData(df, Seq("a", "b"))
      .select(col("synced_id"), unix_micros(col("synced_updated_at")),
        col("synced_canceled_at").isNotNull, col("value"),
        col("a"), col("b"))
      .as[(Long, Long, Boolean, Double, String, String)]
      .collect().toSet

  private val lifecycle: Seq[DataFrame] = Seq(
    upd((1L, "2024-01-01 00:00:00", "created", 1.0, """{"a":"x1","b":"10"}"""),
        (2L, "2024-01-01 00:00:00", "created", 2.0, """{"a":"x2","b":"20"}"""),
        (3L, "2024-01-01 00:00:00", "created", 3.0, """{"a":"x3","b":"30"}""")),
    // fresh win on 1, stale loss on 2
    upd((1L, "2024-02-01 00:00:00", "updated", 11.0, """{"a":"y1","b":"11"}"""),
        (2L, "2023-12-01 00:00:00", "updated", 22.0, """{"a":"y2","b":"22"}""")),
    // soft delete 3
    upd((3L, "2024-03-01 00:00:00", "destroyed", 3.0, """{"a":"x3","b":"30"}""")))

  private def drive(replica: ParquetReplica, variant: Boolean): Unit =
    lifecycle.foreach(b => replica.merge(if (variant) asVariant(b) else b))

  test("merge lifecycle is mode-invariant: STRING vs VARIANT, CoW and MoR") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-variant-replica").toString
    val sCow = new ParquetReplica(spark, s"$tmp/s-cow", stringDdl, buckets = 4)
    val vCow = new ParquetReplica(spark, s"$tmp/v-cow", variantDdl, buckets = 4)
    // compactEvery high: the MoR reads below must FOLD the delta log
    // (the variant comparator path), not a compacted base
    val sMor = new ParquetReplica(spark, s"$tmp/s-mor", stringDdl,
      buckets = 4, mergeOnRead = true, compactEvery = 100)
    val vMor = new ParquetReplica(spark, s"$tmp/v-mor", variantDdl,
      buckets = 4, mergeOnRead = true, compactEvery = 100)
    drive(sCow, variant = false); drive(vCow, variant = true)
    drive(sMor, variant = false); drive(vMor, variant = true)
    assert(vMor.deltaEntries(vMor.currentVersion).size == 3,
      "MoR read must reconcile a live delta log")
    val expect = canon(sCow.read())
    assert(canon(vCow.read()) == expect, "variant CoW diverged")
    assert(canon(sMor.read()) == expect, "string MoR diverged")
    assert(canon(vMor.read()) == expect, "variant MoR diverged")
    // the soft delete landed and payloads survived the binary encoding
    assert(expect.exists { case (id, _, canceled, _, _, _) => id == 3L && canceled })
    assert(expect.exists { case (id, _, _, _, a, b) => id == 1L && a == "y1" && b == "11" })
  }

  test("C16 backfill extraction is mode-invariant on awkward scalar shapes") {
    val payloads = Seq(
      """{"a":"plain","b":"7"}""",
      """{"a":"qu\"ote","b":"-3"}""",
      """{"a":"unié中","b":"0"}""",
      """{"a":null,"b":"9"}""",   // explicit null
      """{"b":"5"}""",            // missing key
      """{"a":"1.25","b":"1e3"}""",
      """{"a":"tab\tnewline\n","b":"42"}""")
    val df = payloads.zipWithIndex
      .map { case (j, i) => (i.toLong, j) }.toDF("synced_id", "synced_data")
    val viaString = ConsumerOps.backfillFromSyncedData(df, Seq("a", "b"))
      .select("synced_id", "a", "b")
      .as[(Long, Option[String], Option[String])].collect().toSet
    val viaVariant = ConsumerOps.backfillFromSyncedData(asVariant(df), Seq("a", "b"))
      .select("synced_id", "a", "b")
      .as[(Long, Option[String], Option[String])].collect().toSet
    assert(viaString == viaVariant)
  }

  test("C16 invariance holds for UNQUOTED numeric scalars; the one " +
      "divergence (decimals beyond double precision) is pinned") {
    // round-12 advice: the invariance claim was only exercised on quoted
    // strings. Measured: Jackson (get_json_object) and the variant
    // decoder NORMALIZE unquoted numbers identically — exponent forms,
    // trailing zeros, int-vs-decimal, negative exponents, longs past
    // 2^53, booleans. The ONLY divergence is a decimal literal with more
    // significant digits than a double holds: Jackson parses it to
    // double (truncates at 17), variant stores decimal(38) and keeps
    // every digit. Both behaviors pinned here so the contract is
    // narrowed, not asserted wholesale.
    val agree = Seq(
      """{"n":1e3}""",      // exponent → 1000.0 in both
      """{"n":1.50}""",     // trailing zero → 1.5 in both
      """{"n":1000}""",     // int stays int-rendered
      """{"n":-2.5E-3}""",  // negative exponent → -0.0025 in both
      """{"n":9007199254740993}""",      // past 2^53, still long-exact
      """{"n":12345678901234567890}""",  // past Long.Max, decimal-exact
      """{"n":1E20}""",     // large exponent → 1.0E20 in both
      """{"n":true}""",     // non-numeric unquoted scalar
      """{"n":0.1}""")
    val df = agree.zipWithIndex.map { case (j, i) => (i.toLong, j) }
      .toDF("synced_id", "synced_data")
    def extract(d: DataFrame) =
      ConsumerOps.backfillFromSyncedData(d, Seq("n"))
        .select("synced_id", "n")
        .as[(Long, Option[String])].collect().toSet
    assert(extract(df) == extract(asVariant(df)),
      "unquoted numeric scalars diverged between modes")

    // the pinned divergence: 25 significant digits
    val hp = Seq((0L, """{"n":3.141592653589793238462643}"""))
      .toDF("synced_id", "synced_data")
    val viaString = extract(hp).head._2.get
    val viaVariant = extract(asVariant(hp)).head._2.get
    assert(viaString == "3.141592653589793",
      s"Jackson double truncation changed: $viaString")
    assert(viaVariant == "3.141592653589793238462643",
      s"variant decimal(38) fidelity changed: $viaVariant")
  }

  test("open-time type check fails fast on a mode toggle; migrateColumn " +
      "converts in place and back") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-variant-migrate").toString
    val asString = new ParquetReplica(spark, tmp, stringDdl,
      buckets = 4, mergeOnRead = true, compactEvery = 100)
    drive(asString, variant = false)
    val expect = canon(asString.read())

    // same root reopened with the VARIANT DDL: reads would force STRING
    // pages through the variant reader — the check must refuse
    val toggled = new ParquetReplica(spark, tmp, variantDdl, buckets = 4)
    val err = intercept[IllegalStateException](toggled.verifyStoredCompatible())
    assert(err.getMessage.contains("synced_data"))
    assert(err.getMessage.contains("migrate"))
    // while the correctly-typed open passes, on the same data
    asString.verifyStoredCompatible()

    // migrate → variant: stored type flips, state (canon) is preserved,
    // the new version folds the MoR delta log (delta-free), and the
    // variant-typed open check now passes
    toggled.migrateColumn(stringDdl, "synced_data", parse_json)
    toggled.verifyStoredCompatible()
    assert(toggled.storedSchema.get("synced_data").dataType
      .isInstanceOf[org.apache.spark.sql.types.VariantType])
    assert(toggled.deltaEntries(toggled.currentVersion).isEmpty,
      "migration must fold the delta log into the new version")
    assert(canon(toggled.read()) == expect, "migration changed state")
    // further merges in the new mode work against the migrated base
    toggled.merge(asVariant(upd(
      (1L, "2024-04-01 00:00:00", "updated", 12.0,
        """{"a":"z1","b":"12"}"""))))
    val variantState = canon(toggled.read())
    assert(variantState.exists {
      case (id, _, _, v, a, _) => id == 1L && v == 12.0 && a == "z1" })

    // and back to STRING (canonical to_json text — extraction-equal)
    val back = new ParquetReplica(spark, tmp, stringDdl, buckets = 4)
    back.migrateColumn(variantDdl, "synced_data", to_json)
    back.verifyStoredCompatible()
    assert(canon(back.read()) == variantState,
      "round-trip migration changed extracted state")
  }

  test("open-time type check permits pure column ADDITIONS (schema " +
      "evolution carve-out)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-variant-evolve").toString
    val v1 = new ParquetReplica(spark, tmp, stringDdl, buckets = 4)
    drive(v1, variant = false)
    // same root, one NEW column appended: must open cleanly (stored
    // files without the column read back as nulls) and keep merging
    val v2 = new ParquetReplica(spark, tmp,
      stringDdl + ", extra_score DOUBLE", buckets = 4)
    v2.verifyStoredCompatible()
    val rows = v2.read()
    assert(rows.schema.fieldNames.contains("extra_score"))
    assert(rows.where(col("extra_score").isNotNull).count() == 0)
    assert(rows.count() == 3)
  }

  test("variant reconcile is deterministic under same-epoch LWW ties") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-variant-tie").toString
    val r = new ParquetReplica(spark, tmp, variantDdl,
      buckets = 2, mergeOnRead = true, compactEvery = 100)
    // one epoch, one key, three rows with IDENTICAL timestamps and
    // different payloads — the tiebreak must pick one stable winner
    r.merge(asVariant(upd(
      (7L, "2024-01-01 00:00:00", "created", 1.0, """{"a":"p","b":"1"}"""),
      (7L, "2024-01-01 00:00:00", "created", 2.0, """{"a":"q","b":"2"}"""),
      (7L, "2024-01-01 00:00:00", "created", 3.0, """{"a":"r","b":"3"}"""))))
    val first = canon(r.read())
    assert(first.size == 1)
    (1 to 3).foreach { i =>
      assert(canon(r.read()) == first, s"read $i flipped the tie winner")
    }
  }
}

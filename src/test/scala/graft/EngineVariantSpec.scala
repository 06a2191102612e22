package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.registry.{Attribute, ModelDef, Registry, TopicDef}

/** `EngineOptions.syncedDataVariant`: the full registry-driven engine
  * run — produce, decode, LWW merge with the variant-aware tiebreak,
  * MoR reconcile through the variant comparator, C12 local changes,
  * C14 consumed events — must land the SAME replica state as STRING
  * mode, with `synced_data` physically stored as VARIANT and C16
  * extraction working against the engine's own replica. */
class EngineVariantSpec extends SparkSpec {
  import spark.implicits._

  private val userDef = ModelDef("user",
    attributes = Seq(Attribute("total", org.apache.spark.sql.types.DoubleType)))
  private val reg = Registry("evar", Seq(TopicDef("users", Seq(userDef))))

  private final class Fixture(tag: String) {
    val tmp: String = Files.createTempDirectory(s"graft-evar-$tag").toString
    private val src = s"$tmp/src"

    def change(rows: Seq[(Long, Double, String)], file: String, ts: String): Unit =
      rows.toDF("id", "total", "__op")
        .select($"id", $"total", $"__op",
          lit(null).cast("timestamp").as("__old_canceled"),
          lit(null).cast("timestamp").as("__new_canceled"),
          lit(ts).cast("timestamp").as("__ts"))
        .write.parquet(s"$src/$file")

    val bindings: Engine.ModelBindings = new Engine.ModelBindings {
      def changes(s: org.apache.spark.sql.SparkSession, m: ModelDef) =
        s.readStream.schema(s.read.parquet(s"$src/f1").schema).parquet(s"$src/*")
      def snapshot(s: org.apache.spark.sql.SparkSession, m: ModelDef) =
        spark.emptyDataFrame
    }

    def opts(variant: Boolean): Engine.EngineOptions = Engine.EngineOptions(
      publishConsumedEvents = true, trackLocalChanges = true,
      mergeOnRead = true, replicaCompactEvery = 100, // reads must FOLD deltas
      syncedDataVariant = variant)

    def run(variant: Boolean): Engine.EngineResult =
      Engine.runAvailableNow(spark, reg, bindings, s"$tmp/work",
        options = opts(variant))
  }

  private def runEngine(variant: Boolean): (Fixture, Engine.EngineResult) = {
    val fx = new Fixture(variant.toString)
    fx.change(Seq((1L, 10.0, "insert"), (2L, 20.0, "insert"),
      (3L, 30.0, "insert")), "f1", "2026-06-01 00:00:00")
    fx.run(variant)
    // fresh win on 1, destroy 3; same-tick duplicate for 2 exercises the
    // payload tiebreak (event_type differs → deterministic either mode)
    fx.change(Seq((1L, 11.0, "update"), (3L, 30.0, "delete"),
      (2L, 20.0, "update")), "f2", "2026-06-02 00:00:00")
    (fx, fx.run(variant))
  }

  /** Consumed-event bus rows of a fixture, keyed for cross-mode compare:
    * (event_name, synced_id, canonicalized payload text). The payload is
    * re-canonicalized through parse_json→to_json on BOTH sides so the
    * compare is about CONTENT — the byte-level shape is asserted
    * separately. */
  private def consumedCanon(fx: Fixture) =
    spark.read.parquet(s"${fx.tmp}/work/consumed/*")
      .select(col("event_name"), col("synced_id"),
        to_json(parse_json(get_json_object(
          col("transformed_data"), "$.synced_data"))).as("payload"))
      .as[(String, Long, String)].collect().toSet

  test("engine run is mode-invariant and stores/extracts real variant") {
    val (_, sRes) = runEngine(variant = false)
    val (_, vRes) = runEngine(variant = true)
    val sRep = sRes.replicas("user").read()
    val vRep = vRes.replicas("user").read()

    // physical storage type actually flipped
    assert(sRep.schema("synced_data").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(vRep.schema("synced_data").dataType.isInstanceOf[
      org.apache.spark.sql.types.VariantType])

    // canonical readback: attributes + C16 extraction from the payload
    def canon(df: org.apache.spark.sql.DataFrame) =
      graft.consumer.ConsumerOps.backfillFromSyncedData(df, Seq("total"))
        .select(col("synced_id"), col("total").cast("double"),
          unix_micros(col("synced_updated_at")),
          col("synced_canceled_at").isNotNull)
        .as[(Long, Option[Double], Long, Boolean)].collect().toSet
    val s = canon(sRep)
    assert(canon(vRep) == s, "variant engine replica diverged from string mode")
    // the lifecycle landed: 1 updated, 3 soft-deleted
    assert(s.exists { case (id, t, _, c) => id == 1L && t.contains(11.0) && !c })
    assert(s.exists { case (id, _, _, c) => id == 3L && c })
    assert(s.size == 3)
  }

  test("C14 consumed-event wire shape is storage-mode-invariant") {
    // round-12 advice: variant mode used to inline synced_data as a
    // NESTED JSON OBJECT in transformed_data while string mode carries
    // it as a JSON-escaped string — a silent event-schema change for
    // every bus consumer. Pin (a) the byte-level shape: synced_data is
    // an escaped STRING field in both modes; (b) the content: both
    // modes publish the same payloads for the same lifecycle.
    val (sFx, _) = runEngine(variant = false)
    val (vFx, _) = runEngine(variant = true)
    val vRaw = spark.read.parquet(s"${vFx.tmp}/work/consumed/*")
      .select("transformed_data").as[String].collect()
    assert(vRaw.nonEmpty)
    vRaw.foreach { td =>
      assert(td.contains("\"synced_data\":\""),
        s"variant-mode event inlined synced_data as an object: $td")
      assert(!td.contains("\"synced_data\":{"),
        s"variant-mode event inlined synced_data as an object: $td")
    }
    assert(consumedCanon(vFx) == consumedCanon(sFx),
      "consumed-event payload content diverged between storage modes")
  }

  test("mode toggle on an existing workDir fails fast; migrateSyncedData " +
      "converts it and the engine resumes in the new mode") {
    val (fx, _) = runEngine(variant = false)

    // toggling the option without migrating must refuse at replica open,
    // before any merge touches the mistyped data
    val err = intercept[IllegalStateException](fx.run(variant = true))
    assert(err.getMessage.contains("synced_data"))
    assert(err.getMessage.contains("migrate"))

    // migrate, then the SAME workDir runs in variant mode: a third change
    // file merges on top of migrated state
    Engine.migrateSyncedData(spark, reg, s"${fx.tmp}/work", toVariant = true,
      options = fx.opts(variant = true))
    // idempotent: a second invocation is a no-op, not a crash or rewrite
    Engine.migrateSyncedData(spark, reg, s"${fx.tmp}/work", toVariant = true,
      options = fx.opts(variant = true))
    fx.change(Seq((2L, 21.0, "update")), "f3", "2026-06-03 00:00:00")
    val res = fx.run(variant = true)
    val rep = res.replicas("user").read()
    assert(rep.schema("synced_data").dataType.isInstanceOf[
      org.apache.spark.sql.types.VariantType])
    val state = graft.consumer.ConsumerOps
      .backfillFromSyncedData(rep, Seq("total"))
      .select(col("synced_id"), col("total").cast("double"),
        col("synced_canceled_at").isNotNull)
      .as[(Long, Option[Double], Boolean)].collect().toSet
    assert(state.size == 3, s"post-migration engine state diverged: $state")
    assert(state.exists { case (id, t, c) => id == 1L && t.contains(11.0) && !c })
    assert(state.exists { case (id, t, c) => id == 2L && t.contains(21.0) && !c })
    assert(state.exists { case (id, _, c) => id == 3L && c })
  }
}

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

  private def runEngine(variant: Boolean): (String, Engine.EngineResult) = {
    val tmp = Files.createTempDirectory(s"graft-evar-$variant").toString
    val src = s"$tmp/src"
    val userDef = ModelDef("user",
      attributes = Seq(Attribute("total", org.apache.spark.sql.types.DoubleType)))
    val reg = Registry("evar", Seq(TopicDef("users", Seq(userDef))))

    def change(rows: Seq[(Long, Double, String)], file: String, ts: String): Unit =
      rows.toDF("id", "total", "__op")
        .select($"id", $"total", $"__op",
          lit(null).cast("timestamp").as("__old_canceled"),
          lit(null).cast("timestamp").as("__new_canceled"),
          lit(ts).cast("timestamp").as("__ts"))
        .write.parquet(s"$src/$file")

    val bindings = new Engine.ModelBindings {
      def changes(s: org.apache.spark.sql.SparkSession, m: ModelDef) =
        s.readStream.schema(s.read.parquet(s"$src/f1").schema).parquet(s"$src/*")
      def snapshot(s: org.apache.spark.sql.SparkSession, m: ModelDef) =
        spark.emptyDataFrame
    }
    val opts = Engine.EngineOptions(
      publishConsumedEvents = true, trackLocalChanges = true,
      mergeOnRead = true, replicaCompactEvery = 100, // reads must FOLD deltas
      syncedDataVariant = variant)

    change(Seq((1L, 10.0, "insert"), (2L, 20.0, "insert"),
      (3L, 30.0, "insert")), "f1", "2026-06-01 00:00:00")
    Engine.runAvailableNow(spark, reg, bindings, s"$tmp/work", options = opts)
    // fresh win on 1, destroy 3; same-tick duplicate for 2 exercises the
    // payload tiebreak (event_type differs → deterministic either mode)
    change(Seq((1L, 11.0, "update"), (3L, 30.0, "delete"),
      (2L, 20.0, "update")), "f2", "2026-06-02 00:00:00")
    val res = Engine.runAvailableNow(spark, reg, bindings, s"$tmp/work",
      options = opts)
    (tmp, res)
  }

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
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // (key, us, id, v): entity key, event time µs, unique tiebreak, payload
  private def log(rows: (Long, Long, Long, String)*) =
    rows.toDF("k", "us", "id", "v")

  private def states(df: org.apache.spark.sql.DataFrame, cuts: Long*) =
    Temporal.asOfStates(df, "k", col("us"), col("id"), cuts,
        Seq("v" -> col("v")))
      .select(col("cutoff_us"), col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("asOfStates: latest event at or before each cutoff, per key") {
    val df = log((1L, 10L, 0L, "a"), (1L, 20L, 1L, "b"), (1L, 30L, 2L, "c"),
      (2L, 25L, 3L, "x"))
    assert(states(df, 5L) == Set.empty) // nobody exists yet
    assert(states(df, 10L) == Set((10L, 1L, "a"))) // inclusive cutoff
    assert(states(df, 24L) == Set((24L, 1L, "b")))
    assert(states(df, 99L, 25L) == Set(
      (25L, 1L, "b"), (25L, 2L, "x"),
      (99L, 1L, "c"), (99L, 2L, "x"))) // both cutoffs in one pass
  }

  test("asOfStates: equal timestamps resolve to the highest tiebreak") {
    val df = log((7L, 10L, 0L, "first"), (7L, 10L, 1L, "second"))
    assert(states(df, 10L) == Set((10L, 7L, "second")))
    assert(states(df, 11L) == Set((11L, 7L, "second")))
  }

  test("asOfStates: one row per (cutoff, key), never duplicates") {
    val df = log((1 to 50).map(i =>
      (i.toLong % 5, i.toLong, i.toLong, s"v$i")): _*)
    val out = Temporal.asOfStates(df, "k", col("us"), col("id"),
      Seq(13L, 27L, 49L), Seq("v" -> col("v")))
    assert(out.groupBy("cutoff_us", "k").count()
      .filter(col("count") > 1).isEmpty)
    // at us=49 all five keys exist; earlier cutoffs cover all keys too
    // (keys 0..4 all have an event by us=5)
    assert(out.count() == 15)
  }

  test("latenessHistogram: buckets per-key lateness by integer log2 seconds") {
    // key 1 arrivals (arr order): us = 10 s, 5 s (5 s late -> bucket 2),
    // 30 s (in order), 29 s (1 s late -> floor(log2(1+1)) = bucket 1),
    // key 2: single event (no prior max -> in-order)
    val M = 1000000L
    val df = Seq(
      (1L, 10L * M, 1L), (1L, 5L * M, 2L), (1L, 30L * M, 3L),
      (1L, 29L * M, 4L), (2L, 7L * M, 5L)).toDF("k", "us", "arr")
    val got = Temporal.latenessHistogram(df, "k", col("us"), col("arr"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(-1L -> 3L, 1L -> 1L, 2L -> 1L), got)
  }

  test("cdcMinimizeStreaming: shuffled multi-batch replay converges to the batch net") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import Temporal.{CdcOp, CdcNet}
    val tmp = java.nio.file.Files.createTempDirectory("graft-cdcmin").toString
    // key 1: I@0, U@1, U@2 -> insert with value of offset 2
    // key 2: U@0, D@5     -> delete (value null)
    // key 3: I@0, D@9     -> none
    // key 4: U@3, U@7     -> update with value of offset 7
    // delivered out of order ACROSS two micro-batches: the LAST offsets
    // land in batch 1, earlier ones in batch 2
    Seq(CdcOp(1L, 2L, "U", 12.0), CdcOp(2L, 5L, "D", 0.0),
      CdcOp(3L, 9L, "D", 0.0), CdcOp(4L, 7L, "U", 47.0))
      .toDF().write.parquet(s"$tmp/in/f1")
    Seq(CdcOp(1L, 0L, "I", 10.0), CdcOp(1L, 1L, "U", 11.0),
      CdcOp(2L, 0L, "U", 20.0), CdcOp(3L, 0L, "I", 30.0),
      CdcOp(4L, 3L, "U", 43.0))
      .toDF().write.parquet(s"$tmp/in/f2")
    val schema = spark.read.parquet(s"$tmp/in/f1").schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val q = Temporal.cdcMinimizeStreaming(in.as[CdcOp])
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("cdcmin_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // Update mode re-emits per batch — the LAST emission per key is the
    // converged net; pick it via max n_ops
    val finalNet = spark.table("cdcmin_out").as[CdcNet].collect()
      .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.n_ops) }
    assert(finalNet(1L) == CdcNet(1L, "insert", Some(12.0), 3L), finalNet(1L))
    assert(finalNet(2L) == CdcNet(2L, "delete", None, 2L), finalNet(2L))
    assert(finalNet(3L) == CdcNet(3L, "none", None, 2L), finalNet(3L))
    assert(finalNet(4L) == CdcNet(4L, "update", Some(47.0), 2L), finalNet(4L))
  }
}

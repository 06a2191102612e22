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
}

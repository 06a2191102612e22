package graft

import org.apache.spark.sql.functions._
import graft.ext.{Curation, Multimodal, Similarity, TextAnalysis, TextDedup}

/** Hash-based ext operators (rows-only in the oracle gate) verified here
  * with planted duplicates and hand-checkable fixtures. */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today", "a"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight", "a"), // near-dup of 1
    (3L, "completely different content about spark shuffles and partitions here", "a"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today", "b"), // exact dup of 1
    (5L, "unrelated words forming a separate document with its own vocabulary", "b"))
    .toDF("doc_id", "text", "source")

  test("shingles: short documents degrade to a single whole-text shingle") {
    val got = Seq("one", "one two", "one two three")
      .toDF("t").select(TextDedup.shingles($"t", 3).as("sh"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("one"))
    assert(got(1) == List("one two"))
    assert(got(2) == List("one two three"))
  }

  test("exact dedup groups identical content across blocks") {
    val got = TextDedup.exact(docs, "doc_id", "text")
      .filter($"n_copies" > 1).collect()
    assert(got.length == 1 && got(0).getAs[Long]("rep_id") == 1L
      && got(0).getAs[Long]("n_copies") == 2L)
  }

  test("streaming exact dedup drops cross-batch duplicates with bounded state") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    // two files = two micro-batches (maxFilesPerTrigger=1); the duplicate
    // content arrives in the SECOND batch and must be dropped by state
    Seq((1L, "alpha beta gamma", "2026-01-01 10:00:00"),
        (2L, "unrelated text here", "2026-01-01 10:00:01"))
      .toDF("doc_id", "text", "ts")
      .withColumn("ts", $"ts".cast("timestamp")).write.parquet(s"$tmp/in/f1")
    Seq((3L, "alpha beta gamma", "2026-01-01 10:00:02"),
        (4L, "fresh content", "2026-01-01 10:00:03"))
      .toDF("doc_id", "text", "ts")
      .withColumn("ts", $"ts".cast("timestamp")).write.parquet(s"$tmp/in/f2")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val q = TextDedup.exactStreaming(in, "doc_id", "text", "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val kept = spark.table("sdedup_out").select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) != kept.contains(3L),
      s"exactly one copy of the duplicate content must survive: $kept")
    assert(kept.contains(2L) && kept.contains(4L))
  }

  test("minhash LSH finds the planted near-dup and the exact dup") {
    val pairs = TextDedup.minhashLshPairs(docs, "doc_id", "text",
        k = 16, bands = 8, shingleN = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact dup must surface")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "near-dup must surface")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not pair")
  }

  test("simhash: identical docs 0 hamming; near-dups close; unrelated far") {
    val sh = docs.select($"doc_id", TextDedup.simhash($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
  }

  test("streaming near-dup: cross-batch and in-batch dominance on simhash bands") {
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = long.replace("omicron", "changed")
    // calibrate the operating point from the ACTUAL signature distance so
    // the test pins semantics, not a lucky hash
    val sigs = Seq(long, nearDup).toDF("t")
      .select(TextDedup.simhash($"t")).as[Long].collect()
    val h = math.max(1, java.lang.Long.bitCount(sigs(0) ^ sigs(1)))
    assert(h <= 15, s"one-token change moved $h bits — pick a longer fixture")
    val bands = Seq(2, 4, 8, 16, 32).find(_ > h).get
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndstream").toString
    Seq((1L, long, "2026-01-01 10:00:00"),
        (2L, "totally different words in this one entirely unrelated", "2026-01-01 10:00:01"))
      .toDF("doc_id", "text", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))
      .coalesce(1).write.parquet(s"$tmp/in/f1") // ONE file = one micro-batch
    Seq((3L, nearDup, "2026-01-01 10:00:02"),
        (4L, "fresh distinct content appears here now", "2026-01-01 10:00:03"),
        (5L, "fresh distinct content appears here now", "2026-01-01 10:00:04"))
      .toDF("doc_id", "text", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))
      .coalesce(1).write.parquet(s"$tmp/in/f2")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val q = TextDedup.nearDupStreaming(in, "doc_id", "text", "ts",
        maxHamming = h, bands = bands)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndstream_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update-mode sink may re-emit an id; the latest state has min kept
    val rows = spark.table("ndstream_out")
      .select($"id", $"dup_of", $"kept")
      .as[(Long, Option[Long], Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.minBy(_._3) }
    assert(rows(1L)._3 == 1L && rows(2L)._3 == 1L && rows(4L)._3 == 1L,
      s"originals must be kept: $rows")
    assert(rows(3L) == (3L, Some(1L), 0L),
      s"cross-batch near-dup must be flagged against doc 1: ${rows(3L)}")
    assert(rows(5L) == (5L, Some(4L), 0L),
      s"in-batch exact dup must be flagged against the earlier row: ${rows(5L)}")
  }

  test("streaming near-dup: hot-bucket flood stays capped, copies still flagged") {
    // a viral template: 60 identical docs across two batches, one band
    // bucket. With maxPerBucket=8 the band state must stop growing at 8
    // entries per band while every copy is still flagged against the
    // retained priors — and the vote stage must store NOTHING.
    val viral = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndcap").toString
    def write(f: String, ids: Range): Unit =
      ids.map(i => (i.toLong, viral, s"2026-01-01 10:00:${"%02d".format(i % 60)}"))
        .toDF("doc_id", "text", "ts")
        .withColumn("ts", $"ts".cast("timestamp"))
        .coalesce(1).write.parquet(s"$tmp/in/$f")
    write("f1", 1 to 30)
    write("f2", 31 to 60)
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val q = TextDedup.nearDupStreaming(in, "doc_id", "text", "ts",
        maxHamming = 3, bands = 4, maxPerBucket = 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndcap_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ndcap_out")
      .select($"id", $"dup_of", $"kept", $"bucket_overflow")
      .as[(Long, Option[Long], Long, Boolean)].collect()
      .map { case (i, d, k, o) => i -> ((d, k, o)) }.toMap
    assert(got(1L) == ((None, 1L, false)),
      s"first arrival is the original: ${got(1L)}")
    // every later copy is flagged against doc 1 — including arrivals far
    // past the cap and in the second batch (retained priors keep working)
    for (i <- 2L to 60L)
      assert((got(i)._1, got(i)._2) == ((Some(1L), 0L)), s"copy $i: ${got(i)}")
    // the recall-loss signal: docs 1..8 fill every bucket un-overflowed;
    // every arrival after the cap reports bucket_overflow (it was NOT
    // retained — a future near-dup of IT could go unflagged)
    for (i <- 1L to 8L)
      assert(!got(i)._3, s"doc $i arrived below the cap: ${got(i)}")
    for (i <- 9L to 60L)
      assert(got(i)._3, s"doc $i must report overflow: ${got(i)}")
    // state bound: identical docs share all 4 band buckets, each capped
    // at 8 entries -> ≤ 32 state rows in the band stage; the vote stage
    // stores nothing. (Progress metrics sum both stateful operators.)
    val prog = q.recentProgress.flatMap(_.stateOperators)
    assert(prog.nonEmpty)
    val maxRows = prog.map(_.numRowsTotal).max
    assert(maxRows <= 32, s"band state leaked past the cap: $maxRows rows")
  }

  test("naive oracles wire to declared queries and never shadow a SQL oracle") {
    // a typo'd key here would silently degrade a query to rows-only (or
    // dump an orphan artifact) — pin the wiring
    val q = SparkEntry.queries.keySet
    val sql = SparkEntry.oracleSql.keySet
    val naive = SparkEntry.naiveOracle.keySet
    assert(naive.subsetOf(q), s"orphan naive oracles: ${naive -- q}")
    assert((naive & sql).isEmpty,
      s"naive oracle shadows a DuckDB oracle: ${naive & sql}")
    // every declared query has exactly one oracle (DuckDB SQL or a
    // Spark-naive artifact) — zero rows-only entries since round 10
    assert(q -- sql -- naive == Set.empty,
      s"unexpected rows-only queries: ${q -- sql -- naive}")
  }

  test("streaming near-dup: restart from checkpoint keeps band state working") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndrestart").toString
    def write(f: String, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "ts")
        .withColumn("ts", $"ts".cast("timestamp"))
        .coalesce(1).write.parquet(s"$tmp/in/$f")
    def run(): Unit = {
      val in = spark.readStream
        .schema(spark.read.parquet(s"$tmp/in/f1").schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
      // a FILE sink (the memory sink cannot recover from a checkpoint;
      // append-mode output makes the parquet sink legal here)
      val q = TextDedup.nearDupStreaming(in, "doc_id", "text", "ts",
          maxHamming = 3, bands = 4)
        .writeStream.outputMode("append")
        .format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    write("f1", Seq((1L, a, "2026-01-01 10:00:00")))
    run() // first process lifetime: doc 1 enters band state
    write("f2", Seq((2L, a, "2026-01-01 10:00:05")))
    run() // second lifetime: the copy must flag against RESTORED state
    val got = spark.read.parquet(s"$tmp/out").select($"id", $"dup_of", $"kept")
      .as[(Long, Option[Long], Long)].collect()
      .map { case (i, d, k) => i -> ((d, k)) }.toMap
    assert(got(1L) == ((None, 1L)), got.toString)
    assert(got(2L) == ((Some(1L), 0L)),
      s"restored band state must flag the post-restart copy: ${got(2L)}")
  }

  test("streaming curation pipeline: quality gate → near-dup suppression end to end") {
    // the streaming ingest composition a training pipeline runs: a
    // stateless quality gate feeds the stateful near-dup suppressor —
    // junk never reaches (or pollutes) dedup state, copies are flagged
    // across batches, clean docs flow through
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndpipe").toString
    def write(f: String, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "ts")
        .withColumn("ts", $"ts".cast("timestamp"))
        .coalesce(1).write.parquet(s"$tmp/in/$f")
    write("f1", Seq(
      (1L, good, "2026-01-01 10:00:00"),
      (2L, "junk", "2026-01-01 10:00:01"))) // fails the length gate
    write("f2", Seq(
      (3L, good, "2026-01-01 10:00:02"), // near-dup of 1, cross-batch
      (4L, "totally different unrelated words appear in here", "2026-01-01 10:00:03")))
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val gated = in.filter(size(split($"text", " ")) >= 5)
    val q = TextDedup.nearDupStreaming(gated, "doc_id", "text", "ts",
        maxHamming = 3, bands = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndpipe_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ndpipe_out").select($"id", $"dup_of", $"kept")
      .as[(Long, Option[Long], Long)].collect()
      .map { case (i, d, k) => i -> ((d, k)) }.toMap
    assert(!got.contains(2L), "gated junk must never reach the suppressor")
    assert(got(1L) == ((None, 1L)) && got(4L) == ((None, 1L)), got.toString)
    assert(got(3L) == ((Some(1L), 0L)),
      s"cross-batch copy must flag through the composed pipeline: ${got(3L)}")
  }

  test("streaming near-dup matches naive hamming dominance on one batch") {
    val rnd = new scala.util.Random(37L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc() = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (1L to 25L).map(i => (i, doc()))
    // plant exact and near copies so the dominance graph is non-trivial
    val rows = base ++ Seq(
      (26L, base(0)._2), (27L, base(0)._2),
      (28L, base(5)._2.replace(base(5)._2.split(" ").head, "nu")))
    val df = rows.toDF("doc_id", "text")
    val sigs = df.select($"doc_id", TextDedup.simhash($"text"))
      .as[(Long, Long)].collect().toMap
    val maxHamming = 3
    val naive = rows.map(_._1).map { id =>
      val doms = rows.map(_._1).filter(j => j < id &&
        java.lang.Long.bitCount(sigs(j) ^ sigs(id)) <= maxHamming)
      id -> (if (doms.isEmpty) None else Some(doms.min))
    }.toMap
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndeq").toString
    df.withColumn("ts",
        timestamp_seconds(lit(1767261600L) + $"doc_id")) // distinct event times
      .coalesce(1).write.parquet(s"$tmp/in/f1")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .parquet(s"$tmp/in/*")
    val q = TextDedup.nearDupStreaming(in, "doc_id", "text", "ts",
        maxHamming = maxHamming, bands = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndeq_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ndeq_out").select($"id", $"dup_of")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == naive,
      s"diff: ${(got.toSet diff naive.toSet).take(3)} vs ${(naive.toSet diff got.toSet).take(3)}")
    assert(naive.values.count(_.isDefined) >= 2, "fixture must plant dups")
  }

  test("streaming near-dup: event-time expiry forgets originals, fresh state works") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndexp").toString
    def write(f: String, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "ts")
        .withColumn("ts", $"ts".cast("timestamp"))
        .coalesce(1).write.parquet(s"$tmp/in/$f")
    write("f1", Seq((1L, a, "2026-01-01 10:00:00")))
    // unrelated doc an hour later advances the watermark past doc 1's
    // timestamp + the 10-minute expiry
    write("f2", Seq((2L, "totally different unrelated words here", "2026-01-01 11:00:00")))
    // doc 3 duplicates doc 1 AFTER its expiry → kept; doc 4 duplicates
    // doc 3 within the window → flagged against the fresh state
    write("f3", Seq((3L, a, "2026-01-01 11:05:00"),
      (4L, a, "2026-01-01 11:06:00")))
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    // see the nearDupStreaming scaladoc: the downstream per-doc vote
    // never evicts by watermark, so the conservative check doesn't apply
    val check = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(check, "false")
    try {
      val q = TextDedup.nearDupStreaming(in, "doc_id", "text", "ts",
          maxHamming = 3, bands = 4,
          expireAfter = Some(java.time.Duration.ofMinutes(10)))
        .writeStream.outputMode("append")
        .format("memory").queryName("ndexp_out")
        .option("checkpointLocation", s"$tmp/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally spark.conf.unset(check)
    val rows = spark.table("ndexp_out")
      .select($"id", $"dup_of", $"kept")
      .as[(Long, Option[Long], Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.minBy(_._3) }
    assert(rows(1L)._3 == 1L && rows(2L)._3 == 1L)
    assert(rows(3L)._3 == 1L,
      s"the original expired ${rows(3L)} — its late duplicate must pass")
    assert(rows(4L) == (4L, Some(3L), 0L),
      s"in-window duplicate must be flagged against fresh state: ${rows(4L)}")
  }

  test("streaming near-dup: out-of-order replay drops and duplicates NO verdicts" +
      " with the correctness check disabled") {
    // WHY the disabled check is safe (the proof the scaladoc promises):
    // Spark's statefulOperator.checkCorrectness guards a DOWNSTREAM
    // watermark-EVICTING stateful operator against upstream emissions
    // arriving behind its watermark — state it already evicted can no
    // longer answer them. The per-doc vote stage here stores nothing and
    // evicts nothing (every band verdict of a document is emitted in the
    // document's own arrival batch), so a "late" emission has no evicted
    // state to miss: it is simply processed in its arrival batch. This
    // replay makes that observable: a LATE event-time arrival (behind a
    // later doc's event time, ahead of the watermark) still produces
    // exactly ONE verdict, correct against the retained priors — nothing
    // dropped, nothing double-emitted, matching the sequential
    // in-arrival-order dominance computed independently below.
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "totally different unrelated words appear in this text here"
    val e = "yet another completely separate document body sits right here"
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndooo").toString
    def write(f: String, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "ts")
        .withColumn("ts", $"ts".cast("timestamp"))
        .coalesce(1).write.parquet(s"$tmp/in/$f")
    write("f1", Seq((1L, a, "2026-01-01 10:00:00"),
      (2L, b, "2026-01-01 10:20:00")))
    // doc 3 arrives in batch 2 with an EVENT time before doc 2's — late,
    // but ahead of the 30-min watermark, so nothing may drop it
    write("f2", Seq((3L, a, "2026-01-01 10:05:00")))
    write("f3", Seq((4L, a, "2026-01-01 10:25:00"),
      (5L, e, "2026-01-01 10:21:00")))
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val check = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(check, "false")
    try {
      val q = TextDedup.nearDupStreaming(in, "doc_id", "text", "ts",
          maxHamming = 3, bands = 4,
          expireAfter = Some(java.time.Duration.ofMinutes(30)))
        .writeStream.outputMode("append")
        .format("memory").queryName("ndooo_out")
        .option("checkpointLocation", s"$tmp/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally spark.conf.unset(check)
    val all = spark.table("ndooo_out")
      .select($"id", $"dup_of", $"kept")
      .as[(Long, Option[Long], Long)].collect()
    // EXACTLY one verdict per document: the stateless vote emitted every
    // arrival once — no late-drop, no re-emission
    assert(all.length == 5 && all.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L),
      s"verdict multiset broken: ${all.toList.sortBy(_._1)}")
    val got = all.map { case (i, d, k) => i -> ((d, k)) }.toMap
    // sequential in-arrival-order dominance (the operator's contract):
    // 3 and 4 are copies of 1 (within expiry at their event times)
    assert(got(1L) == ((None, 1L)) && got(2L) == ((None, 1L)) &&
      got(5L) == ((None, 1L)), got.toString)
    assert(got(3L) == ((Some(1L), 0L)),
      s"the LATE arrival's verdict must not be dropped: ${got(3L)}")
    assert(got(4L) == ((Some(1L), 0L)), got.toString)
  }

  test("containmentPairs: sub-document copies score 1.0 where Jaccard stays low") {
    import graft.ext.TextDedup
    val long =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val short = "alpha beta gamma delta epsilon zeta eta theta" // a prefix
    val d = Seq((1L, long, "a"), (2L, short, "a"),
      (3L, "totally different words in this one entirely", "a"))
      .toDF("doc_id", "text", "source")
    val got = TextDedup.containmentPairs(d, "doc_id", "text", "source",
      n = 3, threshold = 0.8).collect()
    assert(got.length == 1 &&
      got(0).getAs[Long]("id_a") == 1L && got(0).getAs[Long]("id_b") == 2L &&
      got(0).getAs[Double]("containment") == 1.0, got.mkString(","))
    // the same pair is invisible to the symmetric Jaccard at any
    // comparable threshold — the union denominator dilutes it
    val jac = TextDedup.ngramJaccardPairs(d, "doc_id", "text", "source",
      n = 3, threshold = 0.8).collect()
    assert(jac.isEmpty, jac.mkString(","))
  }

  test("length banding: no true pair can land more than one band apart (exhaustive at θ=0.9)") {
    import graft.ext.TextDedup
    val theta = 0.9
    val w = TextDedup.bandWidthFor(theta)
    def bandOf(sz: Long): Long = math.floor(math.log(sz.toDouble) / w).toLong
    // every admissible size pair: jac >= θ forces max/min <= 1/θ; the
    // banded join must see all of them within one band — exhaustive over
    // small sizes, then a boundary sweep at large ones
    for (a <- 1L to 2000L; b <- a to (a / theta).toLong)
      assert(math.abs(bandOf(b) - bandOf(a)) <= 1,
        s"sizes ($a, $b): bands ${bandOf(a)}, ${bandOf(b)}")
    for (a <- Seq(10000L, 123457L, 10000000L, 999999937L)) {
      val b = (a / theta).toLong // the worst admissible ratio
      assert(math.abs(bandOf(b) - bandOf(a)) <= 1, s"boundary at $a")
    }
  }

  test("lengthBanded ngramJaccardPairs ≡ unbanded (zero true-pair loss) and cuts candidates") {
    import graft.ext.TextDedup
    val rnd = new scala.util.Random(7)
    // one giant block with a wide length spread + planted near-dups: the
    // shape banding exists for
    val base = (1 to 300).map { i =>
      val len = 5 + rnd.nextInt(200)
      (i.toLong, (1 to len).map(_ => s"w${rnd.nextInt(500)}").mkString(" "))
    }
    val dups = base.filter(_._1 % 7 == 0).map { case (id, text) =>
      val toks = text.split(" ")
      // drop one token: stays above 0.9 Jaccard for longer docs
      (id + 10000L, toks.drop(1).mkString(" "))
    }
    val df = (base ++ dups).map { case (id, t) => (id, t, "blk") }
      .toDF("doc_id", "text", "source")
    def pairs(banded: Boolean) =
      TextDedup.ngramJaccardPairs(df, "doc_id", "text", "source",
          n = 1, threshold = 0.9, lengthBanded = banded)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val (unbanded, banded) = (pairs(false), pairs(true))
    assert(unbanded.nonEmpty, "corpus must contain true near-dup pairs")
    assert(banded == unbanded,
      s"banding changed the result: only-unbanded=${(unbanded -- banded).take(5)} " +
        s"only-banded=${(banded -- unbanded).take(5)}")
    // the point of the band: candidate fan-out (pairs entering the
    // merge-walk) drops hard on a block with a wide length spread
    def candidates(bw: Option[Double]): Long = {
      val (a, b) = TextDedup.blockedShinglePairSides(
        df, "doc_id", "text", "source", 1, 0, bw)
      a.join(b, Seq("block")).filter($"id_a" < $"id_b").count()
    }
    val (cu, cb) =
      (candidates(None), candidates(Some(TextDedup.bandWidthFor(0.9))))
    assert(cb < cu / 4,
      s"banding must cut candidates ≥4× on this corpus: $cb vs $cu")
  }

  test("containment minGrams floor: degenerate docs drop, surviving pairs unchanged") {
    import graft.ext.TextDedup
    val rnd = new scala.util.Random(11)
    val normal = (1 to 60).map { i =>
      (i.toLong, (1 to 30 + rnd.nextInt(30)).map(_ => s"w${rnd.nextInt(80)}").mkString(" "))
    }
    // sub-document copies (the true positives the floor must keep)
    val halves = normal.filter(_._1 % 10 == 0).map { case (id, t) =>
      (id + 1000L, t.split(" ").take(15).mkString(" "))
    }
    // degenerate 3-token fragments: exactly one REAL 3-gram each (the
    // host's first), containment 1.0 against their host by construction
    // — pure fan-out noise
    val frags = normal.map { case (id, t) =>
      (id + 2000L, t.split(" ").take(3).mkString(" "))
    }
    val df = (normal ++ halves ++ frags).map { case (id, t) => (id, t, "blk") }
      .toDF("doc_id", "text", "source")
    def run(minGrams: Int) =
      TextDedup.containmentPairs(df, "doc_id", "text", "source",
          n = 3, threshold = 0.8, minGrams = minGrams)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val (unfloored, floored) = (run(0), run(3))
    val wantKept = unfloored.filter { case (a, b) => a < 2000L && b < 2000L }
    assert(floored == wantKept,
      s"floor must drop exactly the fragment pairs: ${(floored -- wantKept).take(5)} / ${(wantKept -- floored).take(5)}")
    assert(halves.map(h => (h._1 - 1000L, h._1)).forall(floored.contains),
      "every planted half must survive the floor")
    assert(unfloored.size > floored.size,
      "fragments must have produced pairs for this test to bite")
    // candidate reduction: both sides lose the fragment rows pre-join
    def candidates(minGrams: Int): Long = {
      val (a, b) = TextDedup.blockedShinglePairSides(
        df, "doc_id", "text", "source", 3, minGrams, None)
      a.join(b, Seq("block")).filter($"id_a" < $"id_b").count()
    }
    assert(candidates(3) < candidates(0),
      "the floor must shrink the candidate join")
  }

  test("lshTopK leave-one-out: planted duplicates surface as rank-1 without self-matches") {
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
      .select($"vec_id", $"embedding")
    val copies = emb.withColumn("vec_id", $"vec_id" + 10000L)
    val corpus = emb.unionByName(copies)
    val top = Similarity.lshTopK(corpus, copies, "vec_id", "embedding",
      k = 3, nBits = 4, dim = 64, excludeSelf = true, broadcastQueries = false)
    val r1 = top.filter($"rnk" === 1).select("qid", "nid")
      .as[(Long, Long)].collect()
    assert(r1.nonEmpty)
    // identical vectors share every band, so the original is always a
    // candidate; sim 1.0 + smallest-id tiebreak makes it rank-1, and
    // excludeSelf keeps the query row itself out
    assert(r1.forall { case (q, n) => n == q - 10000L },
      r1.filterNot { case (q, n) => n == q - 10000L }.take(5).mkString(","))
  }

  test("labelVote: majority wins, ties to the smaller label, empty-candidate queries drop") {
    val topk = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // a,b,a -> a (majority)
      (2L, 10L, 1), (2L, 13L, 2),               // a,a   -> a, true y -> wrong
      (3L, 11L, 1), (3L, 10L, 2))               // b,a tie -> a (smaller label)
      .toDF("qid", "nid", "rnk")
    val labels = Seq((1L, "a"), (2L, "y"), (3L, "b"), (10L, "a"),
      (11L, "b"), (12L, "a"), (13L, "a")).toDF("id", "label")
    val got = Similarity.labelVote(topk, labels, "id", "label")
      .orderBy($"qid")
      .select("qid", "true_label", "pred_label", "votes", "correct")
      .as[(Long, String, String, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, "a", "a", 2L, 1L),
      (2L, "y", "a", 2L, 0L),
      (3L, "b", "a", 1L, 0L)), got.mkString(","))
    // qid 4 never appears in topk -> absent from the output
    assert(!got.exists(_._1 == 4L))
  }

  test("dsirSelection: target-like raw docs outrank off-domain ones") {
    import graft.ext.Curation
    // target domain speaks "alpha beta gamma"; half the raw docs speak
    // it too, half speak an unrelated vocabulary — the selection must
    // rank every in-domain raw doc above every off-domain one
    val target = (1L to 10L).map(i => (i * 19, "alpha beta gamma delta alpha beta", "s"))
    val inDomain = (1L to 5L).map(i => (i * 19 + 1, "alpha beta gamma delta epsilon zeta", "s"))
    val offDomain = (1L to 5L).map(i => (i * 19 + 2, "omega psi chi phi upsilon tau", "s"))
    val df = (target ++ inDomain ++ offDomain).toDF("doc_id", "text", "source")
    val got = Curation.dsirSelection(df, "doc_id", "text", "source",
        isTarget = $"doc_id" % 19 === 0, perSource = 10)
      .orderBy($"rk").select("id", "log_w").as[(Long, Double)].collect()
    assert(got.length == 10, got.mkString(","))
    val (top5, bottom5) = got.splitAt(5)
    assert(top5.forall(r => inDomain.exists(_._1 == r._1)),
      s"in-domain docs must rank first: ${got.mkString(",")}")
    assert(top5.map(_._2).min > bottom5.map(_._2).max,
      "in-domain weights must strictly exceed off-domain ones")
  }

  test("tokenBudgetFill: per-source prefix under budget, replay-stable order") {
    import graft.ext.Curation
    val df = (1L to 40L).map(i =>
        (i, (1 to 10).map(j => s"w$j").mkString(" "), s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
    val got = Curation.tokenBudgetFill(df, "doc_id", "text", "source",
        budget = 95L)
      .select("id", "source", "n_tok", "cum_tok")
      .as[(Long, String, Long, Long)].collect()
    // 10 tokens per doc, budget 95 -> exactly 9 docs per source
    val bySrc = got.groupBy(_._2)
    assert(bySrc.keySet == Set("src0", "src1") &&
      bySrc.values.forall(_.length == 9), got.length.toString)
    assert(got.forall(r => r._4 <= 95L && r._4 % 10 == 0))
    // the kept set is the hash-order prefix: recompute it naively
    def h(id: Long) = ((id % 1000000007L) * 2654435761L) % 1000000007L
    val want = (0 to 1).flatMap { s =>
      (1L to 40L).filter(_ % 2 == s).sortBy(i => (h(i), i)).take(9)
    }.toSet
    assert(got.map(_._1).toSet == want)
    // replay stability: a second run returns the identical set
    val again = Curation.tokenBudgetFill(df, "doc_id", "text", "source",
      budget = 95L).select("id").as[Long].collect().toSet
    assert(again == got.map(_._1).toSet)
  }

  test("multimodal: metadata-only queries prune the media bytes at the parquet scan") {
    // the claim Multimodal's layout advice makes (binary column last,
    // metadata first): a query that touches only metadata must never
    // read the blob — at 100 TB the blob IS the table
    val tmp = java.nio.file.Files.createTempDirectory("graft-mmprune").toString
    Multimodal.asMediaTable(
        graft.queries.Q.tbl(spark, sf(), "documents"), "doc_id", "text")
      .write.parquet(s"$tmp/media")
    val q = spark.read.parquet(s"$tmp/media")
      .filter($"format" === "image").select($"id", $"format")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // isolate the ReadSchema struct — the line also carries the file
    // path, which contains the word "media"
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .flatMap(_.split("ReadSchema: ").lastOption).getOrElse("")
    assert(readSchema.contains("id") && readSchema.contains("format"),
      plan.take(2000))
    assert(!readSchema.contains("media"),
      s"metadata query read the blob column: $readSchema")
  }

  test("chunkDedup: keep-first across docs and within a doc; reassembly in order") {
    import graft.ext.Curation
    val d = Seq(
      // doc 1: chunk "a b" repeats internally — the second occurrence dups
      (1L, "a b a b c d"),
      // doc 2 repeats doc 1's first chunk, then contributes its own
      (2L, "a b x y"),
      // doc 3 is entirely doc 1's chunks — fully dropped
      (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = Curation.chunkDedup(d, "doc_id", "text", chunk = 2)
      .orderBy($"doc_id").collect()
    // doc 1: chunks [a b][a b][c d] -> second "a b" dups
    assert(got(0).getAs[Long]("n_chunks") == 3 &&
      got(0).getAs[Long]("n_dup_chunks") == 1 &&
      got(0).getAs[String]("kept_text") == "a b c d", got(0).toString)
    // doc 2: "a b" already seen in doc 1; "x y" fresh
    assert(got(1).getAs[Long]("n_dup_chunks") == 1 &&
      got(1).getAs[String]("kept_text") == "x y", got(1).toString)
    // doc 3: everything seen -> empty reassembly, ratio 1.0
    assert(got(2).getAs[Long]("n_dup_chunks") == 2 &&
      got(2).getAs[Double]("dup_ratio") == 1.0 &&
      got(2).getAs[String]("kept_text") == "", got(2).toString)
  }

  test("duplicatedGramStats: stride-1 repeats counted across and within docs") {
    import graft.ext.Curation
    val d = Seq(
      // "a b c" occurs at stride-1 offsets in docs 1 AND 2 — tiled
      // 3-chunks would miss doc 2's shifted copy
      (1L, "a b c d e"),
      (2L, "z a b c d"),
      // doc 3: internal repeat "p q r p q r" duplicates its own 3-gram
      (3L, "p q r p q r"),
      // doc 4: all fresh
      (4L, "u v w x y"))
      .toDF("doc_id", "text")
    val got = Curation.duplicatedGramStats(d, "doc_id", "text", n = 3)
      .orderBy($"doc_id").collect()
    // doc 1 grams: [a b c][b c d][c d e] — first two also appear in doc 2
    assert(got(0).getAs[Long]("n_grams") == 3 &&
      got(0).getAs[Long]("n_dup") == 2, got(0).toString)
    // doc 2 grams: [z a b][a b c][b c d] — last two shared with doc 1
    assert(got(1).getAs[Long]("n_dup") == 2, got(1).toString)
    // doc 3 grams: [p q r][q r p][r p q][p q r] — only "p q r" repeats,
    // at BOTH its positions
    assert(got(2).getAs[Long]("n_grams") == 4 &&
      got(2).getAs[Long]("n_dup") == 2 &&
      got(2).getAs[Double]("dup_ratio") == 0.5, got(2).toString)
    assert(got(3).getAs[Long]("n_dup") == 0, got(3).toString)
    // a doc shorter than n contributes its whole text as one gram
    val short = Curation.duplicatedGramStats(
      Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text"), "doc_id",
      "text", n = 5).orderBy($"doc_id").collect()
    assert(short.forall(r => r.getAs[Long]("n_grams") == 1 &&
      r.getAs[Long]("n_dup") == 1), short.mkString(","))
  }

  test("duplicatedGramStats equals an in-memory naive count on random corpora") {
    import graft.ext.Curation
    val rnd = new scala.util.Random(43L)
    for (trial <- 1 to 3) {
      val n = 3
      // small alphabet + short docs force plenty of collisions and
      // shorter-than-n docs
      val docs = (1L to 40L).map { id =>
        val len = 1 + rnd.nextInt(8)
        id -> Seq.fill(len)(('a' + rnd.nextInt(4)).toChar.toString).mkString(" ")
      }
      // in-memory reference: sliding n-grams (whole text when short),
      // corpus-wide multiset counts, per-doc dup positions
      def grams(t: String): Seq[String] = {
        val tk = t.split(" ", -1).toSeq
        if (tk.length >= n) tk.sliding(n).map(_.mkString(" ")).toSeq
        else Seq(tk.mkString(" "))
      }
      val counts = docs.flatMap(d => grams(d._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val expected = docs.map { case (id, t) =>
        val g = grams(t)
        id -> ((g.size.toLong, g.count(counts(_) >= 2).toLong))
      }.toMap
      val got = Curation.duplicatedGramStats(
          docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .select($"doc_id", $"n_grams", $"n_dup")
        .as[(Long, Long, Long)].collect()
      assert(got.length == docs.length, s"trial $trial: row count")
      got.foreach { case (id, ng, nd) =>
        assert((ng, nd) == expected(id),
          s"trial $trial doc $id: got ($ng, $nd), want ${expected(id)}")
      }
    }
  }

  test("domainShiftKl: aligned strata score near zero, skewed higher, never negative") {
    import graft.ext.Curation
    val uniform = (0 until 10).map(i => s"w$i").mkString(" ")
    val rows = (1 to 9).map(i => (s"doc$i", uniform, "flat")) ++
      Seq(("skewdoc", "w0 w0 w0 w0 w0 w0 w0 w0 w0 w0", "skew"))
    val got = Curation.domainShiftKl(
        rows.toDF("id", "text", "source"), "text", "source", topN = 10)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // restricted-support KL is still >= 0 (q under-sums on the support)
    assert(got.values.forall(_ >= 0.0), got.toString)
    // the flat stratum IS most of the corpus — near-zero divergence;
    // the one-token stratum diverges hard
    assert(got("skew") > got("flat") + 0.5, got.toString)
    assert(got("flat") < 0.1, got.toString)
  }

  test("slidingChunks: overlap, tail clamp, short docs, tiling degenerate") {
    import graft.ext.Curation
    val doc20 = (1 to 20).map(i => s"t$i").mkString(" ")
    val got = Curation.slidingChunks(
        Seq((1L, doc20), (2L, "a b c")).toDF("doc_id", "text"),
        "doc_id", "text", width = 16, stride = 8)
      .orderBy($"doc_id", $"chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect()
    // doc 1 (20 tokens): chunks at 0 and 8; the second clamps to 12 tokens
    val d1 = got.filter(_._1 == 1L)
    assert(d1.length == 2)
    assert(d1(0) == ((1L, 0L, 0L, 16L, (1 to 16).map(i => s"t$i").mkString(" "))))
    assert(d1(1) == ((1L, 1L, 8L, 12L, (9 to 20).map(i => s"t$i").mkString(" "))))
    // consecutive chunks overlap by width - stride = 8 tokens
    assert(d1(0)._5.split(" ").takeRight(8).toSeq ==
      d1(1)._5.split(" ").take(8).toSeq)
    // short doc: exactly one clamped chunk
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 3L, "a b c")))
    // stride == width tiles without overlap, like chunkDedup's cutter
    val tiles = Curation.slidingChunks(
        Seq((1L, doc20)).toDF("doc_id", "text"), "doc_id", "text",
        width = 8, stride = 8)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(tiles.length == 3 && tiles.map(_._4).toSeq == Seq(8L, 8L, 4L))
  }

  test("spanCorruptionStats equals an in-memory mask on random lengths") {
    import graft.ext.Curation
    val rnd = new scala.util.Random(17L)
    // mask depends only on (id, position): text content is irrelevant
    val docs = (0L to 60L).map(id =>
      id -> Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "))
    def expected(id: Long, n: Int): (Long, Long, Long) = {
      val starts = (0 until n).map(i => (id * 1000003L + i * 7919L) % 100 < 5)
      val masked = (0 until n).map(i =>
        (0 until 3).exists(j => i >= j && starts(i - j)))
      val spans = (0 until n).count(i => masked(i) && (i == 0 || !masked(i - 1)))
      val nm = masked.count(identity)
      // exact integer round-half-up of 1e4·nm/n, as the operator computes
      (nm.toLong, spans.toLong, (20000L * nm + n) / (2L * n))
    }
    val got = Curation.spanCorruptionStats(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"n_masked", $"n_spans",
        $"mask_ratio_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == docs.length)
    got.foreach { case (id, nt, nm, ns, r) =>
      val n = docs.find(_._1 == id).get._2.split(" ").length
      assert(nt == n.toLong, s"doc $id token count")
      val (enm, ens, er) = expected(id, n)
      assert((nm, ns, r) == ((enm, ens, er)),
        s"doc $id: got ($nm, $ns, $r), want ($enm, $ens, $er)")
    }
    // a span starting near the end truncates instead of overflowing
    val one = Curation.spanCorruptionStats(
        Seq((0L, "a")).toDF("doc_id", "text"), "doc_id", "text")
      .select($"n_masked").as[Long].head()
    assert(one == 1L) // id 0 position 0 starts a span; doc has 1 token
  }

  test("qualityDeciles: repetitive docs sink, buckets stay within range") {
    import graft.ext.Curation
    val rep = ("rep " * 60).trim                       // heavy repetition
    val div = (1 to 60).map(i => s"w$i").mkString(" ") // fully distinct
    val d = (Seq((1L, rep, "s"), (2L, div, "s")) ++
      (3L to 12L).map(i => (i, s"doc $i has ${"very " * i.toInt}words", "s")))
      .toDF("doc_id", "text", "source")
    val got = Curation.qualityDeciles(d, "doc_id", "text", "source", buckets = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("score"), r.getAs[Int]("decile"))).toMap
    assert(got.values.forall { case (_, dec) => dec >= 1 && dec <= 4 })
    // the repetitive doc scores strictly below the fully-distinct doc
    // and lands in a lower-or-equal bucket
    assert(got(1L)._1 < got(2L)._1)
    assert(got(1L)._2 <= got(2L)._2)
    assert(got(2L)._2 == 4, got.toString) // highest scorer -> top bucket
  }

  test("ngram jaccard pairs respect blocking") {
    val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        blockCol = "source", n = 1, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 4L)), "cross-block pair must not appear")
  }

  test("brute-force and LSH ANN rank self first") {
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
    val q = emb.filter($"vec_id" % 250 === 0)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)
    val self = bf.filter($"rnk" === 1).select("qid", "nid")
      .as[(Long, Long)].collect()
    assert(self.nonEmpty && self.forall { case (a, b) => a == b },
      "rank-1 neighbor must be the query itself")
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", 3, nBits = 4)
    val lshSelf = lsh.filter($"rnk" === 1).select("qid", "nid")
      .as[(Long, Long)].collect()
    assert(lshSelf.nonEmpty && lshSelf.forall { case (a, b) => a == b },
      "same-bucket self must rank first under LSH")
  }

  test("IVF ANN: self in probed cell ranks first; decent recall vs brute force") {
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
    val q = emb.filter($"vec_id" % 100 === 0)
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 3)
    val self = ivf.filter($"rnk" === 1).select("qid", "nid")
      .as[(Long, Long)].collect()
    assert(self.nonEmpty && self.forall { case (a, b) => a == b },
      "query's own cell is always probed → self must rank first")
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val got = ivf.select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall@5 too low: $recall")
  }

  test("temperatureMix upweights rare domains and respects quotas") {
    // big domain: 90 docs × 4 tokens; small domain: 10 docs × 4 tokens
    val rows = (1L to 90L).map(i => (i, "big", "a b c d")) ++
      (91L to 100L).map(i => (i, "small", "a b c d"))
    val df = rows.toDF("doc_id", "source", "text")
    val got = Curation.temperatureMix(df, "doc_id", "text", "source",
      budget = 50L, alpha = 0.5)
    val byDomain = got.groupBy($"strata").count()
      .as[(String, Long)].collect().toMap
    // proportional sampling would give small 10% of the budget; sqrt
    // scaling gives sqrt(40)/(sqrt(360)+sqrt(40)) = 25%
    val smallShare = byDomain("small").toDouble /
      (byDomain("big") + byDomain("small"))
    assert(smallShare > 0.15, s"sqrt mix must upweight small: $smallShare")
    // quota caps: no domain exceeds its own size or its quota
    val perDoc = got.select($"strata", $"quota").distinct()
      .as[(String, Long)].collect().toMap
    assert(byDomain("small") <= 10 && byDomain("small") == perDoc("small").min(10))
    assert(byDomain("big") == perDoc("big").min(90))
    // selection within a domain is the first-quota ids
    val smallIds = got.filter($"strata" === "small").select($"id")
      .as[Long].collect().sorted
    assert(smallIds.headOption.contains(91L) &&
      smallIds.lastOption.contains(91L + smallIds.length - 1),
      "within-domain selection must be the deterministic id prefix")
  }

  test("PII audit counts and redacts each typed category") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org or at 10.1.2.3 now"),
      (2L, "call +1-555-0100 acct 123456789012 done"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = df.select(
        Seq($"doc_id") ++
          TextAnalysis.piiCounts($"text").map { case (n, c) => c.as(n) } ++
          Seq(TextAnalysis.piiRedacted($"text").as("red")): _*)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1 && out(1L)._4 == 0 && out(1L)._5 == 0)
    assert(out(1L)._6 == "mail me at <EMAIL> or at <IP> now")
    assert(out(2L)._4 == 1 && out(2L)._5 == 1)
    assert(out(2L)._6 == "call <PHONE> acct <NUM> done")
    assert(out(3L) == ((3L, 0L, 0L, 0L, 0L, "no pii here at all")))
  }

  test("PQ ANN: self attains the minimal ADC; decent recall vs exact L2") {
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
    val q = emb.filter($"vec_id" % 100 === 0)
    val pq = Similarity.pqTopK(emb, q, "vec_id", "embedding", 5,
      m = 4, codebookSize = 16)
    val rows = pq.select("qid", "nid", "rnk", "adc")
      .as[(Long, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    // ADC(doc) = Σ_sub d2(q_sub, cent[code_sub(doc)]) ≥ Σ_sub min_code d2
    // = ADC(self): the query's own row always attains the minimum, so the
    // rank-1 distance must equal self's distance exactly
    val byQ = rows.groupBy(_._1)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length == 5, s"qid=$qid must return k rows")
      assert(rs.sortBy(_._3).map(_._4).sliding(2).forall(p => p(0) <= p(1)),
        s"qid=$qid adc must be non-decreasing in rank")
      val selfAdc = rs.find(_._2 == qid)
        .getOrElse(fail(s"qid=$qid: self missing from top-5"))._4
      val top1 = rs.minBy(_._3)
      assert(top1._4 == selfAdc,
        s"qid=$qid rank-1 adc ${top1._4} must equal self's minimal $selfAdc")
    }
    // exact squared-L2 top-5 as the in-test oracle
    val base = emb.select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
    val exact = base.select($"id".as("qid"), $"v".as("qv"))
      .filter($"qid" % 100 === 0)
      .crossJoin(base.select($"id".as("nid"), $"v".as("nv")))
      .withColumn("d2", aggregate(
        zip_with($"qv", $"nv", (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, t) => acc + t))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy($"d2", $"nid")))
      .filter($"rnk" <= 5).select("qid", "nid")
      .as[(Long, Long)].collect().toSet
    val got = rows.map(r => (r._1, r._2)).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.3, s"PQ recall@5 vs exact L2 too low: $recall")
  }

  test("IVF-PQ: full probe degenerates to plain PQ; partial probe stays in-cell") {
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
    val q = emb.filter($"vec_id" % 100 === 0)
    // probing every cell removes the candidate gate — the composition
    // must then reproduce pqTopK EXACTLY (same published codebook, same
    // ADC arithmetic, same tie-breaks)
    val full = Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 5,
        nCentroids = 8, nProbe = 8, m = 4, codebookSize = 16)
      .select("qid", "nid", "rnk", "adc")
      .as[(Long, Long, Int, Double)].collect().toSet
    val pq = Similarity.pqTopK(emb, q, "vec_id", "embedding", 5,
        m = 4, codebookSize = 16)
      .select("qid", "nid", "rnk", "adc")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(full == pq, "full-probe IVF-PQ must equal plain PQ bit-for-bit")
    // partial probe: every candidate's cell is one the query probed
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8, 42L)
    val cellOf = Similarity.assignCells(
        emb.select($"vec_id".as("nid"),
          $"embedding".cast("array<double>").as("v")), "v", cents)
      .select($"nid", $"cell").as[(Long, Int)].collect().toMap
    val probed = Similarity.probeCells(q, "vec_id", "embedding", cents, 2)
      .select($"qid", $"cell").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val part = Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 5,
        nCentroids = 8, nProbe = 2, m = 4, codebookSize = 16)
      .select("qid", "nid").as[(Long, Long)].collect()
    assert(part.nonEmpty)
    part.foreach { case (qid, nid) =>
      assert(probed(qid).contains(cellOf(nid)),
        s"candidate $nid for query $qid came from an unprobed cell")
    }
  }

  test("URL canonicalization: host lower-cased, query/fragment dropped") {
    val rows = Seq(
      "https://WWW.Example.ORG/Path/To?q=1&utm=x#frag",
      "http://host.example.com:8080/a/b",
      "https://plain.example.net",
      "not a url at all")
      .toDF("url")
      .select(TextAnalysis.urlHost($"url").as("h"),
        TextAnalysis.canonicalUrl($"url").as("c"))
      .as[(String, String)].collect()
    // case folds on host only; path case survives; query+fragment drop
    assert(rows(0) == (("www.example.org", "https://www.example.org/Path/To")))
    // scheme normalizes to https; port stays (it addresses a different
    // endpoint); path kept verbatim
    assert(rows(1) == (("host.example.com:8080",
      "https://host.example.com:8080/a/b")))
    // no path → empty path, host alone
    assert(rows(2) == (("plain.example.net", "https://plain.example.net")))
    // non-URLs yield empty host and the bare scheme prefix — callers
    // filter on host != '' (the query's host grouping does implicitly)
    assert(rows(3)._1 == "")
  }

  test("streaming incremental near-dup equals the batch operator, stateless") {
    import graft.ext.TextDedup
    val docs = graft.queries.Q.tbl(spark, sf(), "documents")
      .select($"doc_id", $"text")
    val idx = TextDedup.minhashIndex(docs, "doc_id", "text")
      .persist()
    val batch = docs.filter($"doc_id" % 50 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val tmp = java.nio.file.Files.createTempDirectory("incstream").toString
    // TWO micro-batches: statelessness means each is checked against the
    // index independently, and the union of emissions equals the batch
    // operator on the union
    batch.filter($"doc_id" % 100 === 0).coalesce(1)
      .write.parquet(s"$tmp/in/f1")
    batch.filter($"doc_id" % 100 =!= 0).coalesce(1)
      .write.parquet(s"$tmp/in/f2")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val q = TextDedup.nearDupAgainstIndexStreaming(in, "doc_id", "text", idx)
      .writeStream.outputMode("append")
      .format("memory").queryName("inc_stream_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // a stateless stream-static pipeline: no state store rows at all
    val lastProg = q.lastProgress
    assert(Option(lastProg).forall(_.stateOperators.isEmpty),
      "stream-static incremental dedup must carry no state operators")
    val got = spark.table("inc_stream_out")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == got.toSet.size,
      "first-agreeing-band gate must emit each pair once")
    val expected = TextDedup.nearDupAgainstIndex(batch, "doc_id", "text", idx)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got.nonEmpty && got.toSet == expected,
      s"stream diverged: only-got ${(got.toSet -- expected).take(3)}, " +
        s"only-want ${(expected -- got.toSet).take(3)}")
    idx.unpersist()
  }

  test("incremental near-dup vs persisted index equals the one-corpus operator") {
    import graft.ext.TextDedup
    val docs = graft.queries.Q.tbl(spark, sf(), "documents")
      .select($"doc_id", $"text")
    // planted batch: exact copies (guaranteed hits) + untouched docs
    val batch = docs.filter($"doc_id" % 50 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    // the index persists and reloads — the daily-ingest loop's artifact
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    TextDedup.minhashIndex(docs, "doc_id", "text").write.parquet(s"$dir/idx")
    val idx = spark.read.parquet(s"$dir/idx")
    val got = TextDedup.nearDupAgainstIndex(batch, "doc_id", "text", idx)
      .as[(Long, Long, Double, Double)].collect().toSet
    // reference: the whole-union pair operator, restricted to cross pairs
    // (old id < 1000000 <= new id, which also matches its id_a < id_b
    // orientation), reoriented to (new, old)
    val expected = TextDedup.minhashLshPairs(docs.union(batch), "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .filter { case (a, b, _, _) => a < 1000000L && b >= 1000000L }
      .map { case (a, b, e, j) => (b, a, e, j) }.toSet
    assert(got.nonEmpty, "planted copies must surface")
    assert(got == expected,
      s"incremental diverged: only-got ${(got -- expected).take(3)}, " +
        s"only-want ${(expected -- got).take(3)}")
  }

  test("edge cases: tiny corpus vs k, empty index, empty batch") {
    import graft.ext.TextDedup
    // fewer distinct vectors than centroids: fit pads with repeats,
    // empty clusters stay empty, queries still answer
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.ivfPqTopK(tiny, tiny, "vec_id", "embedding", k = 2,
      nCentroids = 8, nProbe = 8, m = 2, codebookSize = 16)
      .as[(Long, Long, Int, Double)].collect()
    assert(r.groupBy(_._1).size == 3 && r.length == 6,
      s"each tiny query answers with k=2 rows: ${r.mkString(",")}")
    // empty index: no matches, no failure
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val emptyIdx = TextDedup.minhashIndex(
      docs.filter($"doc_id" < 0), "doc_id", "text")
    assert(TextDedup.nearDupAgainstIndex(docs, "doc_id", "text", emptyIdx)
      .count() == 0)
    // empty batch against a real index: same
    val idx = TextDedup.minhashIndex(docs, "doc_id", "text")
    assert(TextDedup.nearDupAgainstIndex(docs.filter($"doc_id" < 0),
      "doc_id", "text", idx).count() == 0)
  }

  test("BM25 index round-trips through parquet and answers identically") {
    import graft.ext.TextSearch
    val docs = graft.queries.Q.tbl(spark, sf(), "documents")
    val qs = Seq(1 -> "fast spark table scan", 2 -> "hash join merge")
    val direct = TextSearch.bm25TopK(docs, "doc_id", "text", qs, k = 10)
      .as[(Int, Int, Long, Double)].collect().toSet
    val idx = TextSearch.buildBm25Index(docs, "doc_id", "text")
    val fromIdx = TextSearch.bm25TopKOnIndex(idx, qs, k = 10)
      .as[(Int, Int, Long, Double)].collect().toSet
    assert(direct.nonEmpty && fromIdx == direct,
      "index path must equal the one-shot operator bit-for-bit")
    // persist the postings (the docs prescribe bucketing by token; plain
    // parquet here) and answer from the RELOADED frame
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    idx.postings.write.parquet(s"$dir/postings")
    val reloaded = idx.copy(postings = spark.read.parquet(s"$dir/postings"))
    val fromDisk = TextSearch.bm25TopKOnIndex(reloaded, qs, k = 10)
      .as[(Int, Int, Long, Double)].collect().toSet
    assert(fromDisk == direct, "reloaded index must answer bit-identically")
  }

  test("IVF-PQ index round-trips through parquet and answers identically") {
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
    val q = emb.filter($"vec_id" % 100 === 0)
    val idx = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCentroids = 8, m = 4, codebookSize = 16)
    val direct = Similarity.ivfPqTopKOnIndex(idx, q, "vec_id", "embedding",
        5, nProbe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    // persist the code table (partitioned by cell, as the docs prescribe)
    // and query from the RELOADED frame — the corpus floats are gone
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    idx.codes.write.partitionBy("cell").parquet(s"$dir/codes")
    val reloaded = idx.copy(codes = spark.read.parquet(s"$dir/codes"))
    val fromDisk = Similarity.ivfPqTopKOnIndex(reloaded, q, "vec_id",
        "embedding", 5, nProbe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(direct.nonEmpty && fromDisk == direct,
      "reloaded index must answer bit-identically")
  }

  test("maintained indexes round-trip through parquet: repaired ANN " +
      "(refit cell ids survive) and streamed-ingest BM25") {
    import graft.ext.{Similarity, TextSearch}
    // REPAIRED ANN index: refit cell ids live ABOVE the standing set —
    // persistence must carry them and answer bit-identically (a repair
    // followed by a reload is the production sequence)
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
      .select($"vec_id".cast("long").as("vec_id"),
        $"embedding".cast("array<double>").as("embedding"))
    val idx0 = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCentroids = 8, m = 4, codebookSize = 16)
    val cells = idx0.codes.filter($"sub" === 0)
      .groupBy($"cell").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"cell").limit(2)
      .collect().map(_.getInt(0)).toSeq
    val repaired = Similarity.repairDriftedCells(idx0, emb,
      "vec_id", "embedding", cells, splitInto = 2)
    assert(repaired.centroids.map(_._1).max > 7, "refit ids above standing")
    val q = emb.filter($"vec_id" % 100 === 0)
    val direct = Similarity.ivfPqTopKOnIndex(repaired, q,
        "vec_id", "embedding", 5, nProbe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("maintidx").toString
    repaired.codes.write.partitionBy("cell").parquet(s"$dir/codes")
    val reloaded = repaired.copy(codes = spark.read.parquet(s"$dir/codes"))
    val fromDisk = Similarity.ivfPqTopKOnIndex(reloaded, q,
        "vec_id", "embedding", 5, nProbe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(direct.nonEmpty && fromDisk == direct,
      "reloaded repaired index must answer bit-identically")

    // STREAMED BM25 ingest: document batches arriving as a stream fold
    // into the standing index via mergeBm25Index per micro-batch —
    // the continuous-corpus form of the x145 standing index — and the
    // result answers bit-identically to a one-shot build
    val docs = graft.queries.Q.tbl(spark, sf(), "documents")
      .select($"doc_id".cast("long").as("doc_id"), $"text")
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$dir/in/f1")
    docs.filter($"doc_id" % 2 === 1).write.parquet(s"$dir/in/f2")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$dir/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    // the standing index state: folded on the driver per micro-batch,
    // postings accumulated as reloadable parquet (epoch dirs)
    var standing = TextSearch.buildBm25Index(
      docs.limit(0), "doc_id", "text") // empty seed
    standing = standing.copy(postings = standing.postings.localCheckpoint(true))
    val ingest = in.writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/cp")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val add = TextSearch.mergeBm25Index(standing, batch,
          "doc_id", "text")
        // materialize the epoch so the standing plan never re-reads the
        // (consumed) micro-batch
        standing = add.copy(postings = add.postings.localCheckpoint(true))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    ingest.awaitTermination()
    val qs = Seq(1 -> "hash join strategy", 2 -> "stream batch merge")
    val streamed = TextSearch.bm25TopKOnIndex(standing, qs, k = 10)
      .as[(Int, Int, Long, Double)].collect().toSet
    val oneShot = TextSearch.bm25TopKOnIndex(
        TextSearch.buildBm25Index(docs, "doc_id", "text"), qs, k = 10)
      .as[(Int, Int, Long, Double)].collect().toSet
    assert(streamed.nonEmpty && streamed == oneShot,
      "stream-folded index must equal a one-shot build bit-for-bit")
  }

  test("blocked near-dup pairs equal naive all-pairs (every block count)") {
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
    // naive all-pairs triangle as the in-test oracle (the shape the
    // operator deliberately avoids at scale)
    val base = emb.select($"vec_id".as("id"), $"embedding".as("v"))
      .withColumn("n", Similarity.norm($"v"))
    val naive = base.select($"id".as("id_a"), $"v".as("va"), $"n".as("na"))
      .crossJoin(base.select($"id".as("id_b"), $"v".as("vb"), $"n".as("nb")))
      .filter($"id_a" < $"id_b")
      .withColumn("sim", Similarity.dot($"va", $"vb") / ($"na" * $"nb"))
      .filter($"sim" >= 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    for (blocks <- Seq(1, 3, 8)) {
      val got = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
          threshold = 0.4, blocks = blocks)
        .select($"id_a", $"id_b").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"blocks=$blocks produced duplicates")
      assert(got.toSet == naive, s"blocks=$blocks diverged from all-pairs")
    }
  }

  test("LSH near-dup catches planted near-identical vectors") {
    val rnd = new scala.util.Random(7L)
    def vec(d: Int) = Array.fill(d)(rnd.nextGaussian().toFloat)
    val a = vec(64)
    val aJitter = a.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val rows = Seq((1L, a), (2L, aJitter)) ++
      (3L to 40L).map(i => i -> vec(64))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDupPairsLsh(df, "vec_id", "embedding",
        threshold = 0.95)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), "planted near-identical pair must surface")
    assert(!got.exists(p => p._1 > 2L), "random vectors must not pair at 0.95")
  }

  test("semanticDedup: cluster-scoped; lower id survives, dup_of is the min") {
    val rnd = new scala.util.Random(11L)
    def vec(d: Int) = Array.fill(d)(rnd.nextGaussian().toFloat)
    val a = vec(64)
    // 1/3/5 identical in cluster 0 → 3 and 5 dup_of 1; the SAME vector in
    // cluster 1 (id 2) is untouched — dedup never crosses a cluster
    val rows = Seq((1L, 0, a), (3L, 0, a), (5L, 0, a), (2L, 1, a)) ++
      (6L to 30L).map(i => (i, (i % 2).toInt, vec(64)))
    val got = Similarity.semanticDedup(
        rows.toDF("vec_id", "label", "embedding"),
        "vec_id", "embedding", "label", threshold = 0.95)
      .select($"id", $"dup_of", $"kept")
      .as[(Long, Option[Long], Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, None, 1L), "lowest id must be kept")
    assert(got(3L) == (3L, Some(1L), 0L))
    assert(got(5L) == (5L, Some(1L), 0L), "dup_of is the MIN dominating id")
    assert(got(2L) == (2L, None, 1L), "identical vector in another cluster stays")
  }

  test("semanticDedup matches a naive driver-side dominance check") {
    val rnd = new scala.util.Random(29L)
    val rows = (1L to 60L).map(i =>
      (i, (i % 5).toInt, Array.fill(32)(rnd.nextGaussian().toFloat)))
    val t = 0.25
    def cos(a: Array[Float], b: Array[Float]): Double = {
      // same accumulation semantics as the native vector_dot: per-element
      // float→double widening, left-to-right double sum
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i).toDouble * y(i).toDouble)
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val naive = rows.map { case (id, cl, v) =>
      val doms = rows.filter { case (j, cj, w) =>
        cj == cl && j < id && cos(v, w) >= t }
      id -> (if (doms.isEmpty) None else Some(doms.map(_._1).min))
    }.toMap
    val got = Similarity.semanticDedup(
        rows.toDF("vec_id", "label", "embedding"),
        "vec_id", "embedding", "label", threshold = t)
      .select($"id", $"dup_of").as[(Long, Option[Long])].collect().toMap
    assert(got == naive,
      s"diff: ${(got.toSet diff naive.toSet).take(3)} vs ${(naive.toSet diff got.toSet).take(3)}")
    assert(naive.values.count(_.isDefined) > 0, "fixture must contain some dups")
  }

  test("knnPredict: planted tight clusters vote the right label, self excluded") {
    val rnd = new scala.util.Random(13L)
    def around(c: Array[Float]) = c.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val c0 = Array.fill(64)(rnd.nextGaussian().toFloat)
    val c1 = Array.fill(64)(rnd.nextGaussian().toFloat)
    val rows = (1L to 20L).map(i => (i, 0, around(c0))) ++
      (21L to 40L).map(i => (i, 1, around(c1)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Similarity.knnPredict(df, df.filter($"vec_id".isin(1L, 21L)),
        "vec_id", "embedding", "label", k = 5)
      .select($"qid", $"pred_label", $"votes", $"correct")
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 0, 5L, 1L), "all 5 neighbours share the cluster label")
    assert(got(21L) == (21L, 1, 5L, 1L))
    // leave-one-out: a lone-label query cannot vote for itself
    val lone = rows :+ ((41L, 2, Array.fill(64)(9f)))
    val pred = Similarity.knnPredict(lone.toDF("vec_id", "label", "embedding"),
        lone.toDF("vec_id", "label", "embedding").filter($"vec_id" === 41L),
        "vec_id", "embedding", "label", k = 5)
      .select($"pred_label").as[Int].collect()
    assert(pred.length == 1 && pred(0) != 2, "self must be excluded from the vote")
  }

  test("knnPredict matches a naive vote on random data") {
    val rnd = new scala.util.Random(31L)
    val rows = (1L to 40L).map(i =>
      (i, (i % 4).toInt, Array.fill(32)(rnd.nextGaussian().toFloat)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i).toDouble * y(i).toDouble)
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val naive = rows.filter(_._1 % 7 == 0).map { case (qid, _, qv) =>
      val nn = rows.filter(_._1 != qid)
        .map { case (id, l, v) => (id, l, cos(qv, v)) }
        .sortBy { case (id, _, s) => (-s, id) }.take(10)
      val best = nn.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (l, n) => (-n, l) }.head
      qid -> best
    }.toMap
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Similarity.knnPredict(df, df.filter($"vec_id" % 7 === 0),
        "vec_id", "embedding", "label", k = 10)
      .select($"qid", $"pred_label", $"votes")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3.toInt)).toMap
    assert(got == naive, s"got $got want $naive")
  }

  test("vocabGrowth: new tokens land in their first bucket; totals cover all") {
    import graft.ext.Curation
    // ids 0..9, buckets of one doc each: "a" new at 0, "b" new at 0,
    // "c" new at 5; bucket 5 has tokens but nothing else new
    val docs = (0L to 9L).map(i =>
      (i, if (i == 5) "a c" else "a b")).toDF("doc_id", "text")
    val got = Curation.vocabGrowth(docs, "doc_id", "text", buckets = 10)
      .select($"bucket", $"n_tokens", $"new_tokens", $"cum_vocab")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 10, "every bucket with tokens appears")
    assert(got(0) == (0L, 2L, 2L, 2L))
    assert(got(5) == (5L, 2L, 1L, 3L), "'c' is first seen in bucket 5")
    assert(got(9) == (9L, 2L, 0L, 3L), "saturated buckets report zero new")
    assert(got.map(_._2).sum == 20L)
  }

  test("centroidOutliers: the planted far vector ranks as the top outlier") {
    val rnd = new scala.util.Random(17L)
    val c0 = Array.fill(64)(rnd.nextGaussian().toFloat)
    def around(c: Array[Float]) = c.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    // 19 vectors hug c0; id 99 points the other way entirely
    val rows = (1L to 19L).map(i => (i, 0, around(c0))) :+
      ((99L, 0, c0.map(-_)))
    val got = Similarity.centroidOutliers(
        rows.toDF("vec_id", "label", "embedding"),
        "vec_id", "embedding", "label", bottomK = 3)
      .select($"id", $"rk", $"sim_centroid")
      .as[(Long, Int, Double)].collect().sortBy(_._2)
    assert(got.head._1 == 99L, "the anti-centroid vector must rank rk=1")
    assert(got.head._3 < 0, "pointing away from the centroid → negative cosine")
    assert(got.length == 3)
  }

  test("source dup matrix: symmetric rollup counts cross-source near-dups") {
    import graft.ext.TextDedup
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      (1L, t, "en", "srcB"), (2L, t, "en", "srcA"),   // cross-source dup
      (3L, t, "en", "srcA"),                          // same-source dup of 2
      (4L, t, "fr", "srcA"),                          // other lang block: no pair
      (5L, "completely different tokens entirely here now", "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = TextDedup.ngramJaccardPairs(d, "doc_id", "text",
      blockCol = "lang", n = 1, threshold = 0.9)
    val src = d.select($"doc_id", $"source")
    val got = pairs
      .join(src.select($"doc_id".as("id_a"), $"source".as("src_a")), "id_a")
      .join(src.select($"doc_id".as("id_b"), $"source".as("src_b")), "id_b")
      .select(least($"src_a", $"src_b").as("lo"),
        greatest($"src_a", $"src_b").as("hi"))
      .groupBy($"lo", $"hi").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // pairs in the en block: (1,2) (1,3) cross, (2,3) within srcA — doc 4
    // never pairs (lang block) even though its text is identical
    assert(got == Map(("srcA", "srcB") -> 2L, ("srcA", "srcA") -> 1L), got)
  }

  test("dim-truncation recall: prefix-identical decoy fools the truncated rank") {
    val rnd = new scala.util.Random(23L)
    def vec(d: Int) = Array.fill(d)(rnd.nextGaussian().toFloat)
    val q = vec(64)
    // decoy: matches q on dims 0-15, points away on 16-63 → top under
    // 16-dim retrieval, far under full; twin: exact copy of q → top under
    // both
    val decoy = q.take(16) ++ q.drop(16).map(x => -x)
    val twin = q.clone()
    val rows = Seq((1L, q), (2L, twin), (3L, decoy)) ++
      (4L to 30L).map(i => i -> vec(64))
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" === 1L)
    val full = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 2)
      .select($"nid").as[Long].collect().toSet
    val df16 = df.select($"vec_id",
      slice($"embedding", 1, 16).as("emb16"))
    val trunc = Similarity.bruteForceTopK(df16,
        df16.filter($"vec_id" === 1L), "vec_id", "emb16", 3)
      .select($"nid").as[Long].collect().toSet
    assert(full == Set(1L, 2L), s"full rank: self + twin, never the decoy: $full")
    assert(trunc == Set(1L, 2L, 3L),
      s"the 16-dim prefix cannot tell the decoy apart: $trunc")
  }

  test("tfidfKeywords: doc-specific terms outrank ubiquitous ones") {
    import graft.ext.Curation
    // "common" appears in every doc → ln(N/df)=0 → score 0; each doc's
    // own marker token (tf=2) must rank first
    val docs = Seq(
      (1L, "common alpha alpha common"),
      (2L, "common beta beta common"),
      (3L, "common gamma gamma common")).toDF("doc_id", "text")
    val got = Curation.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .select($"id", $"rk", $"tok", $"score")
      .as[(Long, Int, String, Double)].collect()
    val top = got.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    assert(top == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    val commonScores = got.filter(_._3 == "common").map(_._4)
    assert(commonScores.forall(_ == 0.0), "df=N terms carry zero weight")
    // score check: tf=2, N=3, df=1 → 2·ln(3) ≈ 2.1972
    assert(got.filter(_._2 == 1).forall(_._4 == 2.1972))
  }

  test("bm25TopK: rarer terms dominate, doc-length normalizes, OOV is inert") {
    import graft.ext.TextSearch
    val d = Seq(
      (1L, "spark shuffle spark shuffle spark shuffle"), // tf-heavy, short
      (2L, "spark " + Seq.fill(40)("filler").mkString(" ")), // long doc, tf=1
      (3L, "rareterm appears here once"),
      (4L, "common words only nothing special"),
      (5L, "common words again nothing more")).toDF("doc_id", "text")
    val got = TextSearch.bm25TopK(d, "doc_id", "text",
        queries = Seq(1 -> "spark", 2 -> "rareterm", 3 -> "zzz_oov"), k = 3)
      .select($"qid", $"rnk", $"nid", $"score")
      .as[(Int, Int, Long, Double)].collect()
    val q1 = got.filter(_._1 == 1).sortBy(_._2).map(_._3).toList
    // tf-rich short doc outranks the diluted long one
    assert(q1 == List(1L, 2L), s"q1 ranking: $q1")
    val q2 = got.filter(_._1 == 2)
    assert(q2.map(_._3).toList == List(3L), "only the rare-term doc matches")
    assert(got.count(_._1 == 3) == 0, "an OOV-only query matches nothing")
    // IDF: the corpus-rare term scores above the two-doc term at tf=1
    val sRare = q2.head._4
    val sSpark2 = got.find(r => r._1 == 1 && r._3 == 2L).get._4
    assert(sRare > sSpark2, s"rare $sRare must outweigh common $sSpark2")
  }

  test("quality rerank: RRF lifts a high-quality doc over a closer BM25 rank") {
    val d = Seq(
      (1L, "spark spark spark spark spark"),      // BM25 rank 1, quality 0
      (2L, "spark the of and to in is"),          // BM25 rank 3, quality 6/7
      (3L, "spark alpha beta gamma delta"),       // BM25 rank 2, quality 0
      (4L, "no match here at all")).toDF("doc_id", "text")
    import graft.ext.TextSearch
    val cands = TextSearch.bm25TopK(d, "doc_id", "text",
      queries = Seq(1 -> "spark"), k = 20)
    val bm25 = cands.orderBy($"rnk").select($"nid").as[Long].collect().toList
    assert(bm25 == List(1L, 3L, 2L), s"BM25-only order: $bm25")
    // stopword quality: d2 = 6/7, d1 = d3 = 0
    val toks = split($"text", " ")
    val quality = d.select($"doc_id".as("nid"),
      (size(filter(toks, (x: org.apache.spark.sql.Column) => x.isin(
          "the", "a", "an", "of", "and", "or", "to", "in", "is", "on")))
        .cast("double") / size(toks)).as("quality"))
    val fused = TextSearch.rrfRerank(cands, quality, k = 3)
      .orderBy($"frk").select($"nid", $"rrf_e7").as[(Long, Long)].collect()
    // hand RRF: d1 1/61+1/62, d2 1/63+1/61, d3 1/62+1/63 → d1 > d2 > d3
    assert(fused.map(_._1).toList == List(1L, 2L, 3L),
      s"quality must lift doc 2 over doc 3: ${fused.toList}")
    assert(fused(0)._2 > fused(1)._2 && fused(1)._2 > fused(2)._2)
    // exact integer form: 1e7·(a+b+120)/((60+a)(60+b)) rounded half-up
    def e7(a: Long, b: Long): Long =
      (20000000L * (a + b + 120) + (60 + a) * (60 + b)) /
        (2L * (60 + a) * (60 + b))
    assert(fused(0)._2 == e7(1, 2) && fused(1)._2 == e7(3, 1) &&
      fused(2)._2 == e7(2, 3), s"rrf_e7 values: ${fused.toList}")
  }

  test("mergeBm25Index: incremental ingest answers identically to a rebuild") {
    import graft.ext.TextSearch
    val docs = graft.queries.Q.tbl(spark, sf(), "documents")
    val half1 = docs.filter($"doc_id" % 2 === 0)
    val half2 = docs.filter($"doc_id" % 2 === 1)
    val merged = TextSearch.mergeBm25Index(
      TextSearch.buildBm25Index(half1, "doc_id", "text"),
      half2, "doc_id", "text")
    val full = TextSearch.buildBm25Index(docs, "doc_id", "text")
    assert(merged.nDocs == full.nDocs &&
      merged.totalTokens == full.totalTokens)
    val qs = Seq(1 -> "hash join strategy", 2 -> "window sort order")
    val a = TextSearch.bm25TopKOnIndex(merged, qs, k = 10)
      .collect().map(_.toSeq).toSet
    val b = TextSearch.bm25TopKOnIndex(full, qs, k = 10)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b,
      "merged index must answer bit-identically to a full rebuild")
  }

  test("extendIvfPqIndex: frozen-constant extension leaves old answers bit-unchanged") {
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
    val half1 = emb.filter($"vec_id" % 2 === 0)
    val half2 = emb.filter($"vec_id" % 2 === 1)
    val base = Similarity.buildIvfPqIndex(half1, "vec_id", "embedding",
      nCentroids = 8, m = 4, codebookSize = 16)
    val extended = Similarity.extendIvfPqIndex(base, half2,
      "vec_id", "embedding")
    // constants are untouched; code count doubles (m rows per vector)
    assert(extended.centroids == base.centroids &&
      extended.codebook == base.codebook)
    assert(extended.codes.count() == base.codes.count() * 2)
    // old-corpus queries answer bit-identically when restricted to the
    // originally indexed vectors (extension appends, never rewrites)
    val q = emb.filter($"vec_id" % 100 === 0)
    val before = Similarity.ivfPqTopKOnIndex(base, q,
        "vec_id", "embedding", 5, nProbe = 8)
      .as[(Long, Long, Int, Double)].collect().toSet
    val after = Similarity.ivfPqTopKOnIndex(
        extended.copy(codes = extended.codes.join(
          half1.select($"vec_id".as("nid")), Seq("nid"), "left_semi")),
        q, "vec_id", "embedding", 5, nProbe = 8)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(before.nonEmpty && after == before)
    // and the extended rows carry the same codes a from-scratch encode
    // with the SAME constants produces: a new vector equal to an indexed
    // one must land in the same cell with identical codes
    val dup = extended.codes.join(
        half2.select($"vec_id".as("nid")), Seq("nid"), "left_semi")
    assert(dup.count() == base.codes.count())
  }

  test("removeFromIvfPqIndex: delete is exact and survivors answer " +
      "bit-identically; ivfCellDrift flags shifted arrivals") {
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
    val idx = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCentroids = 8, m = 4, codebookSize = 16)
    val doomed = emb.filter($"vec_id" % 7 === 3).select($"vec_id")
    val pruned = Similarity.removeFromIvfPqIndex(idx, doomed, "vec_id")
    // exact removal: no doomed id survives, every survivor keeps all m rows
    assert(pruned.codes.join(doomed.withColumnRenamed("vec_id", "nid"),
      Seq("nid"), "left_semi").count() == 0)
    val nDoomed = doomed.count()
    assert(pruned.codes.count() == idx.codes.count() - 4 * nDoomed)
    // survivors answer bit-identically: deleting vectors never perturbs
    // another vector's cell, codes, or ADC — only removes candidates
    val q = emb.filter($"vec_id" % 100 === 0)
    val onPruned = Similarity.ivfPqTopKOnIndex(pruned, q,
        "vec_id", "embedding", 5, nProbe = 8)
      .as[(Long, Long, Int, Double)].collect().toSet
    val onFiltered = Similarity.ivfPqTopKOnIndex(
        idx.copy(codes = idx.codes.join(
          doomed.withColumnRenamed("vec_id", "nid"), Seq("nid"), "left_anti")),
        q, "vec_id", "embedding", 5, nProbe = 8)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(onPruned.nonEmpty && onPruned == onFiltered)

    // drift audit: arrivals identical to the population read ~1000 pm;
    // arrivals pushed far off the manifold read far above it
    val baseV = emb.select($"vec_id", $"embedding".cast("array<double>"))
    val sameDist = Similarity.ivfCellDrift(baseV, baseV,
      "vec_id", "embedding", idx.centroids)
    val samePm = sameDist.filter($"drift_pm".isNotNull)
      .select($"drift_pm").as[Long].collect()
    assert(samePm.nonEmpty && samePm.forall(_ == 1000L),
      s"identical arrivals must read exactly 1000 pm: ${samePm.toSeq}")
    val shifted = baseV.select($"vec_id",
      transform($"embedding", (x: org.apache.spark.sql.Column) => x * 5.0)
        .as("embedding"))
    val far = Similarity.ivfCellDrift(baseV, shifted,
      "vec_id", "embedding", idx.centroids)
    val farPm = far.filter($"drift_pm".isNotNull)
      .select($"drift_pm").as[Long].collect()
    assert(farPm.nonEmpty && farPm.max > 2000L,
      s"5x-scaled arrivals must show drift: max=${farPm.max}")
  }

  test("removeFromBm25Index: pruned index answers bit-identically to a " +
      "rebuild over survivors; deletes are idempotent") {
    import graft.ext.TextSearch
    val docs = graft.queries.Q.tbl(spark, sf(), "documents")
    val doomed = docs.filter($"doc_id" % 7 === 2).select($"doc_id")
    val full = TextSearch.buildBm25Index(docs, "doc_id", "text")
    val pruned = TextSearch.removeFromBm25Index(full, doomed, "doc_id")
    val rebuilt = TextSearch.buildBm25Index(
      docs.join(doomed, Seq("doc_id"), "left_anti"), "doc_id", "text")
    assert(pruned.nDocs == rebuilt.nDocs &&
      pruned.totalTokens == rebuilt.totalTokens,
      s"scalars diverged: ${(pruned.nDocs, pruned.totalTokens)} vs " +
        s"${(rebuilt.nDocs, rebuilt.totalTokens)}")
    val qs = Seq(1 -> "hash join strategy", 2 -> "stream batch merge")
    val a = TextSearch.bm25TopKOnIndex(pruned, qs, k = 10)
      .collect().map(_.toSeq).toSet
    val b = TextSearch.bm25TopKOnIndex(rebuilt, qs, k = 10)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b,
      "pruned index must answer bit-identically to a survivor rebuild")
    // idempotent: deleting the same ids again (now absent) changes nothing
    val again = TextSearch.removeFromBm25Index(pruned, doomed, "doc_id")
    assert(again.nDocs == pruned.nDocs &&
      again.totalTokens == pruned.totalTokens &&
      again.postings.count() == pruned.postings.count())
  }

  test("repairDriftedCells: planted off-manifold arrivals are detected, " +
      "repaired cells absorb them, assignment error collapses") {
    import graft.ext.Similarity
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
      .select($"vec_id".cast("long").as("vec_id"),
        $"embedding".cast("array<double>").as("embedding"))
    // arrivals pushed far off the manifold: +8 on every dim
    val shifted = emb.select(($"vec_id" + 5000000L).as("vec_id"),
      transform($"embedding",
        (x: org.apache.spark.sql.Column) => x + 8.0).as("embedding"))
    val idx0 = Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCentroids = 8, m = 4, codebookSize = 16)
    val ext = Similarity.extendIvfPqIndex(idx0, shifted,
      "vec_id", "embedding")
    // 1. DETECT: the drift audit flags the arrivals' cells hard
    val drift = Similarity.ivfCellDrift(emb, shifted,
      "vec_id", "embedding", idx0.centroids)
    val flagged = drift.filter($"drift_pm" > 2000)
      .select($"cell").as[Int].collect().toSeq.sorted
    assert(flagged.nonEmpty, "off-manifold arrivals must flag drift")
    // 2. REPAIR the flagged cells
    val corpus = emb.unionByName(shifted)
    val repaired = Similarity.repairDriftedCells(ext, corpus,
      "vec_id", "embedding", flagged, splitInto = 2)
    // survivors' code rows are bit-untouched
    val untouchedBefore = ext.codes
      .filter(!$"cell".isin(flagged.map(Integer.valueOf): _*))
    val untouchedAfter = repaired.codes.filter($"cell" <= 7)
    assert(untouchedAfter.exceptAll(untouchedBefore).count() == 0 &&
      untouchedBefore.exceptAll(untouchedAfter).count() == 0)
    // no vector lost or duplicated by the splice
    assert(repaired.codes.count() == ext.codes.count())
    // 3. the arrivals' ASSIGNMENT ERROR collapses: mean distance to the
    // assigned centroid under the composed set is far below the frozen
    // set's (integer milli-scaled sums — exact)
    def totalD2(cents: Seq[(Int, Array[Double])]): Long =
      Similarity.ivfCellStats(shifted, "vec_id", "embedding", cents)
        .agg(sum($"sum_d2_mil")).head().getLong(0)
    val before = totalD2(idx0.centroids)
    val after = totalD2(repaired.centroids)
    assert(after * 2 < before,
      s"repair must at least halve the arrivals' distance mass: $before -> $after")
    // and re-auditing against the REPAIRED quantizer shows the drift gone
    val postDrift = Similarity.ivfCellDrift(corpus, shifted,
        "vec_id", "embedding", repaired.centroids)
      .filter($"drift_pm" > 2000).count()
    assert(postDrift == 0, "repaired quantizer must clear the drift flags")
  }

  test("ivfCellStatsStreaming: windowed drift stats off a vector stream " +
      "match the batch audit bit-exactly per closed window") {
    import graft.ext.Similarity
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
      .select($"vec_id".cast("long").as("vec_id"),
        $"embedding".cast("array<double>").as("embedding"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
      nCentroids = 8, seed = 42L)
    // synthetic event times spread across hours (deterministic from id)
    val stamped = emb.withColumn("ts", timestamp_seconds(
      unix_timestamp(to_timestamp(lit("2026-01-01 00:00:00"))) +
        ($"vec_id" % 180) * 60))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-driftstream").toString
    stamped.write.parquet(s"$tmp/in")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in").schema).parquet(s"$tmp/in")
    val q = Similarity.ivfCellStatsStreaming(in, "vec_id", "embedding",
        "ts", cents, windowDur = "1 hour", watermark = "1 second")
      .writeStream.outputMode("append")
      .format("memory").queryName("drift_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("drift_out")
      .as[(java.sql.Timestamp, Int, Long, Long)].collect()
      .map { case (w, c, n, s) => (w.getTime, c) -> ((n, s)) }.toMap
    // batch truth: same assignment + same milli-scaled sums per window
    val want = Similarity.ivfCellStatsStreaming(stamped, "vec_id",
        "embedding", "ts", cents, windowDur = "1 hour",
        watermark = "1 second") // batch frame: watermark is a no-op
      .as[(java.sql.Timestamp, Int, Long, Long)].collect()
      .map { case (w, c, n, s) => (w.getTime, c) -> ((n, s)) }.toMap
    assert(got.nonEmpty, "watermark must close and emit windows")
    got.foreach { case (k, v) =>
      assert(want(k) == v, s"window/cell $k: $v vs ${want(k)}") }
    // append emits every closed window; only the final hour can be open
    assert(got.size >= want.size - cents.size,
      s"${got.size} of ${want.size} windows emitted")
  }

  test("BM25 on an empty corpus returns empty results, never throws") {
    import graft.ext.TextSearch
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val direct = TextSearch.bm25TopK(empty, "doc_id", "text",
      queries = Seq(1 -> "anything"), k = 5)
    assert(direct.count() == 0)
    assert(direct.columns.toSeq == Seq("qid", "rnk", "nid", "score"))
    val idx = TextSearch.buildBm25Index(empty, "doc_id", "text")
    assert(idx.nDocs == 0 && idx.totalTokens == 0)
    assert(TextSearch.bm25TopKOnIndex(idx,
      Seq(1 -> "anything"), k = 5).count() == 0)
  }

  test("quantizationAudit: fidelity near 1 for real vectors, null for zero") {
    val rnd = new scala.util.Random(19L)
    val rows = (1L to 20L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat))) :+
      ((99L, Array.fill(64)(0f)))
    val got = Similarity.quantizationAudit(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .select($"id", $"fidelity")
      .as[(Long, Option[Double])].collect().toMap
    assert(got(99L).isEmpty, "the zero vector has no direction to preserve")
    val fids = (1L to 20L).map(got(_).get)
    assert(fids.forall(f => f > 0.995 && f <= 1.0),
      s"int8 quantization must preserve direction: ${fids.min}")
  }

  test("connected components: chains merge, islands stay separate") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 10L), (3L, 4L))
      .toDF("id_a", "id_b")
    val comp = TextDedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).map(comp) == Seq(1L, 1L, 1L, 1L))
    assert(Seq(5L, 6L).map(comp) == Seq(5L, 5L))
    assert(Seq(8L, 9L, 10L).map(comp) == Seq(8L, 8L, 8L))
    // the local union-find and the distributed loop are the same operator
    // at two scales — force the distributed path and require an identical
    // fixpoint (threshold 0 disables the local solve)
    val dist = TextDedup.connectedComponents(pairs, localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == comp, s"local $comp vs distributed $dist")
    // non-long ids stay on the generic distributed path (min is
    // lexicographic) — the local solve must not narrow the contract
    val strPairs = Seq(("d1", "d2"), ("d2", "d3"), ("x8", "x9"))
      .toDF("id_a", "id_b")
    val strComp = TextDedup.connectedComponents(strPairs)
      .as[(String, String)].collect().toMap
    assert(strComp == Map("d1" -> "d1", "d2" -> "d1", "d3" -> "d1",
      "x8" -> "x8", "x9" -> "x8"), s"got $strComp")
  }

  test("contamination: benchmark n-gram overlap flags only overlapping docs") {
    import graft.ext.Curation
    val bench = Seq((100L, "a b c d e x y z")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "q q a b c d e q q"), // shares the 5-gram "a b c d e"
      (2L, "p p p p p p p p p"), // clean
      (3L, "a b c x d e f g h")) // shares tokens but no 5-gram
      .toDF("doc_id", "text")
    val got = Curation.contamination(corpus, "doc_id", "text", bench, "text", n = 5)
      .select($"doc_id", $"n_contaminated", $"n_grams")
      .as[(Long, Long, Int)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    assert(got.keySet == Set(1L), s"got $got")
    assert(got(1L) == (1L, 5)) // 1 of its 5 distinct 5-grams contaminated
  }

  test("repetitionScores: repeated text scores high, distinct text zero") {
    import graft.ext.Curation
    val docs = Seq(
      (1L, "x x x x x x"),   // one distinct token/2-gram
      (2L, "a b c d e f"))   // fully distinct
      .toDF("doc_id", "text")
    val got = Curation.repetitionScores(docs, "doc_id", "text")
      .as[(Long, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n1, dtr1, d2_1, _) = got(1L)
    assert(n1 == 6 && dtr1 == 1.0 / 6 && d2_1 == 1.0 - 1.0 / 5)
    val (_, n2, dtr2, d2_2, d3_2) = got(2L)
    assert(n2 == 6 && dtr2 == 1.0 && d2_2 == 0.0 && d3_2 == 0.0)
  }

  test("stratifiedSample: residue rule keeps exact per-stratum rates") {
    import graft.ext.Curation
    val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val got = Curation.stratifiedSample(rows, "doc_id", "source",
      pct = Map("a" -> 50), defaultPct = 0)
    // stratum a: ids 0..98 even; residue < 50 keeps 0,2,..,48 → 25 rows
    assert(got.filter($"source" === "a").count() == 2 * 25)
    assert(got.filter($"source" === "b").count() == 0)
    // deterministic: same rows on replay
    val twice = Curation.stratifiedSample(rows, "doc_id", "source",
      pct = Map("a" -> 50), defaultPct = 0)
    assert(got.select("doc_id").as[Long].collect().sorted.sameElements(
      twice.select("doc_id").as[Long].collect().sorted))
  }

  test("sequencePacking: chunk assignment follows the per-shard running sum") {
    import graft.ext.Curation
    // one shard (ids all ≡ 0 mod 1): tokens 4,3,5 against budget 8 →
    // doc 0 at (seq 0, off 0), doc 1 at (seq 0, off 4),
    // doc 2 starts at off 7 and SPANS into seq 1
    val rows = Seq((0L, "a b c d"), (1L, "e f g"), (2L, "h i j k l"))
      .toDF("doc_id", "text")
    val got = Curation.sequencePacking(rows, "doc_id", "text",
        budget = 8, shards = 1)
      .select($"doc_id", $"seq_id", $"off", $"spans")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(got.toList == List((0L, 0L, 0L, 0), (1L, 0L, 4L, 0),
      (2L, 0L, 7L, 1)), s"got ${got.toList}")
    // sharding: same docs across 3 shards each start their own stream
    val sharded = Curation.sequencePacking(rows, "doc_id", "text",
        budget = 8, shards = 3)
      .select($"off").as[Long].collect()
    assert(sharded.forall(_ == 0L))
  }

  test("domainCap: caps per stratum, deterministic across replays") {
    import graft.ext.Curation
    val rows = (0L until 100L).map(i => (i, s"s${i % 4}"))
      .toDF("doc_id", "source")
    val got = Curation.domainCap(rows, "doc_id", "source", cap = 5)
    val bySrc = got.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc.values.forall(_ == 5L) && bySrc.size == 4, s"got $bySrc")
    val twice = Curation.domainCap(rows, "doc_id", "source", cap = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(got.select("doc_id").as[Long].collect().sorted
      .sameElements(twice))
  }

  test("crossDocRepeats: only corpus-repeated n-grams count as boilerplate") {
    import graft.ext.Curation
    val rows = Seq(
      (1L, "nav home about contact footer plus unique words one"),
      (2L, "nav home about contact footer and other unique words"),
      (3L, "entirely fresh content with no shared gram sequences here"))
      .toDF("doc_id", "text")
    val got = Curation.crossDocRepeats(rows, "doc_id", "text",
        n = 5, minDocs = 2)
      .select($"doc_id", $"n_boiler").as[(Long, Long)].collect().toMap
    // docs 1/2 share exactly the 5-gram "nav home about contact footer";
    // doc 3 shares nothing and is absent
    assert(got == Map(1L -> 1L, 2L -> 1L), s"got $got")
  }

  test("funnel: first failing rule wins; shares sum to one") {
    import graft.ext.Curation
    val rows = Seq(
      (1L, "xx", "fr"),      // fails lang AND length — counts under lang
      (2L, "a b c", "en"),   // fails length only
      (3L, "a b c d e", "en"))
      .toDF("doc_id", "text", "lang")
    val got = Curation.funnel(rows, Seq(
        "lang" -> ($"lang" =!= "en"),
        "too_short" -> (size(split($"text", " ")) < 4)))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "lang" -> (1L, 1.0 / 3),
      "too_short" -> (1L, 1.0 / 3),
      "kept" -> (1L, 1.0 / 3)), s"got $got")
  }

  test("saltedJoin: identical to the plain join; hot key spreads salts") {
    import graft.ext.Skew
    // hot key: 90 of 100 fact rows share key 1
    val fact = (0L until 100L).map(i => (i, if (i < 90) 1L else i))
      .toDF("row_id", "k")
    val build = Seq((1L, "hot"), (95L, "cold")).toDF("k", "tag")
    val salted = Skew.saltedJoin(fact, build, key = "k", salt = 4,
      saltSource = $"row_id")
    val plain = fact.join(build, Seq("k"))
    assert(salted.select("row_id", "k", "tag").collect().toSet ==
      plain.select("row_id", "k", "tag").collect().toSet)
    // the hot key's rows actually use more than one salt bucket
    val salts = fact.filter($"k" === 1L)
      .select(pmod(xxhash64($"row_id"), lit(4)).as("s"))
      .distinct().count()
    assert(salts > 1, s"hot key stayed on $salts salt(s)")
  }

  test("text cleaning: lowercase, redact, strip, collapse") {
    val got = Seq("Contact Bob@Example.COM or call 12345678!!  Now.")
      .toDF("t").select(TextAnalysis.cleaned($"t")).as[String].collect()(0)
    assert(got == "contact <email> or call <num> now")
  }

  test("FreqSketch: sketch heavy hitters cover the exact top tokens") {
    val docs = graft.queries.Q.tbl(spark, sf(), "documents")
      .select(explode(split($"text", " ")).as("tok"))
    val exact = docs.groupBy($"tok").count()
      .orderBy($"count".desc, $"tok").limit(5)
      .select("tok").as[String].collect().toSet
    val sketch = docs.agg(graft.functions.FreqSketch($"tok", 64).as("m"))
      .select(explode($"m").as(Seq("tok", "n")))
      .orderBy($"n".desc, $"tok").limit(10)
      .select("tok").as[String].collect().toSet
    assert(exact.subsetOf(sketch),
      s"exact top-5 $exact must appear in sketch top-10 $sketch")
  }

  test("fingerprint is order-sensitive, language id picks marker language") {
    val fp = Seq((1L, "a b"), (2L, "b a")).toDF("id", "t")
      .select(TextAnalysis.fingerprint($"t")).as[Long].collect()
    assert(fp(0) != fp(1))
    val lang = Seq("the cat and the dog is here", "der hund und die katze ist hier")
      .toDF("t").select(TextAnalysis.langId($"t")).as[String].collect()
    assert(lang(0) == "en" && lang(1) == "de")
  }

  test("multimodal decode stub: deterministic meta + frame sampling") {
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
      .as[Multimodal.MediaRecord]
    val meta = Multimodal.decodeMeta(media)
    val rows = meta.collect()
    assert(rows.length == 5)
    assert(rows.forall(m => m.nBytes > 0 && m.width >= 64 && m.height >= 64))
    // identical bytes → identical meta (determinism)
    val byId = rows.map(m => m.id -> (m.width, m.height)).toMap
    assert(byId(1L) == byId(4L))
    val frames = Multimodal.sampleFrames(meta, every = 10)
    assert(frames.count() >= rows.count(_.nFrames > 0))
  }

  test("contaminationSpans merges overlapping hits into maximal spans") {
    import graft.ext.Curation
    val bench = Seq((100L, "a b c d e"), (101L, "p q r s t")).toDF("doc_id", "text")
    val corpus = Seq(
      // two hits at pos 2 and 3 (grams "a b c d e" at 2 via itself? no —
      // doc 1: tokens x y a b c d e f p q r s t u: gram@2 = "a b c d e"
      // (hit), gram@8 = "p q r s t" (hit) — separated by > n → 2 spans
      (1L, "x y a b c d e f p q r s t u"),
      // doc 2: "a b c d e" at 0 and overlapping again at 4? build
      // a b c d e a b c d e → hits at 0 and 5: 5 <= 0+5 → contiguous,
      // ONE span of length 10
      (2L, "a b c d e a b c d e"),
      // doc 3: no overlap
      (3L, "u v w x y z zz"),
      // doc 4: shorter than n, equals a bench doc exactly → whole-doc
      // gram hit at pos 0 — wait, "a b c" is not a bench gram; bench
      // docs are ≥ n tokens so their only grams are 5-grams; a short
      // corpus doc's whole-text gram can still match nothing → absent
      (4L, "a b c")).toDF("doc_id", "text")
    val got = Curation.contaminationSpans(corpus, "doc_id", "text",
        bench, "text", n = 5)
      .orderBy($"doc_id", $"start_tok")
      .select($"doc_id", $"span_idx", $"start_tok", $"len_toks")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List(
      (1L, 1L, 2L, 5L), (1L, 2L, 8L, 5L),
      (2L, 1L, 0L, 10L)), s"got $got")
  }

  test("BMP encode → ImageIO decode round-trips exact pixel stats") {
    import graft.ext.Multimodal
    // a 5×3 image with hand-computable channels
    val bytes = Multimodal.encodeBmp(5, 3,
      (x, y) => (10 * x, 20 * y, x + y))
    val st = Multimodal.decodeImage(bytes).get
    assert(st.width == 5 && st.height == 3 && st.nPx == 15)
    val xs = for (y <- 0 until 3; x <- 0 until 5) yield (x, y)
    assert(st.sumR == xs.map { case (x, _) => 10 * x }.sum)
    assert(st.sumG == xs.map { case (_, y) => 20 * y }.sum)
    assert(st.sumB == xs.map { case (x, y) => x + y }.sum)
    // the independent codec cross-check: the JDK PNG writer must decode
    // to the identical stats (stats are codec-independent pixel truth)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val png = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", png))
    assert(Multimodal.decodeImage(png.toByteArray).get == st)
    // garbage and empty bytes refuse quietly (stub fallback contract)
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
  }

  test("WAV encode → chunk-walking decode round-trips exact amplitude stats") {
    import graft.ext.Multimodal
    // stereo, hand-computable samples: frames (L,R) = (100,-200),(300,-400)
    val bytes = Multimodal.encodeWav(8000, 2,
      Array[Short](100, -200, 300, -400))
    assert(bytes.length == 44 + 8)
    val st = Multimodal.decodeWav(bytes).get
    assert(st == Multimodal.AudioStats(8000, 2, 2, 400, 1000))
    assert(st.durationUs == 250L) // 2 frames @ 8 kHz = 250 µs exact
    // chunk walker tolerates an extra chunk between fmt and data, with
    // RIFF odd-size padding: splice a 3-byte "LIST" chunk (padded to 4)
    val (head, data) = bytes.splitAt(36) // 36 = end of fmt chunk
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0)
    val spliced = head ++ extra ++ data
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8) // fix RIFF size
    assert(Multimodal.decodeWav(spliced).contains(st), "chunk walk + padding")
    // refusal paths: garbage, truncated data chunk, non-PCM format tag
    assert(Multimodal.decodeWav(
      "not audio at all, just forty-plus bytes of plain text".getBytes).isEmpty)
    assert(Multimodal.decodeWav(bytes.dropRight(2)).isEmpty, "truncated data")
    val nonPcm = bytes.clone()
    java.nio.ByteBuffer.wrap(nonPcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(20, 3.toShort)
    assert(Multimodal.decodeWav(nonPcm).isEmpty, "float WAV refused")
  }

  test("syntheticWav: decoded stats match the closed-form sample formula") {
    import graft.ext.Multimodal
    for (docId <- Seq(0L, 1L, 7L, 42L)) {
      val st = Multimodal.decodeWav(Multimodal.syntheticWav(docId)).get
      val c = (1 + docId % 2).toInt
      val nf = (64 + docId % 33).toInt
      val vs = (0 until nf * c).map(i =>
        math.abs((docId * 31L + 17L * i) % 4096L - 2048L))
      assert(st.sampleRate == 8000 && st.channels == c && st.nFrames == nf)
      assert(st.peakAbs == vs.max && st.sumAbs == vs.sum, s"doc $docId")
    }
  }

  test("GIF sequence encode → stride-sampled decode is frame-exact") {
    import graft.ext.Multimodal
    // 4 frames, luma = (x + 2y + 10f) % 256 — hand-checkable sums
    val bytes = Multimodal.encodeGif(3, 2, 4,
      (x, y, f) => (x + 2 * y + 10 * f) % 256)
    def lumaSum(f: Int) =
      (for (y <- 0 until 2; x <- 0 until 3) yield (x + 2 * y + 10 * f) % 256).sum
    // stride 2 decodes frames 0 and 2 ONLY
    val got = Multimodal.decodeGifFrames(bytes, stride = 2).get
    assert(got == Seq((0, 3, 2, lumaSum(0).toLong), (2, 3, 2, lumaSum(2).toLong)),
      got.toString)
    // stride 1 sees all four
    assert(Multimodal.decodeGifFrames(bytes, 1).get.map(_._1) == Seq(0, 1, 2, 3))
    // refusal: non-GIF bytes
    assert(Multimodal.decodeGifFrames("GIF-shaped but not".getBytes, 1).isEmpty)
    assert(Multimodal.decodeGifFrames("plain text".getBytes, 1).isEmpty)
  }

  test("videoFrameStats: sampled frames decode, garbage rows drop") {
    import graft.ext.Multimodal
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val rows = Seq(
      Multimodal.MediaRecord(1L, "video", Multimodal.syntheticGif(1L)),
      Multimodal.MediaRecord(2L, "video", "not a gif".getBytes)).toDS()
    val got = Multimodal.videoFrameStats(rows, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 1: nf = 2 + 1 % 4 = 3 frames -> sampled 0, 2; doc 2 drops
    assert(got.toSet == Set((1L, 0L), (1L, 2L)), got.toList.toString)
  }

  test("audioStats: parse yield — WAV rows decode, garbage rows drop") {
    import graft.ext.Multimodal
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val rows = Seq(
      Multimodal.MediaRecord(1L, "audio", Multimodal.syntheticWav(1L)),
      Multimodal.MediaRecord(2L, "audio", "definitely not RIFF".getBytes),
      Multimodal.MediaRecord(3L, "audio", Multimodal.encodeWav(16000, 1, Array[Short](5, -5, 5, -5))))
    val got = Multimodal.audioStats(spark.createDataset(rows))
      .orderBy($"id").collect()
    assert(got.map(_.getLong(0)).toList == List(1L, 3L), "garbage dropped")
    val r3 = got(1)
    assert(r3.getLong(1) == 16000L && r3.getLong(3) == 4L &&
      r3.getLong(4) == 250L && r3.getLong(5) == 5L && r3.getLong(6) == 20L)
  }

  test("decodeMeta: real image bytes report true dims, text bytes fall back") {
    import graft.ext.Multimodal
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.encodeBmp(9, 4, (_, _) => (1, 2, 3))),
      Multimodal.MediaRecord(2L, "image", "just text".getBytes), // stub path
      Multimodal.MediaRecord(3L, "audio", Multimodal.encodeBmp(9, 4, (_, _) => (1, 2, 3))))
    val meta = Multimodal.decodeMeta(spark.createDataset(rows))
      .collect().map(m => m.id -> m).toMap
    assert(meta(1L).width == 9 && meta(1L).height == 4, "real decode")
    assert(meta(2L).width >= 64, "non-image bytes take the stub path")
    assert(meta(3L).width >= 64, "audio never routes through ImageIO")
  }

  test("bruteForceTopK: zero-norm corpus rows rank last, never poison top-k") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f))) // empty doc → zero vector
      .toDF("id", "embedding")
    val q = corpus.filter($"id" === 1L)
    val top = graft.ext.Similarity.bruteForceTopK(
        corpus, q, "id", "embedding", k = 2)
      .select($"nid").as[Long].collect().toList
    // without the zero-norm guard, 0/0 = NaN sorts ABOVE 1.0 in desc
    // order and id 3 would be rank 1
    assert(top == List(1L, 2L), s"got $top")
  }

  test("multimodal resize + feature extraction feed ANN end to end") {
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
      .as[Multimodal.MediaRecord]
    // resize: output bytes track the target dims; determinism across dups
    val resized = Multimodal.resize(media, 128, 128).collect()
    assert(resized.forall(r =>
      r.width == 128 && r.height == 128 && r.media.length == 128 * 128 / 64))
    val rById = resized.map(r => r.id -> r.media.toSeq).toMap
    assert(rById(1L) == rById(4L)) // docs 1 and 4 are byte-identical
    // features: the Array[Float] column composes straight into the ANN
    // operator — docs 1 and 4 (exact dups) are each other's nearest
    val feats = Multimodal.features(media, dim = 8)
    val top = graft.ext.Similarity.bruteForceTopK(
        feats, feats.filter($"id" === 1L), "id", "embedding", k = 2)
      .select("nid").as[Long].collect().toSet
    assert(top == Set(1L, 4L), s"got $top")
  }

  test("resize: real decode + integer nearest-neighbor matches the pixel " +
      "formula; undecodable bytes keep the budget fallback") {
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val ids = Seq(0L, 3L, 10L, 62L)
    val media = ids.map(i =>
      Multimodal.MediaRecord(i, "image", Multimodal.syntheticBmp(i))).toDS()
    val (rw, rh) = (16, 12)
    val out = Multimodal.resize(media, rw, rh).collect()
      .map(r => r.id -> r).toMap
    for (i <- ids) {
      val (sw, sh) = ((8 + i % 9).toInt, (8 + i % 7).toInt)
      // the resized payload is a REAL BMP: decode it and compare every
      // pixel against the formula sampled at src = dst·srcDim div dstDim
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out(i).media))
      assert(img.getWidth == rw && img.getHeight == rh)
      for (y <- 0 until rh; x <- 0 until rw) {
        val (sx, sy) = (x * sw / rw, y * sh / rh)
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == ((i + 7L * sx + 13L * sy) % 256).toInt,
          s"id=$i px=($x,$y) r")
        assert(((rgb >> 8) & 0xff) == ((3L * i + 11L * sx + sy) % 256).toInt,
          s"id=$i px=($x,$y) g")
        assert((rgb & 0xff) == ((sx.toLong * sy + i) % 256).toInt,
          s"id=$i px=($x,$y) b")
      }
    }
    // non-image bytes: total operator, budget-shaped fallback payload
    val junk = Seq(Multimodal.MediaRecord(99L, "audio",
      Array[Byte](1, 2, 3))).toDS()
    val fb = Multimodal.resize(junk, 16, 12).head()
    assert(fb.media.length == 16 * 12 / 64 && fb.width == 16)
  }

  test("bloomExactMatches equals the exact semi-join; bloom fps die in verify") {
    // benchmark = doc 1's text; docs 1 AND 4 (its exact dup) must match
    val bench = docs.filter($"doc_id" === 1L).select($"text".as("btext"))
    val got = Curation.bloomExactMatches(docs, "doc_id", "text",
        bench, "btext")
      .as[Long].collect().toSet
    val exact = docs.join(bench.withColumnRenamed("btext", "text"),
        Seq("text"), "left_semi")
      .select($"doc_id").as[Long].collect().toSet
    assert(got == exact && got == Set(1L, 4L), s"got $got")
    // disjoint benchmark: nothing survives the verify stage even if the
    // bloom lets a false positive through
    val none = Curation.bloomExactMatches(docs, "doc_id", "text",
        Seq("text never in the corpus").toDF("btext"), "btext")
      .count()
    assert(none == 0L)
    // empty benchmark: the bounded-action guard returns empty, not a throw
    val empty = Curation.bloomExactMatches(docs, "doc_id", "text",
        bench.filter(lit(false)), "btext")
      .count()
    assert(empty == 0L)
  }

  test("bloom prefilter is plan-local: corpus reaches the verify join pre-pruned") {
    // a FILE-backed corpus: over a LocalRelation the optimizer
    // constant-folds the probe away entirely (also fine, but nothing to
    // pin); over a FileScan the Filter node must survive, scan-local,
    // with the sketch as a plan literal
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    docs.write.parquet(s"$tmp/corpus")
    val corpus = spark.read.parquet(s"$tmp/corpus")
    val bench = docs.filter($"doc_id" === 1L).select($"text".as("btext"))
    val out = Curation.bloomExactMatches(corpus, "doc_id", "text", bench, "btext")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom probe missing from plan:\n$plan")
    // and the probe sits UNDER the verify join (no exchange between the
    // scan and the filter): the first Exchange in the plan is the
    // verify join's broadcast, not a corpus shuffle
    val filterIdx = plan.indexOf("might_contain")
    val scanIdx = plan.indexOf("Scan parquet")
    assert(scanIdx > filterIdx,
      s"probe is not between scan and join:\n$plan")
  }

  test("hostBlockRule: suffix semantics on label boundaries only") {
    val rules = Seq("example.org", "ads.tracker.net")
    val got = Seq(
      "a.b.example.org",   // subdomain → example.org
      "example.org",       // exact → example.org
      "notexample.org",    // label boundary: NOT blocked
      "x.ads.tracker.net", // deep subdomain → ads.tracker.net
      "tracker.net",       // parent of a rule: NOT blocked
      "clean.com")
      .toDF("host")
      .select(TextAnalysis.hostBlockRule($"host", rules).as("r"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toList == List(Some("example.org"), Some("example.org"),
      None, Some("ads.tracker.net"), None, None), s"got ${got.toList}")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by content") {
    val vOld = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val vNew = Seq((1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Curation.snapshotDiff(vOld, vNew, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), s"got $got")
  }

  test("leakageSafeSplit: cluster members never straddle splits") {
    // docs 1/2/4 share an 8-word prefix → one cluster, one split
    val got = Curation.leakageSafeSplit(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = got.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(1L) == byId(2L) && byId(1L) == byId(4L),
      s"cluster straddles splits: $byId")
    assert(byId(1L)._1 == 1L, "representative must be the cluster min id")
    // singletons represent themselves
    assert(byId(3L)._1 == 3L && byId(5L)._1 == 5L)
    // decided from the rep: re-running over a reordered frame agrees
    val again = Curation
      .leakageSafeSplit(docs.orderBy($"doc_id".desc), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.map(t => t._1 -> t._3).toMap == again)
  }

  test("weightedPrioritySample: heavier docs win, order integer-exact") {
    val df = (1L to 200L).map(i => (i, if (i % 50 == 0) 100000L else 10L))
      .toDF("doc_id", "w")
    val got = Curation.weightedPrioritySample(df, "doc_id", "w", k = 10)
      .collect()
    assert(got.length == 10)
    // the four heavy docs (w=100000) have priorities ~1e4× smaller than
    // any light doc — all must be sampled
    val ids = got.map(_.getLong(0)).toSet
    assert(Set(50L, 100L, 150L, 200L).subsetOf(ids), s"got $ids")
    // plans as TakeOrdered — no global sort, no exchange of the corpus
    val plan = Curation.weightedPrioritySample(df, "doc_id", "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("bpePairCounts: pair counts weight by word frequency") {
    val df = Seq("aab aab ab", "aab xy").toDF("text")
    // vocab: aab×3, ab×1, xy×1; pairs: aa←3, ab←3+1=4, xy←1
    val got = Curation.bpePairCounts(df, "text", top = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(got == List("ab" -> 4L, "aa" -> 3L, "xy" -> 1L), s"got $got")
  }

  test("sourceOverlap: exact pairwise cluster Jaccard, a<b ordering") {
    val got = Curation.sourceOverlap(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // source a: clusters {fox, different} (docs 1,2 share the prefix);
    // source b: clusters {fox, unrelated}; shared: fox → inter=1, un=3
    assert(got.toList == List(("a", "b", 1L, 2L, 2L, 3L, 3333L)),
      s"got ${got.toList}")
  }

  test("globalRowNumber: dense global rank without a single-task window") {
    import graft.ext.Sharding
    val df = spark.range(1, 1001).toDF("id")
      .withColumn("key", pmod($"id" * 7919, lit(1000)))
    val got = Sharding.globalRowNumber(df, Seq($"key", $"id"))
    val rows = got.select("key", "id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sorted.toList == (1L to 1000L).toList)
    // rn order agrees with the declared total order
    val inOrder = rows.sortBy(_._3).map(t => (t._1, t._2))
    assert(inOrder.toList == rows.map(t => (t._1, t._2)).sortBy(identity).toList)
    // and no stage collapses to one partition for the rank
    assert(!got.queryExecution.executedPlan.toString.contains("Window"),
      "global rank must not plan a window")
  }

  test("cdcChunkDedup: inserted word shifts chunks without changing them") {
    // a forked copy with ONE word inserted at the front: content-defined
    // boundaries re-synchronize, so every chunk after the first still
    // dedups — the property fixed tiling loses by misaligning all tiles
    val base = (1 to 120).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, "INSERTED " + base))
      .toDF("doc_id", "text")
    val dup = Curation.cdcChunkDedup(df, "doc_id", "text", divisor = 8)
      .collect()
    // chunk boundaries depend only on word content, so all of doc 1's
    // chunks except (possibly) the first are byte-identical in doc 2
    assert(dup.length >= 3, s"expected shared chunks, got ${dup.length}")
    assert(dup.forall(r => r.getAs[Long]("n_docs") == 2L))
    // fixed tiling at the same granularity shares nothing after the shift
    val tiledShared = Curation.chunkDedup(df, "doc_id", "text", chunk = 8)
      .agg(sum("n_dup_chunks")).collect()(0).getLong(0)
    assert(tiledShared == 0L,
      s"fixed tiling unexpectedly re-aligned: $tiledShared")
  }

  test("editDistanceOnePairs: deletion neighborhood equals brute force") {
    val df = Seq("abc", "abd", "abcd", "xbc", "zzz", "abc")
      .toDF("name")
    val got = graft.ext.Fuzzy.editDistanceOnePairs(df, "name")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toList
    // sub: abc~abd, abc~xbc; indel: abc~abcd, abcd~abd (delete the c;
    // lexicographically "abcd" < "abd")
    assert(got == List("abc" -> "abcd", "abc" -> "abd", "abc" -> "xbc",
      "abcd" -> "abd"), s"got $got")
  }

  test("bpeLearn: merges contract left-to-right and feed later rounds") {
    // vocab: "aaab"×2, "ab"×1. round 1 pairs: aa←4 (two per "aaab"),
    // ab←3. merge (a,a): aaab→[aa,a,b]. round 2: aa+a←2, a+b←3 →
    // merge (a,b): aaab→[aa,a? no — ab now wins: [aa,ab]; ab→[ab].
    val df = Seq("aaab aaab ab").toDF("text")
    val got = Curation.bpeLearn(df, "text", merges = 3)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toList
    assert(got == List((1, "a", "a", 4L), (2, "a", "b", 3L),
      (3, "aa", "ab", 2L)), s"got $got")
  }

  test("assignDenseIds: ids dense after the standing max, replay-stable") {
    import graft.ext.Sharding
    val existing = Seq((10L, "x"), (40L, "y")).toDF("doc_id", "source")
    val incoming = Seq((3L, "b"), (1L, "a"), (2L, "a"))
      .toDF("doc_id", "source")
    val got = Sharding.assignDenseIds(existing, "doc_id", incoming,
        Seq($"source", $"doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("new_id")).toMap
    assert(got == Map(1L -> 41L, 2L -> 42L, 3L -> 43L), s"got $got")
  }

  test("madOutliers: median/MAD gate, zero-MAD stratum flags any deviation") {
    val df = Seq((1L, 10L, "s"), (2L, 10L, "s"), (3L, 10L, "s"),
      (4L, 10L, "s"), (5L, 100L, "s"))
      .toDF("doc_id", "n_chars", "source")
    val got = Curation.madOutliers(df, "doc_id", "n_chars", "source")
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    // med=10, MAD=0: only the 100 deviates (90 > 3*0)
    assert(got == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> true), s"got $got")
  }

  test("skewAudit: integer share and skew factor over the mean key") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val got = graft.ext.Skew.skewAudit(df, "k", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4),
        r.getLong(5))).toList
    // a: 6/10 = 6000bp, skew = 100*6*3/10 = 180 (1.8x the mean key)
    assert(got == List(("a", 6L, 6000L, 180L), ("b", 2L, 2000L, 60L)),
      s"got $got")
  }

  test("hashedLinearScore: scan-local fold, scores bounded by weights") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "zz")).toDF("doc_id", "text")
    val out = Curation.hashedLinearScore(df, "doc_id", "text")
    val got = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // deterministic: identical text → identical score; mean of [-1,1)
    // weights stays in [-1, 1)
    assert(got(1L) == got(2L))
    assert(got.values.forall(s => s >= -1.0 && s < 1.0), s"got $got")
    // inference is scan-local — no exchange anywhere in the plan
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1500))
  }

  test("effectiveTokens: cluster copies drop out of the effective count") {
    // docs 1/2 share the 8-word prefix (one cluster); doc 3 is its own
    val pre = "p1 p2 p3 p4 p5 p6 p7 p8"
    val df = Seq((1L, s"$pre tail one", "s"), (2L, s"$pre other", "s"),
      (3L, "different prefix words here make their own cluster x", "s"))
      .toDF("doc_id", "text", "source")
    val got = Curation.effectiveTokens(df, "doc_id", "text", "source")
      .collect()(0)
    // raw: 10 + 9 + 9 = 28; effective keeps doc 1 (10) + doc 3 (9)
    assert(got.getAs[Long]("raw_tokens") == 28L, got.toString)
    assert(got.getAs[Long]("effective_tokens") == 19L, got.toString)
    assert(got.getAs[Long]("dup_overhead_bp") == 10000L * 9 / 28, got.toString)
  }

  test("shardPlan: snake deal balances token totals across shards") {
    val df = (1L to 100L).map(i => (i, "w " * ((i % 17).toInt + 1)))
      .toDF("doc_id", "text")
    val got = graft.ext.Sharding
      .shardPlan(df, "doc_id", size(split($"text", " ")).cast("long"), shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toList == List(0L, 1L, 2L, 3L))
    assert(got.map(_._2).sum == 100L)
    val tokens = got.map(_._3)
    // snake deal: spread bounded by one max document's tokens (18 here)
    assert(tokens.max - tokens.min <= 18L,
      s"unbalanced shards: ${tokens.toList}")
  }

  test("bpeEncodeCounts: nested-fold encode equals the local encoder") {
    // merges learned elsewhere; apply (a,a) then (aa,b): "aaab" →
    // [aa,ab]? no — rank order: (a,a): [aa,a,b]; (aa,b) no adjacency
    // (a between) → 3 tokens. "aab" → (a,a): [aa,b]; (aa,b): [aab] →
    // 1 token. "ba" untouched → 2 tokens.
    val df = Seq((1L, "aaab aab ba")).toDF("doc_id", "text")
    val got = Curation.bpeEncodeCounts(df, "doc_id", "text",
        Seq("a" -> "a", "aa" -> "b"))
      .collect()(0)
    assert(got.getAs[Long]("n_words") == 3L, got.toString)
    assert(got.getAs[Long]("n_chars_ws") == 11L, got.toString)
    assert(got.getAs[Long]("n_bpe_tokens") == (3L + 1L + 2L), got.toString)
  }

  test("encodingAdvisor: distinct/run/width stats drive the advice") {
    import graft.ext.Sharding
    // 4 groups × 3 rows: flag has 2 distinct values constant within a
    // group (4 runs), id is unique per row, note is one constant
    val rows = for (g <- 1L to 4L; i <- 1L to 3L) yield
      (g, i, if (g <= 2) "A" else "B", g * 3 + i, "x" * 40)
    val df = rows.toDF("g", "o", "flag", "id", "note")
    val got = Sharding.encodingAdvisor(df, $"g", $"o",
        Seq("flag" -> $"flag", "id" -> $"id", "note" -> $"note"),
        dictBp = 2000L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_distinct"), r.getAs[Long]("runs"),
          r.getString(7))).toMap
    // flag: distinct_bp = floor((2e4·2+12)/24) = 1667 ≤ 2000 → DICT
    assert(got("flag") == ((2L, 4L, "DICT")), got.toString)
    // id: all-distinct, run-per-row, avg width 1.5 chars → PLAIN
    assert(got("id") == ((12L, 12L, "PLAIN")), got.toString)
    // note: 1 distinct → DICT wins before the width rule sees it
    assert(got("note")._1 == 1L, got.toString)
    assert(got("note")._3 == "DICT", got.toString)
  }

  test("parseJsonl: malformed lines quarantine, good lines parse fully") {
    val df = Seq(
      """{"id": 1, "lang": "en", "text": "hello"}""",
      """{"id": 2, "lang": "fr", "text": "bonj""", // truncated mid-string
      """not json at all""",
      """{"lang": "de", "text": "ok but no id"}""" // parses, id missing
    ).toDF("j")
    val got = graft.sources.TableIO
      .parseJsonl(df, "j", "id BIGINT, lang STRING, text STRING", "id")
      .select($"ok", $"parsed.id", $"parsed.lang").collect()
    assert(got.map(_.getBoolean(0)).toList ==
      List(true, false, false, false))
    assert(got(0).getLong(1) == 1L && got(0).getString(2) == "en")
    // the no-id line parsed its other fields — quarantine is the id
    // contract, not json validity
    assert(got(3).getString(2) == "de")
  }

  test("parseCsv: quoted commas pass, truncated rows quarantine") {
    val df = Seq(
      """1,en,hello world""",
      """2,fr,"bonjour, monde"""", // quoted comma — well-formed
      """3,de""",                  // truncated: text column missing
      """,en,no id here""",        // id absent
      """4,en,"a","extra"""        // too many columns
    ).toDF("c")
    val got = graft.sources.TableIO
      .parseCsv(df, "c", "id BIGINT, lang STRING, text STRING", "id")
      .select($"ok", $"parsed.id", $"parsed.text").collect()
    assert(got.map(_.getBoolean(0)).toList ==
      List(true, true, false, false, false), got.toList.toString)
    // the quoted comma parsed as ONE field, not two
    assert(got(1).getString(2) == "bonjour, monde")
    // quarantined rows still expose what did parse (id for row 3)
    assert(got(2).getLong(1) == 3L)
  }

  test("rangePartitionPlan: buckets partition the domain, counts total") {
    import graft.ext.Sharding
    val df = (1L to 80L).map(v => Tuple1(v)).toDF("v")
    val got = Sharding.rangePartitionPlan(df, $"v", buckets = 4)
      .orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toList == List(0L, 1L, 2L, 3L), got.toList.toString)
    assert(got.map(_._2).sum == 80L)
    // buckets are contiguous, non-overlapping ranges
    for (i <- 1 until got.length)
      assert(got(i - 1)._4 < got(i)._3, got.toList.toString)
    // uniform input → equal-ish buckets (quantile boundaries)
    assert(got.map(_._2).max - got.map(_._2).min <= 1L, got.toList.toString)
  }

  test("zOrderKey: bit interleave matches the local Morton reference") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val df = (for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y))
      .toDF("x", "y")
    val got = df.withColumn("z",
        graft.ext.Sharding.zOrderKey(Seq($"x", $"y"), bits = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == morton(x, y, 4), s"($x,$y) -> $z") }
    // bijective on the 16x16 grid
    assert(got.map(_._3).distinct.length == 256)
  }

  test("zOrderKey: range buckets bound every dimension's span") {
    val df = (for (x <- 0L to 63L; y <- 0L to 63L) yield (x, y))
      .toDF("x", "y")
    val spans = df.withColumn("z",
        graft.ext.Sharding.zOrderKey(Seq($"x", $"y"), bits = 6))
      .withColumn("bucket", expr("z div 64")) // drop 3 bits per dim
      .groupBy($"bucket")
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .collect()
    assert(spans.length == 64)
    // each bucket is one 8x8 tile — both dims pruned at once
    spans.foreach(r => assert(
      r.getAs[Long]("sx") <= 7L && r.getAs[Long]("sy") <= 7L, r.toString))
  }

  test("compactionPlan: next-fit keeps manifest order and fills bins") {
    val m = Seq((1L, 30L), (2L, 50L), (3L, 40L), (4L, 10L), (5L, 100L),
      (6L, 5L)).toDF("file_id", "bytes")
    val got = graft.ext.Sharding
      .compactionPlan(m, $"file_id", $"bytes", targetBytes = 100L)
      .orderBy($"file_id")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("bin")))
    // cum before: 0,30,80,120,130,230 -> bins 0,0,0,1,1,2
    assert(got.toList == List((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L),
      (5L, 1L), (6L, 2L)), got.toList.toString)
    // bins are contiguous runs of the manifest order
    val byBin = got.groupBy(_._2).view.mapValues(_.map(_._1))
    byBin.foreach { case (_, fs) =>
      assert(fs.max - fs.min + 1 == fs.length, fs.toList.toString) }
  }

  test("compactionPlan: appending files never re-bins the existing manifest") {
    // the incrementality contract: next-fit bins depend only on the
    // PREFIX byte sum, so appended files can extend the last bin or
    // open new ones but can never move an earlier file — an incremental
    // compactor re-plans only from the last bin forward
    val v1 = Seq((1L, 60L), (2L, 60L), (3L, 30L)).toDF("file_id", "bytes")
    val v2 = v1.unionByName(
      Seq((4L, 70L), (5L, 90L)).toDF("file_id", "bytes"))
    def plan(m: org.apache.spark.sql.DataFrame) = graft.ext.Sharding
      .compactionPlan(m, $"file_id", $"bytes", targetBytes = 100L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("bin"))).toMap
    val (p1, p2) = (plan(v1), plan(v2))
    p1.foreach { case (f, b) => assert(p2(f) == b, s"file $f moved") }
    assert(p2(4L) >= p1.values.max) // appends land at or after the tail
  }

  test("bpe_encode_len: native scan equals the HOF fold on adversarial inputs") {
    graft.functions.Functions.register(spark)
    val merges = Seq(("a", "a"), ("aa", "b"), ("c", "d"))
    val texts = Seq(
      "aaab aab ba", "aaaa", "cdcd ccdd", "", " ", "a  b", "trailing ",
      " leading", "nomerge words here", "aabaab", "ab" * 20,
      "unicode héllo åå") ++
      (1 to 50).map(i => Seq.fill(i % 7 + 1)(
        ("abcd" * (i % 5 + 1)).drop(i % 3)).mkString(" "))
    val df = texts.toDF("t")
    val cmp = df.select(
      call_function("bpe_encode_len", $"t",
        array(merges.map(m => lit(m._1)): _*),
        array(merges.map(m => lit(m._2)): _*)).as("native"),
      graft.ext.Curation.bpeEncodeLenHof($"t", merges).as("hof"),
      $"t")
    cmp.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"mismatch on '${r.getString(2)}': native=${r.get(0)} hof=${r.get(1)}")
    }
  }

  test("hrwShard: growing k by one moves keys ONLY to the new shard") {
    val df = (0L until 2000L).toDF("k")
    val moves = df.select(
        graft.ext.Sharding.hrwShard($"k", 8).as("old"),
        graft.ext.Sharding.hrwShard($"k", 9).as("nw"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val moved = moves.filter { case (o, n) => o != n }
    moved.foreach { case (_, n) => assert(n == 8L, moved.toList.take(5)) }
    // expected 1/9 ≈ 222; the portable weight is weaker than a real
    // hash, so allow a wide band — the CONTRACT is the target, not the
    // fraction
    assert(moved.length > 50 && moved.length < 700, moved.length)
    // every shard under k=8 is actually populated
    assert(moves.map(_._1).distinct.length == 8)
  }

  test("cdc_chunks: native scan equals the HOF fold on adversarial inputs") {
    graft.functions.Functions.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running",
      "", " ", "a", "a  b", "trailing ", " leading", "unicode héllo åå",
      "x " * 40) ++
      (1 to 60).map(i => (1 to (i % 25 + 1)).map(j =>
        s"w${(i * j) % 13}").mkString(" "))
    val df = texts.toDF("t")
    for (d <- Seq(2, 4, 16)) {
      val cmp = df.select(
        call_function("cdc_chunks", $"t", lit(d)).as("native"),
        graft.ext.Curation.cdcChunksHof("t", d).as("hof"), $"t")
      cmp.collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"d=$d mismatch on '${r.getString(2)}': " +
            s"${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("hrwShard: the move-only-to-new-shard contract holds for every fleet size") {
    val df = (0L until 600L).toDF("k")
    val cols = (1 to 12).map(k =>
      graft.ext.Sharding.hrwShard($"k", k).as(s"s$k"))
    val rows = df.select(cols: _*).collect()
    for (k <- 1 until 12) {
      val moved = rows.filter(r => r.getLong(k - 1) != r.getLong(k))
      moved.foreach(r => assert(r.getLong(k) == k.toLong,
        s"k=$k -> ${k + 1}: mover landed on ${r.getLong(k)}"))
    }
  }

  test("imageAHash: decoded-crop hash matches the pixel formula and is " +
      "brightness-shift tolerant") {
    import graft.ext.Multimodal
    def local(id: Long): (Long, Long) = {
      val gray = (0 until 64).map { i =>
        val (x, y) = (i % 8, i / 8)
        ((id + 7L * x + 13L * y) % 256 + (3L * id + 11L * x + y) % 256 +
          (x.toLong * y + id) % 256).toInt
      }
      val total = gray.map(_.toLong).sum
      val bits = gray.map(g => if (64L * g > total) 1L else 0L)
      (bits.take(32).foldLeft(0L)((a, b) => (a << 1) | b),
        bits.drop(32).foldLeft(0L)((a, b) => (a << 1) | b))
    }
    val ids = Seq(0L, 1L, 7L, 255L, 256L, 257L, 300L, 511L)
    val media = ids.map(i =>
      Multimodal.MediaRecord(i, "image", Multimodal.syntheticBmp(i))).toDS()
    val got = Multimodal.imageAHash(media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // real decode == formula, for every probe id
    ids.foreach(i => assert(got(i) == local(i), s"id=$i"))
    // ids congruent mod 256 render identical crops -> identical hashes
    assert(got(0L) == got(256L) && got(1L) == got(257L))
    // adjacent ids are near-global brightness shifts -> tiny hamming
    def ham(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham(got(0L), got(1L)) <= 6, ham(got(0L), got(1L)).toString)
    // garbage bytes and sub-crop images drop, never throw
    val junk = Seq(Multimodal.MediaRecord(9L, "image", Array[Byte](1, 2, 3)),
      Multimodal.MediaRecord(10L, "image",
        Multimodal.encodeBmp(4, 4, (_, _) => (1, 2, 3)))).toDS()
    assert(Multimodal.imageAHash(junk).count() == 0L)
  }

  test("streaming near-dup over image aHash signatures: cross-batch " +
      "duplicate images flagged, fresh images kept") {
    import graft.ext.{Multimodal, TextDedup}
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndimg").toString
    // batch 1: three STRUCTURALLY distinct patterns (gradient, checker,
    // half-plane — far apart in vote space; the syntheticBmp formula
    // family is all near-identical by design and unusable here);
    // batch 2: a re-encode of the gradient + a fresh inverse checker
    def mono(v: Int) = (v, v, v)
    val gradient = Multimodal.encodeBmp(8, 8, (x, _) => mono(x * 30))
    val checker = Multimodal.encodeBmp(8, 8,
      (x, y) => mono(if ((x + y) % 2 == 0) 255 else 0))
    val halfPlane = Multimodal.encodeBmp(8, 8,
      (_, y) => mono(if (y < 4) 255 else 0))
    val invChecker = Multimodal.encodeBmp(8, 8,
      (x, y) => mono(if ((x + y) % 2 == 1) 255 else 0))
    def write(f: String, rows: Seq[(Long, Array[Byte], String)]): Unit =
      rows.toDF("doc_id", "media", "ts")
        .withColumn("ts", $"ts".cast("timestamp"))
        .coalesce(1).write.parquet(s"$tmp/in/$f")
    write("f1", Seq((1L, gradient, "2026-01-01 10:00:00"),
      (2L, checker, "2026-01-01 10:00:01"),
      (3L, halfPlane, "2026-01-01 10:00:02")))
    write("f2", Seq((4L, gradient, "2026-01-01 10:00:03"),
      (5L, invChecker, "2026-01-01 10:00:04")))
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    // signature column: the aHash halves packed into ONE 64-bit long —
    // the same executor-side decode the batch operator uses, as a UDF
    val ah = udf((bytes: Array[Byte]) => Multimodal.aHash64(bytes))
    val sigged = in.withColumn("sig", ah($"media"))
    val q = TextDedup.nearDupStreamingSig(sigged, "doc_id", "sig", "ts",
        maxHamming = 3, bands = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndimg_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ndimg_out").select($"id", $"dup_of", $"kept")
      .as[(Long, Option[Long], Long)].collect()
      .map { case (i, d, k) => i -> ((d, k)) }.toMap
    assert(got(1L) == ((None, 1L)) && got(2L) == ((None, 1L)) &&
      got(3L) == ((None, 1L)), got.toString)
    assert(got(4L) == ((Some(1L), 0L)),
      s"cross-batch image dup must flag against image 1: ${got(4L)}")
    assert(got(5L)._2 == 1L, s"fresh image must be kept: ${got(5L)}")
  }

  test("streaming near-dup over audio fingerprints: a gain-scaled " +
      "re-encode flags against the original, fresh audio kept") {
    import graft.ext.{Multimodal, TextDedup}
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndaud").toString
    // trend bits are exactly gain-invariant: e'(w) = g·e(w) preserves
    // every adjacent comparison, so a re-encode at 3x volume (no
    // clipping: |sample| ≤ 2047·3 < 32767) fingerprints identically
    def wav(seed: Long): Array[Byte] = Multimodal.syntheticWav(seed)
    def gained(seed: Long, g: Int): Array[Byte] =
      Multimodal.syntheticWavGain(seed, g)
    def write(f: String, rows: Seq[(Long, Array[Byte], String)]): Unit =
      rows.toDF("doc_id", "media", "ts")
        .withColumn("ts", $"ts".cast("timestamp"))
        .coalesce(1).write.parquet(s"$tmp/in/$f")
    write("f1", Seq((1L, wav(100L), "2026-01-01 10:00:00"),
      (2L, wav(7L), "2026-01-01 10:00:01")))
    write("f2", Seq((3L, gained(100L, 3), "2026-01-01 10:00:02"),
      (4L, wav(250L), "2026-01-01 10:00:03")))
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val afp = udf((bytes: Array[Byte]) => Multimodal.audioFp64(bytes))
    val q = TextDedup.nearDupStreamingSig(
        in.withColumn("sig", afp($"media")), "doc_id", "sig", "ts",
        maxHamming = 3, bands = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndaud_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ndaud_out").select($"id", $"dup_of", $"kept")
      .as[(Long, Option[Long], Long)].collect()
      .map { case (i, d, k) => i -> ((d, k)) }.toMap
    assert(got(1L)._2 == 1L && got(2L)._2 == 1L, got.toString)
    assert(got(3L) == ((Some(1L), 0L)),
      s"gain-scaled re-encode must flag against clip 1: ${got(3L)}")
    assert(got(4L)._2 == 1L, s"fresh clip must be kept: ${got(4L)}")
  }

  test("streaming near-dup over video fingerprints: a brightness-shifted " +
      "re-encode flags against the original, fresh clip kept") {
    import graft.ext.{Multimodal, TextDedup}
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndvid").toString
    // 4 frames × 8 rows = 32 row sums → exactly one row per trend
    // window, so a uniform +40 brightness shift (pixels ≤ 199+40 < 256,
    // no clipping) adds the same constant to every window — trend bits
    // identical by integer arithmetic, not approximately
    def clip(shift: Int, flip: Boolean): Array[Byte] =
      Multimodal.encodeGif(8, 8, 4, (x, y, f) => {
        val yy = if (flip) 7 - y else y
        ((7L * x + 29L * yy + 53L * f) % 200L).toInt + shift
      })
    def write(f: String, rows: Seq[(Long, Array[Byte], String)]): Unit =
      rows.toDF("doc_id", "media", "ts")
        .withColumn("ts", $"ts".cast("timestamp"))
        .coalesce(1).write.parquet(s"$tmp/in/$f")
    write("f1", Seq((1L, clip(0, flip = false), "2026-01-01 10:00:00")))
    write("f2", Seq((2L, clip(40, flip = false), "2026-01-01 10:00:01"),
      (3L, clip(0, flip = true), "2026-01-01 10:00:02")))
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val vfp = udf((bytes: Array[Byte]) => Multimodal.videoFp64(bytes, 1))
    val q = TextDedup.nearDupStreamingSig(
        in.withColumn("sig", vfp($"media")), "doc_id", "sig", "ts",
        maxHamming = 3, bands = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndvid_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ndvid_out").select($"id", $"dup_of", $"kept")
      .as[(Long, Option[Long], Long)].collect()
      .map { case (i, d, k) => i -> ((d, k)) }.toMap
    assert(got(1L)._2 == 1L, got.toString)
    assert(got(2L) == ((Some(1L), 0L)),
      s"brightness-shifted re-encode must flag against clip 1: ${got(2L)}")
    assert(got(3L)._2 == 1L, s"fresh clip must be kept: ${got(3L)}")
  }

  test("streaming ANN: queries stream against a standing IVF-PQ index " +
      "and get the batch operator's exact answers") {
    import graft.ext.Similarity
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
      .select($"vec_id".cast("long").as("id"),
        $"embedding".cast("array<double>").as("embedding"))
    val index = Similarity.buildIvfPqIndex(emb, "id", "embedding")
    val queries = emb.filter($"id" < 24)
    // batch truth from the SAME index
    val want = Similarity.ivfPqTopKOnIndex(index, queries, "id", "embedding",
        k = 5, nProbe = 4)
      .select($"qid", $"nid", $"rnk", $"adc")
      .as[(Long, Long, Int, Double)].collect().toSet
    // stream the queries in two micro-batches
    val tmp = java.nio.file.Files.createTempDirectory("graft-annstream").toString
    queries.filter($"id" < 12).write.parquet(s"$tmp/in/f1")
    queries.filter($"id" >= 12).write.parquet(s"$tmp/in/f2")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val q = Similarity.ivfPqTopKStreaming(in, index, "id", "embedding",
        k = 5, nProbe = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("annstream_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("annstream_out")
      .select($"qid", $"nid", $"rnk", $"adc")
      .as[(Long, Long, Int, Double)].collect().toSet
    // EXACT equality incl. the float ADC: the streaming fold sums
    // subspaces in the batch agg's fixed order
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // zero streaming state: the top-k group is complete per batch and
    // stores nothing — the query can run forever
    val prog = q.recentProgress.flatMap(_.stateOperators)
    assert(prog.nonEmpty && prog.map(_.numRowsTotal).max == 0,
      s"ANN streaming leaked state: ${prog.map(_.numRowsTotal).toSeq}")
  }

  test("streaming media → features → ANN: raw image bytes stream through " +
      "decode/pool/project and answer against a standing index, bit-equal " +
      "to batch") {
    // the multimodal closure of the streaming-retrieval story: x150's
    // real feature extraction is a stateless mapPartitions, so it
    // composes onto a stream unchanged, and its output is exactly the
    // embedding shape ivfPqTopKStreaming consumes — raw media bytes in,
    // ranked neighbors out, zero streaming state, bit-equal to batch.
    import graft.ext.{Multimodal, Similarity}
    implicit val enc =
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val corpus = (0L until 60L).map(i =>
      Multimodal.MediaRecord(i, "image", Multimodal.syntheticBmp(i))).toDS()
    val feats = Multimodal.features(corpus, dim = 16)
      .select($"id", $"embedding".cast("array<double>").as("embedding"))
    val index = Similarity.buildIvfPqIndex(feats, "id", "embedding",
      nCentroids = 8, m = 4, codebookSize = 16)
    val qMedia = (0L until 60L by 8L).map(i =>
      Multimodal.MediaRecord(i, "image", Multimodal.syntheticBmp(i)))
    // batch truth: batch features of the same media, batch ANN, same index
    val want = Similarity.ivfPqTopKOnIndex(index,
        Multimodal.features(qMedia.toDS(), dim = 16)
          .select($"id", $"embedding".cast("array<double>").as("embedding")),
        "id", "embedding", k = 3, nProbe = 4)
      .select($"qid", $"nid", $"rnk", $"adc")
      .as[(Long, Long, Int, Double)].collect().toSet
    // the same media arriving as a STREAM of raw bytes, two micro-batches
    val tmp = java.nio.file.Files.createTempDirectory("graft-mmstream").toString
    qMedia.take(4).toDS().write.parquet(s"$tmp/in/f1")
    qMedia.drop(4).toDS().write.parquet(s"$tmp/in/f2")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
      .as[Multimodal.MediaRecord]
    val qStream = Multimodal.features(in, dim = 16)
      .select($"id", $"embedding".cast("array<double>").as("embedding"))
    val q = Similarity.ivfPqTopKStreaming(qStream, index, "id", "embedding",
        k = 3, nProbe = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("mmstream_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("mmstream_out")
      .select($"qid", $"nid", $"rnk", $"adc")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // (no self-at-rank-1 pin: ADC is a QUANTIZED distance — several
    // corpus vectors can share a query's codes exactly, ties break by
    // lower nid, and a tied cohort larger than k crowds the query's own
    // id out of the top-k entirely — observed for qid 56 here. The
    // bit-equality against the batch operator above IS the contract.)
    assert(got.map(_._1) == qMedia.map(_.id).toSet,
      s"every streamed query must be answered: ${got.map(_._1)}")
    val prog = q.recentProgress.flatMap(_.stateOperators)
    assert(prog.isEmpty || prog.map(_.numRowsTotal).max == 0,
      s"streaming media retrieval leaked state: ${prog.map(_.numRowsTotal).toSeq}")
  }

  test("chunkWindows: overlap, stable offsets, partial tail, tiny docs") {
    import graft.ext.TextAnalysis
    val df = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 toks
      (2L, "only"), // single token
      (3L, (1 to 8).map(i => s"u$i").mkString(" ")) // exactly one stride
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(df, "doc_id", "text",
        window = 8, stride = 4)
      .orderBy($"doc_id", $"chunk_no")
      .as[(Long, Long, Long, Long, String)].collect()
    val d1 = got.filter(_._1 == 1L)
    // starts 0,4,8,12,16 — overlapping full windows then partial tails
    assert(d1.map(_._3).toSeq == Seq(0L, 4L, 8L, 12L, 16L))
    assert(d1.map(_._4).toSeq == Seq(8L, 8L, 8L, 8L, 4L),
      "tail must be partial, not dropped or padded")
    assert(d1(1)._5 == (5 to 12).map(i => s"t$i").mkString(" "),
      "offset window content")
    // 50% overlap: second half of chunk 0 == first half of chunk 1
    assert(d1(0)._5.split(" ").drop(4).toSeq ==
      d1(1)._5.split(" ").take(4).toSeq)
    assert(got.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0L, 0L, 1L, "only")))
    // 8 tokens at stride 4: starts 0 and 4 (never a start AT n_toks)
    assert(got.filter(_._1 == 3L).map(_._3).toSeq == Seq(0L, 4L))
  }

  test("doc containment: an embedded document surfaces with exact " +
      "containment pct; boilerplate chunks never pair") {
    // doc 1: 4 disjoint 4-token chunks A B C D; doc 2 embeds B and C
    // (plus its own chunk) → shared=2, containment = 2*100 div 3 = 66;
    // docs 3..12 all share one boilerplate chunk (df=10 > cap) → no pairs
    def c(s: String, n: Int) = (1 to 4).map(i => s"$s${n}_$i").mkString(" ")
    val boiler = "cookie notice terms apply"
    val rows = Seq(
      (1L, s"${c("a",1)} ${c("b",1)} ${c("c",1)} ${c("d",1)}"),
      (2L, s"${c("b",1)} ${c("c",1)} ${c("z",9)}")) ++
      (3L to 12L).map(i => (i, s"$boiler ${c("u",i.toInt)}"))
    // the SAME operator the declared query runs — window=4 for the
    // crafted docs (the declared query is separately oracle-checked)
    val pairs = graft.ext.TextDedup.docContainment(
        rows.toDF("doc_id", "text"), "doc_id", "text", window = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 2L, 66L)),
      s"expected exactly the embedded pair: $pairs")
  }

  test("chunkWindows is streaming-transparent: a document stream chunks " +
      "identically to batch, stateless append") {
    import graft.ext.TextAnalysis
    val rows = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 11).map(i => s"s$i").mkString(" ")),
      (3L, "x y z"))
    val want = TextAnalysis.chunkWindows(
        rows.toDF("doc_id", "text"), "doc_id", "text", 8, 4)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunkstream").toString
    rows.take(2).toDF("doc_id", "text").write.parquet(s"$tmp/in/f1")
    rows.drop(2).toDF("doc_id", "text").write.parquet(s"$tmp/in/f2")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    // pure column expressions — the SAME operator call, no streaming
    // variant needed, no state operators at all
    val q = TextAnalysis.chunkWindows(in, "doc_id", "text", 8, 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("chunkstream_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("chunkstream_out")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(q.recentProgress.flatMap(_.stateOperators).isEmpty,
      "chunking must plan zero state operators")
  }

  test("streaming BM25: queries stream against the standing index and " +
      "get the batch operator's exact answers, zero state") {
    import graft.ext.TextSearch
    val index = TextSearch.buildBm25Index(docs, "doc_id", "text")
    val qs = docs.filter($"doc_id" < 8)
      .select($"doc_id",
        concat_ws(" ", slice(split($"text", " "), 1, 5)).as("q"))
    val qSeq = qs.collect().map(r => (r.getLong(0).toInt, r.getString(1)))
      .toSeq.sortBy(_._1)
    val want = TextSearch.bm25TopKOnIndex(index, qSeq, k = 5)
      .select($"qid".cast("long"), $"rnk", $"nid".cast("long"), $"score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25stream").toString
    qs.filter($"doc_id" < 4).write.parquet(s"$tmp/in/f1")
    qs.filter($"doc_id" >= 4).write.parquet(s"$tmp/in/f2")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in/*")
    val q = TextSearch.bm25TopKStreaming(in, index, "doc_id", "q", k = 5)
      .writeStream.outputMode("append")
      .format("memory").queryName("bm25stream_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("bm25stream_out")
      .select($"qid", $"rnk", $"nid", $"score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    val prog = q.recentProgress.flatMap(_.stateOperators)
    assert(prog.nonEmpty && prog.map(_.numRowsTotal).max == 0,
      s"BM25 streaming leaked state: ${prog.map(_.numRowsTotal).toSeq}")
  }

  test("streaming near-dup: null signatures DROP (batch contract) — one " +
      "garbage record must not kill the query") {
    // aHash64 returns null for undecodable bytes; before the round-10
    // guard that null NPE'd the whole streaming query at the typed
    // Dataset boundary. The operator now filters null sig/id/ts rows.
    import graft.ext.{Multimodal, TextDedup}
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndnull").toString
    def mono(v: Int) = (v, v, v)
    val gradient = Multimodal.encodeBmp(8, 8, (x, _) => mono(x * 30))
    Seq((java.lang.Long.valueOf(1L), gradient, "2026-01-01 10:00:00"),
      (java.lang.Long.valueOf(2L), Array[Byte](9, 9, 9), // undecodable → null sig
        "2026-01-01 10:00:01"),
      (null.asInstanceOf[java.lang.Long], gradient, // null id
        "2026-01-01 10:00:02"),
      (java.lang.Long.valueOf(4L), gradient, "2026-01-01 10:00:03"))
      .toDF("doc_id", "media", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))
      .coalesce(1).write.parquet(s"$tmp/in/f1")
    val in = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in/f1").schema)
      .parquet(s"$tmp/in/*")
    val ah = udf((bytes: Array[Byte]) => Multimodal.aHash64(bytes))
    val q = TextDedup.nearDupStreamingSig(
        in.withColumn("sig", ah($"media")), "doc_id", "sig", "ts",
        maxHamming = 3, bands = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("ndnull_out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination() // would throw the deserializer NPE pre-guard
    val got = spark.table("ndnull_out").select($"id", $"dup_of", $"kept")
      .as[(Long, Option[Long], Long)].collect()
      .map { case (i, d, k) => i -> ((d, k)) }.toMap
    assert(got.keySet == Set(1L, 4L), s"null-sig/null-id rows must drop: $got")
    assert(got(1L) == ((None, 1L)) && got(4L) == ((Some(1L), 0L)), got.toString)
  }

  test("audioFingerprint: decoded trend bits match the sample formula; " +
      "re-encoded twins collide") {
    import graft.ext.Multimodal
    def local(seed: Long): Long = {
      val c = (1 + seed % 2).toInt
      val nf = (64 + seed % 33).toInt
      val n = c * nf
      val e = new Array[Long](32)
      (0 until n).foreach(i =>
        e(32 * i / n) += math.abs((seed * 31L + 17L * i) % 4096L - 2048L))
      (1 until 32).foldLeft(0L)((fp, w) =>
        if (e(w) > e(w - 1)) fp | (1L << (31 - w)) else fp)
    }
    val ids = Seq(0L, 1L, 33L, 64L, 100L, 511L)
    val media = ids.map(i =>
      Multimodal.MediaRecord(i, "audio", Multimodal.syntheticWav(i))).toDS()
    val got = Multimodal.audioFingerprint(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(i => assert(got(i) == local(i), s"seed=$i"))
    // a re-encoded copy of the same samples fingerprints identically
    val twin = Multimodal.audioFingerprint(Seq(Multimodal.MediaRecord(
      999L, "audio", Multimodal.syntheticWav(100L))).toDS()).head()
    assert(twin.getLong(1) == got(100L))
    // garbage and clips shorter than the window count drop, never throw
    val junk = Seq(
      Multimodal.MediaRecord(1L, "audio", Array[Byte](82, 73)),
      Multimodal.MediaRecord(2L, "audio",
        Multimodal.encodeWav(8000, 1, Array[Short](1, -1, 2)))).toDS()
    assert(Multimodal.audioFingerprint(junk).count() == 0L)
  }

  test("videoFingerprint: decoded row-sum trends match the pixel formula " +
      "including sparse-window clips") {
    import graft.ext.Multimodal
    def local(seed: Long): Long = {
      val w = (8 + seed % 9).toInt
      val h = (8 + seed % 7).toInt
      val nf = (2 + seed % 4).toInt
      val k = nf * h
      val e = new Array[Long](32)
      for (f <- 0 until nf; y <- 0 until h) {
        val row = (0 until w).map(x =>
          (seed + 7L * x + 13L * y + 53L * f) % 256).sum
        e((32 * (f * h + y) / k).toInt) += row
      }
      (1 until 32).foldLeft(0L)((fp, wd) =>
        if (e(wd) > e(wd - 1)) fp | (1L << (31 - wd)) else fp)
    }
    // seed 0: nf=2, h=8 -> K=16 < 32 windows (the sparse-window path);
    // larger seeds exercise dense windows
    val ids = Seq(0L, 1L, 5L, 100L, 251L)
    val media = ids.map(i =>
      Multimodal.MediaRecord(i, "video", Multimodal.syntheticGif(i))).toDS()
    val got = Multimodal.videoFingerprint(media, stride = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(i => assert(got(i) == local(i), s"seed=$i"))
    // a re-encoded copy fingerprints identically; garbage drops
    val twin = Multimodal.videoFingerprint(Seq(Multimodal.MediaRecord(
      9L, "video", Multimodal.syntheticGif(100L))).toDS(), 1).head()
    assert(twin.getLong(1) == got(100L))
    assert(Multimodal.videoFingerprint(Seq(Multimodal.MediaRecord(
      8L, "video", Array[Byte](71, 73, 70))).toDS(), 1).count() == 0L)
  }

  test("localLloyd seeding: D2 draws never pick an already-covered point") {
    // the k-means++ property the fallback fix protects: a D²-weighted
    // draw has zero mass on already-chosen points, so with n = k
    // distinct inputs the seeded centers must be a PERMUTATION of the
    // inputs for every seed — the old fallback (index 0 on float
    // residue) could duplicate the first point and drop another.
    // iters = 0 exposes the raw seeding (Lloyd rounds would re-center).
    val pts = Array(Array(0.0, 0.0), Array(1.0, 0.0),
      Array(0.0, 1.0), Array(7.0, 7.0))
    for (seed <- 0L until 300L) {
      val c = graft.ext.Similarity.localLloyd(pts, k = 4, iters = 0,
        seed = seed).map(_.toList).sortBy(_.toString).toSeq
      assert(c == pts.map(_.toList).sortBy(_.toString).toSeq,
        s"seed=$seed picked a covered point: $c")
    }
    // fewer distinct points than k: repeats are the documented contract
    val dup = Array(Array(1.0), Array(1.0))
    val c2 = graft.ext.Similarity.localLloyd(dup, k = 3, iters = 0, seed = 1L)
    assert(c2.forall(_.sameElements(Array(1.0))))
  }

  test("hrwShardSql: SQL twin matches hrwShard for negative keys too") {
    // Spark's % follows the dividend's sign exactly like DuckDB's, so
    // evaluating the emitted SQL through expr() exercises the same
    // sign semantics the oracle engine would — the positive-mod form
    // must agree with the Spark side's pmod on signed keys
    val df = ((-500L until 500L) ++ Seq(Long.MinValue / 4, -1L)).toDF("k")
    for (shards <- Seq(1, 5, 9)) {
      val bad = df.select(
          graft.ext.Sharding.hrwShard($"k", shards).as("a"),
          expr(graft.ext.Sharding.hrwShardSql("k", shards))
            .cast("long").as("b"))
        .filter($"a" =!= $"b").count()
      assert(bad == 0L, s"shards=$shards: $bad diverging keys")
    }
  }

  test("largestRemainderQuotas: quotas are integers summing exactly to total") {
    val df = Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(1)("d")
    val rows = graft.ext.Curation
      .largestRemainderQuotas(df.toDF("s"), $"s", total = 10L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    // shares: a=4.375, b=3.125, c=1.875, d=0.625 → floors 4,3,1,0 (=8),
    // remainders .375/.125/.875/.625 → c and d get the 2 leftovers
    assert(rows == Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 1L), rows)
    assert(rows.values.sum == 10L)
  }
}

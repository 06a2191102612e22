package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * benchmark decontamination (train/test n-gram overlap), intra-document
  * repetition scoring (Gopher-style duplicate-n-gram quality signals),
  * and deterministic domain-mix sampling.
  *
  * Design for 100 TB:
  *  - decontamination is a shuffle equi-join on the n-gram between two
  *    exploded gram sets — the benchmark side is NOT broadcast (real
  *    benchmark suites are millions of grams) and per-doc counts
  *    partial-aggregate before their single exchange;
  *  - repetition scores are pure scan-local array expressions — zero
  *    shuffle, embarrassingly parallel;
  *  - sampling decides per-row from a deterministic residue, so the
  *    sample is stable across retries/replays (exactly-once-friendly)
  *    and needs no global count or sort.
  */
object Curation {

  /** Raw (non-deduplicated) word n-grams of `text`; a document shorter
    * than n tokens contributes its whole token sequence as one gram
    * (`sequence(a, b)` DESCENDS when a > b — guard, don't clamp). The
    * single n-gram builder for the whole engine: the dedup family's
    * [[TextDedup.shingles]] is `array_distinct` over this. */
  def ngrams(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    if (n == 1) toks
    else {
      val idx = sequence(lit(0), size(toks) - n)
      when(size(toks) >= n,
        transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", toks)))
    }
  }

  /** Benchmark decontamination: for every corpus document that shares at
    * least one word n-gram with the benchmark set, report how many of its
    * distinct n-grams are contaminated and the contaminated fraction.
    * Docs with no overlap are absent (the result is the quarantine list).
    *
    * Grams are DISTINCT-then-HASHED per document before they explode, so
    * the generator emits and the join moves fixed-width longs, never the
    * gram strings — per-doc distinct counts (and so the contamination
    * ratio) are preserved modulo 64-bit collisions, which are negligible
    * at any realistic gram cardinality. */
  /** Distinct word n-grams of `text`, each reduced to its `xxhash64` —
    * the shared shuffle currency of [[contamination]] and
    * [[crossDocRepeats]]. The native [[graft.functions.HashedNgrams]]
    * expression (one pass over the text bytes, no gram-string
    * materialization; bit-identical to
    * `transform(array_distinct(ngrams(text, n)), xxhash64)` — the
    * FunctionsSpec parity pin). Callers register
    * [[graft.functions.Functions]] on the session. The `localCheckpoint`
    * at each use still matters: it materializes the arrays once for
    * frames consumed by two plan branches. */
  private def hashedGrams(text: Column, n: Int): Column =
    TextDedup.hashedShingles(text, n)

  def contamination(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 8): DataFrame = {
    // both frames run the native gram builder — in a multi-session app
    // each resolves against its OWN session's registry
    graft.functions.Functions.register(corpus.sparkSession)
    graft.functions.Functions.register(benchmark.sparkSession)
    val bench = benchmark
      .select(hashedGrams(col(benchTextCol), n).as("g"))
      .localCheckpoint(eager = false)
      .select(explode(col("g")).as("ng"))
      .distinct()
    val grams = corpus
      .select(col(idCol).as("doc_id"), hashedGrams(col(textCol), n).as("g"))
      .localCheckpoint(eager = false)
      .select(col("doc_id"), size(col("g")).as("n_grams"),
        explode(col("g")).as("ng"))
    grams.join(bench, Seq("ng"))
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_contaminated"))
      .select(col("doc_id"), col("n_contaminated"), col("n_grams"),
        (col("n_contaminated").cast("double") / col("n_grams"))
          .as("contamination"))
  }

  /** Span-level benchmark decontamination — WHERE a training document
    * overlaps the benchmark, not just whether ([[contamination]]'s
    * boolean form): every corpus n-gram occurrence that appears anywhere
    * in the benchmark set marks tokens [pos, pos+n-1] contaminated, and
    * overlapping-or-contiguous marks merge into maximal spans. Returns
    * one row per span — (doc_id, span_idx, start_tok, len_toks),
    * span_idx 1-based in start order — the operator a pipeline runs
    * BEFORE cutting contaminated windows out of training text (Lee et
    * al. 2022 exact-substring removal at occurrence granularity).
    *
    * Scale shape: grams ride as `xxhash64` longs out of the native
    * occurrence hasher ([[graft.functions.HashedNgramsAll]] — position
    * order, multiplicity kept, so `posexplode` yields exact token
    * offsets with zero gram-string materialization); the benchmark side
    * is the distinct-gram long set ([[TextDedup.hashedShingles]], same
    * bytes→hash, so the join is collision-exact at realistic
    * cardinalities — the x21 argument). Only bench-MATCHING occurrences
    * survive into the span merge, which is one per-doc window (a single
    * doc_id exchange): positions sort per doc, a gap > n starts a new
    * island (classic gap-and-islands — with a fixed gram width the
    * running coverage end is just prev_pos + n − 1, so one `lag`
    * suffices), and the island aggregate emits (start, length). No
    * corpus-sized sort, no list state; the hit set a window touches is
    * the contaminated subset, not the corpus. */
  def contaminationSpans(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 5): DataFrame = {
    require(n >= 1 && n <= 64,
      s"gram n must be in 1..64 (native gram hasher bound), got $n")
    graft.functions.Functions.register(corpus.sparkSession)
    graft.functions.Functions.register(benchmark.sparkSession)
    val bench = benchmark
      .select(explode(hashedGrams(col(benchTextCol), n)).as("ng"))
      .distinct()
    val hits = corpus
      .select(col(idCol).as("doc_id"),
        posexplode(call_function("hashed_ngrams_all", col(textCol), lit(n))))
      .withColumnRenamed("col", "ng")
      .join(bench, Seq("ng"))
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(w)
    hits
      .withColumn("new_span",
        when(prev.isNull || col("pos") > prev + n, 1).otherwise(0))
      .withColumn("span_idx", sum(col("new_span")).over(w))
      .groupBy(col("doc_id"), col("span_idx"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"))
      .select(col("doc_id"), col("span_idx").cast("long").as("span_idx"),
        col("s").cast("long").as("start_tok"),
        (col("e") + n - col("s")).cast("long").as("len_toks"))
  }

  /** The decontamination REWRITE: apply [[contaminationSpans]] and cut
    * the contaminated windows out, emitting each affected document's
    * cleaned text (tokens outside every span, original order) plus the
    * removal accounting — the step that actually edits training data,
    * where [[contamination]] only quarantines and [[contaminationSpans]]
    * only locates. Documents with no overlap are absent (their text is
    * unchanged; a pipeline unions them back untouched — cheaper than
    * rewriting the whole corpus through this operator).
    *
    * Scale shape: spans aggregate per doc (the contaminated subset
    * only), then one join back to the corpus text and a SCAN-LOCAL
    * rewrite — `filter` with a positional lambda over the token array
    * against the ≤ spans-per-doc span list — so the corpus tokens never
    * shuffle; the only exchanges are the span window's and the span→doc
    * join's, both sized by contamination, not corpus. */
  def decontaminatedRewrite(corpus: DataFrame, idCol: String,
      textCol: String, benchmark: DataFrame, benchTextCol: String,
      n: Int = 5): DataFrame = {
    val spans = contaminationSpans(corpus, idCol, textCol,
        benchmark, benchTextCol, n)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("len_toks")).as("n_removed"),
        collect_list(struct(col("start_tok"), col("len_toks"))).as("sp"))
    corpus.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .join(spans, Seq("doc_id"))
      .select(col("doc_id"),
        size(split(col("__text"), " ")).cast("long").as("n_tokens"),
        col("n_spans"), col("n_removed"),
        concat_ws(" ", filter(split(col("__text"), " "),
          (x: Column, i: Column) => !exists(col("sp"),
            s => i >= s.getField("start_tok") &&
              i < s.getField("start_tok") + s.getField("len_toks"))))
          .as("kept_text"))
  }

  /** Intra-document repetition quality signals (the Gopher repetition
    * rules' Spark form): distinct-token ratio and duplicate-n-gram
    * fraction per document for n = 2 and 3. Scan-local column
    * expressions only. */
  def repetitionScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    def dupRatio(n: Int): Column = {
      val g = ngrams(col(textCol), n)
      (lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
        .as(s"dup_${n}gram_ratio")
    }
    df.select(col(idCol).as("doc_id"),
      size(toks).as("n_tokens"),
      (size(array_distinct(toks)).cast("double") / size(toks))
        .as("distinct_token_ratio"),
      dupRatio(2), dupRatio(3))
  }

  /** Deterministic domain-mix sampling: keep each stratum at its declared
    * percentage, decided per row by a residue of the id — stable across
    * runs, retries and replays, with no global count/sort/shuffle. At
    * 100 TB use `pmod(xxhash64(id), 100)` as the residue so the decision
    * is uniform regardless of how ids were assigned; the plain-id residue
    * here is the oracle-portable form. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      pct: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    val rate = pct.foldLeft(lit(defaultPct): Column) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(pmod(col(idCol), lit(100)) < rate)
  }

  /** Sequence packing (concatenate-and-chunk, the LLM-pretraining form):
    * deterministically order each shard's documents, concatenate their
    * token streams, and cut the stream at every `budget` tokens. Each
    * document reports the training sequence its first token lands in,
    * the offset there, and whether it spans a chunk boundary.
    *
    * The running total is windowed PER SHARD, so packing parallelizes
    * with the shard count instead of serializing on one global ordered
    * window — the only cross-shard coordination is the hash that
    * assigns shards. The id-residue shard here is the oracle-portable
    * form; at 100 TB shard by `pmod(xxhash64(id), shards)` with
    * thousands of shards so one shard's rows fit an executor. */
  def sequencePacking(df: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int = 8): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), pmod(col(idCol), lit(shards)).as("shard"),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .withColumn("__prev", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tok"),
        floor(col("__prev") / budget).as("seq_id"),
        pmod(col("__prev"), lit(budget)).as("off"),
        when(pmod(col("__prev"), lit(budget)) + col("n_tok") > budget, 1)
          .otherwise(0).as("spans"))
  }

  /** Per-stratum cap sampling: keep at most `cap` rows per stratum,
    * chosen by a deterministic multiplicative hash of the id (stable
    * across runs and replays — no RNG state). Complements
    * [[stratifiedSample]]'s rate-based form when the mix is specified
    * as absolute per-domain document budgets.
    *
    * The rank is one window per stratum, and because the predicate is
    * `row_number() <= cap` Spark plans a `WindowGroupLimit` BEFORE the
    * exchange: each map task forwards at most `cap` rows per stratum,
    * so the shuffle moves O(tasks · cap) rows per stratum, not the
    * stratum — a pathologically hot domain is bounded at the map side
    * (verified in the executed plan: Partial/Final WindowGroupLimit
    * around the exchange). The Knuth multiplicative residue is the
    * oracle-portable stand-in for `xxhash64(id)`; the id reduces mod
    * p BEFORE the multiply so the product stays under 2^63 for any
    * long id — ANSI mode turns silent wraparound into a query-killing
    * overflow error, so the bound must hold by construction. */
  def domainCap(df: DataFrame, idCol: String, strataCol: String,
      cap: Int): DataFrame = {
    val p = 1000000007L // (p-1) * 2654435761 < 2^63
    val h = pmod(pmod(col(idCol), lit(p)) * lit(2654435761L), lit(p))
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= cap)
  }

  /** Cross-document repeated n-grams (the C4-style boilerplate signal):
    * flag word n-grams appearing in at least `minDocs` distinct
    * documents, and report per affected document how much of it is
    * boilerplate. Navigation chrome, license headers and templated
    * spam all surface here before they survive into training data.
    *
    * Same distinct-then-hash shape as [[contamination]]: grams explode
    * as fixed-width longs and the gram→doc-count aggregation
    * partial-aggregates before its single exchange. The boilerplate
    * gram set joins back without an explicit `broadcast()` hint: real
    * boilerplate sets scale with the corpus, so the plan must default
    * to a shuffle join — AQE upgrading it to broadcast at runtime when
    * the set actually fits is the desired adaptive behavior, a hint
    * pinning it would not survive 100 TB. */
  def crossDocRepeats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame = {
    graft.functions.Functions.register(df.sparkSession)
    val grams = df
      .select(col(idCol).as("doc_id"),
        hashedGrams(col(textCol), n).as("g"))
      .localCheckpoint(eager = false)
      .select(col("doc_id"), size(col("g")).as("n_grams"),
        explode(col("g")).as("ng"))
    // grams are distinct per doc, so count(*) == count(DISTINCT doc)
    val boiler = grams.groupBy(col("ng"))
      .agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("ng"))
    grams.join(boiler, Seq("ng"))
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_boiler"))
      .select(col("doc_id"), col("n_boiler"), col("n_grams"),
        (col("n_boiler").cast("double") / col("n_grams"))
          .as("boiler_ratio"))
  }

  /** Chunk-level exact substring dedup (the Lee et al. 2022 "deduplicating
    * training data" shape at fixed-width granularity): cut each document's
    * token stream into `chunk`-token pieces and keep only the FIRST
    * occurrence of every distinct chunk across the corpus — first by
    * (doc id, position), the deterministic keep rule. Per document:
    * chunk counts, the duplicated fraction, and the text reassembled
    * from its surviving chunks (in original order). Catches repeated
    * paragraphs/boilerplate INSIDE otherwise-distinct documents, which
    * whole-document dedup (x01) cannot.
    *
    * Scale shape: one shuffle keyed by chunk value to rank occurrences
    * (chunk-cardinality partitioning — hot chunks are single keys, but
    * a chunk is ≤ `chunk` tokens so the value payload is bounded), one
    * partial-aggregated shuffle back onto doc ids for reassembly; the
    * corpus moves through each exactly once. At 100 TB key the window by
    * `xxhash64(chunk)` (fixed-width keys, chunk text rides as payload
    * only into the reassembly) — the string key here is the
    * oracle-portable form. */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      chunk: Int): DataFrame = {
    require(chunk >= 1)
    val toks = split(col(textCol), " ")
    // split() never yields an empty array, so nChunks >= 1 and the
    // sequence() is always ascending (the a > b descending trap)
    val nChunks = ceil(size(toks).cast("double") / chunk).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(toks, i * chunk + 1, lit(chunk))))
    val exploded = df.select(col(idCol).as("doc_id"), posexplode(chunks))
      .toDF("doc_id", "pos", "chunk")
    val w = Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("pos"))
    exploded
      .withColumn("dup", (row_number().over(w) > 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("dup")).as("n_dup_chunks"),
        // collect_list skips the nulls when() leaves for dup chunks; the
        // struct sorts by its leading pos field, restoring document order
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("dup") === 0, struct(col("pos"), col("chunk"))))),
          s => s.getField("chunk"))).as("kept_text"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks").cast("double") / col("n_chunks")).as("dup_ratio"),
        col("kept_text"))
  }

  /** Stride-1 duplicated-n-gram diagnostic (the Lee et al. 2022 exact-
    * substring signal at sliding granularity): for every document, how
    * many of its overlapping word `n`-grams occur at two or more
    * positions corpus-wide, and the duplicated fraction. Complements
    * [[chunkDedup]] (tiled chunks, keep-first rewrite): stride-1 catches
    * repeats at ANY offset, so it quantifies duplication that tiling
    * misses by up to a factor of `n` — the survey step pipelines run
    * BEFORE deciding a dedup granularity.
    *
    * Grams ride as `xxhash64` longs straight out of the native
    * occurrence-level hasher ([[graft.functions.HashedNgramsAll]] — no
    * gram-string materialization; counts are collision-exact at
    * realistic cardinalities, the x21 argument), so every exchange moves
    * fixed-width keys. Shape: one partial-aggregated count keyed by
    * (gram, doc) feeds BOTH the per-gram total and the join back —
    * Catalyst's ReuseExchange dedups the shared shuffle, so the corpus
    * scans and explodes exactly once (PlanShapeSpec pins this) — then a
    * partial-aggregated fold onto doc ids. Hot grams never concentrate:
    * both aggregations are map-side-combined, and the total↔occurrence
    * join is AQE-planned (broadcast while gram totals fit, skew-split
    * sort-merge beyond). No corpus-sized window, no sort, no list
    * state. */
  def duplicatedGramStats(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1 && n <= 64,
      s"gram n must be in 1..64 (native gram hasher bound), got $n")
    graft.functions.Functions.register(df.sparkSession)
    // occurrence-level grams (multiplicity kept): the native non-distinct
    // hasher — null-text docs drop here, matching the oracle's null-gram
    // join-drop
    val cd = df
      .select(col(idCol).as("doc_id"),
        explode(call_function("hashed_ngrams_all", col(textCol), lit(n)))
          .as("ng"))
      .groupBy(col("ng"), col("doc_id")).agg(count(lit(1)).as("cnt"))
    val counts = cd.groupBy(col("ng")).agg(sum(col("cnt")).as("c"))
    cd.join(counts, Seq("ng"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_grams"),
        sum(when(col("c") >= 2, col("cnt")).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        (col("n_dup").cast("double") / col("n_grams")).as("dup_ratio"))
  }

  /** Two-sample distribution-drift audit (binned Kolmogorov–Smirnov):
    * per stratum, the maximum CDF gap between two snapshots' quality
    * distributions — "did this source's data shift between crawls", the
    * monitor a pipeline runs before trusting yesterday's mix weights on
    * today's crawl. The quality signal is the distinct-token ratio
    * binned to `bins` integer buckets via exact integer division, so
    * binning is engine-portable; the gap maximand
    * `|cumA·totB − cumB·totA|` stays in exact integers and only the
    * final normalization divides (RAW division — IEEE-identical across
    * engines; deliberately never round()-on-double, see x59). The max
    * needs checking only at OCCUPIED bins (the CDF gap is constant
    * across empty ones).
    *
    * Scale shape: one partial-agg shuffle to (stratum, snapshot, bin) —
    * ≤ strata × 2 × bins rows regardless of corpus size — then windows
    * over that tiny frame. Strata with an empty side report null ks. */
  def distributionDrift(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, isSnapshotA: Column, bins: Int = 20): DataFrame = {
    require(bins >= 2)
    val binned = df.select(col(strataCol).as("stratum"),
        when(isSnapshotA, lit(1L)).otherwise(lit(0L)).as("a"),
        expr(s"($bins * size(array_distinct(split($textCol, ' '))))" +
          s" div size(split($textCol, ' '))").as("rawbin"))
      .select(col("stratum"), col("a"),
        least(col("rawbin"), lit(bins - 1L)).as("bin"))
      .groupBy(col("stratum"), col("bin"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("bin"))
    val tw = Window.partitionBy(col("stratum"))
    binned
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("tota", sum(col("ca")).over(tw))
      .withColumn("totb", sum(col("cb")).over(tw))
      .groupBy(col("stratum"), col("tota"), col("totb"))
      .agg(max(abs(col("cuma") * col("totb") - col("cumb") * col("tota")))
        .as("maxgap"))
      .select(col("stratum"), col("tota").as("n_a"), col("totb").as("n_b"),
        when(col("tota") > 0 && col("totb") > 0,
          col("maxgap").cast("double") / (col("tota") * col("totb")))
          .as("ks"))
  }

  /** Domain-shift audit: per-stratum KL divergence to the corpus token
    * distribution, restricted to the corpus's `topN` most frequent
    * tokens (the head carries the signal; restricting the support also
    * sidesteps p=0 terms — a stratum simply contributes no term for a
    * head token it never uses, the correct KL limit). The mix-design
    * companion of [[temperatureMix]]: which domains actually DIFFER
    * before you reweight them.
    *
    * Scale shape: the head is a TakeOrdered over partial-aggregated
    * token counts (no global window), rides as a broadcast ≤ topN rows;
    * stratum counts partial-aggregate over the head-joined explode; the
    * KL fold runs over ≤ topN terms per stratum, token-order-pinned so
    * the float sum is engine-exact. */
  def domainShiftKl(df: DataFrame, textCol: String, strataCol: String,
      topN: Int = 50): DataFrame = {
    require(topN >= 1)
    // ONE corpus pass (round-15 restructure): the exploded token rows
    // fold straight into per-(source, tok) counts — map-side partial
    // aggregation, so the shuffle and the checkpoint hold the tiny
    // (strata × vocabulary) table, never the raw token rows. The corpus
    // counts the top-N head needs are the EXACT integer sums of the
    // per-stratum counts (c(tok) = Σ_source s(source, tok)), so the old
    // shape's second corpus scan — and its checkpoint of every exploded
    // token row — is gone. Same doubles reach the KL terms (same
    // integers in, same IEEE ops), so results are bit-identical.
    val scAll = df.select(col(strataCol).as("source"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("s"))
      // materialized by the head collect below; the terms action reuses
      // the blocks — the corpus is exploded exactly once
      .localCheckpoint(eager = false)
    // The top-N head is BOUNDED (≤ topN rows) — collect it and push the
    // head back into the terms plan as literals: an INSET filter plus a
    // literal token→count map replace the old shape's three broadcast
    // joins (each a separate broadcast-build job), and the per-stratum
    // total becomes a window over the filtered rows instead of a
    // separate aggregate+join. Same integers reach the same IEEE
    // expressions (c(tok) and tot are exact integer sums either way),
    // so the KL terms — and the token-order-pinned fold — are
    // bit-identical. Round-15: 12 jobs → ~6; every deleted job was
    // ~60 ms of fixed driver latency on this sub-second query.
    val topRows = scAll.groupBy(col("tok")).agg(sum(col("s")).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(topN)
      .collect()
    val topToks = topRows.map(_.getString(0)).toSeq
    val cMap = typedLit(
      topRows.map(r => r.getString(0) -> r.getLong(1)).toMap)
    val tot = topRows.map(_.getLong(1)).sum.toDouble
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    val p = col("s").cast("double") / col("stot")
    val q = col("c").cast("double") / lit(tot)
    scAll.filter(col("tok").isin(topToks: _*))
      .select(col("source"), col("tok"), col("s"),
        element_at(cMap, col("tok")).as("c"))
      .withColumn("stot", sum(col("s")).over(w))
      .select(col("source"), col("tok"), (p * log(p / q)).as("term"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens_in_set"),
        round(aggregate(
            transform(sort_array(collect_list(
              struct(col("tok"), col("term")))), x => x.getField("term")),
          lit(0.0), (a: Column, t: Column) => a + t), 6).as("kl"))
  }

  /** Sliding-window chunking with overlap (the RAG-ingestion chunker):
    * windows of `width` tokens every `stride` tokens, the final window
    * clamped to the document tail — stride < width gives the standard
    * overlapped retrieval chunks, stride = width degenerates to
    * [[chunkDedup]]'s tiling. One generator per document, scan-local;
    * chunk count is ⌈max(n−width, 0)/stride⌉ + 1 so the tail is always
    * covered and a short document yields exactly one chunk. Returns one
    * row per chunk: (doc_id, chunk_idx, start_tok, n_tokens,
    * chunk_text). */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width)
    val tk = split(col(textCol), " ")
    val n = size(tk)
    val nChunks = (ceil(greatest(n - width, lit(0)) / lit(stride.toDouble))
      .cast("int") + 1)
    df.select(col(idCol).as("doc_id"), tk.as("tk"), n.as("n"),
        posexplode(sequence(lit(0), nChunks - 1)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        (col("pos") * stride).cast("long").as("start_tok"),
        least(lit(width), col("n") - col("pos") * stride).cast("long")
          .as("n_tokens"),
        concat_ws(" ", slice(col("tk"), col("pos") * stride + 1, lit(width)))
          .as("chunk_text"))
  }

  /** Contrastive pair construction (embedding-model training data): per
    * document, a POSITIVE pair of its two halves, and a deterministic
    * same-stratum NEGATIVE — its front half against the back half of the
    * NEXT document in (stratum, id) order. Same-source negatives are the
    * harder ones (cross-source pairs are trivially separable); the last
    * document of each stratum contributes no negative. Deterministic and
    * replay-stable — no RNG, the pairing is a pure function of the
    * corpus order.
    *
    * Scale shape: one scan for the half sizes, one per-stratum `lead`
    * window (parallel in the stratum count — never a global order);
    * only ids and token counts move, the halves themselves are sliced
    * out later by whoever materializes the pair text. Returns
    * (anchor_id, other_id, label 1|0, n_anchor_tokens,
    * n_other_tokens). */
  def contrastivePairs(df: DataFrame, idCol: String, textCol: String,
      strataCol: String): DataFrame = {
    val n = size(split(col(textCol), " "))
    val h = df
      .select(col(idCol).as("anchor_id"), col(strataCol).as("__src"),
        n.as("n"))
      .filter(col("n") >= 2)
      .select(col("anchor_id"), col("__src"),
        (col("n") / 2).cast("long").as("n_front"),
        (col("n") - (col("n") / 2).cast("long")).as("n_back"))
    val w = Window.partitionBy(col("__src")).orderBy(col("anchor_id"))
    val pos = h.select(col("anchor_id"), col("anchor_id").as("other_id"),
      lit(1L).as("label"), col("n_front").as("n_anchor_tokens"),
      col("n_back").as("n_other_tokens"))
    val neg = h.select(col("anchor_id"),
        lead(col("anchor_id"), 1).over(w).as("other_id"), lit(0L).as("label"),
        col("n_front").as("n_anchor_tokens"),
        lead(col("n_back"), 1).over(w).as("n_other_tokens"))
      .filter(col("other_id").isNotNull)
    pos.union(neg)
  }

  /** T5-style span-corruption mask statistics: deterministic seeded
    * masking — position `i` of document `id` STARTS a `span`-token mask
    * when `(id·1000003 + i·7919) mod 100 < startPct`, and a position is
    * masked when any of the previous `span` positions started one
    * (overlapping spans merge; spans truncate at the document end).
    * `startPct`=5, `span`=3 lands the canonical ~15% corruption rate.
    * Reports per document: token count, masked count, merged-span count,
    * mask ratio — the objective-construction audit a pretraining
    * pipeline runs before materializing denoising targets.
    *
    * Entirely scan-local integer arithmetic (one `transform` chain per
    * row, no shuffle but the final sort), and the mask is a pure
    * function of (id, position) — replay-stable across retries and
    * engines, which is what makes it oracle-portable (plain modular
    * arithmetic, no engine hash). */
  def spanCorruptionStats(df: DataFrame, idCol: String, textCol: String,
      startPct: Int = 5, span: Int = 3): DataFrame = {
    require(startPct >= 0 && startPct <= 100 && span >= 1)
    val tk = split(col(textCol), " ")
    val n = size(tk)
    val idx = sequence(lit(0), n - 1)
    val sf = transform(idx, i =>
      (pmod(col(idCol) * 1000003L + i * 7919L, lit(100)) < startPct)
        .cast("int"))
    def startedAt(sfc: Column, i: Column, j: Int): Column =
      if (j == 0) element_at(sfc, i + 1) === 1
      else (i >= j) && element_at(sfc, i - j + 1) === 1
    def maskedExpr(sfc: Column): Column = transform(idx, i =>
      when((0 until span).map(j => startedAt(sfc, i, j)).reduce(_ || _), 1)
        .otherwise(0))
    df.select(col(idCol).as("doc_id"), n.as("n"), maskedExpr(sf).as("mk"))
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        aggregate(col("mk"), lit(0L), (a, x) => a + x).as("n_masked"),
        aggregate(transform(sequence(lit(0), col("n") - 1), i =>
            when(element_at(col("mk"), i + 1) === 1 &&
              (i === 0 || element_at(col("mk"), i) === 0), 1).otherwise(0)),
          lit(0L), (a, x) => a + x).as("n_spans"))
      // Basis-point ratio via exact integer round-half-up (floor((2·1e4·
      // num + den) / (2·den))): n_tokens is frequently a power of two, so
      // round()-on-double would sit on exactly representable .5 ties where
      // rounding libraries disagree (half-even vs half-away). Operands are
      // non-negative, so Spark `div` truncation == DuckDB `//` floor.
      .withColumn("mask_ratio_bp",
        expr("(20000 * n_masked + n_tokens) div (2 * n_tokens)"))
  }

  /** Quality-score ensemble → per-stratum deciles (the CCNet-style
    * bucketing step: downstream pipelines keep/mix by bucket, not by raw
    * score). The score folds three scan-local signals — distinct-token
    * ratio, 1 − duplicate-2-gram ratio, and a capped length credit —
    * with fixed weights; `ntile(buckets)` ranks within each stratum so
    * every domain contributes its own best-to-worst spread (a global
    * ranking would let one verbose domain crowd out the rest). Signals
    * are one scan; the only shuffle is the per-stratum window, whose
    * order is made total by the (score, id) tiebreak so replays and the
    * oracle agree exactly. */
  def qualityDeciles(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 1)
    val toks = split(col(textCol), " ")
    val g2 = ngrams(col(textCol), 2)
    val score =
      lit(0.5) * (size(array_distinct(toks)).cast("double") / size(toks)) +
        lit(0.3) * (size(array_distinct(g2)).cast("double") / size(g2)) +
        lit(0.2) * least(size(toks).cast("double") / 500.0, lit(1.0))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("score"), col(idCol))
    df.select(col(idCol), col(strataCol), score.as("score"))
      .withColumn("decile", ntile(buckets).over(w))
  }

  /** Filter-funnel accounting: assign every document its FIRST failing
    * rule — `rules` is ordered `(stage name, fails predicate)` — and
    * report per-stage drop counts plus the `kept` survivors and each
    * stage's share of the corpus. The assignment is one scan-local CASE
    * cascade (a doc failing several rules counts exactly once, under
    * the earliest), so the whole funnel is one pass over the corpus
    * and one partial-aggregated count shuffle onto a stage-cardinality
    * frame — the survival report every curation pipeline publishes,
    * at any corpus size. */
  def funnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    val names = rules.map(_._1)
    require(names.distinct.size == names.size && !names.contains("kept"),
      "funnel stage names must be unique and must not shadow 'kept'")
    val stage = rules.foldRight(lit("kept")) { case ((name, fails), acc) =>
      when(fails, lit(name)).otherwise(acc)
    }
    val counts = df.select(stage.as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n"))
    // the share window runs over the stage-cardinality aggregate (a
    // handful of rows), not the corpus — a single-partition window
    // there is free
    counts.select(col("stage"), col("n"),
      (col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy())).as("share"))
  }

  /** Per-document TF-IDF keyword extraction: top-`k` tokens per doc by
    * `tf × ln(N / df)`, ranked on the ROUNDED score (token tiebreak) so
    * rank order is deterministic across engines.
    *
    * The term-frequency table is built once and feeds both the document-
    * frequency aggregate and the scoring join — two partial-aggregated
    * shuffles plus one token-keyed equi-join; only the scalar corpus
    * count broadcasts. The per-doc window is the x25 map-side
    * WindowGroupLimit shape. */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = df
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false) // feeds doc-frequency AND scoring
    val docFreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).cast("double").as("n"))
    val scored = tf.join(docFreq, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n") / col("df")), 4))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("score").desc, col("tok"))))
      .filter(col("rk") <= k)
      .select(col("id"), col("rk"), col("tok"), col("score"))
  }

  /** Vocabulary-growth curve: bucket the corpus by id into `buckets`
    * equal id-ranges and count the tokens whose FIRST occurrence falls in
    * each bucket, plus the running vocabulary size — the Heaps'-law
    * saturation diagnostic for "is more data still adding new language".
    *
    * One token explode feeds a partial-aggregated min-id shuffle (the only
    * corpus-sized exchange); the max-id scalar broadcasts; bucketing is
    * exact integer division so the oracle bit-matches. The cumulative
    * window runs over `buckets` rows on one partition — free. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val mx = df.agg(max(col(idCol)).as("mx"))
    // one token explode feeds both the per-bucket totals and the
    // first-seen mins — materialize it once
    val toks = df
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .crossJoin(broadcast(mx))
      // FLOOR division in exact integer math (pmod is non-negative, so
      // subtracting it floors for any sign): Spark `div` truncates toward
      // zero while the oracle's `//` floors — they'd diverge on negative
      // ids; this form matches the oracle for every id sign
      .withColumn("bucket",
        expr(s"(id * $buckets - pmod(id * $buckets, mx + 1)) div (mx + 1)"))
      .localCheckpoint(eager = false)
    val totals = toks.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
    // bucket is monotone in id, so min(bucket) = bucket of first sighting
    val firsts = toks.groupBy(col("tok")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_tokens"))
    totals.join(firsts, Seq("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
      .withColumn("cum_vocab", sum(col("new_tokens")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every RAW
    * document by how much more likely its tokens are under the TARGET
    * distribution than under the raw one —
    * `log w(doc) = Σ_tok ln p̂_target(tok) − ln p̂_raw(tok)` with add-0.5
    * smoothing over the joint vocabulary — then keep the top `perSource`
    * docs per source (deterministic resampling; the paper adds Gumbel
    * noise, which a seeded hash column slots into the same rank).
    *
    * Scale shape: ONE token explode feeds a single conditional-aggregate
    * shuffle producing both sides' counts per token (no second corpus
    * pass); the scored join is a token-keyed equi-join against that
    * vocabulary-sized frame (never broadcast — only the three scalar
    * totals are); the per-doc sum folds in token-sorted order (the x31
    * float-parity pattern) and the per-source top-k is the map-side
    * WindowGroupLimit shape. `isTarget` marks the target-domain rows;
    * scores are reported for the raw (non-target) rows. */
  def dsirSelection(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, isTarget: Column, perSource: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"), col(strataCol).as("source"),
        isTarget.as("__t"), explode(split(col(textCol), " ")).as("tok"))
      .localCheckpoint(eager = false) // feeds counts AND per-doc scoring
    val counts = toks.groupBy(col("tok")).agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("cr"))
      .localCheckpoint(eager = false) // feeds totals AND the score join
    val totals = counts.agg(
      sum(col("ct")).cast("double").as("tt"),
      sum(col("cr")).cast("double").as("tr"),
      count(lit(1)).cast("double").as("v"))
    val llr = log((col("ct") + lit(0.5)) / (col("tt") + lit(0.5) * col("v"))) -
      log((col("cr") + lit(0.5)) / (col("tr") + lit(0.5) * col("v")))
    val scored = toks.filter(!col("__t"))
      .join(counts, Seq("tok"))
      .crossJoin(broadcast(totals))
      .select(col("id"), col("source"), col("tok"), llr.as("llr"))
      .groupBy(col("id"), col("source"))
      .agg(count(lit(1)).as("n_tok"),
        sort_array(collect_list(struct(col("tok"), col("llr")))).as("ls"))
      .select(col("id"), col("source"), col("n_tok"),
        round(aggregate(transform(col("ls"), s => s.getField("llr")),
          lit(0.0), (a: Column, x: Column) => a + x), 4).as("log_w"))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("log_w").desc, col("id"))))
      .filter(col("rk") <= perSource)
      .select(col("id"), col("source"), col("n_tok"), col("log_w"), col("rk"))
  }

  /** Token-budget fill: walk each source's documents in a deterministic
    * hash-shuffled order (seeded by id, so the fill is stable across
    * replays and unbiased by ingestion order) and keep the PREFIX whose
    * running token total stays within `budget` — the "fill each domain's
    * token quota" step that turns mixture weights into an actual corpus.
    * Prefix-truncate semantics: the walk stops contributing at the first
    * document that crosses the budget (a plain running-total predicate,
    * identical in any engine; a first-fit variant that skips oversized
    * docs and keeps walking buys marginal utilization at the cost of a
    * sequential fold that no longer maps to a window).
    *
    * One cumulative-sum window per source over (hash, id) — the x24/x25
    * per-stratum shape: parallel in the source count, no global sort, no
    * driver state, and the window's running total is the only state a
    * 1000-executor run carries per stratum. */
  def tokenBudgetFill(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, budget: Long): DataFrame = {
    // the x25 multiplicative hash: oracle-portable (plain integer
    // arithmetic) and free of ingestion-order bias
    val t = df.select(col(idCol).as("id"), col(strataCol).as("source"),
      size(split(col(textCol), " ")).cast("long").as("n_tok"),
      pmod(pmod(col(idCol), lit(1000000007L)) * lit(2654435761L),
        lit(1000000007L)).as("h"))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budget)
      .select(col("id"), col("source"), col("n_tok"), col("cum_tok"))
  }

  /** Temperature-scaled domain resampling — the multilingual-pretraining
    * mix of XLM-R / mT5: a domain's sampling weight is its token mass
    * raised to `alpha` < 1 and renormalized, which upweights rare
    * domains relative to proportional sampling (alpha=1) without the
    * uniform mix's (alpha=0) repetition of tiny ones. Returns each
    * selected document with its domain's normalized weight and document
    * quota (`floor(budget × w)`, capped at the domain's size); selection
    * within a domain is the deterministic id order.
    *
    * Parity note: alpha = 0.5 routes through `sqrt`, which IEEE 754
    * requires to be correctly rounded in every engine — the
    * oracle-portable exponent. Other alphas use `pow`, whose last ULP
    * may differ across libm implementations. The cross-domain weight
    * denominator folds in sorted domain order (the x31/x47 pattern) so
    * the double sum is reproducible on both sides.
    *
    * Scale shape: domain stats are a map-side-combinable aggregation to
    * |domains| rows, broadcast back; the only corpus-sized work is the
    * per-domain rank window. A domain with billions of rows makes that
    * window one giant partition — at that scale swap the rank for
    * residue thinning at rate quota/docs ([[stratifiedSample]]'s shape:
    * keep iff pmod(hash(id), docs) < quota), which trades the exact
    * first-k-by-id semantics for a full-shuffle-free Bernoulli-style
    * pick that is still deterministic and replay-stable. */
  def temperatureMix(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget > 0 && alpha > 0)
    val tw: Column => Column =
      if (alpha == 0.5) sqrt(_) else c => pow(c, lit(alpha))
    val per = df.select(col(strataCol).as("strata"), col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .localCheckpoint(eager = false) // feeds domain stats AND selection
    val counts = per.groupBy(col("strata"))
      .agg(sum(col("n_tok")).as("toks"), count(lit(1)).as("docs"))
    val denom = counts.agg(aggregate(
      transform(
        sort_array(collect_list(struct(col("strata").as("k"),
          tw(col("toks").cast("double")).as("s")))),
        e => e.getField("s")),
      lit(0.0), (a: Column, x: Column) => a + x).as("denom"))
    val quotas = counts.crossJoin(broadcast(denom))
      .withColumn("w", tw(col("toks").cast("double")) / col("denom"))
      .withColumn("quota",
        least(col("docs"), floor(lit(budget.toDouble) * col("w")).cast("long")))
      .select(col("strata"), col("w"), col("quota"))
    per.join(broadcast(quotas), "strata")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("strata")).orderBy(col("id"))))
      .filter(col("rn") <= col("quota"))
      .select(col("id"), col("strata"), round(col("w"), 6).as("mix_w"),
        col("quota"))
  }

  /** Bloom-prefiltered exact-text decontamination: corpus documents whose
    * full text appears verbatim in the benchmark set. The OUTPUT is the
    * plain exact semi-join (bloom false positives die in the verify
    * stage, and a Bloom filter has no false negatives), so the result is
    * oracle-exact while the PLAN is the 100 TB shape: the benchmark side
    * folds into a fixed-size sketch in one bounded action, the sketch
    * rides the corpus scan as a binary literal probed by the codegen'd
    * native `might_contain` ([[graft.functions.Functions]] registers
    * Catalyst's own runtime-filter expression, which the public registry
    * omits), and only the ~matches + fpp·corpus survivors reach the
    * verify join's exchange — the corpus itself never shuffles. This is
    * Catalyst's InjectRuntimeFilter pattern made explicit as an operator.
    *
    * `expectedItems` sizes the sketch (default 2^17 ≈ 131 k benchmark
    * docs at 1% fpp ≈ 160 KB of plan literal). An UNDERSIZED sketch only
    * raises the false-positive rate — the verify stage keeps the output
    * exact — so the parameter is a perf knob, never a correctness one. */
  def bloomExactMatches(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      expectedItems: Long = 1L << 17, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    graft.functions.Functions.register(corpus.sparkSession)
    val bench = benchmark.select(col(benchTextCol).as(textCol)).distinct()
    // one bounded action: (count, fixed-size sketch bytes). numBits is
    // the standard optimum -n·ln(p)/ln(2)^2 for the declared capacity.
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val st = bench
      .agg(count(lit(1)),
        call_function("bloom_filter_agg", xxhash64(col(textCol)),
          lit(expectedItems), lit(numBits)))
      .head()
    if (st.getLong(0) == 0L)
      return corpus.select(col(idCol)).limit(0)
    val sketch = st.getAs[Array[Byte]](1)
    corpus
      .filter(call_function("might_contain", lit(sketch),
        xxhash64(col(textCol))))
      .join(bench, Seq(textCol), "left_semi")
      .select(col(idCol))
  }

  /** Corpus snapshot diff — the data-versioning audit run between two
    * ingestion runs: per document id, `added` / `removed` / `changed` /
    * `unchanged` by content. Scale shape: each side reduces scan-local to
    * (id, 8-byte content hash) before the single co-partitioned full
    * outer join on the id — document text never reaches the exchange, so
    * the shuffle is O(corpus) fixed-width rows on both sides regardless
    * of document size. Content equality is `xxhash64` equality (the
    * engine-wide collision-exactness argument of x21). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"), xxhash64(col(textCol)).as("oh"))
    val n = newDf.select(col(idCol).as("id"), xxhash64(col(textCol)).as("nh"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("oh").isNull, lit("added"))
          .when(col("nh").isNull, lit("removed"))
          .when(col("oh") === col("nh"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Cheap near-dup cluster key: the document's first `words` tokens.
    * Shared prefixes catch the templated/forked copies that exact
    * full-text equality misses, at zero pairwise cost — the standard
    * blocking key for split hygiene and canonicalization below. */
  private def prefixKey(text: Column, words: Int): Column =
    array_join(slice(split(text, " "), 1, words), " ")

  /** The Knuth multiplicative residue in [0, p) — the engine's
    * oracle-portable stand-in for `xxhash64` wherever a deterministic
    * uniform-ish integer is derived from an id (x25/x47 convention).
    * The id reduces mod p BEFORE the multiply so the product stays
    * under 2^63 under ANSI overflow checking. */
  private def idResidue(id: Column): Column = {
    val p = 1000000007L
    pmod(pmod(id, lit(p)) * lit(2654435761L), lit(p))
  }

  /** Leakage-safe train/val/test split: documents sharing a near-dup
    * cluster key are assigned to the SAME split, so a test document can
    * never have a templated twin in train — the assignment hygiene every
    * eval pipeline needs before it can trust held-out numbers.
    *
    * The cluster is the [[prefixKey]] block; the representative is the
    * cluster's min id; the split is decided by a deterministic residue
    * of the REPRESENTATIVE (not the member), which is what makes every
    * member land together. One hash shuffle on the 8-byte cluster key
    * (window min — no join, no second pass); the decision replays
    * identically across retries because nothing samples. At 100 TB the
    * cluster key generalizes to a MinHash band or x16's resolved
    * cluster id with the same split rule. */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
      trainPct: Int = 90, valPct: Int = 5,
      prefixWords: Int = 8): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100)
    val w = Window.partitionBy(xxhash64(prefixKey(col(textCol), prefixWords)))
    val rep = min(col(idCol)).over(w)
    val r = pmod(idResidue(rep), lit(100))
    df.select(col(idCol), rep.as("rep"),
      when(r < trainPct, lit("train"))
        .when(r < trainPct + valPct, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /** Canonical-document selection: per multi-member near-dup cluster,
    * keep the highest-quality member (tiebreak: lowest id) and report
    * what dropping the rest reclaims. The "keep one per cluster" step
    * that turns a dedup ANALYSIS into a dedup DECISION.
    *
    * One window shuffle on the cluster key; rank + cluster totals ride
    * the same partition, so there is no groupBy+join back. */
  def canonicalPerCluster(df: DataFrame, idCol: String, textCol: String,
      qualityCol: String, prefixWords: Int = 8): DataFrame = {
    val key = xxhash64(prefixKey(col(textCol), prefixWords))
    val wAll = Window.partitionBy(key)
    val wRank = Window.partitionBy(key)
      .orderBy(col(qualityCol).desc, col(idCol))
    df.select(col(idCol), col(qualityCol),
        row_number().over(wRank).as("rk"),
        count(lit(1)).over(wAll).as("n_members"),
        sum(col(qualityCol)).over(wAll).as("__qt"))
      .filter(col("rk") === 1 && col("n_members") > 1)
      .select(col(idCol).as("keeper_id"), col("n_members"),
        col("__qt").cast("long").as("chars_total"),
        (col("__qt") - col(qualityCol)).cast("long").as("chars_saved"))
  }

  /** Pairwise source-overlap matrix: for every pair of sources, the
    * exact count of shared near-dup cluster keys and the resulting
    * Jaccard (as an integer basis-point ratio — float-free, so the
    * result hashes identically in every engine). The audit that decides
    * whether two crawls are worth ingesting separately.
    *
    * Scale shape: distinct (key, source) reduces the corpus scan-local
    * to fixed-width rows; the per-key source set is bounded by the
    * SOURCE COUNT (not the corpus), so the pair explosion inside each
    * key is O(|sources|²) worst-case and typically tiny; both
    * aggregations partial-combine before their single exchange. The
    * size join at the end is sources² rows — broadcast by AQE. */
  def sourceOverlap(df: DataFrame, textCol: String, srcCol: String,
      prefixWords: Int = 8): DataFrame = {
    val hs = df.select(
      xxhash64(prefixKey(col(textCol), prefixWords)).as("h"),
      col(srcCol).as("src")).distinct()
    val sizes = hs.groupBy("src").agg(count(lit(1)).as("n"))
    val pairs = hs.groupBy("h").agg(collect_set(col("src")).as("ss"))
      .select(explode(expr(
        "flatten(transform(ss, a -> transform(filter(ss, b -> b > a), " +
          "b -> struct(a AS src_a, b AS src_b))))")).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("src").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("n").as("n_b")), "src_b")
      .withColumn("un", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jaccard_bp", expr("(10000 * inter) div un"))
      .select("src_a", "src_b", "inter", "n_a", "n_b", "un", "jaccard_bp")
  }

  /** Deterministic weighted priority sample: top-`k` documents by the
    * integer priority `residue(id) / weight` — the integer-exact
    * stand-in for the Efraimidis–Spiliakopoulos exponential race
    * (`-ln(u)/w`): both are monotone in u for fixed w, so heavier
    * documents win proportionally more races, and the integer form
    * orders identically in every engine (no libm, no float ties).
    *
    * Plans as one TakeOrdered (per-partition top-k, then a k-row merge
    * on the driver) — no global sort, no shuffle of the corpus; replays
    * and retries reproduce the same sample because nothing draws RNG
    * state at runtime. */
  def weightedPrioritySample(df: DataFrame, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0)
    // residue < 1e9 and the 1e6 scale keep the product under 2^63 for
    // any weight >= 1 (ANSI mode would fail the query on overflow).
    df.withColumn("__h", idResidue(col(idCol)))
      .withColumn("pri", expr(s"(__h * 1000000) div greatest($weightCol, 1)"))
      .orderBy(col("pri"), col(idCol))
      .limit(k)
      .select(col(idCol), col(weightCol), col("pri"))
  }

  /** Content-defined chunking (CDC) dedup: chunk boundaries fall where a
    * word's polynomial hash residue hits zero (FastCDC's idea at word
    * granularity), so an insertion near the top of a forked document
    * SHIFTS later chunk positions without CHANGING their content — the
    * later chunks still dedup, which fixed-window tiling
    * ([[chunkDedup]]) structurally cannot do (one inserted word
    * misaligns every downstream tile).
    *
    * The whole chunker is scan-local array algebra (boundary positions →
    * start/end spans → sliced chunk strings, all linear in the word
    * count — no quadratic fold, no explode before chunking); the only
    * exchange is the final partial-aggregated groupBy on the 8-byte
    * chunk hash. The word hash is the [[TextAnalysis.fingerprint]]
    * recipe, so the whole operator is oracle-portable. Expected chunk
    * length = `divisor` words (geometric); no max-length cap — a
    * boundary-free document is one chunk by design (cap-splitting would
    * re-introduce the alignment fragility CDC exists to remove). */
  def cdcChunkDedup(df: DataFrame, idCol: String, textCol: String,
      divisor: Int = 16): DataFrame = {
    require(divisor >= 2)
    // History: the index-based form (`filter(sequence(1, n), ...)`) was
    // O(n²·wordlen) per doc — 54 s at sf0.1; the HOF fold fixed the
    // complexity (one streaming pass, ~2.5 s); the native `cdc_chunks`
    // scan removes the interpreter (the fold evaluated each word's char
    // hash once per struct BRANCH) — sub-second, bit-identical at every
    // step (parity spec + unchanged oracle).
    graft.functions.Functions.register(df.sparkSession)
    // native scan (one rolling hash per word); the interpreted HOF twin
    // lives in [[cdcChunksHof]] for the parity spec — it re-evaluated
    // the per-word char hash once per struct BRANCH through the
    // interpreter and cost ~2.5 s at sf0.1 vs sub-second native
    val chunks = df
      .select(col(idCol).as("doc_id"),
        call_function("cdc_chunks", col(textCol), lit(divisor)).as("__ch"))
      .select(col("doc_id"), posexplode(col("__ch")).as(Seq("cidx", "chunk")))
    chunks
      .withColumn("ch", graft.ext.TextAnalysis.fingerprint(col("chunk")))
      .groupBy(col("ch"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("rep_doc"),
        min(size(split(col("chunk"), " "))).cast("long").as("n_words"))
      .filter(col("n_copies") > 1)
      .select(col("ch").as("chunk_hash"), col("n_copies"), col("n_docs"),
        col("rep_doc"), col("n_words"))
  }

  /** Behavior-sequence example construction: sessionize an event log
    * (gap rule) and emit one training example per session — the ordered
    * event-type trajectory, its duration, and its outcome (final
    * event). The log-to-sequence step behind behavioral-cloning and
    * next-action-prediction datasets.
    *
    * One exchange total: the session window hash-partitions on
    * `user_id`, and the (user, session) aggregation reuses that
    * partitioning (grouping keys ⊇ partition keys — no second
    * shuffle). The trajectory is ordered by an explicit
    * `array_sort(struct(ts, event_id, …))`, never by `collect_list`
    * arrival order, so replays and retries produce identical strings. */
  def sessionTrajectories(events: DataFrame, gapSeconds: Long = 1800L)
      : DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val sessioned = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("__prev", lag(col("us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("us") - col("__prev") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / lit(1000000L)).cast("long")
          .as("duration_s"),
        concat_ws(">", transform(
          array_sort(collect_list(
            struct(col("us"), col("event_id"), col("event_type")))),
          x => x.getField("event_type"))).as("traj"))
      .withColumn("outcome",
        element_at(split(col("traj"), ">"), -1))
  }

  /** Hashed linear-model inference at scan speed (the fastText-style
    * quality-classifier shape): every token hashes into one of `dim`
    * weight buckets, the document score is the mean bucket weight, and
    * the label is its sign. No feature dictionary ships anywhere — the
    * hashing trick IS the vocabulary — and inference is a pure
    * scan-local fold: zero shuffle, zero UDF, codegen end to end. This
    * is the plumbing real pipelines run trained fastText weights
    * through; here the weight table is a deterministic seeded function
    * of the bucket (portable to the oracle), and swapping in trained
    * weights means broadcasting a `dim`-sized array and indexing it in
    * the same fold.
    *
    * Token hash is the [[TextAnalysis.fingerprint]] polynomial; the
    * bucket weight maps the Knuth residue into [-1, 1) with one IEEE
    * division — no libm, so scores hash identically across engines.
    * The fold runs in token order in both engines, pinning the float
    * sum. */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 1 << 10, seed: Long = 97L): DataFrame = {
    require(dim > 0)
    val p = 1000000007L
    df.select(col(idCol), split(col(textCol), " ").as("__t"))
      .withColumn("score", expr(
        // the weight term is parenthesized as ((h/p)*2 - 1) BEFORE the
        // accumulator add — FP addition is not associative, and the
        // oracle folds fully-formed weights
        s"""aggregate(__t, 0.0D, (acc, w) ->
           |  acc + ((CAST(((aggregate(split(w, ''), 0L,
           |      (a, c) -> (a * 31 + ascii(c)) % $p) % $dim)
           |      * 2654435761L + $seed) % $p AS DOUBLE) / $p) * 2.0D
           |      - 1.0D),
           |  acc -> acc / size(__t))""".stripMargin))
      .select(col(idCol), col("score"), (col("score") > 0).as("keep"))
  }

  /** Dedup-adjusted corpus sizing: raw vs EFFECTIVE token counts per
    * source, where effective keeps one copy per near-dup cluster (the
    * representative's tokens) — the number that actually matters when a
    * token budget meets a duplicated crawl, and the honest denominator
    * for epoch planning (x69). One window shuffle on the cluster key,
    * one partial-combined roll-up to |sources| rows. */
  def effectiveTokens(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, prefixWords: Int = 8): DataFrame = {
    val key = xxhash64(prefixKey(col(textCol), prefixWords))
    val w = Window.partitionBy(key).orderBy(col(idCol))
    df.select(col(strataCol), col(idCol),
        size(split(col(textCol), " ")).cast("long").as("__tok"),
        row_number().over(w).as("__rk"))
      .groupBy(col(strataCol))
      .agg(sum(col("__tok")).as("raw_tokens"),
        sum(when(col("__rk") === 1, col("__tok")).otherwise(0L))
          .as("effective_tokens"))
      .withColumn("dup_overhead_bp", expr(
        "(10000 * (raw_tokens - effective_tokens)) div raw_tokens"))
  }

  /** Robust per-stratum outlier gate (median/MAD): flag documents whose
    * metric sits more than `nMads` median-absolute-deviations from the
    * stratum median. Median+MAD survive the heavy-tailed length/quality
    * distributions that mean+stddev gates are blown open by (one 10 MB
    * document shifts a mean, not a median).
    *
    * Two grouped EXACT interpolated percentiles (portable: Spark
    * `percentile` and DuckDB `median` share the definition), each a
    * (stratum, value) shuffle, with the tiny per-stratum results
    * broadcast back. At 100 TB swap `percentile` for
    * `percentile_approx` under the x76 rank-error contract — the gate's
    * decisions change only for docs within ε·N ranks of the cut. The
    * only float operations are IEEE +,-,×,÷ on exact inputs — no libm,
    * so the output hashes identically across engines. */
  def madOutliers(df: DataFrame, idCol: String, valueCol: String,
      strataCol: String, nMads: Int = 3): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(strataCol))
      .agg(percentile(v, lit(0.5)).as("med"))
    val withMed = df.join(broadcast(med), Seq(strataCol))
    val mad = withMed.groupBy(col(strataCol))
      .agg(percentile(abs(v - col("med")), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), Seq(strataCol))
      .select(col(idCol), col(strataCol), col(valueCol), col("med"),
        col("mad"),
        (abs(v - col("med")) > lit(nMads.toDouble) * col("mad"))
          .as("is_outlier"))
  }

  /** Multi-iteration BPE vocabulary learner: `merges` rounds of
    * (count adjacent symbol pairs over the distributed word-frequency
    * table → pick the argmax → contract it left-to-right in every
    * word). Returns the learned merge table `(iter, left, right, cnt)`
    * — the actual artifact a BPE tokenizer trains.
    *
    * Scale shape per round: one partial-combined pair count + a 1-row
    * TakeOrdered action + one scan-local contraction over the CACHED
    * vocab (which never leaves the cluster; only the single winning
    * pair crosses to the driver). Production trainers amortize further
    * with incremental pair-count deltas; recount-per-round keeps each
    * round embarrassingly parallel and exactly reproducible. */
  /** One left-to-right BPE contraction pass over a symbol array: every
    * adjacent (l, r) occurrence becomes the merged symbol `l+r`,
    * non-overlapping, leftmost-first — the classic trainer's replace
    * step as a pure fold (scan-local, codegen-friendly, no explode). */
  private def contractPair(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      struct(lit(Array.empty[String]).as("acc"),
        lit(null).cast("string").as("pend")),
      (a, s) => {
        val acc = a.getField("acc"); val pend = a.getField("pend")
        when(pend.isNull, struct(acc.as("acc"), s.as("pend")))
          .when(pend === lit(l) && s === lit(r),
            struct(concat(acc, array(concat(pend, s))).as("acc"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(acc, array(pend)).as("acc"),
            s.as("pend")))
      },
      a => when(a.getField("pend").isNull, a.getField("acc"))
        .otherwise(concat(a.getField("acc"), array(a.getField("pend")))))

  def bpeLearn(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    def contract(syms: Column, l: String, r: String): Column =
      contractPair(syms, l, r)
    // NOT widened (cf. Par.widen): measured at sf0.1, the per-round
    // pair-explosion over the coalesced single-partition vocab beats
    // the 32-way version — each round's work is too small to amortize
    // task scheduling, and `merges` rounds multiply that overhead
    var vocab = df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("wf"))
      .select(split(col("w"), "").as("syms"), col("wf"))
      .cache()
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    // ONE job per round: the round's top-pair aggregation is also the
    // action that materializes the round's cached vocab (its plan is a
    // projection over the PARENT round's cache, so nothing recomputes
    // from the corpus). The former shape paid a second `count()` job
    // per round purely to materialize the cache before unpersisting
    // the parent; deferring the unpersist until after the next round's
    // aggregation makes that job pure overhead — measured at sf0.1 this
    // halves the per-round job count (8 aggs + 7 counts + final → 8
    // aggs) with identical merges learned (round-14 optimization pass).
    var parent: Option[DataFrame] = None
    var it = 1
    var done = false
    while (it <= merges && !done) {
      val top = vocab
        .filter(size(col("syms")) >= 2) // sequence(a,b) descends if a > b
        .select(col("wf"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS l,
            |              element_at(syms, i + 1) AS r))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wf")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      // `vocab`'s cache is materialized now — its parent can drop.
      // Peak storage is TWO cached vocab generations by design (the
      // parent feeds the child's cache build during the aggregation
      // above); vocab-table-sized, the price of the one-job rounds.
      parent.foreach(_.unpersist())
      parent = Some(vocab)
      if (top.isEmpty) done = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((it, l, r, c))
        if (it < merges) // the final round's contraction is never read
          vocab = vocab
            .select(contract(col("syms"), l, r).as("syms"), col("wf"))
            .cache()
        it += 1
      }
    }
    vocab.unpersist()
    // after the final round `parent` and `vocab` alias the same frame —
    // guard rather than unpersist twice (idempotent either way)
    parent.filterNot(_ eq vocab).foreach(_.unpersist())
    learned.result().toDF("iter", "left", "right", "cnt")
  }

  /** One BPE merge iteration, distributed: adjacent character-pair
    * counts over the corpus, weighted by word frequency — the top pair
    * is the next merge a byte-pair-encoding tokenizer would learn.
    * Real BPE trainers count over the WORD-FREQUENCY TABLE, not the
    * corpus, and so does this: the first aggregation collapses the
    * corpus to its vocabulary (heavy hitters partial-combine map-side),
    * so the quadratic-ish pair explosion runs over distinct words only.
    * Iterating = [[bpeLearn]]. */
  def bpePairCounts(df: DataFrame, textCol: String,
      top: Int = 20): DataFrame = {
    val words = df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wf"))
    words
      // sequence(a, b) DESCENDS when a > b — the length filter above
      // guarantees 1 <= length(w) - 1, so the bounds are always ordered
      .select(col("wf"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("wf")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(top)
  }

  /** Apply a learned BPE merge table ([[bpeLearn]]'s output, in learned
    * order) to the corpus and report per-document tokenization stats:
    * word count, character mass, and the BPE token count after all
    * merges — the operator a pipeline runs to budget sequence lengths
    * under the REAL tokenizer rather than the whitespace proxy.
    *
    * Classic BPE encoding applies merges in rank order, each as a full
    * left-to-right non-overlapping replace — exactly `merges.foldLeft`
    * over [[contractPair]], so the whole encode is ONE nested scan-local
    * expression per word: `transform(words, w -> size(contract_k(...
    * contract_1(split(w, "")))))`. Zero exchanges (the merge table is a
    * driver-side constant — real vocabularies are ≤ ~100k entries and
    * ship as literals/broadcast, never a join); the output sort is the
    * only shuffle. At 100 TB the encode cost is a single corpus pass. */
  def bpeEncodeCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    graft.functions.Functions.register(df.sparkSession)
    // native codegen'd scan: the HOF form ([[bpeEncodeLenHof]], kept for
    // the parity spec) interprets a struct-building lambda per symbol
    // per merge — ~50 closures/word at 8 merges — and was the most
    // CPU-bound stage on the bench (x93)
    val encodedLen = call_function("bpe_encode_len", col(textCol),
      array(merges.map(m => lit(m._1)): _*),
      array(merges.map(m => lit(m._2)): _*))
    df.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_words"),
      length(col(textCol)).cast("long").as("n_chars_ws"),
      encodedLen.as("n_bpe_tokens"))
  }

  /** The higher-order-function twin of `cdc_chunks` — the original
    * chunking fold, retained as the independent parity reference
    * (ExtOpsSpec pins equality on adversarial inputs). Takes the text
    * COLUMN NAME (the fold is an `expr` string). */
  def cdcChunksHof(textColName: String, divisor: Int): Column = {
    val p = 1000000007L
    expr(
      s"""aggregate(split($textColName, ' '),
         |  named_struct('chs', cast(array() as array<string>), 'cur', ''),
         |  (st, w) -> named_struct(
         |    'chs', if(aggregate(split(w, ''), 0L,
         |         (a, c) -> (a * 31 + ascii(c)) % $p) % $divisor = 0,
         |       concat(st.chs, array(
         |         if(st.cur = '', w, concat(st.cur, ' ', w)))),
         |       st.chs),
         |    'cur', if(aggregate(split(w, ''), 0L,
         |         (a, c) -> (a * 31 + ascii(c)) % $p) % $divisor = 0,
         |       '', if(st.cur = '', w, concat(st.cur, ' ', w)))),
         |  st -> if(st.cur = '', st.chs, concat(st.chs, array(st.cur))))
         |""".stripMargin)
  }

  /** The higher-order-function twin of `bpe_encode_len` — the original
    * encode fold, retained as the independent parity reference
    * (ExtOpsSpec pins equality on adversarial inputs). */
  def bpeEncodeLenHof(textCol: Column,
      merges: Seq[(String, String)]): Column = {
    val perWord: Column => Column = w =>
      size(merges.foldLeft(split(w, "")) { case (syms, (l, r)) =>
        contractPair(syms, l, r)
      })
    aggregate(transform(split(textCol, " "), perWord),
      lit(0L), (a, n) => a + n)
  }

  /** Largest-remainder (Hamilton) integer quota allocation: split a
    * global sample budget of `total` rows across strata proportionally
    * to their counts, with EXACT integer quotas summing to exactly
    * `total` — floor quotas first, then the `total - Σfloor` leftover
    * units go to the strata with the largest remainders (ties broken by
    * stratum order). Pure integer arithmetic (`total·n div C`,
    * `total·n mod C`), so the allocation is bit-portable and
    * replay-stable — no float shares that could round to `total ± 1`.
    *
    * The eval-set construction primitive: x23's residue sampler then
    * draws `quota` rows per stratum. One count shuffle; the
    * remainder-ranking window runs over the STRATA table (strata-count
    * rows, not the corpus), where a single-partition window is free. */
  def largestRemainderQuotas(df: DataFrame, stratum: Column,
      total: Long): DataFrame = {
    require(total >= 0)
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("__c"))
    val based = counts.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_docs"),
        expr(s"(${total}L * n_docs) div __c").as("__base"),
        expr(s"(${total}L * n_docs) % __c").as("__rem"))
    val deficit = based.agg((lit(total) - sum(col("__base"))).as("__d"))
    val w = Window.orderBy(col("__rem").desc, col("stratum"))
    based.crossJoin(broadcast(deficit))
      .withColumn("__rk", row_number().over(w))
      .select(col("stratum"), col("n_docs"),
        (col("__base") +
          when(col("__rk") <= col("__d"), lit(1L)).otherwise(lit(0L)))
          .as("quota"))
  }

  /** The end-to-end eval-set sampler: [[largestRemainderQuotas]]' exact
    * per-stratum quotas drawn via [[domainCap]]'s portable hash rank —
    * EXACTLY `total` rows out, proportionally stratified, replay-stable
    * (same corpus → same sample, no RNG, no ingestion-order bias).
    * The quota table is strata-sized and broadcasts; the corpus pays
    * one per-stratum rank window. */
  def quotaSample(df: DataFrame, idCol: String,
      strataCol: String, total: Long): DataFrame = {
    val quotas = largestRemainderQuotas(df, col(strataCol), total)
    val p = 1000000007L
    val h = pmod(pmod(col(idCol), lit(p)) * lit(2654435761L), lit(p))
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .join(broadcast(quotas
        .select(col("stratum").as(strataCol), col("quota"))), strataCol)
      .filter(col("__rk") <= col("quota"))
      .drop("__rk", "quota")
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
  def contamination(
      corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 8): DataFrame = {
    // materialize the hashed-gram arrays BEFORE the explodes: a Generate
    // whose input is the n-gram builder expression re-evaluates the
    // (higher-order-function) builder inside the generator, outside
    // whole-stage codegen — exploding a checkpointed attribute keeps the
    // builder in the scan-side projection and runs it once per document
    def hashedGrams(text: Column): Column =
      transform(array_distinct(ngrams(text, n)), g => xxhash64(g))
    val bench = benchmark
      .select(hashedGrams(col(benchTextCol)).as("g"))
      .localCheckpoint(eager = false)
      .select(explode(col("g")).as("ng"))
      .distinct()
    val grams = corpus
      .select(col(idCol).as("doc_id"), hashedGrams(col(textCol)).as("g"))
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
}

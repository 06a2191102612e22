package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching for entity resolution: an EXACT edit-distance-1
  * similarity self-join via deletion neighborhoods (the FastSS family —
  * Bocek et al. 2007), the record-linkage step that finds typo'd /
  * OCR-drifted twins of canonical entity names.
  *
  * Why not a blocked nested-loop: first-letter or length blocking leaves
  * blocks that scale with the corpus (every `Customer#…` shares both),
  * and the quadratic term inside a block is unbounded. The deletion
  * neighborhood is the scale-correct shape: each string emits
  * `length+1` fixed keys, and a bucket only collects strings whose
  * ED-1 witness is that exact deletion — bucket sizes are bounded by
  * the alphabet times positions, never by the corpus.
  */
object Fuzzy {

  /** All unordered pairs of DISTINCT values of `strCol` at edit distance
    * exactly 1, as `(name_a, name_b)` with `name_a < name_b`.
    *
    * Completeness: if ED(a,b)=1 then the neighborhoods
    * `U(s) = {s} ∪ {single-char deletions of s}` intersect — a
    * substitution at i gives `d_i(a) = d_i(b)`; an indel makes the
    * shorter string itself a deletion of the longer. The join on the
    * shared neighborhood member generates every true pair (plus a few
    * ED-2 candidates), and the final `levenshtein = 1` verify keeps the
    * result EXACTLY equal to the naive all-pairs join — the oracle runs
    * that naive form and the outputs hash-match.
    *
    * Plan: one distinct, one self-equi-join on the variant key (both
    * sides the same exchange → ReuseExchange), pair-distinct, then the
    * verify filter over surviving candidates only. */
  def editDistanceOnePairs(df: DataFrame, strCol: String): DataFrame = {
    // ROUND-ROBIN numbered repartition after the distinct: its
    // post-shuffle bytes are tiny (strings only), so AQE coalesces the
    // distinct's exchange to one partition — but everything downstream
    // is row-heavy, not byte-heavy (length+1 variant expansions, hash
    // probes, levenshtein on ~1M candidates), and a byte-sized plan
    // serializes ALL of that onto a single task (measured 11 s
    // single-task vs 5.5 s wide at sf0.1). It must be round-robin:
    // a hash repartition on `s` is satisfied by the distinct's own
    // hashpartitioning(s) and collapses into that (coalescible)
    // exchange; RoundRobinPartitioning/REPARTITION_BY_NUM survives,
    // is AQE-coalesce-exempt, and one exchange feeds BOTH join sides
    // (ReuseExchange).
    val shufflePartitions =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val names = df.select(col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull && length(col("s")) >= 1)
      .distinct()
      .repartition(shufflePartitions)
    // sequence(a, b) DESCENDS when a > b — the length filter above
    // keeps the bounds ordered for every row
    // join on the 8-byte hash of the variant, not the variant string:
    // the exchange ships fixed-width keys and the join compares longs.
    // A hash collision can only ADD a candidate pair, and every
    // candidate passes the exact `levenshtein = 1` verify — the result
    // is collision-proof.
    val variants = names.select(col("s"), explode(expr(
      """array_union(array(xxhash64(s)),
        | transform(sequence(1, length(s)),
        |   i -> xxhash64(concat(substr(s, 1, i - 1), substr(s, i + 1)))))"""
        .stripMargin)).as("v"))
    // verify BEFORE the pair-distinct: levenshtein is codegen'd and
    // runs scan-local on the join output, so the distinct's exchange
    // only ever carries TRUE pairs (each duplicated at most once per
    // shared variant) instead of the full candidate set — repeated-char
    // strings generate many ED-2 candidates that would otherwise ride
    // the shuffle just to be filtered afterwards
    variants.as("a").join(variants.as("b"),
        col("a.v") === col("b.v") && col("a.s") < col("b.s"))
      .select(col("a.s").as("name_a"), col("b.s").as("name_b"))
      .filter(levenshtein(col("name_a"), col("name_b")) === 1)
      .distinct()
  }
}

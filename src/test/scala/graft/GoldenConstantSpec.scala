package graft

import org.apache.spark.sql.functions._

/** Engine-independent golden pins for four of the naive-oracle queries
  * (round-13 review: NaiveOracles re-derives in independent Spark code,
  * but same JVM, same float semantics — a bug shared by both Spark
  * paths would be invisible to the hash compare).
  *
  * PROVENANCE: every constant below is reproduced by
  * `tools/golden_check.py /root/testdata/sf0.001` — a pure-Python
  * recomputation (parquet in via duckdb; XXH64 implemented from its
  * public spec, the minhash remix constants re-derived from
  * java.util.Random's documented LCG, classic mutable-scan BPE) that
  * shares NO code, NO runtime, and NO float machinery with the engine.
  * Agreement here means the declared semantics hold outside the JVM
  * entirely.
  *
  * The integer columns pin exactly; the two float columns of the
  * near-dup pairs are exact IEEE quotients of pinned integers
  * (est_jac = eq/16, jac = inter/union), so equality — not tolerance —
  * is asserted.
  */
class GoldenConstantSpec extends SparkSpec {

  // tools/golden_check.py → "x88" (sf0.001)
  private val x88Golden: Seq[(Int, String, String, Long)] = Seq(
    (1, "e", "r", 4650L),
    (2, "o", "r", 2880L),
    (3, "i", "n", 2858L),
    (4, "o", "w", 2763L),
    (5, "s", "t", 2721L),
    (6, "l", "u", 1928L),
    (7, "a", "r", 1873L),
    (8, "p", "ar", 1873L))

  // tools/golden_check.py → "x93" (sf0.001)
  private val x93Golden =
    (500L, 27939L, 153156L, 104171L, 26069611L)

  // tools/golden_check.py → "x57"/"x158" (sf0.001):
  // (id, dup_of, positional-eq count of 16, |toks_a ∩ toks_b|, |union|)
  private val x57Golden: Seq[(Long, Long, Int, Int, Int)] = Seq(
    (2000000L, 0L, 16, 21, 21),
    (2000000L, 50L, 16, 20, 21),
    (2000000L, 82L, 14, 21, 22),
    (2000050L, 0L, 16, 20, 21),
    (2000050L, 50L, 16, 20, 20),
    (2000050L, 82L, 14, 20, 22),
    (2000100L, 100L, 16, 85, 85),
    (2000150L, 150L, 16, 13, 13),
    (2000200L, 200L, 16, 55, 55),
    (2000250L, 250L, 16, 35, 35),
    (2000300L, 300L, 16, 76, 76),
    (2000350L, 350L, 16, 51, 51),
    (2000400L, 400L, 16, 14, 14),
    (2000450L, 5L, 15, 40, 41),
    (2000450L, 450L, 16, 40, 40))

  private val x158Golden: Seq[(Long, Long, Int, Int, Int)] = Seq(
    (2000000L, 0L, 16, 21, 21),
    (2000000L, 82L, 14, 21, 22),
    (2000050L, 0L, 16, 20, 21),
    (2000050L, 82L, 14, 20, 22),
    (2000100L, 100L, 16, 85, 85),
    (2000200L, 200L, 16, 55, 55),
    (2000300L, 300L, 16, 76, 76),
    (2000400L, 400L, 16, 14, 14),
    (2000450L, 5L, 15, 40, 41))

  private def pairRows(name: String): Seq[(Long, Long, Double, Double)] =
    SparkEntry.queries(name)(spark, sf())
      .select(col("id").cast("long"), col("dup_of").cast("long"),
        col("est_jac"), col("jac"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))

  private def expectPairs(golden: Seq[(Long, Long, Int, Int, Int)]) =
    golden.map { case (a, b, eq, inter, union) =>
      (a, b, eq.toDouble / 16.0, inter.toDouble / union.toDouble)
    }

  test("x88 BPE merges equal the pure-Python classic trainer's (golden pin)") {
    val got = SparkEntry.queries("x88_bpe_learn")(spark, sf())
      .select(col("iter").cast("int"), col("left"), col("right"),
        col("cnt").cast("long"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got === x88Golden)
  }

  test("x93 BPE encode fingerprint equals the pure-Python encoder's (golden pin)") {
    val row = SparkEntry.queries("x93_bpe_encode")(spark, sf())
      .agg(count(lit(1)), sum(col("n_words")), sum(col("n_chars_ws")),
        sum(col("n_bpe_tokens")),
        sum(col("doc_id") * col("n_bpe_tokens")))
      .head()
    val got = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4))
    assert(got === x93Golden)
  }

  test("x57 incremental near-dup pairs equal the pure-Python minhash pipeline's (golden pin)") {
    assert(pairRows("x57_incremental_neardup") === expectPairs(x57Golden))
  }

  test("x158 stored-index probe pairs equal the pure-Python recomputation over the maintained corpus (golden pin)") {
    assert(pairRows("x158_stored_minhash_probe") === expectPairs(x158Golden))
  }
}

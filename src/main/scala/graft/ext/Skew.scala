package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * At 100 TB, power-law keys (one tenant, one language, one hot document
  * cluster) make single reducers the bottleneck. Two standard levers:
  * AQE's runtime skew-join splitting (enabled via conf), and explicit
  * salting for aggregations/joins whose skew is known up front — this
  * file implements the latter as a reusable two-phase aggregation.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates on
    * `(key, hash(row) % salt)` so each hot key spreads over `salt`
    * reducers; phase 2 re-combines per key. The caller declares how each
    * partial re-combines (`"sum"`, `"max"`, `"min"`) — identical results
    * to a direct groupBy for decomposable aggregates.
    */
  def saltedAgg(
      df: DataFrame, keyCol: String, salt: Int,
      aggs: Seq[(String, Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val phase1 = salted.groupBy(col(keyCol), col("__salt"))
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, c, _) => c.as(s"__p_$n") }: _*)
    val recombined = aggs.map {
      case (n, _, "sum") => sum(col(s"__p_$n")).as(n)
      case (n, _, "max") => max(col(s"__p_$n")).as(n)
      case (n, _, "min") => min(col(s"__p_$n")).as(n)
      case (n, _, other) =>
        throw new IllegalArgumentException(s"unsupported recombine $other for $n")
    }
    phase1.groupBy(col(keyCol))
      .agg(recombined.head, recombined.tail: _*)
  }

  /** Salted equi-join for a skewed fact side against a bounded build
    * side: each fact row draws a deterministic salt from its own
    * identity (`saltSource`, e.g. the fact primary key — NOT the join
    * key, which is exactly what's skewed), the build side replicates
    * `salt` times, and the join runs on `(key, salt)` — a hot key's
    * rows spread over `salt` reducers instead of one. Inner-join
    * result is identical to the unsalted join.
    *
    * Cost model: the build side grows ×`salt` through its shuffle, so
    * this fits dims too big to broadcast but small enough to
    * replicate; AQE's runtime skew splitting is the zero-config
    * alternative when the skew isn't known up front. The salt is
    * derived, never random — replays and retries salt identically. */
  def saltedJoin(
      fact: DataFrame, build: DataFrame, key: String, salt: Int,
      saltSource: Column): DataFrame = {
    require(salt > 0)
    require(!fact.columns.contains("__salt") &&
        !build.columns.contains("__salt"),
      "saltedJoin reserves the __salt column; rename it on the inputs")
    val f = fact.withColumn("__salt", pmod(xxhash64(saltSource), lit(salt)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    f.join(b, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-key skew audit — the measurement that DECIDES between a plain
    * join, [[saltedJoin]], and AQE skew splitting, run before the big
    * join instead of after it spills: per-key row counts reduced to the
    * top-`k` heaviest keys, each annotated with the key's share of the
    * table (basis points) and its skew factor over the mean key
    * (`count × n_keys / total`, ×100 fixed-point) — both integer-exact
    * ratios, no float hashing hazard.
    *
    * Shape: one partial-combined count per key (the count table is
    * |keys| rows, never the corpus) and one 1-row global roll-up that
    * broadcasts back; the top-k is a TakeOrdered. A skew factor ≥
    * `salt×100` means a hot key occupies `salt` reducers' worth of the
    * mean — the direct sizing input for [[saltedJoin]]'s salt count. */
  def skewAudit(df: DataFrame, keyCol: String, k: Int = 5): DataFrame = {
    require(k > 0)
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("n")).as("total"))
    counts.crossJoin(broadcast(stats))
      .select(col("key"), col("n"), col("n_keys"), col("total"),
        expr("(10000 * n) div total").as("share_bp"),
        expr("(100 * n * n_keys) div total").as("skew_x100"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus, score with higher-order functions (codegen'd, no
  * UDF), rank per query with a bounded window.
  *
  * Scale path: LSH bucketing via random-hyperplane signatures. The
  * hyperplanes are derived from a fixed seed so the signature is
  * deterministic and partition-independent; candidates come from a bucket
  * equi-join, so the corpus is scored only within matching buckets. At
  * 100 TB the corpus side stays partitioned by bucket (shuffle once,
  * reusable across query batches), and multi-probe (flipping low-margin
  * bits) trades recall for fan-out without rescanning.
  */
object Similarity {

  /** Dot product of two float arrays in double precision, sequential
    * left-to-right — deterministic and oracle-parity-safe. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x: Column, y: Column) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc: Column, x: Column) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, (x: Column) => x.cast("double") * x.cast("double")),
      lit(0.0), (acc: Column, x: Column) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every corpus row scored against every query
    * (queries broadcast), then per-query top-k. Norms are precomputed per
    * side so the cross join multiplies dot products only. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplanes: `nBits` planes of dimension
    * `dim`, components from a seeded generator (plan-time constants). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane LSH signature: bit_p = sign(v · plane_p). */
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: candidates share the exact signature bucket; scored
    * and ranked within bucket only. Lower `nBits` → bigger buckets →
    * higher recall and cost. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nBits: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("cv"))
      .withColumn("bucket", lshSignature(col("cv"), planes))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("bucket", lshSignature(col("qv"), planes))
      .withColumn("qn", norm(col("qv")))
    val scored = c.join(broadcast(q), "bucket")
      .withColumn("sim", dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), col("sim"))
  }
}

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

  /** Dot product in double precision, sequential left-to-right —
    * deterministic and oracle-parity-safe. Uses the native codegen
    * [[graft.functions.VectorDot]] (similarity scoring runs this once per
    * candidate pair; the HOF form interprets with per-element boxing).
    * Callers must have run `Functions.register` on the session — every
    * Similarity entry point does. */
  def dot(a: Column, b: Column): Column = call_function("vector_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every corpus row scored against every query
    * (queries broadcast), then per-query top-k. Norms are precomputed per
    * side so the cross join multiplies dot products only. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.Functions.register(corpus.sparkSession)
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

  /** Embedding-cosine near-duplicate pairs: exact all-pairs above a
    * similarity threshold. The small side broadcasts through a nested-loop
    * join with the `id_a < id_b` triangle predicate; at 100 TB corpus
    * scale the candidate set comes from [[lshTopK]]/[[ivfTopK]] buckets
    * instead and this exact scorer runs within buckets only. */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    graft.functions.Functions.register(df.sparkSession)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", norm(col("v")))
    val a = base.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = base.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer partitions the
    * corpus into `nCentroids` cells; each query probes its `nProbe`
    * nearest cells and scores only those vectors. At 100 TB the corpus is
    * written partitioned by cell id (one shuffle, reused by every query
    * batch), centroids are driver-side constants, and `nProbe` trades
    * recall for scan fraction (~nProbe/nCentroids of the corpus). */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    graft.functions.Functions.register(corpus.sparkSession)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val features = corpus.select(col(idCol).as("nid"),
      col(vecCol).cast("array<double>").as("arr"))
      .withColumn("features", array_to_vector(col("arr")))
    val model = new KMeans().setK(nCentroids).setSeed(42L)
      .setFeaturesCol("features").fit(features)

    val assigned = model.transform(features)
      .select(col("nid"), col("arr").as("cv"), col("prediction").as("cell"))
      .withColumn("cn", norm(col("cv")))

    // probe ranking: distance of each query to every centroid (plan-time
    // literals), keep the nProbe nearest cells
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cell"), array(c.toArray.map(lit): _*).as("cvec"))
    }
    val q = queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("c", explode(array(centroids: _*)))
      .withColumn("d2", aggregate(
        zip_with(col("qv"), col("c.cvec"), (x: Column, y: Column) => (x - y) * (x - y)),
        lit(0.0), (acc: Column, x: Column) => acc + x))
    val probeW = Window.partitionBy(col("qid")).orderBy(col("d2"), col("c.cell"))
    val probes = q.withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), col("c.cell").as("cell"))

    val scored = assigned.join(broadcast(probes), "cell")
      .withColumn("sim", dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("rnk"), col("sim"))
  }

  /** LSH-bucketed ANN: candidates share the exact signature bucket; scored
    * and ranked within bucket only. Lower `nBits` → bigger buckets →
    * higher recall and cost. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nBits: Int = 8, dim: Int = 64): DataFrame = {
    graft.functions.Functions.register(corpus.sparkSession)
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

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY §2 (plus the
  * LLM-pipeline extensions) to a DataFrame query over the test tables;
  * `oracleSql` carries the DuckDB-equivalent SQL the driver hash-compares
  * against. Operators whose semantics are not SQL-expressible (MinHash/LSH,
  * SimHash, custom hashes) are declared rows-only and verified in ScalaTest
  * instead.
  */
object SparkEntry {

  /** Flagship: the full CDC replication pipeline in batch miniature —
    * change stream → event classification (P2) → payload serialization +
    * envelope encode (P7/P11) → envelope decode (C3/C4) → keep-latest dedup
    * (C2) → LWW merge into the replica (C7/C8/C9). Driver smoke-checks
    * rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Pipeline.replicateEvents(spark, dir)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map { case (name, e) => name -> e.fn }

  def oracleSql: Map[String, String] =
    allEntries.collect { case (name, Q.Entry(_, Some(sql))) => name -> sql }

  /** Spark-naive oracle references ([[graft.queries.NaiveOracles]]) for
    * queries whose semantics DuckDB cannot express: Verify dumps each as
    * a parquet artifact and registers a `read_parquet` oracle SQL for
    * it, so the driver's checker still runs the full rows+schema+hash
    * compare instead of a rows-only count. */
  def naiveOracle: Map[String, (SparkSession, String) => DataFrame] =
    NaiveOracles.all

  private def allEntries: Map[String, Q.Entry] =
    StandardQueries.all ++ ProducerQueries.all ++ ConsumerQueries.all ++
      ExtQueries.all
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-surface plumbing shared by the per-category query files.
  *
  * Each declared query is a (Spark implementation, optional DuckDB oracle)
  * pair; the driver runs the Spark side at sf0.01 and hash-compares against
  * the oracle (see /root/repo/SURVEY.md §5 and Verify.scala). Oracle-parity
  * conventions used throughout:
  *
  *  - timestamps are compared/ordered as epoch microseconds
  *    (`unix_micros` ↔ DuckDB `epoch_us`), because the source `events.ts`
  *    is nanosecond parquet that Spark truncates to µs on read;
  *  - money aggregations run in DECIMAL(18,2) (exact in both engines) and
  *    cast the final value to DOUBLE, so float summation order can never
  *    flip a bit;
  *  - every result carries a deterministic total order with a unique
  *    tiebreak column.
  */
object Q {
  type Fn = (SparkSession, String) => DataFrame

  final case class Entry(fn: Fn, oracle: Option[String])

  def entry(fn: Fn, oracle: String): Entry = Entry(fn, Some(oracle))
  def rowsOnly(fn: Fn): Entry = Entry(fn, None)

  /** Read a test table. `events.ts` is nanosecond parquet, which Spark 4
    * cannot read as a timestamp — read it as a long (legacy conf) and
    * truncate ns → µs with exact integer division (`div`, not fp), which
    * matches DuckDB's `epoch_us` truncation of the same values. */
  def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}

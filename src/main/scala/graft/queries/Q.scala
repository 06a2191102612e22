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

  /** Read a test table, normalizing `events.ts` to a session-TZ
    * TIMESTAMP whatever generation of testdata is on disk (the column's
    * physical type has changed across driver regenerations). */
  def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Widen a byte-small input for a CPU-bound map stage — see
    * [[graft.ext.Par.widen]] for the full rationale (AQE's byte-based
    * coalescing serializes row-heavy work over small files onto one
    * task; the guard makes this a no-op at real scale). */
  def wide(df: DataFrame): DataFrame = graft.ext.Par.widen(df)

  /** `events.ts` has shipped as ns-int64 parquet (read as a long under the
    * nanosAsLong conf) in earlier testdata generations and as a native µs
    * timestamp (TIMESTAMP_NTZ on read) in later ones. Normalize both to
    * the µs-precision session-TZ TIMESTAMP the queries consume:
    *  - long ns → exact integer `div 1000` truncation (matches DuckDB's
    *    `epoch_us` truncation of the same values — never fp division);
    *  - NTZ → a bare cast, value-stable because every engine session runs
    *    `spark.sql.session.timeZone=UTC`, so `unix_micros` returns the
    *    stored micros exactly as DuckDB's `epoch_us` does. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast(TimestampType))
    }
  }
}

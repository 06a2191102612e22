package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format table IO (SURVEY §2.4: the reference's only sources are
  * ActiveRecord tables (JDBC) and Kafka; file formats come from Spark
  * built-ins). One declarative entry point so registry configs can name a
  * format + path/DSN instead of wiring readers by hand.
  *
  * Format notes for scale: parquet/orc are the only formats with predicate
  * pushdown + column pruning + splittable compression — CSV/JSON exist for
  * ingest boundaries, land them into parquet before heavy querying. JDBC
  * reads parallelize only with explicit partitioning bounds
  * (`partitionColumn`/`numPartitions`), otherwise they're a single task.
  */
object TableIO {

  sealed trait Source { def read(spark: SparkSession): DataFrame }

  final case class Parquet(path: String) extends Source {
    def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
  }

  final case class Csv(path: String, schema: Option[StructType] = None,
      header: Boolean = true) extends Source {
    def read(spark: SparkSession): DataFrame = {
      val r = spark.read.option("header", header.toString)
      schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
    }
  }

  final case class JsonLines(path: String, schema: Option[StructType] = None)
      extends Source {
    def read(spark: SparkSession): DataFrame = {
      val r = spark.read
      schema.fold(r)(r.schema).json(path)
    }
  }

  final case class Orc(path: String) extends Source {
    def read(spark: SparkSession): DataFrame = spark.read.orc(path)
  }

  /** Robust JSONL field extraction with corrupt-record quarantine — the
    * ingest-boundary operator for raw crawl dumps, where some fraction
    * of lines is always truncated or malformed. `from_json` in its
    * default PERMISSIVE mode null-fills the struct on a malformed line;
    * a record is quarantined when the required `idField` is null after
    * parsing (never by re-validating the raw string — the parser IS the
    * contract). Scan-local, zero shuffle: safe to run on the raw text
    * scan of a 100 TB ingest before anything else touches the data.
    *
    * Returns the input plus `parsed` (struct of `schema`) and `ok`;
    * callers route `!ok` rows to a quarantine sink and continue with
    * `parsed.*`. */
  def parseJsonl(df: DataFrame, jsonCol: String, schema: String,
      idField: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_json}
    df.withColumn("parsed", from_json(col(jsonCol), StructType.fromDDL(schema)))
      .withColumn("ok", col(s"parsed.$idField").isNotNull)
  }

  /** CSV sibling of [[parseJsonl]]: schema'd `from_csv` in PERMISSIVE
    * mode — malformed lines surface as `ok = false` with null fields
    * (quarantine-able), never dropped silently or failing the batch.
    * `ok` requires BOTH the id field present AND the parser itself to
    * report the line well-formed, via the `columnNameOfCorruptRecord`
    * channel: PERMISSIVE pads short rows with nulls (which id-presence
    * alone can't see when the id parses but later fields are truncated)
    * but records the raw line in the corrupt column when the token
    * count disagrees with the schema. The PARSER is the judge — a raw
    * comma count would wrongly quarantine well-formed quoted fields
    * containing commas that `from_csv` parses fine. */
  def parseCsv(df: DataFrame, csvCol: String, schema: String,
      idField: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_csv}
    val st = StructType.fromDDL(schema)
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    df.withColumn("parsed", from_csv(col(csvCol), st,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
      .withColumn("ok", col(s"parsed.$idField").isNotNull &&
        col("parsed._corrupt_record").isNull)
      .withColumn("parsed", col("parsed").dropFields("_corrupt_record"))
  }

  /** JDBC source with explicit parallelism bounds — a boundless JDBC read
    * is one task regardless of cluster size. Untestable in this container
    * (no database), exercised through the shared interface contract. */
  final case class Jdbc(url: String, table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None) extends Source {
    def read(spark: SparkSession): DataFrame = {
      val r = spark.read.format("jdbc")
        .option("url", url).option("dbtable", table)
      partitionColumn.fold(r) { case (c, lo, hi, n) =>
        r.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", n)
      }.load()
    }
  }
}

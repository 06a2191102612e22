package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing names restrict the dump (local iteration only;
    // the driver always passes exactly two args = full sweep)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // full sweep OWNS outDir: remove stale artifacts first (a reused
    // outDir would otherwise surface leftover dirs from earlier runs —
    // e.g. a renamed query's old dump — as oracle-less query rows in
    // the driver's checker). Restricted local runs leave siblings be.
    // Deletion is scoped to what a sweep actually writes — query dirs
    // named like our query keys plus oracle_sql.json — so a
    // misconfigured outDir pointing at a shared directory can't lose
    // unrelated data; listFiles() is null-guarded (outDir existing as a
    // regular FILE is a config error, reported, not an NPE).
    if (only.isEmpty) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      val root = new java.io.File(outDir)
      if (root.exists() && !root.isDirectory)
        sys.error(s"outDir $outDir exists and is not a directory")
      // a sweep artifact = a directory holding a Spark parquet dump:
      // committed (_SUCCESS marker) OR crashed-partial (part files /
      // _temporary / empty dir — an OOM-killed sweep's debris would
      // otherwise resurface forever as an oracle-less query row after
      // a rename). Still never touches anything a sweep didn't write.
      def isDump(f: java.io.File): Boolean = f.isDirectory && {
        val entries = Option(f.listFiles()).getOrElse(Array.empty)
        entries.isEmpty ||
          entries.exists(e => e.getName == "_SUCCESS" ||
            e.getName == "_temporary" || e.getName.startsWith("part-") ||
            e.getName.startsWith(".part-"))
      }
      // AND-gate on the sweep's own naming scheme: a live query key, or
      // the key pattern every graft query follows (`c02_keep_latest`,
      // `x149_ann_extend`, …) so a RENAMED query's stale dump still
      // clears — but a dump-shaped directory some other job wrote into
      // a misconfigured shared outDir does not.
      val keyShaped = "^[a-z]{1,6}\\d{1,3}(_[a-z0-9_]+)?$".r
      def sweepNamed(n: String): Boolean =
        SparkEntry.queries.contains(n) || keyShaped.matches(n)
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => (isDump(f) && sweepNamed(f.getName)) ||
          f.getName == "oracle_sql.json")
        .foreach(rm)
    }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // iterative ops persist() loop-invariant tables; drop blocks and
      // cache entries so the sweep's footprint stays per-query bounded
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // Spark-naive oracle artifacts (x02/x03/x13): dump the independent
    // brute-force reference and register a read_parquet oracle for it —
    // the checker then hash-compares the two artifacts exactly like a
    // DuckDB oracle. A failed naive dump degrades that query to its
    // former rows-only state (no SQL entry) rather than guaranteeing a
    // checker failure. The dumps live in a SIBLING directory
    // (`${outDir}_naive`), not outDir itself: the driver enumerates
    // outDir's subdirectories as declared queries, so an in-tree
    // `${name}_naive` artifact would surface as a query with no oracle
    // (an err:"no_oracle" row indistinguishable from breakage).
    val naiveDir = s"${outDir.stripSuffix("/")}_naive"
    val naiveAbs = new java.io.File(naiveDir).getAbsolutePath
    val naiveSql = SparkEntry.naiveOracle
      .filter { case (name, _) => only.isEmpty || only(name) }
      .flatMap { case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$naiveDir/$name")
          Some(name ->
            s"SELECT * FROM read_parquet('$naiveAbs/$name/*.parquet')")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] naive oracle $name failed: ${e.getMessage}")
          None
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = (SparkEntry.oracleSql ++ naiveSql)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

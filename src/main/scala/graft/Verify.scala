package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (dev shortcut)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Output file count: the driver gate expects one tidy file per query
    // (default). Scale-point dumps (600M-row per-row kernels at sf100) set
    // SPARK_GRAFT_VERIFY_PARTS=0 to keep the write parallel — the DuckDB
    // compare globs <name>/*.parquet either way.
    val parts = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PARTS", "1").toInt
    SparkEntry.queries.filter(e => only.forall(_.contains(e._1))).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        (if (parts > 0) df.coalesce(parts) else df).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
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
    // run-scoped fixture substitution: the write-then-introspect oracle rows
    // template their /tmp fixture path with __SFTAG__ so both the Spark
    // lambda (SparkEntry.fixtureTag) and the dumped oracle SQL resolve to
    // the same SF-scoped location — out-of-sequence replays after a run at
    // a different SF no longer read stale shared fixtures
    val tag = SparkEntry.fixtureTag(sfDir)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__SFTAG__", tag))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // provenance: the commit this dump ran on (scale_verify.py copies it
    // into its summary; the driver ignores unknown files in outDir)
    Files.writeString(Paths.get(s"$outDir/run_meta.json"),
      s"""{"commit":"${RunStamp.commit}","sf":${q(sfDir)}}""")
    spark.stop()
    // hard exit: q_http_read's fixture HTTP server (and any other library
    // that spins a non-daemon thread) must not keep the forked JVM — and
    // therefore the driver's gate — alive after the dump is complete
    sys.exit(0)
  }
}

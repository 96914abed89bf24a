package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR and
 * prints one JSON line. Measurement forces full materialization of every
 * output column via `queryExecution.toRdd.count()` — a plain df.count() lets
 * Catalyst prune unevaluated projections, which would time scalar functions
 * as free. Failures are reported (negative sentinel) rather than swallowed
 * into fake timings.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.register(spark)
    // warmup: absorb JVM/codegen/scan-planning startup so the first timed
    // query isn't charged for JIT compilation
    try {
      spark.range(1000).selectExpr("st_astext(st_point(cast(id AS DOUBLE), 1.0d))").queryExecution.toRdd.count()
      SparkEntry.queries.head._2(spark, sfDir).queryExecution.toRdd.count()
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.filter(_ > 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

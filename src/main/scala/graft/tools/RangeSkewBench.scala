package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Pathological-skew harness for the binned range join — the 1-D sibling of
  * [[SkewBench]]. Generates a deterministic dataset where ONE bin holds ~20%
  * of all points (a spike of events at one timestamp / one price band) AND a
  * stack of intervals, runs the bin-join count under each salt setting, and
  * reports the join stage's per-task time histogram — the direct measurement
  * of whether a hot bin serializes onto one task.
  *
  * The reference handles this class single-node with an IEJoin
  * (/root/reference/spatial/src/spatial/core/optimizer_rules.cpp:33-279); a
  * distributed bin join must instead prove spark.graft.rangeJoin.salt=auto
  * actually levels the task histogram. This harness measures it.
  *
  * Usage: tools/run_main.sh graft.tools.RangeSkewBench [nPoints] [nIntervals]
  * Prints one JSON line per configuration plus a `skew_summary` line.
  */
object RangeSkewBench {
  def main(args: Array[String]): Unit = {
    val nPts = if (args.length > 0) args(0).toLong else 20_000_000L
    val nIntv = if (args.length > 1) args(1).toLong else 2000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-rangeskewbench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.register(spark)
    // pin the bin width so every config shares the same bin layout (auto
    // would sample the same medians anyway; pinning removes one variable)
    spark.conf.set("spark.graft.rangeJoin.binWidth", "1.0")
    spark.conf.set("spark.graft.rangeJoin.maxBroadcastBypass", "0")

    // --- deterministic skewed fixture --------------------------------------
    // Points: 20% in the hot unit bin [50,51) (the "spike"), 80% uniform over
    // [0,100). hash() is Murmur3 — deterministic across runs/JVMs.
    spark.range(nPts).selectExpr(
      "id AS pid",
      """CASE WHEN id % 5 = 0
           THEN 50.0d + pmod(hash(id, 1), 100000) / 100000.0d
           ELSE pmod(hash(id, 2), 1000000) / 10000.0d END AS x""")
      .createOrReplaceTempView("rpts")
    // Intervals: 1% stacked on the hot bin, the rest unit-length uniform over
    // the extent (realistic background matches in the non-hot bins).
    spark.range(nIntv).selectExpr(
      "id AS iid",
      """CASE WHEN id % 100 = 0 THEN 50.0d
           ELSE pmod(hash(id, 5), 990000) / 10000.0d END AS lo""")
      .selectExpr("iid", "lo", "lo + 1.0d AS hi")
      .createOrReplaceTempView("rintv")

    // --- per-task metrics ---------------------------------------------------
    val taskMs = TrieMap.empty[Int, Vector[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful)
          taskMs.updateWith(t.stageId) {
            case Some(v) => Some(v :+ t.taskInfo.duration)
            case None => Some(Vector(t.taskInfo.duration))
          }
    })

    def pct(v: Vector[Long], p: Double): Long =
      if (v.isEmpty) 0L else v((p * (v.size - 1)).round.toInt)

    val query =
      "SELECT count(*) AS pairs FROM rpts p JOIN rintv i ON p.x >= i.lo AND p.x < i.hi"

    def run(label: String, salt: String, aqeSkew: Boolean): (Long, String) = {
      spark.conf.set("spark.graft.rangeJoin.salt", salt)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
      // the interval side is small, so by default Catalyst would BROADCAST
      // the rewritten equi-join and no shuffle skew exists; both sides being
      // huge at 100 TB forces the shuffle shape — measure that
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      taskMs.clear()
      val t0 = System.nanoTime()
      val pairs = spark.sql(query).head().getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      val (stage, tasks) = taskMs.maxBy(_._2.sum)
      val v = tasks.sorted
      val line =
        f"""{"config":"$label","salt":"$salt","aqe_skew":$aqeSkew,"pairs":$pairs,""" +
        f""""wall_sec":${wall}%.2f,"join_stage":$stage,"tasks":${v.size},""" +
        f""""task_max_sec":${v.last / 1e3}%.2f,"task_p95_sec":${pct(v, 0.95) / 1e3}%.2f,""" +
        f""""task_p50_sec":${pct(v, 0.50) / 1e3}%.2f,""" +
        f""""task_sum_sec":${v.sum / 1e3}%.2f,"commit":"${graft.RunStamp.commit}"}"""
      println(line)
      (pairs, line)
    }

    // warmup: plan + codegen outside the measured runs
    spark.sql(
      "SELECT count(*) FROM rintv i JOIN (SELECT x FROM rpts LIMIT 100000) w " +
        "ON w.x >= i.lo AND w.x < i.hi").head()

    val results = Seq(
      run("shuffle_no_mitigation", salt = "1", aqeSkew = false),
      run("shuffle_aqe_skew_only", salt = "1", aqeSkew = true),
      run("shuffle_salt8", salt = "8", aqeSkew = false),
      run("shuffle_salt_auto", salt = "auto", aqeSkew = false),
      run("shuffle_salt_auto_aqe", salt = "auto", aqeSkew = true))
    val counts = results.map(_._1).distinct
    require(counts.size == 1, s"configs disagree on pair count: $counts")
    println(s"""{"skew_summary":"ok","pairs":${counts.head},"n_points":$nPts,"n_intervals":$nIntv,"configs":${results.size}}""")
    spark.stop()
    sys.exit(0)
  }
}

package graft.tools

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Noise-immune measurement for driver-loop-shaped queries: counts the Spark
  * jobs, stages, and tasks one full execution of each named query schedules.
  * Wall-clock on a shared host swings 2-10x; these counts are deterministic,
  * so before/after deltas of a job-reduction optimization are exact.
  *
  * Usage: runMain graft.tools.JobCount <sfDir> q_a,q_b,...
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").map(_.trim).toSeq
                else graft.SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.register(spark)
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    // warmup (not counted separately — reset after)
    try SparkEntryWarm.warm(spark, sfDir) catch { case _: Throwable => }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // settle listener queue, then reset
      Thread.sleep(500)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      println(f"[jobcount] $name jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} wall=$sec%.2f")
    }
    spark.stop()
    sys.exit(0)
  }
}

private object SparkEntryWarm {
  def warm(spark: SparkSession, sfDir: String): Unit = {
    spark.range(1000).selectExpr("st_astext(st_point(cast(id AS DOUBLE), 1.0d))")
      .queryExecution.toRdd.count()
    graft.SparkEntry.queries.head._2(spark, sfDir).queryExecution.toRdd.count()
  }
}

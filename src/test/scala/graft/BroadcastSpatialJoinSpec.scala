package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Broadcast R-tree spatial join: small-side joins must take the
  * SpatialBroadcastJoinExec plan (no shuffle of the big side, no
  * BroadcastNestedLoopJoin pair scan) and produce results identical to both
  * the tile rewrite and the naive join. */
class BroadcastSpatialJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private def setup(): Unit = {
    spark.conf.set("spark.graft.spatialJoin.broadcast.enabled", "true")
    spark.conf.set("spark.graft.spatialJoin.cellSize", "10.0")
    spark.sql("""
      SELECT id AS pid, st_point(cast(id % 97 AS DOUBLE), cast((id * 7) % 89 AS DOUBLE)) AS pt
      FROM range(0, 2000)""").createOrReplaceTempView("bpts")
    spark.sql("""
      SELECT id AS cell,
             st_makeenvelope(cast((id % 10) * 10 AS DOUBLE), cast((id DIV 10) * 10 AS DOUBLE),
                             cast((id % 10) * 10 + 10 AS DOUBLE), cast((id DIV 10) * 10 + 10 AS DOUBLE)) AS env
      FROM range(0, 100)""").createOrReplaceTempView("bcells")
  }

  private def collectPairs(sql: String): Set[(Long, Long)] =
    spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("small right side plans as SpatialBroadcastJoinExec and matches the naive join") {
    setup()
    val sql = "SELECT pid, cell FROM bpts JOIN bcells ON st_contains(env, pt)"
    val df = spark.sql(sql)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SpatialBroadcastJoin"), s"broadcast plan not chosen:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val fast = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    spark.conf.set("spark.graft.spatialJoin.enabled", "false")
    val naive = collectPairs(sql)
    spark.conf.set("spark.graft.spatialJoin.enabled", "true")
    assert(fast == naive && fast.nonEmpty,
      s"broadcast join changed results: only-fast=${(fast -- naive).take(5)} only-naive=${(naive -- fast).take(5)}")
  }

  test("small LEFT side builds left (streamed side keeps its partitioning)") {
    setup()
    val sql = "SELECT cell, pid FROM bcells JOIN bpts ON st_contains(env, pt)"
    val df = spark.sql(sql)
    assert(df.queryExecution.executedPlan.toString.contains("SpatialBroadcastJoin"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same pairs as the right-build orientation, columns swapped
    val other = collectPairs("SELECT pid, cell FROM bpts JOIN bcells ON st_contains(env, pt)")
    assert(got == other.map(_.swap) && got.nonEmpty)
  }

  test("extra conjuncts run as exact residual") {
    setup()
    val sql = "SELECT pid, cell FROM bpts JOIN bcells ON st_intersects(pt, env) AND pid % 2 = 0"
    val df = spark.sql(sql)
    assert(df.queryExecution.executedPlan.toString.contains("SpatialBroadcastJoin"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty && got.forall(_._1 % 2 == 0))
    spark.conf.set("spark.graft.spatialJoin.enabled", "false")
    assert(got == collectPairs(sql))
    spark.conf.set("spark.graft.spatialJoin.enabled", "true")
  }

  test("threshold 0 falls back to the tile rewrite") {
    setup()
    spark.conf.set("spark.graft.spatialJoin.broadcastThreshold", "0")
    try {
      val df = spark.sql("SELECT pid, cell FROM bpts JOIN bcells ON st_contains(env, pt)")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SpatialBroadcastJoin"), s"broadcast chosen despite threshold 0:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
      assert(df.count() > 0)
    } finally spark.conf.unset("spark.graft.spatialJoin.broadcastThreshold")
  }

  test("st_dwithin radius join expands the probe envelope and matches the naive join") {
    setup()
    spark.sql("""
      SELECT id AS poi, st_point(cast((id * 13) % 97 AS DOUBLE), cast((id * 29) % 89 AS DOUBLE)) AS cpt
      FROM range(0, 50)""").createOrReplaceTempView("bpois")
    val sql = "SELECT pid, poi FROM bpts JOIN bpois ON st_dwithin(pt, cpt, 3.0)"
    val df = spark.sql(sql)
    assert(df.queryExecution.executedPlan.toString.contains("SpatialBroadcastJoin"),
      s"dwithin not broadcast:\n${df.queryExecution.executedPlan}")
    val fast = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.spatialJoin.enabled", "false")
    val naive = collectPairs(sql)
    spark.conf.set("spark.graft.spatialJoin.enabled", "true")
    assert(fast == naive && fast.nonEmpty,
      s"dwithin mismatch: only-fast=${(fast -- naive).take(5)} only-naive=${(naive -- fast).take(5)}")
  }

  test("matches the tile path result for result") {
    setup()
    val sql = "SELECT pid, cell FROM bpts JOIN bcells ON st_within(pt, env)"
    val broadcast = collectPairs(sql)
    spark.conf.set("spark.graft.spatialJoin.broadcast.enabled", "false")
    val tiled = collectPairs(sql)
    spark.conf.set("spark.graft.spatialJoin.broadcast.enabled", "true")
    assert(broadcast == tiled && broadcast.nonEmpty)
  }
}

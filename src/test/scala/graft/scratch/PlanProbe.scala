package graft.scratch

import graft.{SparkEntry, SparkTestSession}

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q_radius_join", "q_spatial_join")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val op =
        if (plan.contains("SpatialBroadcastJoin")) "SpatialBroadcastJoin"
        else if (plan.contains("__graft_tile")) "tile-equi-join"
        else if (plan.contains("BroadcastNestedLoopJoin")) "BNLJ(!)"
        else "other"
      println(s"PLAN $name -> $op")
    }
  }
}

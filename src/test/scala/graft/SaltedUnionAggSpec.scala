package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.scalatest.funsuite.AnyFunSuite

/** Two-level salted union aggregate (round-4 scale fix: with G distinct
  * groups the final merge otherwise lands on G reducers). */
class SaltedUnionAggSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val sql =
    """SELECT flag, st_area(st_union_agg(st_makeenvelope(x, 0.0d, x + 5.0d, 5.0d))) AS area
      FROM (SELECT cast(id % 3 AS INT) AS flag, cast(id % 40 AS DOUBLE) * 10.0d AS x FROM range(100000))
      GROUP BY flag ORDER BY flag"""

  test("rewrite produces the two-level shape with a salt key") {
    // measure fusion replaces st_area(st_union_agg) with the sweep aggregate
    // (tiny state, no reducer bottleneck — salting is then unnecessary);
    // disable it here to exercise the salted path that geometry-valued
    // st_union_agg outputs still take
    spark.conf.set("spark.graft.measureFusion.enabled", "false")
    val plan =
      try spark.sql(sql).queryExecution.optimizedPlan
      finally spark.conf.set("spark.graft.measureFusion.enabled", "true")
    val aggs = plan.collect { case a: Aggregate => a }
    assert(aggs.size == 2, s"expected 2 Aggregate nodes, got ${aggs.size}:\n$plan")
    val inner = aggs.last
    assert(inner.groupingExpressions.exists(_.toString.contains("__graft_union_salt")),
      s"inner aggregate not salted:\n$plan")
    assert(aggs.head.groupingExpressions.size == 1, "outer must group by the original key only")
  }

  test("salted and unsalted results agree") {
    val salted = spark.sql(sql).collect().map(r => (r.getInt(0), r.getDouble(1)))
    spark.conf.set("spark.graft.unionAgg.salt", "0")
    try {
      val plain = spark.sql(sql).collect().map(r => (r.getInt(0), r.getDouble(1)))
      val plainPlan = spark.sql(sql).queryExecution.optimizedPlan
      assert(plainPlan.collect { case a: Aggregate => a }.size == 1, "salt=0 must disable the rewrite")
      assert(salted.toSeq == plain.toSeq, s"${salted.toSeq} vs ${plain.toSeq}")
      // independent arithmetic: 40 disjoint 5x5 squares per flag
      salted.foreach { case (_, area) => assert(area == 40 * 25.0, s"area $area") }
    } finally spark.conf.unset("spark.graft.unionAgg.salt")
  }

  test("mixed aggregates are left untouched") {
    val q = """SELECT flag, st_area(st_union_agg(st_point(x, x))) AS a, count(*) AS n
               FROM (SELECT cast(id % 3 AS INT) AS flag, cast(id AS DOUBLE) AS x FROM range(1000))
               GROUP BY flag"""
    val plan = spark.sql(q).queryExecution.optimizedPlan
    assert(plan.collect { case a: Aggregate => a }.size == 1, s"must not rewrite mixed aggs:\n$plan")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** st_area(overlay) fusion: plan shape + equality with the unfused path. */
class MeasureFusionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val q = """
    SELECT st_area(st_intersection(st_makeenvelope(cast(id AS DOUBLE), 0.0d, cast(id AS DOUBLE) + 10.0d, 10.0d),
                                   st_makeenvelope(5.0d, 2.0d, 15.0d, 9.0d))) AS ia,
           st_area(st_union(st_makeenvelope(cast(id AS DOUBLE), 0.0d, cast(id AS DOUBLE) + 10.0d, 10.0d),
                            st_makeenvelope(5.0d, 2.0d, 15.0d, 9.0d))) AS ua,
           st_area(st_difference(st_makeenvelope(cast(id AS DOUBLE), 0.0d, cast(id AS DOUBLE) + 10.0d, 10.0d),
                                 st_makeenvelope(5.0d, 2.0d, 15.0d, 9.0d))) AS da
    FROM range(12)"""

  test("rule rewrites area-of-overlay to fused measures in the plan") {
    Graft.register(spark)
    val plan = spark.sql(q).queryExecution.optimizedPlan.toString
    assert(plan.contains("st_intersection_area") && plan.contains("st_union_area") &&
      plan.contains("st_difference_area"), s"fusion did not fire:\n$plan")
    assert(!plan.contains("st_area("), s"unfused st_area survived:\n$plan")
  }

  test("fused results equal the unfused two-step evaluation on these inputs") {
    Graft.register(spark)
    val fusedRows = spark.sql(q).collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    spark.conf.set("spark.graft.measureFusion.enabled", "false")
    try {
      val plain = spark.sql(q).collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      assert(fusedRows.toSeq == plain.toSeq)
    } finally spark.conf.set("spark.graft.measureFusion.enabled", "true")
  }

  test("fusion handles non-rect geometries through the general path") {
    Graft.register(spark)
    val r = spark.sql("""
      SELECT st_area(st_intersection(
               st_geomfromtext('POLYGON ((0 0, 8 0, 0 8, 0 0))'),
               st_geomfromtext('POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))'))) AS a,
             st_area(st_union(
               st_geomfromtext('POLYGON ((0 0, 8 0, 0 8, 0 0))'),
               st_geomfromtext('POLYGON ((4 4, 20 4, 20 20, 4 20, 4 4))'))) AS u
      """).collect()(0)
    assert(r.getDouble(0) == 32.0) // the triangle is inside the square
    // union by inclusion-exclusion: 32 + 256 - intersection(triangle, square2)
    val inter = spark.sql("""
      SELECT st_area(st_intersection(
        st_geomfromtext('POLYGON ((0 0, 8 0, 0 8, 0 0))'),
        st_geomfromtext('POLYGON ((4 4, 20 4, 20 20, 4 20, 4 4))')))""").collect()(0).getDouble(0)
    assert(r.getDouble(1) == 32.0 + 256.0 - inter)
  }
}

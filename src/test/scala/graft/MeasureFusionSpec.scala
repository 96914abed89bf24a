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

  test("aggregate fusion: st_area(st_union_agg) sweeps rects, matches JTS") {
    Graft.register(spark)
    val q = """
      SELECT id % 3 AS grp,
             st_area(st_union_agg(st_makeenvelope(
               CAST((id % 40) * 5 AS DOUBLE), CAST((id % 7) * 3 AS DOUBLE),
               CAST((id % 40) * 5 + 8 AS DOUBLE), CAST((id % 7) * 3 + 6 AS DOUBLE)))) AS a,
             st_area(st_intersection_agg(st_makeenvelope(
               0.0d, 0.0d, CAST(200 + id % 9 AS DOUBLE), CAST(100 + id % 5 AS DOUBLE)))) AS ia
      FROM range(0, 5000) GROUP BY id % 3 ORDER BY grp"""
    val df = spark.sql(q)
    val agg = df.queryExecution.executedPlan.toString
    assert(agg.contains("st_union_area_agg") && agg.contains("st_intersection_area_agg"),
      s"aggregate fusion did not fire:\n${agg.take(2000)}")
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    spark.conf.set("spark.graft.measureFusion.enabled", "false")
    val plain =
      try spark.sql(q).collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      finally spark.conf.set("spark.graft.measureFusion.enabled", "true")
    assert(got.toSeq == plain.toSeq, s"got=${got.toSeq} plain=${plain.toSeq}")
  }

  test("collect fusion: st_ngeometries/st_npoints over st_collect_agg never buffer") {
    Graft.register(spark)
    val q = """
      SELECT id % 3 AS grp,
             st_ngeometries(st_collect_agg(g)) AS n,
             st_npoints(st_collect_agg(g)) AS np
      FROM (SELECT id,
                   CASE WHEN id % 11 = 0 THEN NULL
                        WHEN id % 7 = 0 THEN st_geomfromtext('POINT EMPTY')
                        WHEN id % 2 = 0 THEN st_point(CAST(id AS DOUBLE), 1.0d)
                        ELSE st_makeline(st_point(0.0d, 0.0d), st_point(CAST(id AS DOUBLE), 2.0d))
                   END AS g
            FROM range(0, 3000))
      GROUP BY id % 3 ORDER BY grp"""
    val df = spark.sql(q)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("st_collect_agg"),
      s"collect fusion did not fire — geometry buffering survives:\n${plan.take(2000)}")
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    spark.conf.set("spark.graft.measureFusion.enabled", "false")
    val plain =
      try spark.sql(q).collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      finally spark.conf.set("spark.graft.measureFusion.enabled", "true")
    assert(got.toSeq == plain.toSeq, s"got=${got.toSeq} plain=${plain.toSeq}")
  }

  test("collect fusion skips DISTINCT aggregates (fused Count(DISTINCT 1) would be 1)") {
    Graft.register(spark)
    // 10 rows, 4 distinct points (ids 0..3) repeated — DISTINCT collect must
    // report 4 geometries / 4 points, not Count(DISTINCT <literal 1>) = 1
    val q = """
      SELECT st_ngeometries(st_collect_agg(DISTINCT g)) AS n,
             st_npoints(st_collect_agg(DISTINCT g)) AS np
      FROM (SELECT st_point(CAST(id % 4 AS DOUBLE), 0.0d) AS g FROM range(0, 10))"""
    val df = spark.sql(q)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("st_collect_agg"),
      s"DISTINCT collect was fused away — the rewrite is unsound for DISTINCT:\n${plan.take(2000)}")
    val r = df.collect()(0)
    assert(r.getInt(0) == 4 && r.getInt(1) == 4, s"got ${r}")
  }

  test("rectUnionArea sweep: randomized parity with JTS, fast at dedupCap scale") {
    import graft.functions.GeoAggregates
    import org.locationtech.jts.geom.GeometryFactory
    val rnd = new scala.util.Random(42)
    val f = new GeometryFactory()
    // randomized parity: 500 overlapping rects vs CascadedPolygonUnion area
    val rects = Array.fill(500) {
      val x0 = rnd.nextInt(1000).toDouble; val y0 = rnd.nextInt(1000).toDouble
      Array(x0, y0, x0 + 1 + rnd.nextInt(80), y0 + 1 + rnd.nextInt(80))
    }
    val sweep = GeoAggregates.rectUnionArea(rects.toIndexedSeq)
    val jts = org.locationtech.jts.operation.union.CascadedPolygonUnion.union(
      java.util.Arrays.asList(rects.map { r =>
        f.createPolygon(Array(
          new org.locationtech.jts.geom.Coordinate(r(0), r(1)),
          new org.locationtech.jts.geom.Coordinate(r(2), r(1)),
          new org.locationtech.jts.geom.Coordinate(r(2), r(3)),
          new org.locationtech.jts.geom.Coordinate(r(0), r(3)),
          new org.locationtech.jts.geom.Coordinate(r(0), r(1)))): org.locationtech.jts.geom.Geometry
      }: _*)).getArea
    assert(math.abs(sweep - jts) < 1e-6, s"sweep=$sweep jts=$jts")
    // scale: the full dedupCap (2^16 rects) must finish in seconds, not minutes
    val big = Array.fill(1 << 16) {
      val x0 = rnd.nextDouble() * 1e6; val y0 = rnd.nextDouble() * 1e6
      Array(x0, y0, x0 + rnd.nextDouble() * 500, y0 + rnd.nextDouble() * 500)
    }
    val t0 = System.nanoTime()
    val a = GeoAggregates.rectUnionArea(big.toIndexedSeq)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(a > 0 && sec < 10.0, f"dedupCap sweep took $sec%.1f s")
  }

  test("aggregate fusion degrades to JTS when a non-rect input appears") {
    Graft.register(spark)
    val q = """
      SELECT st_area(st_union_agg(g)) AS a FROM (
        SELECT st_makeenvelope(CAST(id AS DOUBLE), 0.0d, CAST(id + 2 AS DOUBLE), 2.0d) AS g
        FROM range(0, 50)
        UNION ALL
        SELECT st_geomfromtext('POLYGON ((100 0, 108 0, 100 8, 100 0))'))"""
    val got = spark.sql(q).collect()(0).getDouble(0)
    // 50 overlapping rects, step 1 width 2: union [0,51]x[0,2] = 102,
    // plus the disjoint triangle 32
    assert(got == 102.0 + 32.0, got.toString)
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

  test("symdifference fusion: area by inclusion-exclusion, emptiness via st_equals") {
    Graft.register(spark)
    val q = """
      SELECT st_area(st_symdifference(st_makeenvelope(0.0d, 0.0d, x + 4.0d, 6.0d),
                                      st_makeenvelope(x, 1.0d, x + 8.0d, 7.0d))) AS sd,
             st_isempty(st_symdifference(st_makeenvelope(0.0d, 0.0d, x + 4.0d, 6.0d),
                                         st_makeenvelope(0.0d, 0.0d, x + 4.0d, 6.0d))) AS same,
             st_isempty(st_symdifference(st_makeenvelope(0.0d, 0.0d, x + 4.0d, 6.0d),
                                         st_makeenvelope(x, 1.0d, x + 8.0d, 7.0d))) AS diff
      FROM (SELECT cast(id AS DOUBLE) AS x FROM range(0, 6))"""
    val plan = spark.sql(q).queryExecution.optimizedPlan.toString
    assert(plan.contains("st_symdifference_area"), s"area fusion did not fire:\n$plan")
    assert(plan.contains("st_equals"), s"emptiness fusion did not fire:\n$plan")
    val fused = spark.sql(q).collect().map(r => (r.getDouble(0), r.getBoolean(1), r.getBoolean(2)))
    spark.conf.set("spark.graft.measureFusion.enabled", "false")
    try {
      val plain = spark.sql(q).collect().map(r => (r.getDouble(0), r.getBoolean(1), r.getBoolean(2)))
      assert(fused.toSeq == plain.toSeq)
    } finally spark.conf.set("spark.graft.measureFusion.enabled", "true")
    assert(fused.forall { case (_, same, diff) => same && !diff })
    // empty Δ empty IS empty — the rewrite's extra disjunct
    val ee = spark.sql("""
      SELECT st_isempty(st_symdifference(g, g))
      FROM (SELECT st_geomfromtext(concat('POLYGON EMPT', 'Y')) AS g FROM range(1))""")
      .collect()(0).getBoolean(0)
    assert(ee)
    // non-rect inputs fall through to the general JTS path, still equal
    val tri = spark.sql("""
      SELECT st_area(st_symdifference(st_geomfromtext('POLYGON ((0 0, 8 0, 0 8, 0 0))'),
                                      st_geomfromtext('POLYGON ((4 4, 20 4, 20 20, 4 20, 4 4))'))) AS f
      FROM range(1)""").collect()(0).getDouble(0)
    spark.conf.set("spark.graft.measureFusion.enabled", "false")
    try {
      val u = spark.sql("""
        SELECT st_area(st_symdifference(st_geomfromtext('POLYGON ((0 0, 8 0, 0 8, 0 0))'),
                                        st_geomfromtext('POLYGON ((4 4, 20 4, 20 20, 4 20, 4 4))'))) AS u
        FROM range(1)""").collect()(0).getDouble(0)
      assert(math.abs(tri - u) < 1e-9)
    } finally spark.conf.set("spark.graft.measureFusion.enabled", "true")
  }
}

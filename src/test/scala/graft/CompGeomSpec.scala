package graft

import org.scalatest.funsuite.AnyFunSuite

class CompGeomSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def sql1(q: String): Any = spark.sql(s"SELECT $q").collect()(0).get(0)

  test("segmentize splits long segments and interpolates Z") {
    assert(sql1("st_astext(st_segmentize(st_geomfromtext('LINESTRING (0 0, 8 0)'), 2))")
      == "LINESTRING (0 0, 2 0, 4 0, 6 0, 8 0)")
    // ceil(5/2)=3 parts on a 3-4-5 hypotenuse; Z rides the same interpolation
    assert(sql1("st_astext(st_segmentize(st_geomfromtext('LINESTRING Z (0 0 0, 3 4 12)'), 2))")
      == "LINESTRING Z (0 0 0, 1 1.3333333333333333 4, 2 2.6666666666666665 8, 3 4 12)")
    // segments at or under the threshold are untouched
    assert(sql1("st_astext(st_segmentize(st_geomfromtext('LINESTRING (0 0, 1 0, 2 0)'), 2))")
      == "LINESTRING (0 0, 1 0, 2 0)")
    // polygons densify per ring
    assert(sql1("st_npoints(st_segmentize(st_makeenvelope(0, 0, 4, 4), 2))") == 9)
  }

  test("oriented envelope of a rotated rectangle recovers its area") {
    // 45-degree 10x2 rectangle: axis-aligned envelope would be ~12x12
    val area = sql1(
      """round(st_area(st_orientedenvelope(st_geomfromtext(
        |'POLYGON ((0 0, 5 5, 4 6, -1 1, 0 0))'))), 6)""".stripMargin).asInstanceOf[Double]
    assert(math.abs(area - 10.0) < 1e-6, s"got $area")
    assert(sql1("st_geometrytype(st_minimumrotatedrectangle(st_geomfromtext('MULTIPOINT (0 0, 4 0, 4 3)')))")
      == "POLYGON")
  }

  test("minimum bounding circle covers the input") {
    assert(sql1(
      """st_covers(st_minimumboundingcircle(st_geomfromtext('MULTIPOINT (0 0, 8 0, 4 3)')),
        |          st_geomfromtext('MULTIPOINT (0 0, 8 0, 4 3)'))""".stripMargin) == true)
    val r = sql1("st_minimumboundingradius(st_geomfromtext('LINESTRING (0 0, 6 8)')).radius")
    assert(math.abs(r.asInstanceOf[Double] - 5.0) < 1e-9)
  }

  test("snap moves vertices onto the reference within tolerance") {
    assert(sql1(
      """st_astext(st_snap(st_geomfromtext('LINESTRING (0.1 0, 9.9 0)'),
        |                  st_geomfromtext('MULTIPOINT (0 0, 10 0)'), 0.5))""".stripMargin)
      == "LINESTRING (0 0, 10 0)")
    // beyond tolerance: unchanged
    assert(sql1(
      """st_astext(st_snap(st_geomfromtext('LINESTRING (0.1 0, 9.9 0)'),
        |                  st_geomfromtext('MULTIPOINT (0 0, 10 0)'), 0.01))""".stripMargin)
      == "LINESTRING (0.1 0, 9.9 0)")
  }

  test("voronoi cells partition around sites, delaunay triangulates") {
    assert(sql1("st_ngeometries(st_voronoipolygons(st_geomfromtext('MULTIPOINT (0 0, 10 0, 5 8)')))") == 3)
    // each site's cell contains its site
    assert(sql1(
      """st_intersects(st_geometryn(st_voronoipolygons(st_geomfromtext('MULTIPOINT (0 0, 10 0)')), 1),
        |              st_point(0, 0))""".stripMargin) == true)
    assert(sql1("st_ngeometries(st_delaunaytriangles(st_geomfromtext('MULTIPOINT (0 0, 4 0, 0 4, 4 5)')))") == 2)
  }

  test("relate produces DE-9IM matrices and relatematch honors wildcards") {
    assert(sql1("st_relate(st_makeenvelope(0, 0, 2, 2), st_makeenvelope(0, 0, 2, 2))") == "2FFF1FFF2")
    assert(sql1("st_relate(st_makeenvelope(0, 0, 4, 4), st_makeenvelope(5, 5, 6, 6))") == "FF2FF1212")
    assert(sql1("st_relatematch('2FFF1FFF2', 'T*F**FFF*')") == true) // equals mask
    assert(sql1("st_relatematch('FF2FF1212', 'T********')") == false) // disjoint vs interior-int
    assert(sql1("st_relatematch('212101212', '2********')") == true) // dim-specific cell
  }

  test("polygon orientation forcing and predicates, multipolygon recursion") {
    // makeenvelope emits a CW shell
    assert(sql1("st_ispolygoncw(st_makeenvelope(0, 0, 2, 2))") == true)
    assert(sql1("st_astext(st_forcepolygonccw(st_makeenvelope(0, 0, 2, 3)))")
      == "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))")
    // idempotent
    assert(sql1("st_astext(st_forcepolygoncw(st_forcepolygoncw(st_makeenvelope(0, 0, 2, 3))))")
      == sql1("st_astext(st_forcepolygoncw(st_makeenvelope(0, 0, 2, 3)))"))
    // non-polygonal input unchanged; vacuous predicates true
    assert(sql1("st_astext(st_forcepolygoncw(st_geomfromtext('LINESTRING (0 0, 1 1)')))")
      == "LINESTRING (0 0, 1 1)")
    assert(sql1("st_ispolygonccw(st_point(1, 1))") == true)
    // multipolygon members all normalized
    assert(sql1(
      """st_ispolygoncw(st_forcepolygoncw(st_geomfromtext(
        |'MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 5 6, 6 6, 6 5, 5 5)))')))""".stripMargin) == true)
  }

  test("st_angle at a vertex: quadrants and degeneracy") {
    val a = sql1("st_angle(st_point(1, 0), st_point(0, 0), st_point(0, 1))").asInstanceOf[Double]
    assert(math.abs(a - math.Pi / 2) < 1e-12) // from +x ray clockwise to +y ray
    val b = sql1("st_angle(st_point(1, 0), st_point(0, 0), st_point(0, -1))").asInstanceOf[Double]
    assert(math.abs(b - 3 * math.Pi / 2) < 1e-12)
    assert(sql1("st_angle(st_point(1, 0), st_point(0, 0), st_point(0, 0))") == null)
  }

  test("st_subdivide: every piece bounded, lossless recombination, small inputs pass through") {
    // a small rect (5 vertices ≤ maxVertices) passes through untouched
    assert(sql1("st_astext(st_normalize(st_subdivide(st_makeenvelope(0, 0, 2, 3), 12)))")
      == sql1("st_astext(st_normalize(st_multi(st_makeenvelope(0, 0, 2, 3))))"))
    // densified 8x8 rect: 33 boundary vertices forces recursion
    val parts = sql1("st_ngeometries(st_subdivide(st_segmentize(st_makeenvelope(0, 0, 8, 8), 1.0), 12))")
      .asInstanceOf[Int]
    assert(parts > 1, s"expected subdivision, got $parts piece(s)")
    // lossless: area sum exact, extent recombines, every piece within bound
    assert(sql1("st_area(st_subdivide(st_segmentize(st_makeenvelope(0, 0, 8, 8), 1.0), 12))") == 64.0)
    val maxNp = SparkTestSession.spark.sql("""
      SELECT max(st_npoints(d.geom))
      FROM (SELECT explode(st_dump(
              st_subdivide(st_segmentize(st_makeenvelope(0.0d, 0.0d, 8.0d, 8.0d), 1.0d), 12))) AS d)""")
      .collect()(0).getInt(0)
    assert(maxNp <= 12, s"a piece exceeds max_vertices: $maxNp")
    // lines subdivide too; points pass through; bad bound rejected
    assert(sql1("st_ngeometries(st_subdivide(st_segmentize(st_geomfromtext('LINESTRING (0 0, 16 0)'), 1.0), 6))")
      .asInstanceOf[Int] > 1)
    assert(sql1("st_astext(st_subdivide(st_point(1, 2), 12))") == "MULTIPOINT (1 2)")
    intercept[Exception](sql1("st_subdivide(st_point(1, 2), 4)"))
  }

  test("st_relate pair memo: a cache hit allocates nothing per row") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val eval = graft.functions.FnRegistry("st_relate").make(Seq(
      Literal(null, BinaryType), Literal(null, BinaryType)))
    val x = graft.geom.Wkb.write(graft.geom.Geo.fromWkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    val y = graft.geom.Wkb.write(graft.geom.Geo.fromWkt("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"))
    val args = Array[Any](x, y)
    assert(String.valueOf(eval(args)) == "212101212") // miss → compute + store
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
    assume(tmx.isInstanceOf[com.sun.management.ThreadMXBean])
    val tm = tmx.asInstanceOf[com.sun.management.ThreadMXBean]
    assume(tm.isThreadAllocatedMemorySupported && tm.isThreadAllocatedMemoryEnabled)
    val tid = Thread.currentThread().getId
    (1 to 20000).foreach(_ => eval(args)) // warm JIT before measuring
    // JIT recompilation on a loaded JVM (full-suite runs) can bill compile-
    // thread-adjacent allocations here; take the BEST of a few measurements
    // — a zero-allocation hit path must produce at least one clean window
    val perHit = (1 to 3).map { _ =>
      val before = tm.getThreadAllocatedBytes(tid)
      var i = 0
      while (i < 100000) { eval(args); i += 1 }
      (tm.getThreadAllocatedBytes(tid) - before).toDouble / 100000
    }.min
    // the old `x ++ y` key concat allocated ~|x|+|y| (≈200B) per HIT; the
    // thread-local probe key allocates zero — leave headroom for JIT noise
    assert(perHit < 64.0, f"per-hit allocation $perHit%.1f bytes — memo key allocates on hit")
  }

  test("st_subdivide drops lower-dimension clip artifacts (PostGIS parity)") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory, LineString, Point}
    val f = new GeometryFactory()
    // 7-vertex line whose envelope is [0,10]x[0,3]: first split falls at
    // x=5, where the line TOUCHES without crossing at (5,0) and also
    // genuinely crosses on the (2,3)->(10,2) segment. A closed-rect clip
    // emits POINT (5 0) into the right half (and keeps it in the left) —
    // PostGIS emits each piece once and never a point from a lineal input.
    val line = f.createLineString(Array(
      new Coordinate(0, 0), new Coordinate(5, 0), new Coordinate(0, 1),
      new Coordinate(0, 2), new Coordinate(2, 3), new Coordinate(10, 2),
      new Coordinate(9, 0)))
    val out = graft.functions.CompGeomFns.subdivide(line, 5)
    val comps = (0 until out.getNumGeometries).map(out.getGeometryN)
    assert(comps.nonEmpty && comps.forall(_.isInstanceOf[LineString]),
      s"non-lineal piece in ${out.toText.take(300)}")
    assert(!comps.exists(_.isInstanceOf[Point]))
    // total length is preserved (no duplicated or dropped lineal pieces)
    assert(math.abs(comps.map(_.getLength).sum - line.getLength) < 1e-9)
  }

  test("maximum inscribed / largest empty circle") {
    // 10x4 rect: MIC radius 2; center on the medial axis (y = 2)
    val r = sql1("st_maximuminscribedcircle(st_makeenvelope(0, 0, 10, 4), 0.000001d).radius")
      .asInstanceOf[Double]
    assert(math.abs(r - 2.0) < 1e-4, s"radius $r")
    val cy = sql1("st_y(st_maximuminscribedcircle(st_makeenvelope(0, 0, 10, 4), 0.000001d).center)")
      .asInstanceOf[Double]
    assert(math.abs(cy - 2.0) < 1e-4, s"center y $cy")
    // 4 corner obstacles of a 10x10 square: LEC centers in the middle,
    // radius = half diagonal = 5*sqrt(2)
    val ler = sql1(
      "st_largestemptycircle(st_geomfromtext('MULTIPOINT (0 0, 10 0, 10 10, 0 10)'), 0.000001d).radius")
      .asInstanceOf[Double]
    assert(math.abs(ler - 5 * math.sqrt(2)) < 1e-4, s"LEC radius $ler")
  }

  test("st_node: crossings become endpoints") {
    // an X of two crossing diagonals nodes into 4 segments meeting at (1 1)
    val n = sql1(
      """st_ngeometries(st_node(st_geomfromtext(
        |'MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))')))""".stripMargin).asInstanceOf[Int]
    assert(n == 4, s"expected 4 noded segments, got $n")
    // total length preserved through noding
    val len = sql1(
      """st_length(st_node(st_geomfromtext(
        |'MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))')))""".stripMargin).asInstanceOf[Double]
    assert(math.abs(len - 4 * math.sqrt(2)) < 1e-12)
    // already-noded input unchanged in structure
    assert(sql1("st_ngeometries(st_node(st_geomfromtext('LINESTRING (0 0, 1 0)')))") == 1)
  }

  test("voronoi lines: cell boundaries as linework") {
    assert(sql1("st_geometrytype(st_voronoilines(st_geomfromtext('MULTIPOINT (0 0, 10 0, 5 10)')))")
      == "MULTILINESTRING")
    // the two-site diagram's boundary contains the perpendicular bisector:
    // sites (0 0) and (10 0) → a vertical line at x = 5 crosses it
    val crosses = sql1(
      """st_intersects(st_voronoilines(st_geomfromtext('MULTIPOINT (0 0, 10 0)')),
        |st_geomfromtext('LINESTRING (5 -1, 5 1)'))""".stripMargin)
    assert(crosses == true)
  }

  test("concave hull tightens below the convex hull") {
    // C-shaped point set: generous maxLen gives the convex hull; a tight one excludes the bay
    val convex = sql1(
      "st_area(st_concavehull(st_geomfromtext('MULTIPOINT (0 0, 4 0, 4 4, 0 4, 2 2)'), 100))")
      .asInstanceOf[Double]
    assert(convex == 16.0)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

class TopoFnsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def sql1(q: String): Any = spark.sql(s"SELECT $q").collect()(0).get(0)
  private def d(q: String): Double = sql1(q).asInstanceOf[Double]

  test("polygonize forms faces from fully noded linework") {
    // square boundary + a vertical divider: two 2x4 faces
    val g = "st_geomfromtext('MULTILINESTRING ((0 0, 4 0), (0 4, 4 4), (0 0, 0 4), (4 0, 4 4), (2 0, 2 4))')"
    assert(sql1(s"st_ngeometries(st_polygonize($g))") == 2)
    assert(math.abs(d(s"st_area(st_polygonize($g))") - 16.0) < 1e-9)
    // dangling edges form no face
    assert(sql1("st_ngeometries(st_polygonize(st_geomfromtext('LINESTRING (0 0, 1 1)')))") == 0)
  }

  test("buildarea nests odd-depth faces as holes") {
    val rings = "st_geomfromtext('MULTILINESTRING ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2))')"
    assert(math.abs(d(s"st_area(st_buildarea($rings))") - (100.0 - 36.0)) < 1e-9)
    assert(sql1(s"st_numinteriorrings(st_buildarea($rings))") == 1)
    // ring inside the hole becomes solid again (depth 2)
    val rings3 = "st_geomfromtext('MULTILINESTRING ((0 0, 10 0, 10 10, 0 10, 0 0), " +
      "(2 2, 8 2, 8 8, 2 8, 2 2), (4 4, 6 4, 6 6, 4 6, 4 4))')"
    assert(math.abs(d(s"st_area(st_buildarea($rings3))") - (100.0 - 36.0 + 4.0)) < 1e-9)
  }

  test("unaryunion dissolves overlapping members") {
    val two = "st_collect(array(st_makeenvelope(0, 0, 4, 4), st_makeenvelope(3, 0, 6, 2)))"
    // 16 + 6 - overlap 1x2=2
    assert(math.abs(d(s"st_area(st_unaryunion($two))") - 20.0) < 1e-9)
    assert(sql1(s"st_ngeometries(st_unaryunion($two))") == 1)
  }

  test("split: line by point, line by line, polygon by line") {
    assert(sql1(
      "st_astext(st_split(st_geomfromtext('LINESTRING (0 0, 10 0)'), st_point(4.0d, 0.0d)))")
      == "GEOMETRYCOLLECTION (LINESTRING (0 0, 4 0), LINESTRING (4 0, 10 0))")
    // blade off the line: input back as the single piece
    assert(sql1(
      "st_ngeometries(st_split(st_geomfromtext('LINESTRING (0 0, 10 0)'), st_point(4.0d, 1.0d)))") == 1)
    assert(sql1(
      """st_astext(st_split(st_geomfromtext('LINESTRING (0 0, 10 0)'),
        |                   st_geomfromtext('LINESTRING (5 -1, 5 1)')))""".stripMargin)
      == "GEOMETRYCOLLECTION (LINESTRING (0 0, 5 0), LINESTRING (5 0, 10 0))")
    val sp = "st_split(st_makeenvelope(0, 0, 10, 4), st_geomfromtext('LINESTRING (3 -1, 3 5)'))"
    assert(sql1(s"st_ngeometries($sp)") == 2)
    assert(math.abs(d(s"st_area($sp)") - 40.0) < 1e-9)
    assert(math.abs(d(s"least(st_area(st_geometryn($sp, 1)), st_area(st_geometryn($sp, 2)))") - 12.0) < 1e-9)
  }

  test("sharedpaths separates same- and opposite-direction overlap") {
    // g2 runs the same way over [4,10], g3 runs backwards
    val g1 = "st_geomfromtext('LINESTRING (0 0, 10 0)')"
    val g2 = "st_geomfromtext('LINESTRING (4 0, 14 0)')"
    val g3 = "st_geomfromtext('LINESTRING (14 0, 4 0)')"
    assert(math.abs(d(s"st_length(st_geometryn(st_sharedpaths($g1, $g2), 1))") - 6.0) < 1e-9)
    assert(math.abs(d(s"st_length(st_geometryn(st_sharedpaths($g1, $g2), 2))") - 0.0) < 1e-9)
    assert(math.abs(d(s"st_length(st_geometryn(st_sharedpaths($g1, $g3), 1))") - 0.0) < 1e-9)
    assert(math.abs(d(s"st_length(st_geometryn(st_sharedpaths($g1, $g3), 2))") - 6.0) < 1e-9)
    // pieces are oriented along g1 regardless of bucket
    assert(sql1(s"st_astext(st_geometryn(st_sharedpaths($g1, $g3), 2))")
      == "MULTILINESTRING ((4 0, 10 0))")
  }

  test("split: collinear (linear-overlap) blade is an error, PostGIS-style") {
    // difference() would silently delete the shared [4,6] stretch; PostGIS
    // raises for a splitter with a linear intersection — so do we
    val e = intercept[Exception](sql1(
      """st_astext(st_split(st_geomfromtext('LINESTRING (0 0, 10 0)'),
        |                   st_geomfromtext('LINESTRING (4 0, 6 0)')))""".stripMargin))
    assert(e.getMessage.contains("linear intersection"), e.getMessage)
  }

  test("sharedpaths classifies per segment when an input doubles back") {
    // g2 runs forward over [2,8], detours off-axis, then doubles back over
    // [8.1,5]: the shared path is [2,8.1]. First-location tangents make
    // [2,8] same-direction (first pass) and (8,8.1] opposite-only — a single
    // first-segment probe would have bucketed the whole merged piece as same
    val g1 = "st_geomfromtext('LINESTRING (0 0, 10 0)')"
    val g2 = "st_geomfromtext('LINESTRING (2 0, 8 0, 8 1, 8.1 1, 8.1 0, 5 0)')"
    val same = d(s"st_length(st_geometryn(st_sharedpaths($g1, $g2), 1))")
    val opp = d(s"st_length(st_geometryn(st_sharedpaths($g1, $g2), 2))")
    assert(math.abs(same - 6.0) < 1e-9 && math.abs(opp - 0.1) < 1e-9,
      s"same=$same opp=$opp")
  }

  test("offsetcurve of a straight segment is the exact parallel") {
    assert(sql1("st_astext(st_offsetcurve(st_geomfromtext('LINESTRING (0 0, 8 0)'), 2.0d))")
      == "LINESTRING (0 2, 8 2)")
    // negative = right side
    assert(sql1("st_astext(st_offsetcurve(st_geomfromtext('LINESTRING (0 0, 8 0)'), -2.0d))")
      == "LINESTRING (0 -2, 8 -2)")
  }

  test("triangulatepolygon covers the polygon with triangles") {
    val t = "st_triangulatepolygon(st_makeenvelope(0, 0, 6, 4))"
    assert(sql1(s"st_ngeometries($t)") == 2)
    assert(math.abs(d(s"st_area($t)") - 24.0) < 1e-9)
    // with a hole: area preserved, more triangles
    val hole = "st_triangulatepolygon(st_difference(st_makeenvelope(0, 0, 10, 10), st_makeenvelope(4, 4, 6, 6)))"
    assert(math.abs(d(s"st_area($hole)") - 96.0) < 1e-9)
  }

  test("minimum clearance of a rectangle is its short side") {
    assert(math.abs(d("st_minimumclearance(st_makeenvelope(0, 0, 7, 3))") - 3.0) < 1e-9)
    assert(math.abs(d("st_length(st_minimumclearanceline(st_makeenvelope(0, 0, 7, 3)))") - 3.0) < 1e-9)
  }

  test("hausdorff and frechet distances on parallel segments") {
    val a = "st_geomfromtext('LINESTRING (0 0, 10 0)')"
    val b = "st_geomfromtext('LINESTRING (0 3, 10 3)')"
    assert(math.abs(d(s"st_hausdorffdistance($a, $b)") - 3.0) < 1e-9)
    assert(math.abs(d(s"st_frechetdistance($a, $b)") - 3.0) < 1e-9)
    // reversed b forces the Fréchet leash across the diagonal
    val br = "st_geomfromtext('LINESTRING (10 3, 0 3)')"
    assert(math.abs(d(s"st_frechetdistance($a, $br)") - math.hypot(10, 3)) < 1e-9)
    // densified hausdorff tightens the vertex-sampling bound: offset segment
    // pair where the true distance needs an interior sample
    val p = "st_geomfromtext('LINESTRING (0 0, 10 0, 10 10)')"
    val q = "st_geomfromtext('LINESTRING (0 1, 10 1, 10 10)')"
    assert(d(s"st_hausdorffdistance($p, $q, 0.1d)") <= d(s"st_hausdorffdistance($p, $q)") + 1e-9)
  }

  test("geometric median of rectangle corners is the center") {
    val g = "st_geomfromtext('MULTIPOINT (0 0, 8 0, 8 6, 0 6)')"
    assert(math.abs(d(s"st_x(st_geometricmedian($g))") - 4.0) < 1e-6)
    assert(math.abs(d(s"st_y(st_geometricmedian($g))") - 3.0) < 1e-6)
    // 3 collinear points: median is the middle point (Weiszfeld fixed point)
    val c = "st_geomfromtext('MULTIPOINT (0 0, 1 0, 10 0)')"
    assert(math.abs(d(s"st_x(st_geometricmedian($c))") - 1.0) < 1e-4)
  }

  test("bounding diagonal and repeated interpolation") {
    assert(sql1("st_astext(st_boundingdiagonal(st_makeenvelope(1, 2, 5, 9)))")
      == "LINESTRING (1 2, 5 9)")
    assert(sql1(
      "st_astext(st_lineinterpolatepoints(st_geomfromtext('LINESTRING (0 0, 8 0)'), 0.25d, true))")
      == "MULTIPOINT (2 0, 4 0, 6 0, 8 0)")
    assert(sql1(
      "st_astext(st_lineinterpolatepoints(st_geomfromtext('LINESTRING (0 0, 8 0)'), 0.25d, false))")
      == "POINT (2 0)")
  }

  test("clusterintersecting and clusterwithin over a collection") {
    // A touches B; C is 3 away from them
    val g = "st_collect(array(st_makeenvelope(0, 0, 2, 2), st_makeenvelope(2, 0, 4, 2), st_makeenvelope(7, 0, 9, 2)))"
    assert(sql1(s"st_ngeometries(st_clusterintersecting($g))") == 2)
    assert(sql1(s"st_ngeometries(st_geometryn(st_clusterintersecting($g), 1))") == 2)
    // within 3: everything chains into one cluster
    assert(sql1(s"st_ngeometries(st_clusterwithin($g, 3.0d))") == 1)
    // within 2.9: still two
    assert(sql1(s"st_ngeometries(st_clusterwithin($g, 2.9d))") == 2)
  }

  test("clusterdbscan: member-order ids, border attachment, noise as null") {
    def ids(pts: String, eps: Double, minPts: Int): Seq[Any] =
      spark.sql(s"SELECT st_clusterdbscan(st_geomfromtext('MULTIPOINT ($pts)'), ${eps}d, $minPts)")
        .collect()(0).getSeq[Any](0)
    // two dense groups and one isolated point
    assert(ids("0 0, 1 0, 2 0, 10 0, 11 0, 30 0", 1.5, 2) == Seq(0, 0, 0, 1, 1, null))
    // minpts=4: the trio is all border-reachable? no — nobody has 4 within
    // eps, so everything is noise
    assert(ids("0 0, 1 0, 2 0, 10 0, 11 0, 30 0", 1.5, 4) == Seq(null, null, null, null, null, null))
    // minpts=3: center of the trio is core (self + 2), edges are border and
    // attach to it; the pair has only 2 within eps -> noise
    assert(ids("0 0, 1 0, 2 0, 10 0, 11 0, 30 0", 1.5, 3) == Seq(0, 0, 0, null, null, null))
    // chain-linked cores merge into one cluster
    assert(ids("0 0, 1 0, 2 0, 3 0, 4 0", 1.0, 2) == Seq(0, 0, 0, 0, 0))
    // ids number clusters by first appearance in member order
    assert(ids("10 0, 11 0, 0 0, 1 0", 1.5, 2) == Seq(0, 0, 1, 1))
    // minpts=1: every member is its own core; singletons get their own ids
    assert(ids("0 0, 5 0", 1.0, 1) == Seq(0, 1))
    intercept[Exception](sql1("st_clusterdbscan(st_point(0.0d, 0.0d), -1.0d, 2)"))
    intercept[Exception](sql1("st_clusterdbscan(st_point(0.0d, 0.0d), 1.0d, 0)"))
  }

  test("clusterkmeans: blob partition, first-appearance ids, k edge cases") {
    def ids(pts: String, k: Int): Seq[Any] =
      spark.sql(s"SELECT st_clusterkmeans(st_geomfromtext('MULTIPOINT ($pts)'), $k)")
        .collect()(0).getSeq[Any](0)
    // three well-separated blobs resolve exactly
    assert(ids("0 0, 1 0, 2 0, 100 0, 101 0, 200 0", 3) == Seq(0, 0, 0, 1, 1, 2))
    // ids number by first appearance even when blobs arrive interleaved
    assert(ids("100 0, 0 0, 101 0, 1 0", 2) == Seq(0, 1, 0, 1))
    // k = 1: everything in one cluster
    assert(ids("0 0, 5 0, 100 3", 1) == Seq(0, 0, 0))
    // k >= members: every member its own cluster
    assert(ids("0 0, 50 0", 5) == Seq(0, 1))
    // empty members carry no location -> null, others still cluster
    // (st_collect drops empties, so build the collection from WKT)
    assert(spark.sql(
      "SELECT st_clusterkmeans(st_geomfromtext('GEOMETRYCOLLECTION (POINT (0 0), POINT EMPTY, POINT (100 0))'), 2)")
      .collect()(0).getSeq[Any](0) == Seq(0, null, 1))
    // non-point members cluster by centroid
    assert(spark.sql(
      "SELECT st_clusterkmeans(st_collect(array(st_makeenvelope(0.0d,0.0d,2.0d,2.0d), st_makeenvelope(100.0d,0.0d,102.0d,2.0d))), 2)")
      .collect()(0).getSeq[Any](0) == Seq(0, 1))
    intercept[Exception](sql1("st_clusterkmeans(st_point(0.0d, 0.0d), 0)"))
    // duplicate locations with k = distinct-location count: seeding must not
    // re-pick an already-chosen seed (all remaining min-distances are 0), so
    // the three distinct sites still get three distinct cluster ids
    assert(ids("0 0, 0 0, 50 0, 50 0, 100 0, 100 0", 3) == Seq(0, 0, 1, 1, 2, 2))
    assert(ids("0 0, 0 0, 0 0, 9 0", 2) == Seq(0, 0, 0, 1))
  }
}

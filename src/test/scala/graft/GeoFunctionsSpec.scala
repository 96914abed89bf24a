package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Graft.register(s)
    s
  }
}

class GeoFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark

  private def sql1(q: String): Any = spark.sql(s"SELECT $q").collect()(0).get(0)

  test("constructors and text output") {
    assert(sql1("st_astext(st_point(1, 2))") == "POINT (1 2)")
    assert(sql1("st_astext(st_point(1.5, -2.25))") == "POINT (1.5 -2.25)")
    assert(sql1("st_astext(st_makeenvelope(0, 0, 2, 3))") == "POLYGON ((0 0, 0 3, 2 3, 2 0, 0 0))")
    assert(sql1("st_astext(st_geomfromtext('MULTIPOINT (1 1, 2 2)'))") == "MULTIPOINT (1 1, 2 2)")
    assert(sql1("st_astext(st_geomfromtext('POINT Z (1 2 3)'))") == "POINT Z (1 2 3)")
    assert(sql1("st_astext(st_geomfromtext('POINT EMPTY'))") == "POINT EMPTY")
    assert(sql1("st_astext(st_makeline(st_point(0,0), st_point(3,4)))") == "LINESTRING (0 0, 3 4)")
    assert(sql1("st_astext(st_collect(array(st_point(1,1), st_point(2,2))))") == "MULTIPOINT (1 1, 2 2)")
  }

  test("wkb/hex/geojson roundtrip") {
    assert(sql1("st_astext(st_geomfromwkb(st_aswkb(st_point(3, 4))))") == "POINT (3 4)")
    assert(sql1("st_astext(st_geomfromhexwkb(st_ashexwkb(st_geomfromtext('LINESTRING (0 0, 1 1)'))))") == "LINESTRING (0 0, 1 1)")
    assert(sql1("st_asgeojson(st_point(1, 2))") == """{"type":"Point","coordinates":[1.0,2.0]}""")
    assert(sql1("st_astext(st_geomfromgeojson('{\"type\":\"Point\",\"coordinates\":[5,6]}'))") == "POINT (5 6)")
    // Z roundtrips through ISO WKB
    assert(sql1("st_astext(st_geomfromwkb(st_aswkb(st_geomfromtext('POINT Z (1 2 3)'))))") == "POINT Z (1 2 3)")
  }

  test("accessors") {
    assert(sql1("st_x(st_point(3, 4))") == 3.0)
    assert(sql1("st_y(st_point(3, 4))") == 4.0)
    assert(sql1("st_xmin(st_makeenvelope(1, 2, 3, 4))") == 1.0)
    assert(sql1("st_ymax(st_makeenvelope(1, 2, 3, 4))") == 4.0)
    assert(sql1("st_npoints(st_makeenvelope(0, 0, 1, 1))") == 5)
    assert(sql1("st_ngeometries(st_geomfromtext('MULTIPOINT (1 1, 2 2)'))") == 2)
    assert(sql1("st_geometrytype(st_point(0, 0))") == "POINT")
    assert(sql1("st_isempty(st_geomfromtext('POINT EMPTY'))") == true)
    assert(sql1("st_isclosed(st_geomfromtext('LINESTRING (0 0, 1 0, 1 1, 0 0)'))") == true)
    assert(sql1("st_hasz(st_geomfromtext('POINT Z (1 2 3)'))") == true)
    assert(sql1("st_zmflag(st_geomfromtext('POINT Z (1 2 3)'))") == 2)
    assert(sql1("st_z(st_geomfromtext('POINT Z (1 2 3)'))") == 3.0)
    assert(sql1("st_astext(st_startpoint(st_geomfromtext('LINESTRING (5 5, 6 6)')))") == "POINT (5 5)")
    assert(sql1("st_astext(st_pointn(st_geomfromtext('LINESTRING (1 1, 2 2, 3 3)'), -1))") == "POINT (3 3)")
    assert(sql1("st_dimension(st_makeenvelope(0,0,1,1))") == 2)
  }

  test("measures") {
    assert(sql1("st_area(st_makeenvelope(0, 0, 4, 5))") == 20.0)
    assert(sql1("st_perimeter(st_makeenvelope(0, 0, 4, 5))") == 18.0)
    assert(sql1("st_length(st_geomfromtext('LINESTRING (0 0, 3 4)'))") == 5.0)
    assert(sql1("st_distance(st_point(0, 0), st_point(3, 4))") == 5.0)
    assert(sql1("st_dwithin(st_point(0, 0), st_point(3, 4), 5.0)") == true)
    assert(sql1("st_x(st_centroid(st_makeenvelope(0, 0, 4, 6)))") == 2.0)
  }

  test("predicates") {
    assert(sql1("st_intersects(st_makeenvelope(0,0,2,2), st_makeenvelope(1,1,3,3))") == true)
    assert(sql1("st_intersects(st_makeenvelope(0,0,1,1), st_makeenvelope(2,2,3,3))") == false)
    assert(sql1("st_contains(st_makeenvelope(0,0,4,4), st_point(1,1))") == true)
    assert(sql1("st_within(st_point(1,1), st_makeenvelope(0,0,4,4))") == true)
    assert(sql1("st_touches(st_makeenvelope(0,0,1,1), st_makeenvelope(1,0,2,1))") == true)
    assert(sql1("st_disjoint(st_makeenvelope(0,0,1,1), st_makeenvelope(5,5,6,6))") == true)
    assert(sql1("st_crosses(st_geomfromtext('LINESTRING (0 0, 2 2)'), st_geomfromtext('LINESTRING (0 2, 2 0)'))") == true)
    assert(sql1("st_equals(st_makeenvelope(0,0,1,1), st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))") == true)
    assert(sql1("st_covers(st_makeenvelope(0,0,2,2), st_makeenvelope(0,0,1,1))") == true)
    assert(sql1("st_intersects_extent(st_point(1,1), st_makeenvelope(0,0,2,2))") == true)
  }

  test("overlays and transforms") {
    assert(sql1("st_area(st_intersection(st_makeenvelope(0,0,2,2), st_makeenvelope(1,1,3,3)))") == 1.0)
    assert(sql1("st_area(st_union(st_makeenvelope(0,0,2,2), st_makeenvelope(1,1,3,3)))") == 7.0)
    assert(sql1("st_area(st_difference(st_makeenvelope(0,0,2,2), st_makeenvelope(1,1,3,3)))") == 3.0)
    assert(sql1("st_area(st_convexhull(st_geomfromtext('MULTIPOINT (0 0, 4 0, 0 3)')))") == 6.0)
    assert(sql1("st_npoints(st_buffer(st_point(0,0), 1.0, 8))") == 33)
    assert(sql1("st_astext(st_flipcoordinates(st_point(1, 2)))") == "POINT (2 1)")
    assert(sql1("st_astext(st_multi(st_point(1, 1)))") == "MULTIPOINT (1 1)")
    assert(sql1("st_astext(st_reverse(st_geomfromtext('LINESTRING (0 0, 1 1)')))") == "LINESTRING (1 1, 0 0)")
    assert(sql1("st_astext(st_force2d(st_geomfromtext('POINT Z (1 2 3)')))") == "POINT (1 2)")
    assert(sql1("st_astext(st_force3dz(st_point(1, 2), 9.0))") == "POINT Z (1 2 9)")
    assert(sql1("st_npoints(st_simplify(st_geomfromtext('LINESTRING (0 0, 1 0, 2 0)'), 0.5))") == 2)
    assert(sql1("st_isvalid(st_makeenvelope(0,0,1,1))") == true)
    assert(sql1("st_isvalid(st_geomfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))'))") == false)
    assert(sql1("st_area(st_makevalid(st_geomfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))'))) > 0") == true)
  }

  test("rectangle predicate closed forms match JTS exactly") {
    val ops = Seq("st_intersects", "st_disjoint", "st_contains", "st_containsproperly",
      "st_within", "st_covers", "st_coveredby", "st_touches", "st_overlaps", "st_equals", "st_crosses")
    // all box pairs over a small lattice: disjoint, touching (edge + corner),
    // overlapping, contained, equal
    val coords = Seq(0.0, 2.0, 4.0)
    val boxes = for (x0 <- coords; x1 <- coords if x1 > x0; y0 <- coords; y1 <- coords if y1 > y0)
      yield (x0, y0, x1, y1)
    val pairs = for (a <- boxes; b <- boxes) yield (a, b)
    val rows = pairs.map { case ((ax0, ay0, ax1, ay1), (bx0, by0, bx1, by1)) =>
      s"($ax0, $ay0, $ax1, $ay1, $bx0, $by0, $bx1, $by1)"
    }.mkString(", ")
    val sel = ops.map(o => s"$o(st_makeenvelope(ax0, ay0, ax1, ay1), st_makeenvelope(bx0, by0, bx1, by1)) AS $o").mkString(", ")
    val got = spark.sql(
      s"SELECT $sel FROM VALUES $rows AS t(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)").collect()
    import org.locationtech.jts.geom.prep.PreparedGeometryFactory
    pairs.zip(got).foreach { case (((ax0, ay0, ax1, ay1), (bx0, by0, bx1, by1)), row) =>
      val a = graft.geom.Geo.box(ax0, ay0, ax1, ay1)
      val b = graft.geom.Geo.box(bx0, by0, bx1, by1)
      val expect = Seq(a.intersects(b), a.disjoint(b), a.contains(b),
        PreparedGeometryFactory.prepare(a).containsProperly(b), a.within(b), a.covers(b),
        a.coveredBy(b), a.touches(b), a.overlaps(b), a.equalsTopo(b), a.crosses(b))
      ops.indices.foreach { i =>
        assert(row.getBoolean(i) == expect(i),
          s"${ops(i)} mismatch for ($ax0,$ay0,$ax1,$ay1) vs ($bx0,$by0,$bx1,$by1): got ${row.getBoolean(i)}")
      }
    }
  }

  test("rectangle overlay fast paths keep OverlayNG topology") {
    // B strictly inside A: shell + hole
    assert(sql1("st_astext(st_difference(st_makeenvelope(0,0,10,10), st_makeenvelope(2,2,4,4)))")
      .toString.startsWith("POLYGON"))
    assert(sql1("st_ninteriorrings(st_difference(st_makeenvelope(0,0,10,10), st_makeenvelope(2,2,4,4)))") == 1)
    assert(sql1("st_area(st_difference(st_makeenvelope(0,0,10,10), st_makeenvelope(2,2,4,4)))") == 96.0)
    // B splits A vertically: two slabs
    assert(sql1("st_ngeometries(st_difference(st_makeenvelope(0,0,9,9), st_makeenvelope(3,-1,6,10)))") == 2)
    assert(sql1("st_area(st_difference(st_makeenvelope(0,0,9,9), st_makeenvelope(3,-1,6,10)))") == 54.0)
    // C-shape: single 8-vertex polygon
    assert(sql1("st_npoints(st_difference(st_makeenvelope(0,0,10,10), st_makeenvelope(4,2,12,8)))") == 9)
    assert(sql1("st_area(st_difference(st_makeenvelope(0,0,10,10), st_makeenvelope(4,2,12,8)))") == 64.0)
    // corner overlap: L-shape, 6 vertices
    assert(sql1("st_npoints(st_difference(st_makeenvelope(0,0,10,10), st_makeenvelope(5,5,12,12)))") == 7)
    // union of overlapping rects dissolves into one polygon
    assert(sql1("st_ngeometries(st_union(st_makeenvelope(0,0,10,10), st_makeenvelope(5,5,15,15)))") == 1)
    assert(sql1("st_area(st_union(st_makeenvelope(0,0,10,10), st_makeenvelope(5,5,15,15)))") == 175.0)
    // plus/cross shape: 12 vertices
    assert(sql1("st_npoints(st_union(st_makeenvelope(0,4,12,8), st_makeenvelope(4,0,8,12)))") == 13)
    assert(sql1("st_area(st_union(st_makeenvelope(0,4,12,8), st_makeenvelope(4,0,8,12)))") == 80.0)
    // containment: union is the outer rect
    assert(sql1("st_area(st_union(st_makeenvelope(0,0,10,10), st_makeenvelope(2,2,4,4)))") == 100.0)
    assert(sql1("st_npoints(st_union(st_makeenvelope(0,0,10,10), st_makeenvelope(2,2,4,4)))") == 5)
    // edge-touching only (zero-area overlap) falls back to OverlayNG: dissolved
    assert(sql1("st_area(st_union(st_makeenvelope(0,0,5,10), st_makeenvelope(5,0,10,10)))") == 100.0)
  }

  test("linemerge undirected and directed") {
    // goldens from the reference's test/sql/postgis/st_linemerge.test
    assert(sql1("st_astext(st_linemerge(st_geomfromtext('MULTILINESTRING((10 160, 60 120), (120 140, 60 120), (120 140, 180 120))')))")
      == "LINESTRING (10 160, 60 120, 120 140, 180 120)")
    assert(sql1("st_astext(st_linemerge(st_geomfromtext('MULTILINESTRING((60 30, 10 70), (120 50, 60 30), (120 50, 180 30))'), true))")
      == "MULTILINESTRING ((120 50, 60 30, 10 70), (120 50, 180 30))")
    // directed never reverses: two opposed lines stay separate...
    assert(sql1("st_astext(st_linemerge(st_geomfromtext('MULTILINESTRING((0 0, 1 0), (2 0, 1 0))'), true))")
      == "MULTILINESTRING ((0 0, 1 0), (2 0, 1 0))")
    // ...but a directed cycle merges into a closed line
    assert(sql1("st_astext(st_linemerge(st_geomfromtext('MULTILINESTRING((0 0, 1 1), (1 1, 0 0))'), true))")
      == "LINESTRING (0 0, 1 1, 0 0)")
    // a 3-way node blocks directed chaining through it
    assert(sql1("st_astext(st_linemerge(st_geomfromtext('MULTILINESTRING((0 0, 1 0), (1 0, 2 0), (1 0, 1 5))'), true))")
      == "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (1 0, 1 5))")
    // directed=false keeps the plain merge behavior
    assert(sql1("st_astext(st_linemerge(st_geomfromtext('MULTILINESTRING((0 0, 1 0), (2 0, 1 0))'), false))")
      == "LINESTRING (0 0, 1 0, 2 0)")
  }

  test("buffer styles") {
    // reference golden (geos/st_buffer.test): 1-quadrant-segment circle = inscribed square, area 2r²
    assert(sql1("st_area(st_buffer(st_geomfromtext('POINT(0 0)'), 5, 1))") == 50.0)
    // point fast path keeps the 4*segs+1 vertex count
    assert(sql1("st_npoints(st_buffer(st_point(0,0), 1.0, 8))") == 33)
    assert(math.abs(sql1("st_area(st_buffer(st_point(0,0), 1.0, 64))").asInstanceOf[Double] - math.Pi) < 1e-3)
    // CAP_SQUARE on a point: square of side 2r, area 4r²
    assert(sql1("st_area(st_buffer(st_geomfromtext('POINT(0 0)'), 2, 8, 'CAP_SQUARE', 'JOIN_ROUND', 1.0))") == 16.0)
    // CAP_FLAT on a line: pure rectangle, no end caps
    assert(sql1("st_area(st_buffer(st_geomfromtext('LINESTRING(0 0, 10 0)'), 1, 8, 'CAP_FLAT', 'JOIN_ROUND', 1.0))") == 20.0)
    // JOIN_MITRE keeps a right-angle corner sharp: 2×(5×2) rects − 1 overlap + 1 mitre corner = 20
    assert(sql1("st_area(st_buffer(st_geomfromtext('LINESTRING(0 0, 5 0, 5 5)'), 1, 8, 'CAP_FLAT', 'JOIN_MITRE', 10.0))") == 20.0)
    // JOIN_BEVEL cuts that corner triangle in half: 19.5
    assert(sql1("st_area(st_buffer(st_geomfromtext('LINESTRING(0 0, 5 0, 5 5)'), 1, 8, 'CAP_FLAT', 'JOIN_BEVEL', 1.0))") == 19.5)
    // case-insensitive style parsing
    assert(sql1("st_area(st_buffer(st_geomfromtext('POINT(0 0)'), 2, 8, 'cap_square', 'join_bevel', 1.0))") == 16.0)
    val err = intercept[Exception](sql1("st_area(st_buffer(st_point(0,0), 1.0, 8, 'CAP_BOGUS', 'JOIN_ROUND', 1.0))"))
    assert(err.getMessage.contains("cap style") || String.valueOf(err.getCause).contains("cap style"))
  }

  test("geodesy and CRS") {
    val d = sql1("st_haversine(0.0, 0.0, 0.0, 1.0)").asInstanceOf[Double]
    assert(math.abs(d - 111195.0) < 100.0) // 1 degree of latitude ≈ 111.2 km
    // spheroid fns use the reference's GeographicLib axis convention: x IS latitude
    val v = sql1("st_distance_spheroid(st_point(1, 0), st_point(0, 0))").asInstanceOf[Double]
    assert(math.abs(v - 110574.0) < 100.0) // WGS84 meridian arc at equator
    val veq = sql1("st_distance_spheroid(st_point(0, 0), st_point(0, 1))").asInstanceOf[Double]
    assert(math.abs(veq - 111319.5) < 100.0, s"equatorial arc $veq") // 1 deg of longitude
    val x = sql1("st_x(st_transform(st_point(10.0, 50.0), 'OGC:CRS84', 'EPSG:3857'))").asInstanceOf[Double]
    assert(math.abs(x - 1113194.9) < 1.0)
    // EPSG:4326 authority order is lat/lon; always_xy flips interpretation
    val x2 = sql1("st_x(st_transform(st_point(50.0, 10.0), 'EPSG:4326', 'EPSG:3857'))").asInstanceOf[Double]
    assert(math.abs(x2 - 1113194.9) < 1.0)
    // UTM: on the central meridian of zone 32 (9°E) easting is exactly 500000
    // and northing/k0 equals the meridian arc — cross-checked against the
    // independent Vincenty implementation
    val e32 = sql1("st_x(st_transform(st_point(9.0, 52.0), 'OGC:CRS84', 'EPSG:32632'))").asInstanceOf[Double]
    val n32 = sql1("st_y(st_transform(st_point(9.0, 52.0), 'OGC:CRS84', 'EPSG:32632'))").asInstanceOf[Double]
    assert(math.abs(e32 - 500000.0) < 1e-6, s"easting $e32")
    val arc = sql1("st_distance_spheroid(st_point(0.0, 9.0), st_point(52.0, 9.0))").asInstanceOf[Double]
    assert(math.abs(n32 / 0.9996 - arc) < 1.0, s"northing $n32 vs meridian arc $arc")
    // round trip through UTM
    val back = sql1(
      "st_astext(st_transform(st_transform(st_point(9.37, 52.13), 'OGC:CRS84', 'EPSG:32632'), 'EPSG:32632', 'OGC:CRS84'))")
      .asInstanceOf[String]
    assert(back.startsWith("POINT (9.3") && back.contains("52.1"), back)
    // southern hemisphere false northing
    val nS = sql1("st_y(st_transform(st_point(-58.4, -34.6), 'OGC:CRS84', 'EPSG:32721'))").asInstanceOf[Double]
    assert(nS > 6000000.0 && nS < 10000000.0, s"south northing $nS")
    // ellipsoidal area: 1°x1° at the equator = 111.32 km x 110.57 km ≈ 12309.6 km²
    // (the purely spherical figure would be 12364 — the authalic correction matters)
    val cell = sql1("st_area_spheroid(st_makeenvelope(0.0d, 0.0d, 1.0d, 1.0d))").asInstanceOf[Double]
    assert(math.abs(cell / 1e6 - 12309.6) < 15.0, s"cell area ${cell / 1e6} km2")
    // the reference's own st_area_spheroid.test golden (belem box, lat/lon axes,
    // GeographicLib value 73991730 m²) — both winding directions
    val belem = "POLYGON((-1.475781 -48.516655, -1.475781 -48.433228, -1.403706 -48.433228, -1.403706 -48.516655, -1.475781 -48.516655))"
    val acw = sql1(s"st_area_spheroid(st_geomfromtext('$belem'))").asInstanceOf[Double]
    val accw = sql1(s"st_area_spheroid(st_reverse(st_geomfromtext('$belem')))").asInstanceOf[Double]
    assert(math.abs(acw - 73991730.0) / 73991730.0 < 1e-6, s"belem cw $acw")
    assert(math.abs(accw - 73991730.0) / 73991730.0 < 1e-6, s"belem ccw $accw")
  }

  test("projected CRS registry: LCC, Albers, LAEA, polar stereographic") {
    def xy(sql: String): (Double, Double) = {
      val r = spark.sql(s"SELECT st_x($sql) AS x, st_y($sql) AS y").collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    // Lambert-93: the false origin (46.5N 3E) maps to (700000, 6600000) exactly
    val (l93x, l93y) = xy("st_transform(st_point(3.0, 46.5), 'OGC:CRS84', 'EPSG:2154')")
    assert(math.abs(l93x - 700000.0) < 1e-6 && math.abs(l93y - 6600000.0) < 1e-6, s"L93 origin ($l93x,$l93y)")
    // scale-true on the standard parallel (44N): projected EW length == ellipsoidal parallel arc
    val (ax, ay) = xy("st_transform(st_point(1.0, 44.0), 'OGC:CRS84', 'EPSG:2154')")
    val (bx, by) = xy("st_transform(st_point(1.01, 44.0), 'OGC:CRS84', 'EPSG:2154')")
    val proj = math.hypot(bx - ax, by - ay)
    val m44 = math.cos(math.toRadians(44)) / math.sqrt(1 - 0.00669438002290 * math.pow(math.sin(math.toRadians(44)), 2))
    val arc = 6378137.0 * m44 * math.toRadians(0.01)
    assert(math.abs(proj / arc - 1.0) < 1e-6, s"L93 scale at 44N: ${proj / arc}")
    // round trip
    val rt = sql1("st_astext(st_transform(st_transform(st_point(2.3522, 48.8566), 'OGC:CRS84', 'EPSG:2154'), 'EPSG:2154', 'OGC:CRS84'))").asInstanceOf[String]
    assert(rt.startsWith("POINT (2.35") && rt.contains("48.85"), rt)
    // Conus Albers: central meridian -96 maps to x=0; equal-area property vs spheroid area
    val (cax, _) = xy("st_transform(st_point(-96.0, 40.0), 'OGC:CRS84', 'EPSG:5070')")
    assert(math.abs(cax) < 1e-6, s"Albers central meridian x=$cax")
    val aProj = sql1("st_area(st_transform(st_makeenvelope(-100.0d, 38.0d, -99.0d, 39.0d), 'OGC:CRS84', 'EPSG:5070'))").asInstanceOf[Double]
    val aSph = sql1("st_area_spheroid(st_flipcoordinates(st_makeenvelope(-100.0d, 38.0d, -99.0d, 39.0d)))").asInstanceOf[Double]
    assert(math.abs(aProj / aSph - 1.0) < 1e-4, s"Albers equal-area: proj=$aProj sph=$aSph")
    // LAEA Europe: projection center (10E 52N) maps to the false origin exactly
    val (lx, ly) = xy("st_transform(st_point(10.0, 52.0), 'OGC:CRS84', 'EPSG:3035')")
    assert(math.abs(lx - 4321000.0) < 1e-6 && math.abs(ly - 3210000.0) < 1e-6, s"LAEA origin ($lx,$ly)")
    val eProj = sql1("st_area(st_transform(st_makeenvelope(9.0d, 51.0d, 10.0d, 52.0d), 'OGC:CRS84', 'EPSG:3035'))").asInstanceOf[Double]
    val eSph = sql1("st_area_spheroid(st_flipcoordinates(st_makeenvelope(9.0d, 51.0d, 10.0d, 52.0d)))").asInstanceOf[Double]
    assert(math.abs(eProj / eSph - 1.0) < 1e-4, s"LAEA equal-area: proj=$eProj sph=$eSph")
    // polar stereographic: north pole at the natural origin; true scale at 70N
    val (px, py) = xy("st_transform(st_point(0.0, 90.0), 'OGC:CRS84', 'EPSG:3413')")
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6, s"3413 pole ($px,$py)")
    val (p1x, p1y) = xy("st_transform(st_point(-45.0, 70.0), 'OGC:CRS84', 'EPSG:3413')")
    val (p2x, p2y) = xy("st_transform(st_point(-45.0, 70.01), 'OGC:CRS84', 'EPSG:3413')")
    val geod = sql1("st_distance_spheroid(st_point(70.0, -45.0), st_point(70.01, -45.0))").asInstanceOf[Double]
    // finite-segment tolerance: scale drifts ~1.5e-5 across the 1.1 km chord
    assert(math.abs(math.hypot(p2x - p1x, p2y - p1y) / geod - 1.0) < 5e-5, "3413 true scale at 70N")
    // south aspect round trip (EPSG:3031)
    val rts = sql1("st_astext(st_transform(st_transform(st_point(166.6667, -77.85), 'OGC:CRS84', 'EPSG:3031'), 'EPSG:3031', 'OGC:CRS84'))").asInstanceOf[String]
    assert(rts.startsWith("POINT (166.66") && rts.contains("-77.8"), rts)
  }

  test("hilbert and quadkey") {
    val h1 = sql1("st_hilbert(1.0, 1.0, 0.0, 0.0, 10.0, 10.0)").asInstanceOf[Long]
    val h2 = sql1("st_hilbert(1.01, 1.0, 0.0, 0.0, 10.0, 10.0)").asInstanceOf[Long]
    assert(h1 >= 0 && math.abs(h1 - h2) < 100000) // locality: near points → near keys
    assert(sql1("length(st_quadkey(11.08, 49.45, 10))") == 10)
  }

  test("dump and collectionextract") {
    val n = spark.sql(
      "SELECT explode(st_dump(st_geomfromtext('MULTIPOINT (1 1, 2 2, 3 3)')))").count()
    assert(n == 3)
    assert(sql1("st_astext(st_collectionextract(st_geomfromtext('GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))'), 1))") == "MULTIPOINT (1 1)")
  }

  test("aggregates") {
    spark.sql("SELECT explode(sequence(0, 9)) AS i").createOrReplaceTempView("ten")
    assert(spark.sql(
      "SELECT st_astext(st_extent_agg(st_point(cast(i as double), cast(i as double)))) FROM ten")
      .collect()(0).getString(0) == "POLYGON ((0 0, 0 9, 9 9, 9 0, 0 0))")
    // ten disjoint unit squares → union area 10
    assert(spark.sql(
      "SELECT st_area(st_union_agg(st_makeenvelope(cast(i*2 as double), 0.0, cast(i*2+1 as double), 1.0))) FROM ten")
      .collect()(0).getDouble(0) == 10.0)
    // intersection of nested envelopes → smallest
    assert(spark.sql(
      "SELECT st_area(st_intersection_agg(st_makeenvelope(0.0, 0.0, cast(10-i as double), 1.0))) FROM ten")
      .collect()(0).getDouble(0) == 1.0)
    assert(spark.sql(
      "SELECT st_ngeometries(st_collect_agg(st_point(cast(i as double), 0.0))) FROM ten")
      .collect()(0).getInt(0) == 10)
  }

  test("text pipeline functions") {
    assert(sql1("token_count('  hello   world ')") == 2)
    assert(sql1("bpe_token_count('hello, world 42')") == 4)
    assert(sql1("lang_id('the cat and the dog are in the house')") == "en")
    assert(sql1("lang_id('le chat est dans la maison avec le chien')") == "fr")
    // Unicode-script stage: dominant non-Latin script identifies the language
    assert(sql1("lang_id('这是一个中文句子')") == "zh")
    assert(sql1("lang_id('これはテストです')") == "ja")
    assert(sql1("lang_id('한국어 문장입니다')") == "ko")
    assert(sql1("lang_id('Это русское предложение')") == "ru")
    assert(sql1("lang_id('جملة باللغة العربية')") == "ar")
    // Japanese kana wins over Han even when kanji dominate the char count
    assert(sql1("lang_id('日本語の文書を解析する')") == "ja")
    assert(sql1("lang_id('12345 !!! ???')") == "und")
    assert(sql1("jaccard_shingles('abcdef', 'abcdef', 3)") == 1.0)
    // Gopher-style quality signals
    assert(sql1("char_entropy('aabb')") == 1.0)
    assert(sql1("char_entropy('abcd')") == 2.0)
    assert(sql1("char_entropy('')") == 0.0)
    assert(sql1("dup_ngram_frac('a b a b a', 2)") == 0.5) // 4 bigrams, 2 distinct
    assert(sql1("dup_ngram_frac('all words unique here', 2)") == 0.0)
    assert(sql1("dup_ngram_frac('one', 2)") == 0.0)
    val ls = spark.sql(
      "SELECT s.n_lines, s.max_len, s.mean_len FROM (SELECT line_stats('ab\ncdef\nx') AS s)").collect()(0)
    assert(ls.getInt(0) == 3 && ls.getInt(1) == 4 && math.abs(ls.getDouble(2) - 7.0 / 3) < 1e-12)
    assert(sql1("doc_fingerprint('a  B') = doc_fingerprint('a b')") == true)
    assert(sql1("size(minhash('some text here', 32, 4, 42))") == 32)
    assert(sql1("size(minhash_lsh_buckets('some text here', 32, 4, 8, 42))") == 8)
    // embedding arithmetic
    assert(sql1("vec_norm(vec_normalize(array(3.0d, 4.0d)))") == 1.0)
    assert(sql1("vec_normalize(array(0.0d, 0.0d))[0]") == 0.0)
    assert(sql1("vec_add(array(1.0d, 2.0d), array(3.0d, 4.0d))[1]") == 6.0)
    assert(sql1("vec_sub(array(1.0d, 2.0d), array(3.0d, 4.0d))[0]") == -2.0)
    assert(sql1("vec_scale(array(1.5d, -2.0d), 2.0d)[1]") == -4.0)
    // near-identical docs share most minhashes; unrelated docs don't
    val near = spark.sql(
      "SELECT size(array_intersect(minhash('the quick brown fox jumps over the lazy dog', 64, 4, 1), " +
        "minhash('the quick brown fox jumps over the lazy cat', 64, 4, 1)))").collect()(0).getInt(0)
    assert(near > 32, s"expected >32 shared minhashes, got $near")
  }

  test("vector functions") {
    assert(sql1("vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))") == 11.0)
    assert(sql1("vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))") == 1.0)
    assert(sql1("vec_l2(array(0.0d, 0.0d), array(3.0d, 4.0d))") == 5.0)
    // identical vectors → same LSH bucket
    assert(sql1("rhp_lsh_bucket(array(0.1d, 0.9d), 16, 7) = rhp_lsh_bucket(array(0.1d, 0.9d), 16, 7)") == true)
    // float arrays upcast automatically
    assert(sql1("vec_dot(array(cast(1.0 as float), cast(2.0 as float)), array(1.0d, 1.0d))") == 3.0)
  }

  test("st_generatepoints table function and reference pin shape") {
    val n = spark.sql(
      "SELECT count(*) FROM st_generatepoints(0.0d, 0.0d, 100.0d, 100.0d, 1000, 42)").collect()(0).getLong(0)
    assert(n == 1000L)
    val wkt = spark.sql(
      "SELECT st_astext(point) FROM st_generatepoints(0.0d, 0.0d, 100.0d, 100.0d, 1, 42)").collect()(0).getString(0)
    assert(wkt.startsWith("POINT ("))
  }

  test("reference alias names and columnar constructors") {
    assert(sql1("st_numpoints(st_makeenvelope(0, 0, 1, 1))") == 5)
    assert(sql1("st_numgeometries(st_geomfromtext('MULTIPOINT (1 1, 2 2)'))") == 2)
    assert(sql1("st_numinteriorrings(st_geomfromtext('POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))'))") == 1)
    assert(sql1("st_astext(st_geomfromhexewkb(st_ashexwkb(st_point(3, 4))))") == "POINT (3 4)")
    assert(sql1("st_extent_approx(st_makeenvelope(1, 2, 3, 4)).min_x") == 1.0)
    // WKB → columnar encodings, and back through the coercion lattice
    assert(sql1("st_point2dfromwkb(st_aswkb(st_point(7, 8))).x") == 7.0)
    assert(sql1("st_astext(st_point2dfromwkb(st_aswkb(st_point(7, 8))))") == "POINT (7 8)")
    assert(sql1("size(st_linestring2dfromwkb(st_aswkb(st_geomfromtext('LINESTRING (0 0, 1 1, 2 0)'))))") == 3)
    assert(sql1("st_length(st_linestring2dfromwkb(st_aswkb(st_geomfromtext('LINESTRING (0 0, 3 4)'))))") == 5.0)
    assert(sql1("st_area(st_polygon2dfromwkb(st_aswkb(st_makeenvelope(0, 0, 4, 4))))") == 16.0)
    // CRS catalog table function
    val crs = spark.sql("SELECT auth_code FROM st_list_proj_crs()").collect().map(_.getString(0))
    assert(crs.contains("EPSG:2154") && crs.contains("EPSG:3857") && crs.length >= 10)
  }

  test("columnar POINT_3D/4D, LINESTRING_2D, POLYGON_2D coerce to geometry") {
    // POINT_3D (xyz) and the m-named variant (xym)
    assert(sql1("st_astext(named_struct('x', 1.0d, 'y', 2.0d, 'z', 3.0d))") == "POINT Z (1 2 3)")
    assert(sql1("st_astext(named_struct('x', 1.0d, 'y', 2.0d, 'm', 9.0d))") == "POINT M (1 2 9)")
    assert(sql1("st_astext(named_struct('x', 1.0d, 'y', 2.0d, 'z', 3.0d, 'm', 4.0d))") == "POINT ZM (1 2 3 4)")
    // LINESTRING_2D: array of point structs
    assert(sql1("st_length(array(named_struct('x', 0.0d, 'y', 0.0d), named_struct('x', 3.0d, 'y', 4.0d)))") == 5.0)
    assert(sql1("st_astext(array(named_struct('x', 0.0d, 'y', 0.0d), named_struct('x', 1.0d, 'y', 1.0d)))")
      == "LINESTRING (0 0, 1 1)")
    // POLYGON_2D: array of rings
    assert(sql1("""st_area(array(array(
      named_struct('x', 0.0d, 'y', 0.0d), named_struct('x', 4.0d, 'y', 0.0d),
      named_struct('x', 4.0d, 'y', 4.0d), named_struct('x', 0.0d, 'y', 4.0d),
      named_struct('x', 0.0d, 'y', 0.0d))))""") == 16.0)
  }

  test("columnar POINT_2D struct coerces to geometry") {
    assert(sql1("st_x(named_struct('x', 3.0d, 'y', 4.0d))") == 3.0)
    assert(sql1("st_distance(named_struct('x', 0.0d, 'y', 0.0d), named_struct('x', 3.0d, 'y', 4.0d))") == 5.0)
    assert(sql1("st_astext(st_multi(named_struct('x', 1.0d, 'y', 2.0d)))") == "MULTIPOINT (1 2)")
  }

  test("multimodal stub") {
    val r = spark.sql("SELECT mm_decode_stub(cast('hello' as binary)) AS m")
      .selectExpr("m.width", "m.nbytes", "m.format").collect()(0)
    assert(r.getInt(0) == 6 && r.getLong(1) == 5L && r.getString(2) == "fake/rgb8")
  }

  test("multimodal resize / frame-sample / feature stubs") {
    assert(sql1("size(mm_frame_sample_stub(cast('0123456789abcdefghij' AS BINARY), 4))") == 4)
    // evenly spaced 16-byte windows over the blob
    assert(sql1("cast(mm_frame_sample_stub(cast('0123456789abcdefghij' AS BINARY), 4)[1] AS STRING)") == "56789abcdefghij")
    assert(sql1("length(mm_resize_stub(cast('hello world, this is media' AS BINARY), 8, 8))") == 64)
    // feature vector is unit-scale, deterministic, and dim-sized
    assert(sql1("size(mm_feature_stub(cast('blob' AS BINARY), 16))") == 16)
    val f = sql1("mm_feature_stub(cast('blob' AS BINARY), 4)[2]").asInstanceOf[Double]
    assert(f >= -1.0 && f <= 1.0)
    assert(sql1("mm_feature_stub(cast('blob' AS BINARY), 4)[2]") == f) // stable
    // the explode pattern a video pipeline uses: one row per frame
    val n = spark.sql(
      "SELECT explode(mm_frame_sample_stub(cast('0123456789abcdefghij' AS BINARY), 5)) AS frame").count()
    assert(n == 5)
  }

  test("vertex editors: st_addpoint / st_setpoint / st_removepoint / st_expand") {
    assert(sql1("st_astext(st_addpoint(st_geomfromtext('LINESTRING (0 0, 2 2)'), st_point(4.0d, 4.0d)))")
      .toString == "LINESTRING (0 0, 2 2, 4 4)")
    assert(sql1("st_astext(st_addpoint(st_geomfromtext('LINESTRING (0 0, 2 2)'), st_point(1.0d, 1.0d), 1))")
      .toString == "LINESTRING (0 0, 1 1, 2 2)")
    assert(sql1("st_astext(st_setpoint(st_geomfromtext('LINESTRING (0 0, 2 2, 4 4)'), -1, st_point(9.0d, 9.0d)))")
      .toString == "LINESTRING (0 0, 2 2, 9 9)")
    assert(sql1("st_astext(st_removepoint(st_geomfromtext('LINESTRING (0 0, 2 2, 4 4)'), 1))")
      .toString == "LINESTRING (0 0, 4 4)")
    // expand grows the envelope; the asymmetric form takes dx/dy
    assert(sql1("st_astext(st_expand(st_point(1.0d, 2.0d), 3.0d))").toString ==
      "POLYGON ((-2 -1, -2 5, 4 5, 4 -1, -2 -1))")
    assert(sql1("st_xmax(st_expand(st_makeenvelope(0.0d, 0.0d, 2.0d, 2.0d), 1.0d, 5.0d))") == 3.0)
    assert(sql1("st_ymax(st_expand(st_makeenvelope(0.0d, 0.0d, 2.0d, 2.0d), 1.0d, 5.0d))") == 7.0)
    // loud failures
    intercept[Exception](sql1("st_removepoint(st_geomfromtext('LINESTRING (0 0, 2 2)'), 0)"))
    intercept[Exception](sql1("st_setpoint(st_geomfromtext('LINESTRING (0 0, 2 2)'), 5, st_point(0.0d, 0.0d))"))
    intercept[Exception](sql1("st_addpoint(st_point(0.0d, 0.0d), st_point(1.0d, 1.0d))"))
  }

  test("st_symdifference: XOR overlay with the rect closed form") {
    // overlapping unit-offset squares: each contributes area 3, overlap 1
    assert(sql1(
      """st_area(st_symdifference(st_makeenvelope(0.0d, 0.0d, 2.0d, 2.0d),
                                  st_makeenvelope(1.0d, 1.0d, 3.0d, 3.0d)))""") == 6.0)
    // disjoint -> union of both
    assert(sql1(
      """st_area(st_symdifference(st_makeenvelope(0.0d, 0.0d, 1.0d, 1.0d),
                                  st_makeenvelope(5.0d, 5.0d, 6.0d, 6.0d)))""") == 2.0)
    // identical inputs cancel
    assert(sql1(
      """st_isempty(st_symdifference(st_makeenvelope(0.0d, 0.0d, 2.0d, 2.0d),
                                     st_makeenvelope(0.0d, 0.0d, 2.0d, 2.0d)))""") == true)
    // agrees with JTS on a non-rect pair
    assert(sql1(
      """abs(st_area(st_symdifference(st_buffer(st_point(0.0d, 0.0d), 2.0d),
                                      st_makeenvelope(0.0d, 0.0d, 3.0d, 3.0d)))
           - (st_area(st_buffer(st_point(0.0d, 0.0d), 2.0d)) + 9.0d
              - 2 * st_area(st_intersection(st_buffer(st_point(0.0d, 0.0d), 2.0d),
                                            st_makeenvelope(0.0d, 0.0d, 3.0d, 3.0d))))) < 1e-9""") == true)
  }

  test("dump family: st_dumprings / st_dumpsegments") {
    val holed = "st_geomfromtext('POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))')"
    assert(sql1(s"size(st_dumprings($holed))") == 2)
    assert(sql1(s"st_astext(st_dumprings($holed)[0])").toString == "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0))")
    assert(sql1(s"st_astext(st_dumprings($holed)[1])").toString == "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    // segments walk rings too: 4 + 4 for the holed polygon
    assert(sql1(s"size(st_dumpsegments($holed))") == 8)
    assert(sql1("st_astext(st_dumpsegments(st_geomfromtext('LINESTRING (0 0, 3 0, 3 4)'))[1])")
      .toString == "LINESTRING (3 0, 3 4)")
    // multipolygon recursion; points contribute no segments
    assert(sql1("size(st_dumpsegments(st_geomfromtext('GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 0))')))") == 1)
    intercept[Exception](sql1("st_dumprings(st_point(0.0d, 0.0d))"))
  }

  test("grid constructors: st_square / st_hexagon / st_squaregrid TVF") {
    assert(sql1("st_astext(st_square(2.0d, 3, -1))").toString ==
      "POLYGON ((6 -2, 6 0, 8 0, 8 -2, 6 -2))")
    // st_hexagon renders the cell st_hexbin assigns: the cell center must be
    // inside its own hexagon, and the probe point inside the cell it maps to
    val r = spark.sql(
      """SELECT st_contains(st_hexagon(3.0d, h.q, h.r), st_point(h.cx, h.cy)) AS c,
                st_contains(st_hexagon(3.0d, h.q, h.r), st_point(10.0d, 7.0d)) AS p
         FROM (SELECT st_hexbin(10.0d, 7.0d, 3.0d) AS h)""").collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1))
    // TVF: origin-aligned cover of the bounds
    val g = spark.sql(
      "SELECT count(*) AS n, min(i) AS i0, max(i) AS i1, min(j) AS j0, max(j) AS j1 " +
      "FROM st_squaregrid(7.0d, 3.0d, -5.0d, 100.0d, 40.0d)").collect()(0)
    assert(g.getLong(0) == 105 && g.getLong(1) == 0 && g.getLong(2) == 14
      && g.getLong(3) == -1 && g.getLong(4) == 5, g.toString)
    // every generated cell really is the st_square of its (i, j)
    val bad = spark.sql(
      """SELECT count(*) AS bad FROM st_squaregrid(2.5d, -10.0d, -10.0d, 10.0d, 10.0d)
         WHERE st_astext(geom) != st_astext(st_square(2.5d, i, j))""").collect()(0).getLong(0)
    assert(bad == 0)
    intercept[Exception](spark.sql("SELECT * FROM st_squaregrid(0.0d, 0d, 0d, 1d, 1d)").collect())
    // hexagon grid: every cell equals st_hexagon of its (q, r); every probe
    // point's st_hexbin cell is present in the cover
    val hbad = spark.sql(
      """SELECT count(*) AS bad FROM st_hexagongrid(3.0d, 1.0d, 2.0d, 50.0d, 40.0d)
         WHERE st_astext(geom) != st_astext(st_hexagon(3.0d, q, r))""").collect()(0).getLong(0)
    assert(hbad == 0)
    val missing = spark.sql(
      """WITH probes AS (
           SELECT st_hexbin(cast(3 + id * 7 % 47 AS DOUBLE), cast(2 + id * 11 % 38 AS DOUBLE), 3.0d) AS h
           FROM range(40))
         SELECT count(*) AS missing FROM probes p
         LEFT JOIN (SELECT q, r FROM st_hexagongrid(3.0d, 1.0d, 2.0d, 50.0d, 40.0d)) g
           ON p.h.q = g.q AND p.h.r = g.r
         WHERE g.q IS NULL""").collect()(0).getLong(0)
    assert(missing == 0)
  }

  test("st_dumppoints: PostGIS paths through collections, rings, vertices") {
    def dump(wkt: String): Seq[(String, String)] =
      spark.sql(s"""
        SELECT array_join(d.path, ','), st_astext(d.geom)
        FROM (SELECT explode(st_dumppoints(st_geomfromtext('$wkt'))) AS d)""")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // bare point: just the vertex index
    assert(dump("POINT (3 4)") == Seq(("1", "POINT (3 4)")))
    // linestring: 1-based vertex indexes
    assert(dump("LINESTRING (0 0, 1 1, 2 2)").map(_._1) == Seq("1", "2", "3"))
    // polygon: {ring, vertex}, exterior ring = 1
    val poly = dump("POLYGON ((0 0, 4 0, 4 4, 0 0), (1 1, 2 1, 1 2, 1 1))")
    assert(poly.map(_._1) == Seq("1,1", "1,2", "1,3", "1,4", "2,1", "2,2", "2,3", "2,4"))
    assert(poly(4)._2 == "POINT (1 1)")
    // nested collection: element prefix from st_dump's convention
    val gc = dump("GEOMETRYCOLLECTION (POINT (9 9), MULTILINESTRING ((0 0, 1 0), (5 5, 6 5)))")
    assert(gc.map(_._1) == Seq("1,1", "2,1,1", "2,1,2", "2,2,1", "2,2,2"))
    // empties contribute nothing
    assert(dump("GEOMETRYCOLLECTION (POINT EMPTY, POINT (1 2))") == Seq(("2,1", "POINT (1 2)")))
  }

  test("dumppoints/longestline invariants on randomized geometries") {
    val rnd = new scala.util.Random(12012026)
    def wkt(): String = rnd.nextInt(4) match {
      case 0 => s"POINT (${rnd.nextInt(50)} ${rnd.nextInt(50)})"
      case 1 =>
        val pts = Seq.fill(2 + rnd.nextInt(4))(s"${rnd.nextInt(50)} ${rnd.nextInt(50)}")
        s"LINESTRING (${pts.mkString(", ")})"
      case 2 =>
        val x = rnd.nextInt(40); val y = rnd.nextInt(40)
        s"POLYGON (($x $y, ${x + 5} $y, ${x + 5} ${y + 5}, $x ${y + 5}, $x $y))"
      case _ =>
        s"MULTIPOINT (${rnd.nextInt(50)} ${rnd.nextInt(50)}, ${rnd.nextInt(50)} ${rnd.nextInt(50)})"
    }
    val pairs = Seq.fill(60)((wkt(), wkt()))
    spark.createDataFrame(pairs).toDF("a", "b").createOrReplaceTempView("dpll_src")
    val bad = spark.sql("""
      SELECT count(*) FROM dpll_src
      WHERE size(st_dumppoints(st_geomfromtext(a))) != st_npoints(st_geomfromtext(a))
         OR abs(st_length(st_longestline(st_geomfromtext(a), st_geomfromtext(b)))
                - st_maxdistance(st_geomfromtext(a), st_geomfromtext(b))) > 1e-9
         OR NOT st_intersects(st_startpoint(st_longestline(st_geomfromtext(a), st_geomfromtext(b))),
                              st_geomfromtext(a))""").collect()(0).getLong(0)
    assert(bad == 0)
  }

  test("multimodal batch pipeline via mapPartitions") {
    val df = spark.sql("SELECT id, cast(concat('media', id) AS BINARY) AS media FROM range(100)")
    val decoded = graft.mm.MultiModal.decodeBatch(df, "id", "media")
    assert(decoded.count() == 100)
    val one = decoded.filter(_.id == 7L).collect()(0)
    assert(one.meta.nbytes == 6L && one.meta.format == "fake/rgb8" && one.thumbnailStub.nonEmpty)
  }
}

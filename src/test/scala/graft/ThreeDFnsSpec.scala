package graft

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, GeometryFactory, LineString}
import graft.functions.ThreeDFns
import graft.geom.Geo

class ThreeDFnsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val f: GeometryFactory = Geo.factory

  private def sql1(q: String): Any = spark.sql(s"SELECT $q").collect()(0).get(0)

  private def lineZ(pts: (Double, Double, Double)*): LineString =
    f.createLineString(pts.map { case (x, y, zz) => new Coordinate(x, y, zz) }.toArray)

  test("3D length and perimeter include the Z deltas; 2D input degrades") {
    // 3-4-12 box: sqrt(3^2+4^2+12^2) = 13
    assert(ThreeDFns.length3d(lineZ((0, 0, 0), (3, 4, 12))) == 13.0)
    // 2D line has Z = NaN -> treated as 0
    val flat = f.createLineString(Array(new Coordinate(0, 0), new Coordinate(3, 4)))
    assert(ThreeDFns.length3d(flat) == 5.0)
    // perimeter of a tilted unit square in the x=z plane: each side sqrt(2) or 1
    val p = f.createPolygon(Array(
      new Coordinate(0, 0, 0), new Coordinate(1, 0, 1),
      new Coordinate(1, 1, 1), new Coordinate(0, 1, 0), new Coordinate(0, 0, 0)))
    assert(math.abs(ThreeDFns.perimeter3d(p) - (2 + 2 * math.sqrt(2))) < 1e-12)
    assert(ThreeDFns.perimeter3d(lineZ((0, 0, 0), (1, 1, 1))) == 0.0)
    assert(ThreeDFns.length3d(p) == 0.0)
  }

  test("SQL surface: st_3ddistance / st_3dlength / st_3dperimeter") {
    // vertical offset between two points: pure-Z distance
    assert(sql1("st_3ddistance(st_point3d(0d,0d,0d), st_point3d(0d,0d,7d))") == 7.0)
    // 2D distance ignores Z; 3D includes it
    assert(sql1("st_distance(st_point3d(0d,0d,0d), st_point3d(3d,4d,12d))") == 5.0)
    assert(sql1("st_3ddistance(st_point3d(0d,0d,0d), st_point3d(3d,4d,12d))") == 13.0)
    assert(sql1("st_3dlength(st_geomfromtext('LINESTRING Z (0 0 0, 3 4 12)'))") == 13.0)
    assert(sql1("st_3dperimeter(st_geomfromtext('POLYGON Z ((0 0 0, 1 0 1, 1 1 1, 0 1 0, 0 0 0))'))")
      .asInstanceOf[Double] - (2 + 2 * math.sqrt(2)) < 1e-12)
  }

  test("shiftLongitude toggles negative longitudes by +360") {
    assert(sql1("st_astext(st_shiftlongitude(st_point(-170.0d, 10.0d)))").toString == "POINT (190 10)")
    assert(sql1("st_astext(st_shiftlongitude(st_point(170.0d, 10.0d)))").toString == "POINT (170 10)")
    // Z carried through
    assert(sql1("st_z(st_shiftlongitude(st_point3d(-10d, 0d, 5d)))") == 5.0)
  }

  test("3D affine and axis rotations") {
    // 12-arg affine: project onto z=0 then translate
    assert(sql1(
      """st_astext(st_affine(st_geomfromtext('POINT Z (1 2 3)'),
           1d,0d,0d, 0d,1d,0d, 0d,0d,0d, 10d,20d,30d))""").toString == "POINT Z (11 22 30)")
    // rotateX by pi/2: (y,z) -> (-z, y)
    val p = spark.sql(
      """SELECT st_x(g) AS x, st_y(g) AS y, st_z(g) AS z FROM
         (SELECT st_rotatex(st_geomfromtext('POINT Z (5 1 2)'), acos(-1d) / 2) AS g)""").collect()(0)
    assert(math.abs(p.getDouble(0) - 5) < 1e-12 && math.abs(p.getDouble(1) + 2) < 1e-12
      && math.abs(p.getDouble(2) - 1) < 1e-12)
    // rotateY by pi/2: (x,z) -> (z, -x)
    val q = spark.sql(
      """SELECT st_x(g) AS x, st_z(g) AS z FROM
         (SELECT st_rotatey(st_geomfromtext('POINT Z (1 7 0)'), acos(-1d) / 2) AS g)""").collect()(0)
    assert(math.abs(q.getDouble(0)) < 1e-12 && math.abs(q.getDouble(1) + 1) < 1e-12)
    // rotatez == st_rotate
    assert(sql1("st_astext(st_rotatez(st_point(1.0d, 0.0d), acos(-1d)))").toString ==
      sql1("st_astext(st_rotate(st_point(1.0d, 0.0d), acos(-1d)))").toString)
    // 2D input through the 12-arg form stays 2D
    assert(sql1("st_astext(st_affine(st_point(1.0d, 2.0d), 2d,0d,0d, 0d,2d,0d, 0d,0d,1d, 0d,0d,0d))")
      .toString == "POINT (2 4)")
  }

  test("st_project_spheroid travels the WGS84 geodesic (family x=lat order)") {
    // east along the equator: the equator is a geodesic, one equatorial
    // degree = a * pi/180 meters. Spheroid-family axis order: POINT(lat lon).
    val r = spark.sql(
      """SELECT st_x(g) AS lat, st_y(g) AS lon FROM
         (SELECT st_project_spheroid(st_point(0.0d, 10.0d), 6378137.0d * acos(-1d) / 180.0d,
                                     acos(-1d) / 2) AS g)""").collect()(0)
    assert(math.abs(r.getDouble(0)) < 1e-9 && math.abs(r.getDouble(1) - 11.0) < 1e-9, r.toString)
    // due north along a meridian: a quarter meridian lands on the pole
    // (GeographicLib published quadrant 10001965.72931258 m)
    val n = spark.sql(
      """SELECT st_x(st_project_spheroid(st_point(0.0d, 7.0d), 10001965.72931258d, 0.0d)) AS lat""")
      .collect()(0).getDouble(0)
    assert(math.abs(n - 90.0) < 1e-7, s"quadrant lat $n")
    // round trip: the family's own inverse distance recovers the input
    val d = spark.sql(
      """SELECT st_distance_spheroid(st_point(48.0d, 2.0d), g) AS d FROM
         (SELECT st_project_spheroid(st_point(48.0d, 2.0d), 123456.0d, 0.7d) AS g)""")
      .collect()(0).getDouble(0)
    assert(math.abs(d - 123456.0) < 1e-3, s"round-trip distance $d")
  }

  test("snapToGrid: rint snapping, duplicate collapse, degenerate components") {
    assert(sql1("st_astext(st_snaptogrid(st_point(1.4d, 2.6d), 1.0d))").toString == "POINT (1 3)")
    // rint is half-even: 2.5 -> 2, 3.5 -> 4
    assert(sql1("st_astext(st_snaptogrid(st_point(2.5d, 3.5d), 1.0d))").toString == "POINT (2 4)")
    // consecutive duplicates collapse; a fully-collapsed line is EMPTY
    assert(sql1("st_npoints(st_snaptogrid(st_geomfromtext('LINESTRING (0 0, 0.2 0.1, 5 5)'), 1.0d))") == 2)
    assert(sql1("st_isempty(st_snaptogrid(st_geomfromtext('LINESTRING (0 0, 0.2 0.2)'), 1.0d))") == true)
    // a hole smaller than the grid vanishes; the shell survives
    assert(sql1(
      """st_ninteriorrings(st_snaptogrid(st_geomfromtext(
           'POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (4.1 4.1, 4.2 4.1, 4.2 4.2, 4.1 4.2, 4.1 4.1))'), 1.0d))""") == 0)
    // a shell smaller than the grid collapses the polygon to EMPTY
    assert(sql1(
      "st_isempty(st_snaptogrid(st_geomfromtext('POLYGON ((0 0, 0.2 0, 0.2 0.2, 0 0.2, 0 0))'), 1.0d))") == true)
    // explicit origin shifts the lattice
    assert(sql1("st_astext(st_snaptogrid(st_point(1.1d, 0.0d), 0.5d, 0.0d, 1.0d, 1.0d))").toString
      == "POINT (1.5 0)")
    // asymmetric sizes
    assert(sql1("st_astext(st_snaptogrid(st_point(1.4d, 1.4d), 1.0d, 0.25d))").toString == "POINT (1 1.5)")
    intercept[Exception](sql1("st_snaptogrid(st_point(0.0d, 0.0d), -1.0d)"))
  }

  test("swapOrdinates exchanges named pairs and is loud on missing ordinates") {
    assert(sql1("st_astext(st_swapordinates(st_point(1.0d, 2.0d), 'xy'))").toString == "POINT (2 1)")
    assert(sql1("st_astext(st_swapordinates(st_geomfromtext('LINESTRING Z (1 2 3, 4 5 6)'), 'yz'))").toString
      == "LINESTRING Z (1 3 2, 4 6 5)")
    // M-swap through the WKB path
    assert(sql1("st_m(st_swapordinates(st_force4d(st_point(1.0d, 2.0d), 0.0d, 9.0d), 'xm'))") == 1.0)
    val e = intercept[Exception](sql1("st_swapordinates(st_point(1.0d, 2.0d), 'xz')"))
    assert(e.getMessage.contains("no Z") || e.getCause != null)
    intercept[Exception](sql1("st_swapordinates(st_point(1.0d, 2.0d), 'xx')"))
  }
}

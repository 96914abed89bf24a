package graft

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.linearref.LengthIndexedLine
import graft.functions.LinearFns

class LinearFnsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val f = new GeometryFactory()

  private def sql1(q: String): Any = spark.sql(s"SELECT $q").collect()(0).get(0)

  private def line(pts: (Double, Double)*) =
    f.createLineString(pts.map { case (x, y) => new Coordinate(x, y) }.toArray)

  test("interpolate matches JTS LengthIndexedLine on oblique lines") {
    val l = line((0, 0), (3, 4), (10, 4), (10, -2))
    val lil = new LengthIndexedLine(l)
    for (frac <- Seq(0.0, 0.1, 0.25, 0.37, 0.5, 0.73, 0.99, 1.0)) {
      val mine = LinearFns.interpolate(l, frac)
      val jts = lil.extractPoint(frac * l.getLength)
      assert(math.abs(mine.getX - jts.x) < 1e-9 && math.abs(mine.getY - jts.y) < 1e-9,
        s"frac $frac: (${mine.getX}, ${mine.getY}) vs JTS (${jts.x}, ${jts.y})")
    }
  }

  test("interpolate endpoints and bounds") {
    val l = line((2, 3), (8, 3))
    assert(LinearFns.interpolate(l, 0.0).getCoordinate == new Coordinate(2, 3))
    assert(LinearFns.interpolate(l, 1.0).getCoordinate == new Coordinate(8, 3))
    intercept[IllegalArgumentException](LinearFns.interpolate(l, 1.5))
  }

  test("substring preserves interior vertices and length fraction") {
    val l = line((0, 0), (4, 0), (4, 4), (8, 4))
    val sub = LinearFns.substring(l, 0.25, 0.75)
    assert(math.abs(sub.getLength - 0.5 * l.getLength) < 1e-9)
    // from (3,0) through corners (4,0),(4,4) to (5,4)
    assert(sub.getCoordinates.length == 4)
    assert(sub.getCoordinates()(0) == new Coordinate(3, 0))
    assert(sub.getCoordinates()(3) == new Coordinate(5, 4))
    // degenerate f1 == f2 yields the interpolated point
    assert(LinearFns.substring(l, 0.5, 0.5).getGeometryType == "Point")
  }

  test("locate is the inverse of interpolate for on-line points") {
    val l = line((0, 0), (3, 4), (10, 4), (10, -2))
    for (frac <- Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)) {
      val p = LinearFns.interpolate(l, frac)
      assert(math.abs(LinearFns.locate(l, p) - frac) < 1e-9, s"frac $frac")
    }
    // off-line point projects to the nearest segment; beyond-the-end clamps
    assert(LinearFns.locate(l, f.createPoint(new Coordinate(20, -2))) == 1.0)
    assert(LinearFns.locate(l, f.createPoint(new Coordinate(-5, -5))) == 0.0)
  }

  test("azimuth quadrants, cardinal directions, and null on identical points") {
    val p = (x: Double, y: Double) => f.createPoint(new Coordinate(x, y))
    assert(LinearFns.azimuth(p(0, 0), p(0, 1)) == 0.0) // north
    assert(LinearFns.azimuth(p(0, 0), p(1, 0)) == math.Pi / 2) // east
    assert(LinearFns.azimuth(p(0, 0), p(0, -1)) == math.Pi) // south
    assert(LinearFns.azimuth(p(0, 0), p(-1, 0)) == 3 * math.Pi / 2) // west
    assert(LinearFns.azimuth(p(2, 2), p(2, 2)) == null)
  }

  test("affine preserves Z/M and composes (rotate then un-rotate)") {
    assert(sql1("st_astext(st_translate(st_geomfromtext('POINT Z (1 2 9)'), 10, 20))")
      == "POINT Z (11 22 9)")
    assert(sql1("st_astext(st_affine(st_geomfromtext('LINESTRING M (0 0 5, 2 0 6)'), 0, -1, 1, 0, 0, 0))")
      == "LINESTRING M (0 0 5, 0 2 6)")
    val round = sql1(
      "st_astext(st_rotate(st_rotate(st_point(3, 4), pi() / 3), -pi() / 3))").toString
    val re = """POINT \(([-\d.eE]+) ([-\d.eE]+)\)""".r
    round match {
      case re(x, y) =>
        assert(math.abs(x.toDouble - 3) < 1e-12 && math.abs(y.toDouble - 4) < 1e-12)
      case other => fail(s"unexpected WKT: $other")
    }
  }

  test("closestpoint and project round-trip with azimuth") {
    assert(sql1("st_astext(st_closestpoint(st_geomfromtext('LINESTRING (0 0, 10 0)'), st_point(3, 7)))")
      == "POINT (3 0)")
    // project east by 5: azimuth pi/2
    val wkt = sql1("st_astext(st_project(st_point(1, 2), 5, pi() / 2))").toString
    val re = """POINT \(([-\d.eE]+) ([-\d.eE]+)\)""".r
    wkt match {
      case re(x, y) => assert(math.abs(x.toDouble - 6) < 1e-12 && math.abs(y.toDouble - 2) < 1e-12)
      case other => fail(s"unexpected WKT: $other")
    }
    // azimuth(p, project(p, d, az)) == az
    val az = sql1("st_azimuth(st_point(0, 0), st_project(st_point(0, 0), 10, 0.7))").asInstanceOf[Double]
    assert(math.abs(az - 0.7) < 1e-12)
  }

  test("SQL surface: polygon scaling scales area quadratically, substring of ring") {
    assert(sql1("st_area(st_scale(st_makeenvelope(0, 0, 2, 3), 2, 2))") == 24.0)
    assert(sql1("round(st_linelocatepoint(st_geomfromtext('LINESTRING (0 0, 10 0)'), st_point(2.5, 7)), 6)") == 0.25)
  }
}

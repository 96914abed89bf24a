package graft

import graft.geom.{Geo, GeoJson, Wkb, Wkt}
import org.locationtech.jts.geom._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: every codec round-trips arbitrary geometries exactly —
  * the ScalaCheck analogue of the reference's fuzz oracle
  * (/root/reference/test/python/rtree_fuzz.py). */
class CodecPropertiesSpec extends AnyFunSuite {

  private val f = Geo.factory

  private val ord: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1000, 1000).map(_.toDouble),
    Gen.chooseNum(-1000.0, 1000.0),
    Gen.chooseNum(-1e7, 1e7))

  private def coord(z: Boolean): Gen[Coordinate] =
    for { x <- ord; y <- ord; zv <- ord } yield
      if (z) new Coordinate(x, y, zv) else new Coordinate(x, y)

  private def point(z: Boolean): Gen[Point] = coord(z).map(f.createPoint)

  private def line(z: Boolean): Gen[LineString] =
    Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, coord(z))).map(cs => f.createLineString(cs.toArray))

  private def polygon(z: Boolean): Gen[Polygon] =
    Gen.chooseNum(3, 10).flatMap(n => Gen.listOfN(n, coord(false)))
      .map { cs =>
        // convex hull of random points is always a valid polygon
        f.createMultiPoint(cs.map(f.createPoint).toArray).convexHull() match {
          case p: Polygon => p
          case other => f.createPolygon(Array(
            new Coordinate(0, 0), new Coordinate(1, 0), new Coordinate(1, 1), new Coordinate(0, 0)))
        }
      }

  private def multi(z: Boolean): Gen[Geometry] = Gen.oneOf(
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, point(z))).map(ps => f.createMultiPoint(ps.toArray)),
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, line(z))).map(ls => f.createMultiLineString(ls.toArray)),
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, polygon(z))).map(ps => f.createMultiPolygon(ps.toArray)))

  private val geometry: Gen[Geometry] = for {
    z <- Gen.oneOf(false, false, true) // 2D-weighted
    g <- Gen.oneOf(
      point(z).map(_.asInstanceOf[Geometry]),
      line(z).map(_.asInstanceOf[Geometry]),
      polygon(z).map(_.asInstanceOf[Geometry]),
      multi(z),
      Gen.listOfN(2, Gen.oneOf(point(z).map(_.asInstanceOf[Geometry]), line(z).map(_.asInstanceOf[Geometry])))
        .map(gs => f.createGeometryCollection(gs.toArray): Geometry))
  } yield g

  /** deterministic 300-sample property loop over the geometry generator */
  private def forAllGeom(check: Geometry => Unit): Unit = {
    val params = Gen.Parameters.default
    var i = 0
    while (i < 300) {
      geometry.apply(params, org.scalacheck.rng.Seed(1000L + i)).foreach(check)
      i += 1
    }
  }

  private def sameGeom(a: Geometry, b: Geometry): Boolean = a.equalsExact(b)

  test("WKB round-trips exactly (ISO, incl. Z)") {
    forAllGeom { g =>
      val back = Geo.read(Wkb.write(g))
      assert(sameGeom(back, g), s"wkb roundtrip: ${Wkt.write(g)} -> ${Wkt.write(back)}")
    }
  }

  test("WKT round-trips exactly") {
    forAllGeom { g =>
      val back = Geo.fromWkt(Wkt.write(g))
      assert(sameGeom(back, g), s"wkt roundtrip: ${Wkt.write(g)} -> ${Wkt.write(back)}")
    }
  }

  test("GeoJSON round-trips exactly") {
    forAllGeom { g =>
      val back = GeoJson.parse(GeoJson.write(g))
      assert(sameGeom(back, g), s"geojson roundtrip: ${GeoJson.write(g)}")
    }
  }

  test("empty geometries round-trip in every codec") {
    val empties = Seq("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
      "MULTIPOINT EMPTY", "MULTILINESTRING EMPTY", "MULTIPOLYGON EMPTY",
      "GEOMETRYCOLLECTION EMPTY")
    empties.foreach { wkt =>
      val g = Geo.fromWkt(wkt)
      assert(Wkt.write(g) == wkt)
      assert(Geo.read(Wkb.write(g)).isEmpty)
      assert(GeoJson.parse(GeoJson.write(g)).isEmpty)
    }
  }

  test("string arguments act as WKT geometries in SQL (implicit cast)") {
    val spark = SparkTestSession.spark
    val r = spark.sql(
      "SELECT st_area('POLYGON ((0 0, 4 0, 4 5, 0 5, 0 0))'), " +
        "st_intersects('POINT (1 1)', st_makeenvelope(0.0d, 0.0d, 2.0d, 2.0d))").collect()(0)
    assert(r.getDouble(0) == 20.0 && r.getBoolean(1))
  }
}

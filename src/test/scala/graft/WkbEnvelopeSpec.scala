package graft

import graft.geom.{Geo, Wkb}
import org.scalatest.funsuite.AnyFunSuite

/** Direct-WKB envelope scanner (round-4: the functional analogue of the
  * reference's cached-bbox geometry header) — must agree with the JTS
  * envelope for every geometry shape, dimension form, and encoding. */
class WkbEnvelopeSpec extends AnyFunSuite {

  private val wkts = Seq(
    "POINT (3 4)", "POINT Z (1 2 3)", "POINT M (1 2 9)", "POINT ZM (1 2 3 4)",
    "POINT EMPTY",
    "LINESTRING (0 0, 5 -2, 3 7)", "LINESTRING Z (0 0 1, -4 2 2)",
    "LINESTRING EMPTY",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "POLYGON EMPTY",
    "MULTIPOINT (1 1, -5 3, 2 -8)", "MULTIPOINT EMPTY",
    "MULTILINESTRING ((0 0, 1 1), (5 5, -3 9))",
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 9 5, 9 9, 5 9, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (100 -50), LINESTRING (0 0, 1 1), POLYGON ((3 3, 4 3, 4 4, 3 3)))",
    "GEOMETRYCOLLECTION (POINT EMPTY, POINT (7 8))",
    "GEOMETRYCOLLECTION EMPTY")

  test("scanner matches the JTS envelope for every shape and dimension form") {
    wkts.foreach { w =>
      val g = Geo.fromWkt(w)
      val bytes = Wkb.write(g)
      val e = Wkb.envelope(bytes)
      if (g.isEmpty || g.getEnvelopeInternal.isNull)
        assert(e == null, s"$w -> ${java.util.Arrays.toString(e)}")
      else {
        val j = g.getEnvelopeInternal
        assert(e != null && e(0) == j.getMinX && e(1) == j.getMinY &&
          e(2) == j.getMaxX && e(3) == j.getMaxY,
          s"$w -> ${java.util.Arrays.toString(e)} vs $j")
      }
    }
  }

  test("foreign encodings: JTS big-endian and EWKB with SRID") {
    val g = Geo.fromWkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    // JTS writer, big-endian XDR
    val be = new org.locationtech.jts.io.WKBWriter(2,
      org.locationtech.jts.io.ByteOrderValues.BIG_ENDIAN).write(g)
    val e1 = Wkb.envelope(be)
    assert(e1.toSeq == Seq(0.0, 0.0, 10.0, 10.0), e1.toSeq.toString)
    // EWKB with SRID flag
    val ewkb = new org.locationtech.jts.io.WKBWriter(2, true).write {
      val c = g.copy(); c.setSRID(4326); c
    }
    val e2 = Wkb.envelope(ewkb)
    assert(e2.toSeq == Seq(0.0, 0.0, 10.0, 10.0), e2.toSeq.toString)
  }

  test("SQL envelope accessors agree with the JTS-computed values") {
    val spark = SparkTestSession.spark
    val rows = spark.sql("""
      SELECT st_xmin(g) AS x0, st_ymin(g) AS y0, st_xmax(g) AS x1, st_ymax(g) AS y1,
             st_extent(g) AS ext,
             st_intersects_extent(g, st_makeenvelope(4.0d, 4.0d, 6.0d, 6.0d)) AS hits
      FROM (SELECT st_geomfromtext('POLYGON ((1 2, 5 2, 5 8, 1 8, 1 2))') AS g)""").collect()(0)
    assert(rows.getDouble(0) == 1 && rows.getDouble(1) == 2 &&
      rows.getDouble(2) == 5 && rows.getDouble(3) == 8)
    assert(rows.getStruct(4).getDouble(0) == 1 && rows.getStruct(4).getDouble(3) == 8)
    assert(rows.getBoolean(5))
    val empty = spark.sql(
      "SELECT st_xmin(st_geomfromtext('POLYGON EMPTY')), st_extent(st_geomfromtext('LINESTRING EMPTY'))").collect()(0)
    assert(empty.isNullAt(0) && empty.isNullAt(1))
  }

  test("direct-WKB area agrees with JTS across shapes, exactly on integer coords") {
    wkts.foreach { w =>
      val g = Geo.fromWkt(w)
      val a = Wkb.area(Wkb.write(g))
      assert(a == g.getArea, s"$w: scanner $a vs JTS ${g.getArea}")
    }
    // length/perimeter scanners: bit parity with the JTS formulas
    wkts.foreach { w =>
      val g = Geo.fromWkt(w)
      val bytes = Wkb.write(g)
      def jtsLen(g0: org.locationtech.jts.geom.Geometry): Double = g0 match {
        case l: org.locationtech.jts.geom.LineString => l.getLength
        case c: org.locationtech.jts.geom.GeometryCollection =>
          (0 until c.getNumGeometries).map(i => jtsLen(c.getGeometryN(i))).sum
        case _ => 0.0
      }
      def jtsPerim(g0: org.locationtech.jts.geom.Geometry): Double = g0 match {
        case p: org.locationtech.jts.geom.Polygon => p.getLength
        case c: org.locationtech.jts.geom.GeometryCollection =>
          (0 until c.getNumGeometries).map(i => jtsPerim(c.getGeometryN(i))).sum
        case _ => 0.0
      }
      assert(Wkb.length(bytes) == jtsLen(g), s"length $w")
      assert(Wkb.perimeter(bytes) == jtsPerim(g), s"perimeter $w")
    }
    // random float-coordinate polygons: near-equality (different summation
    // anchoring can differ in the last ulp)
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val cx = rnd.nextDouble() * 1000; val cy = rnd.nextDouble() * 1000
      val n = 3 + rnd.nextInt(8)
      val pts = (0 until n).map { i =>
        val ang = 2 * math.Pi * i / n
        val r = 1 + rnd.nextDouble() * 50
        new org.locationtech.jts.geom.Coordinate(cx + r * math.cos(ang), cy + r * math.sin(ang))
      }
      val ring = (pts :+ pts.head).toArray
      val g = Geo.factory.createPolygon(ring)
      val a = Wkb.area(Wkb.write(g))
      assert(math.abs(a - g.getArea) <= 1e-9 * math.max(1.0, g.getArea),
        s"area mismatch: $a vs ${g.getArea}")
    }
  }
}

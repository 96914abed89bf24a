package graft

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, LineString, MultiPoint, Point}
import graft.functions.MeasureFns
import graft.geom.Geo

class MeasureFnsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val f: GeometryFactory = Geo.factory

  private def sql1(q: String): Any = spark.sql(s"SELECT $q").collect()(0).get(0)

  private def line(pts: (Double, Double)*): LineString =
    f.createLineString(pts.map { case (x, y) => new Coordinate(x, y) }.toArray)

  private def lineM(pts: (Double, Double, Double)*): LineString = {
    val cs = f.getCoordinateSequenceFactory.create(pts.length, 3, 1)
    pts.zipWithIndex.foreach { case ((x, y, m), i) =>
      cs.setOrdinate(i, 0, x); cs.setOrdinate(i, 1, y); cs.setOrdinate(i, 2, m)
    }
    f.createLineString(cs)
  }

  private def ms(g: Geometry): Seq[Double] = g match {
    case l: LineString => (0 until l.getNumPoints).map(l.getCoordinateSequence.getM)
    case p: Point => Seq(p.getCoordinateSequence.getM(0))
    case c => (0 until c.getNumGeometries).flatMap(i => ms(c.getGeometryN(i)))
  }

  test("addMeasure interpolates by arc length, continuing across multiline parts") {
    val l = MeasureFns.addMeasure(line((0, 0), (6, 0), (6, 8)), 0, 28).asInstanceOf[LineString]
    assert(ms(l) == Seq(0.0, 12.0, 28.0)) // lengths 6 and 8 of total 14, scaled to 28
    val ml = f.createMultiLineString(Array(line((0, 0), (4, 0)), line((10, 0), (10, 6))))
    val out = MeasureFns.addMeasure(ml, 100, 200)
    assert(ms(out) == Seq(100.0, 140.0, 140.0, 200.0)) // 4 + 6 = 10 total
    // Z is carried, M overwritten
    val withM = MeasureFns.addMeasure(lineM((0, 0, 7), (5, 0, 9)), 0, 1)
    assert(ms(withM) == Seq(0.0, 1.0))
    intercept[IllegalArgumentException](MeasureFns.addMeasure(f.createPoint(new Coordinate(1, 2)), 0, 1))
  }

  test("locateAlong finds interpolated points; offset displaces left") {
    val l = lineM((0, 0, 0), (10, 0, 100))
    val p = MeasureFns.locateAlong(l, 25, 0).asInstanceOf[MultiPoint]
    assert(p.getNumGeometries == 1)
    val pt = p.getGeometryN(0).asInstanceOf[Point]
    assert(pt.getX == 2.5 && pt.getY == 0.0 && ms(pt) == Seq(25.0))
    // left of +x direction is +y
    val po = MeasureFns.locateAlong(l, 25, 2.0).asInstanceOf[MultiPoint].getGeometryN(0).asInstanceOf[Point]
    assert(po.getX == 2.5 && po.getY == 2.0)
    // decreasing measures still span
    val dec = lineM((0, 0, 100), (10, 0, 0))
    val pd = MeasureFns.locateAlong(dec, 25, 0).asInstanceOf[MultiPoint].getGeometryN(0).asInstanceOf[Point]
    assert(pd.getX == 7.5)
    // out-of-range m yields an empty multipoint
    assert(MeasureFns.locateAlong(l, 500, 0).isEmpty)
    // no M -> loud error
    intercept[IllegalArgumentException](MeasureFns.locateAlong(line((0, 0), (1, 1)), 0.5, 0))
  }

  test("locateBetween clips segments to the measure window") {
    val l = lineM((0, 0, 0), (10, 0, 10), (10, 10, 20))
    val g = MeasureFns.locateBetween(l, 5, 15, 0)
    assert(g.getGeometryType == "MultiLineString" && g.getNumGeometries == 1)
    val part = g.getGeometryN(0).asInstanceOf[LineString]
    val cs = part.getCoordinateSequence
    assert(cs.size == 3)
    assert(cs.getX(0) == 5.0 && cs.getY(0) == 0.0 && cs.getM(0) == 5.0)
    assert(cs.getX(1) == 10.0 && cs.getY(1) == 0.0 && cs.getM(1) == 10.0)
    assert(cs.getX(2) == 10.0 && cs.getY(2) == 5.0 && cs.getM(2) == 15.0)
    // window touching a single vertex -> isolated point
    val touch = MeasureFns.locateBetween(lineM((0, 0, 0), (4, 0, 10)), 10, 12, 0)
    assert(ms(touch) == Seq(10.0))
    // a window below the measure peak splits into two disjoint parts
    val vee = lineM((0, 0, 0), (10, 0, 10), (20, 0, 0))
    val two = MeasureFns.locateBetween(vee, 2, 8, 0)
    assert(two.getNumGeometries == 2)
    // a window containing the peak stays connected through the vertex
    assert(MeasureFns.locateBetween(vee, 8, 10, 0).getNumGeometries == 1)
    // fully-inside window returns the whole line
    val whole = MeasureFns.locateBetween(l, 0, 20, 0)
    assert(whole.getGeometryN(0).asInstanceOf[LineString].getNumPoints == 3)
    intercept[IllegalArgumentException](MeasureFns.locateBetween(l, 15, 5, 0))
  }

  test("interpolatePoint returns M at the closest approach") {
    val l = lineM((0, 0, 0), (10, 0, 100))
    assert(MeasureFns.interpolatePoint(l, f.createPoint(new Coordinate(3, 5))) == 30.0)
    // beyond the end clamps to the endpoint's M
    assert(MeasureFns.interpolatePoint(l, f.createPoint(new Coordinate(15, 2))) == 100.0)
    intercept[IllegalArgumentException](
      MeasureFns.interpolatePoint(line((0, 0), (1, 0)), f.createPoint(new Coordinate(0, 0))))
  }

  test("filterByM keeps in-window vertices; scroll rotates ring start") {
    val l = lineM((0, 0, 0), (1, 0, 5), (2, 0, 10))
    val kept = MeasureFns.filterByM(l, 3, 20, returnM = false).asInstanceOf[LineString]
    assert(kept.getNumPoints == 2 && kept.getCoordinateN(0).getX == 1.0)
    assert(!kept.getCoordinateSequence.hasM) // M dropped by default
    assert(MeasureFns.filterByM(l, 3, 20, returnM = true)
      .asInstanceOf[LineString].getCoordinateSequence.hasM)
    // fewer than 2 surviving vertices -> EMPTY
    assert(MeasureFns.filterByM(l, 4, 6, returnM = false).isEmpty)
    // point filter
    assert(sql1("st_isempty(st_filterbym(st_locatealong(st_addmeasure(" +
      "st_geomfromtext('LINESTRING (0 0, 10 0)'), 0d, 100d), 25d), 50d, 99d))") == true)
    intercept[Exception](MeasureFns.filterByM(
      f.createPolygon(Array(new Coordinate(0, 0), new Coordinate(1, 0),
        new Coordinate(1, 1), new Coordinate(0, 0))), 0, 1, returnM = false))
    // scroll
    assert(sql1("st_astext(st_scroll(st_geomfromtext('LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)'), st_point(1.0d, 1.0d)))")
      .toString == "LINESTRING (1 1, 0 1, 0 0, 1 0, 1 1)")
    intercept[Exception](sql1(
      "st_scroll(st_geomfromtext('LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)'), st_point(5.0d, 5.0d))"))
    intercept[Exception](sql1(
      "st_scroll(st_geomfromtext('LINESTRING (0 0, 1 0, 1 1)'), st_point(1.0d, 0.0d))"))
  }

  test("SQL surface: addmeasure -> locatealong/between/interpolatepoint round-trip") {
    assert(sql1(
      """st_astext(st_locatealong(
           st_addmeasure(st_geomfromtext('LINESTRING (0 0, 10 0)'), 0d, 100d), 25d))""").toString
      .contains("2.5"))
    assert(sql1(
      """st_interpolatepoint(
           st_addmeasure(st_geomfromtext('LINESTRING (0 0, 10 0)'), 0d, 100d),
           st_point(3d, 5d))""") == 30.0)
    // locatebetween via SQL: count vertices of the clipped run
    assert(sql1(
      """st_npoints(st_locatebetween(
           st_addmeasure(st_geomfromtext('LINESTRING (0 0, 10 0, 10 10)'), 0d, 20d), 5d, 15d))""") == 3)
    // WKB round-trip preserves M through the locate chain
    assert(sql1(
      """st_m(st_geometryn(st_locatealong(
           st_addmeasure(st_geomfromtext('LINESTRING (0 0, 10 0)'), 0d, 100d), 25d), 1))""") == 25.0)
  }
}

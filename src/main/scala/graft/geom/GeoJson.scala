package graft.geom

import org.locationtech.jts.geom._
import scala.collection.mutable.ArrayBuffer

/**
 * GeoJSON (RFC 7946) codec — hand-rolled, zero-dependency, mirrors the
 * capability of the reference's yyjson-based implementation
 * (/root/reference/spatial/src/spatial/core/functions/scalar/st_asgeojson.cpp).
 */
object GeoJson {

  // ---------------------------------------------------------------- writer
  def write(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(128)
    writeGeom(g, sb)
    sb.toString
  }

  private def num(d: Double, sb: java.lang.StringBuilder): Unit = sb.append(Geo.jsonFmt(d))

  private def seq(cs: CoordinateSequence, sb: java.lang.StringBuilder): Unit = {
    val hasZ = cs.hasZ
    sb.append('[')
    var i = 0
    while (i < cs.size) {
      if (i > 0) sb.append(',')
      sb.append('['); num(cs.getX(i), sb); sb.append(','); num(cs.getY(i), sb)
      if (hasZ && !cs.getZ(i).isNaN) { sb.append(','); num(cs.getZ(i), sb) }
      sb.append(']')
      i += 1
    }
    sb.append(']')
  }

  private def pointCoords(p: Point, sb: java.lang.StringBuilder): Unit = {
    if (p.isEmpty) { sb.append("[]"); return }
    val cs = p.getCoordinateSequence
    sb.append('['); num(cs.getX(0), sb); sb.append(','); num(cs.getY(0), sb)
    if (cs.hasZ && !cs.getZ(0).isNaN) { sb.append(','); num(cs.getZ(0), sb) }
    sb.append(']')
  }

  private def polyCoords(p: Polygon, sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    if (!p.isEmpty) {
      seq(p.getExteriorRing.getCoordinateSequence, sb)
      var i = 0
      while (i < p.getNumInteriorRing) {
        sb.append(','); seq(p.getInteriorRingN(i).getCoordinateSequence, sb); i += 1
      }
    }
    sb.append(']')
  }

  private def writeGeom(g: Geometry, sb: java.lang.StringBuilder): Unit = g match {
    case p: Point =>
      sb.append("{\"type\":\"Point\",\"coordinates\":"); pointCoords(p, sb); sb.append('}')
    case l: LineString =>
      sb.append("{\"type\":\"LineString\",\"coordinates\":")
      if (l.isEmpty) sb.append("[]") else seq(l.getCoordinateSequence, sb)
      sb.append('}')
    case p: Polygon =>
      sb.append("{\"type\":\"Polygon\",\"coordinates\":"); polyCoords(p, sb); sb.append('}')
    case m: MultiPoint =>
      sb.append("{\"type\":\"MultiPoint\",\"coordinates\":[")
      var i = 0
      while (i < m.getNumGeometries) {
        if (i > 0) sb.append(','); pointCoords(m.getGeometryN(i).asInstanceOf[Point], sb); i += 1
      }
      sb.append("]}")
    case m: MultiLineString =>
      sb.append("{\"type\":\"MultiLineString\",\"coordinates\":[")
      var i = 0
      while (i < m.getNumGeometries) {
        if (i > 0) sb.append(',')
        seq(m.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence, sb); i += 1
      }
      sb.append("]}")
    case m: MultiPolygon =>
      sb.append("{\"type\":\"MultiPolygon\",\"coordinates\":[")
      var i = 0
      while (i < m.getNumGeometries) {
        if (i > 0) sb.append(','); polyCoords(m.getGeometryN(i).asInstanceOf[Polygon], sb); i += 1
      }
      sb.append("]}")
    case c: GeometryCollection =>
      sb.append("{\"type\":\"GeometryCollection\",\"geometries\":[")
      var i = 0
      while (i < c.getNumGeometries) {
        if (i > 0) sb.append(','); writeGeom(c.getGeometryN(i), sb); i += 1
      }
      sb.append("]}")
  }

  // ---------------------------------------------------------------- reader
  def parse(s: String): Geometry = {
    val p = new P(s)
    p.ws()
    val g = p.geometry()
    g
  }

  /** Minimal recursive-descent parser for the GeoJSON geometry subset. */
  private final class P(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    private def fail(m: String) = throw new IllegalArgumentException(s"Invalid GeoJSON at offset $i: $m")

    private def string(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'u' if i + 5 < s.length =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case other => sb.append(other); i += 2
          }
        } else { sb.append(c); i += 1 }
      }
      expect('"')
      sb.toString
    }

    private def number(): Double = {
      ws()
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == start) fail("expected number")
      java.lang.Double.parseDouble(s.substring(start, i))
    }

    private def peek(): Char = { ws(); if (i < s.length) s.charAt(i) else '\u0000' }

    private def position(): Array[Double] = {
      expect('[')
      val buf = new ArrayBuffer[Double](4)
      if (peek() != ']') {
        buf += number()
        while (peek() == ',') { i += 1; buf += number() }
      }
      expect(']')
      buf.toArray
    }

    // parse a JSON array of depth `d` positions
    private def positions1(): Array[Array[Double]] = {
      expect('[')
      val buf = new ArrayBuffer[Array[Double]]()
      if (peek() != ']') {
        buf += position()
        while (peek() == ',') { i += 1; buf += position() }
      }
      expect(']')
      buf.toArray
    }

    private def positions2(): Array[Array[Array[Double]]] = {
      expect('[')
      val buf = new ArrayBuffer[Array[Array[Double]]]()
      if (peek() != ']') {
        buf += positions1()
        while (peek() == ',') { i += 1; buf += positions1() }
      }
      expect(']')
      buf.toArray
    }

    private def positions3(): Array[Array[Array[Array[Double]]]] = {
      expect('[')
      val buf = new ArrayBuffer[Array[Array[Array[Double]]]]()
      if (peek() != ']') {
        buf += positions2()
        while (peek() == ',') { i += 1; buf += positions2() }
      }
      expect(']')
      buf.toArray
    }

    private def skipValue(): Unit = {
      ws()
      peek() match {
        case '{' =>
          expect('{')
          if (peek() != '}') {
            string(); expect(':'); skipValue()
            while (peek() == ',') { i += 1; ws(); string(); expect(':'); skipValue() }
          }
          expect('}')
        case '[' =>
          expect('[')
          if (peek() != ']') {
            skipValue()
            while (peek() == ',') { i += 1; skipValue() }
          }
          expect(']')
        case '"' => string()
        case _ =>
          val start = i
          while (i < s.length && ",]}".indexOf(s.charAt(i)) < 0) i += 1
          if (i == start) fail("expected value")
      }
    }

    def geometry(): Geometry = {
      expect('{')
      var typ: String = null
      var coordsStart = -1
      var geoms: Array[Geometry] = null
      var done = false
      while (!done) {
        val key = string()
        expect(':')
        key match {
          case "type" => typ = string()
          case "coordinates" => ws(); coordsStart = i; skipValue()
          case "geometries" =>
            expect('[')
            val buf = new ArrayBuffer[Geometry]()
            if (peek() != ']') {
              buf += geometry()
              while (peek() == ',') { i += 1; buf += geometry() }
            }
            expect(']')
            geoms = buf.toArray
          case _ => skipValue()
        }
        if (peek() == ',') i += 1 else done = true
      }
      expect('}')
      if (typ == null) fail("missing type")
      val f = Geo.factory
      def coordP(): P = {
        if (coordsStart < 0) fail("missing coordinates")
        val p = new P(s); p.i = coordsStart; p
      }
      def toCoord(a: Array[Double]): Coordinate =
        if (a.length >= 3) new Coordinate(a(0), a(1), a(2)) else new Coordinate(a(0), a(1))
      def line(a: Array[Array[Double]]): LineString = f.createLineString(a.map(toCoord))
      def ring(a: Array[Array[Double]]): LinearRing = f.createLinearRing(a.map(toCoord))
      def poly(a: Array[Array[Array[Double]]]): Polygon =
        if (a.isEmpty) f.createPolygon() else f.createPolygon(ring(a.head), a.tail.map(ring))
      typ match {
        case "Point" =>
          val a = coordP().position()
          if (a.isEmpty) f.createPoint() else f.createPoint(toCoord(a))
        case "LineString" => line(coordP().positions1())
        case "Polygon" => poly(coordP().positions2())
        case "MultiPoint" =>
          f.createMultiPoint(coordP().positions1().map(a => f.createPoint(toCoord(a))))
        case "MultiLineString" => f.createMultiLineString(coordP().positions2().map(line))
        case "MultiPolygon" => f.createMultiPolygon(coordP().positions3().map(poly))
        case "GeometryCollection" =>
          f.createGeometryCollection(if (geoms == null) Array.empty[Geometry] else geoms)
        case other => fail(s"unknown geometry type $other")
      }
    }
  }
}

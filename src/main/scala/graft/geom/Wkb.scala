package graft.geom

import org.locationtech.jts.geom._
import java.nio.{ByteBuffer, ByteOrder}

/**
 * ISO WKB writer (little-endian). ISO encodes dimensionality in the type code
 * (`base + 1000*Z + 2000*M`), unlike JTS's WKBWriter which emits EWKB-style
 * high-bit flags — ISO is what GeoParquet/DuckDB expect on the wire.
 * (Reference writer: /root/reference/spatial/src/spatial/core/geometry/wkb_writer.cpp.)
 *
 * POINT EMPTY is written as a point with NaN ordinates (the de-facto ISO
 * convention; JTS's reader maps it back to an empty point).
 */
object Wkb {

  def write(g: Geometry): Array[Byte] = {
    val hasZ = Geo.geomHasZ(g)
    val hasM = Geo.geomHasM(g)
    val dim = 2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)
    val buf = ByteBuffer.allocate(size(g, dim)).order(ByteOrder.LITTLE_ENDIAN)
    put(g, buf, hasZ, hasM)
    buf.array()
  }

  /** Fast path: a 2D point straight from doubles, no JTS objects. */
  def writePointXY(x: Double, y: Double): Array[Byte] = {
    val buf = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    buf.array()
  }

  private def baseType(g: Geometry): Int = g match {
    case _: Point              => 1
    case _: LinearRing         => 2
    case _: LineString         => 2
    case _: Polygon            => 3
    case _: MultiPoint         => 4
    case _: MultiLineString    => 5
    case _: MultiPolygon       => 6
    case _: GeometryCollection => 7
  }

  private def size(g: Geometry, dim: Int): Int = {
    val w = dim * 8
    g match {
      case p: Point      => 5 + w
      case l: LineString => 9 + l.getNumPoints * w
      case p: Polygon =>
        var s = 9
        s += 4 + p.getExteriorRing.getNumPoints * w
        var i = 0
        while (i < p.getNumInteriorRing) { s += 4 + p.getInteriorRingN(i).getNumPoints * w; i += 1 }
        s
      case c: GeometryCollection =>
        var s = 9; var i = 0
        while (i < c.getNumGeometries) { s += size(c.getGeometryN(i), dim); i += 1 }
        s
    }
  }

  private def putCoords(cs: CoordinateSequence, buf: ByteBuffer, hasZ: Boolean, hasM: Boolean): Unit = {
    var i = 0
    while (i < cs.size) {
      buf.putDouble(cs.getX(i)).putDouble(cs.getY(i))
      if (hasZ) buf.putDouble(if (cs.hasZ) cs.getZ(i) else Double.NaN)
      if (hasM) buf.putDouble(if (cs.hasM) cs.getM(i) else Double.NaN)
      i += 1
    }
  }

  private def put(g: Geometry, buf: ByteBuffer, hasZ: Boolean, hasM: Boolean): Unit = {
    buf.put(1.toByte) // little-endian marker
    val code = baseType(g) + (if (hasZ) 1000 else 0) + (if (hasM) 2000 else 0)
    buf.putInt(code)
    g match {
      case p: Point =>
        if (p.isEmpty) {
          buf.putDouble(Double.NaN).putDouble(Double.NaN)
          if (hasZ) buf.putDouble(Double.NaN)
          if (hasM) buf.putDouble(Double.NaN)
        } else putCoords(p.getCoordinateSequence, buf, hasZ, hasM)
      case l: LineString =>
        buf.putInt(l.getNumPoints)
        putCoords(l.getCoordinateSequence, buf, hasZ, hasM)
      case p: Polygon =>
        if (p.isEmpty) buf.putInt(0)
        else {
          buf.putInt(1 + p.getNumInteriorRing)
          val sh = p.getExteriorRing.getCoordinateSequence
          buf.putInt(sh.size); putCoords(sh, buf, hasZ, hasM)
          var i = 0
          while (i < p.getNumInteriorRing) {
            val r = p.getInteriorRingN(i).getCoordinateSequence
            buf.putInt(r.size); putCoords(r, buf, hasZ, hasM)
            i += 1
          }
        }
      case c: GeometryCollection =>
        buf.putInt(c.getNumGeometries)
        var i = 0
        while (i < c.getNumGeometries) { put(c.getGeometryN(i), buf, hasZ, hasM); i += 1 }
    }
  }
}

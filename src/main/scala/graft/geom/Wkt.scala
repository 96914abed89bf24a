package graft.geom

import org.locationtech.jts.geom._

/**
 * WKT writer with DuckDB-spatial-compatible formatting
 * (reference renderer: /root/reference/spatial/src/spatial/core/functions/cast/varchar_cast.cpp:370-385):
 * integral coordinates print without a trailing ".0", empties render as
 * `POINT EMPTY`, dimensioned geometries as `POINT Z (…)` etc. Z/M presence is
 * detected by non-NaN ordinates (JTS coordinate arrays always carry a z slot).
 */
object Wkt {

  def write(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(64)
    writeGeom(g, sb, Geo.geomHasZ(g), Geo.geomHasM(g))
    sb.toString
  }

  private def tag(hasZ: Boolean, hasM: Boolean): String =
    if (hasZ && hasM) " ZM" else if (hasZ) " Z" else if (hasM) " M" else ""

  private def writeGeom(g: Geometry, sb: java.lang.StringBuilder, hz: Boolean, hm: Boolean): Unit = {
    g match {
      case p: Point =>
        sb.append("POINT").append(tag(hz, hm))
        if (p.isEmpty) sb.append(" EMPTY") else { sb.append(" ("); coords(p.getCoordinateSequence, sb, hz, hm); sb.append(')') }
      case l: LineString =>
        sb.append("LINESTRING").append(tag(hz, hm))
        if (l.isEmpty) sb.append(" EMPTY") else { sb.append(" ("); coords(l.getCoordinateSequence, sb, hz, hm); sb.append(')') }
      case p: Polygon =>
        sb.append("POLYGON").append(tag(hz, hm))
        if (p.isEmpty) sb.append(" EMPTY") else { sb.append(' '); polyBody(p, sb, hz, hm) }
      case m: MultiPoint =>
        sb.append("MULTIPOINT").append(tag(hz, hm))
        // member-wise rendering: MULTIPOINT (EMPTY) keeps its empty member
        // (reference st_multi.test golden); only zero members → EMPTY
        if (m.getNumGeometries == 0) sb.append(" EMPTY") else {
          // Typed-collection members render bare (no inner parens) to match the
          // reference renderer: varchar_cast.cpp ProcessPoint with
          // in_typed_collection=true → `MULTIPOINT (1 1, 2 2)`.
          sb.append(" (")
          var i = 0
          while (i < m.getNumGeometries) {
            if (i > 0) sb.append(", ")
            val pt = m.getGeometryN(i).asInstanceOf[Point]
            if (pt.isEmpty) sb.append("EMPTY") else coords(pt.getCoordinateSequence, sb, hz, hm)
            i += 1
          }
          sb.append(')')
        }
      case m: MultiLineString =>
        sb.append("MULTILINESTRING").append(tag(hz, hm))
        if (m.isEmpty) sb.append(" EMPTY") else {
          sb.append(" (")
          var i = 0
          while (i < m.getNumGeometries) {
            if (i > 0) sb.append(", ")
            sb.append('('); coords(m.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence, sb, hz, hm); sb.append(')')
            i += 1
          }
          sb.append(')')
        }
      case m: MultiPolygon =>
        sb.append("MULTIPOLYGON").append(tag(hz, hm))
        if (m.isEmpty) sb.append(" EMPTY") else {
          sb.append(" (")
          var i = 0
          while (i < m.getNumGeometries) {
            if (i > 0) sb.append(", ")
            polyBody(m.getGeometryN(i).asInstanceOf[Polygon], sb, hz, hm)
            i += 1
          }
          sb.append(')')
        }
      case c: GeometryCollection =>
        sb.append("GEOMETRYCOLLECTION").append(tag(hz, hm))
        if (c.getNumGeometries == 0) sb.append(" EMPTY") else {
          sb.append(" (")
          var i = 0
          while (i < c.getNumGeometries) {
            if (i > 0) sb.append(", ")
            val child = c.getGeometryN(i)
            writeGeom(child, sb, Geo.geomHasZ(child), Geo.geomHasM(child))
            i += 1
          }
          sb.append(')')
        }
    }
  }

  private def polyBody(p: Polygon, sb: java.lang.StringBuilder, hz: Boolean, hm: Boolean): Unit = {
    sb.append('(')
    sb.append('('); coords(p.getExteriorRing.getCoordinateSequence, sb, hz, hm); sb.append(')')
    var i = 0
    while (i < p.getNumInteriorRing) {
      sb.append(", (")
      coords(p.getInteriorRingN(i).getCoordinateSequence, sb, hz, hm)
      sb.append(')')
      i += 1
    }
    sb.append(')')
  }

  private def coords(seq: CoordinateSequence, sb: java.lang.StringBuilder, hz: Boolean, hm: Boolean): Unit = {
    var i = 0
    while (i < seq.size) {
      if (i > 0) sb.append(", ")
      sb.append(Geo.fmt(seq.getX(i))).append(' ').append(Geo.fmt(seq.getY(i)))
      if (hz) sb.append(' ').append(Geo.fmt(if (seq.hasZ) seq.getZ(i) else Double.NaN))
      if (hm) sb.append(' ').append(Geo.fmt(if (seq.hasM) seq.getM(i) else Double.NaN))
      i += 1
    }
  }
}

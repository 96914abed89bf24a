package graft.geom

import org.locationtech.jts.geom._

/**
 * WKT writer with DuckDB-spatial-compatible formatting
 * (reference renderer: /root/reference/spatial/src/spatial/core/functions/cast/varchar_cast.cpp:370-385):
 * integral coordinates print without a trailing ".0", empties render as
 * `POINT EMPTY`, dimensioned geometries as `POINT Z (…)` etc.
 */
object Wkt {

  def write(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(64)
    writeGeom(g, sb)
    sb.toString
  }

  private def dimTag(g: Geometry): String = {
    var hasZ = false; var hasM = false
    g.apply(new CoordinateSequenceFilter {
      private var d = false
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        if (seq.hasZ) hasZ = true; if (seq.hasM) hasM = true; d = true
      }
      override def isDone: Boolean = d
      override def isGeometryChanged: Boolean = false
    })
    if (hasZ && hasM) " ZM" else if (hasZ) " Z" else if (hasM) " M" else ""
  }

  private def writeGeom(g: Geometry, sb: java.lang.StringBuilder): Unit = {
    val tag = dimTag(g)
    g match {
      case p: Point =>
        sb.append("POINT").append(tag)
        if (p.isEmpty) sb.append(" EMPTY") else { sb.append(" ("); coords(p.getCoordinateSequence, sb); sb.append(')') }
      case l: LineString =>
        sb.append("LINESTRING").append(tag)
        if (l.isEmpty) sb.append(" EMPTY") else { sb.append(" ("); coords(l.getCoordinateSequence, sb); sb.append(')') }
      case p: Polygon =>
        sb.append("POLYGON").append(tag)
        if (p.isEmpty) sb.append(" EMPTY") else { sb.append(' '); polyBody(p, sb) }
      case m: MultiPoint =>
        sb.append("MULTIPOINT").append(tag)
        if (m.isEmpty) sb.append(" EMPTY") else {
          sb.append(" (")
          var i = 0
          while (i < m.getNumGeometries) {
            if (i > 0) sb.append(", ")
            val pt = m.getGeometryN(i).asInstanceOf[Point]
            if (pt.isEmpty) sb.append("EMPTY") else { sb.append('('); coords(pt.getCoordinateSequence, sb); sb.append(')') }
            i += 1
          }
          sb.append(')')
        }
      case m: MultiLineString =>
        sb.append("MULTILINESTRING").append(tag)
        if (m.isEmpty) sb.append(" EMPTY") else {
          sb.append(" (")
          var i = 0
          while (i < m.getNumGeometries) {
            if (i > 0) sb.append(", ")
            sb.append('('); coords(m.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence, sb); sb.append(')')
            i += 1
          }
          sb.append(')')
        }
      case m: MultiPolygon =>
        sb.append("MULTIPOLYGON").append(tag)
        if (m.isEmpty) sb.append(" EMPTY") else {
          sb.append(" (")
          var i = 0
          while (i < m.getNumGeometries) {
            if (i > 0) sb.append(", ")
            polyBody(m.getGeometryN(i).asInstanceOf[Polygon], sb)
            i += 1
          }
          sb.append(')')
        }
      case c: GeometryCollection =>
        sb.append("GEOMETRYCOLLECTION").append(tag)
        if (c.isEmpty) sb.append(" EMPTY") else {
          sb.append(" (")
          var i = 0
          while (i < c.getNumGeometries) {
            if (i > 0) sb.append(", ")
            writeGeom(c.getGeometryN(i), sb)
            i += 1
          }
          sb.append(')')
        }
    }
  }

  private def polyBody(p: Polygon, sb: java.lang.StringBuilder): Unit = {
    sb.append('(')
    sb.append('('); coords(p.getExteriorRing.getCoordinateSequence, sb); sb.append(')')
    var i = 0
    while (i < p.getNumInteriorRing) {
      sb.append(", (")
      coords(p.getInteriorRingN(i).getCoordinateSequence, sb)
      sb.append(')')
      i += 1
    }
    sb.append(')')
  }

  private def coords(seq: CoordinateSequence, sb: java.lang.StringBuilder): Unit = {
    val hasZ = seq.hasZ; val hasM = seq.hasM
    var i = 0
    while (i < seq.size) {
      if (i > 0) sb.append(", ")
      sb.append(Geo.fmt(seq.getX(i))).append(' ').append(Geo.fmt(seq.getY(i)))
      if (hasZ) sb.append(' ').append(Geo.fmt(seq.getZ(i)))
      if (hasM) sb.append(' ').append(Geo.fmt(seq.getM(i)))
      i += 1
    }
  }
}

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

  /** Envelope straight off the WKB bytes — no JTS object construction (the
   *  functional analogue of the reference's cached-bbox geometry header,
   *  geometry_type.hpp:100-146). Accepts ISO (dim in type code) and EWKB
   *  (flag bits + optional SRID), both endiannesses. Returns
   *  [minX, minY, maxX, maxY], or null for empty geometries; throws on
   *  malformed bytes (callers fall back to the JTS reader). */
  def envelope(b: Array[Byte]): Array[Double] = {
    val env = Array(Double.PositiveInfinity, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity)
    scanEnv(ByteBuffer.wrap(b), env)
    if (env(0) > env(2)) null else env
  }

  /** Direct-WKB planar area — shoelace per ring, shell minus holes per
   *  polygon (JTS Polygon.getArea semantics), summed over multis and nested
   *  collections; points/lines contribute 0. Throws on malformed bytes —
   *  callers fall back to the JTS path. */
  def area(b: Array[Byte]): Double = scanArea(ByteBuffer.wrap(b))

  private def scanArea(buf: ByteBuffer): Double = {
    buf.order(if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    var t = buf.getInt()
    var hasZ = (t & 0x80000000) != 0
    var hasM = (t & 0x40000000) != 0
    val hasSrid = (t & 0x20000000) != 0
    t &= 0x0fffffff
    if (hasSrid) buf.getInt()
    if (t >= 3000) { hasZ = true; hasM = true; t -= 3000 }
    else if (t >= 2000) { hasM = true; t -= 2000 }
    else if (t >= 1000) { hasZ = true; t -= 1000 }
    val skip = (if (hasZ) 8 else 0) + (if (hasM) 8 else 0)
    def skipCoords(n: Int): Unit = buf.position(buf.position() + n * (16 + skip))
    def ringArea(): Double = {
      val n = buf.getInt()
      if (n < 3) { skipCoords(n); return 0.0 }
      // shoelace anchored at the first vertex for numerical stability
      val x0 = buf.getDouble(); val y0 = buf.getDouble()
      if (skip > 0) buf.position(buf.position() + skip)
      var sum = 0.0
      var px = 0.0; var py = 0.0
      var i = 1
      while (i < n) {
        val x = buf.getDouble() - x0; val y = buf.getDouble() - y0
        if (skip > 0) buf.position(buf.position() + skip)
        if (i > 1) sum += px * y - x * py
        px = x; py = y
        i += 1
      }
      math.abs(sum) / 2.0
    }
    t match {
      case 1 => skipCoords(1); 0.0
      case 2 => skipCoords(buf.getInt()); 0.0
      case 3 =>
        var rings = buf.getInt()
        var a = 0.0
        var first = true
        while (rings > 0) {
          val r = ringArea()
          a += (if (first) r else -r)
          first = false
          rings -= 1
        }
        a
      case 4 | 5 | 6 | 7 => // members carry their own WKB headers
        var n = buf.getInt()
        var acc = 0.0
        while (n > 0) {
          val o = buf.order()
          acc += scanArea(buf)
          buf.order(o)
          n -= 1
        }
        acc
      case other => throw new IllegalArgumentException(s"WKB area: unknown type $other")
    }
  }

  /** Direct-WKB path length of LineString components (polygons excluded —
   *  reference ST_Length semantics). Throws on malformed bytes. */
  def length(b: Array[Byte]): Double = scanLen(ByteBuffer.wrap(b), forPerimeter = false)

  /** Direct-WKB ring-length sum of Polygon components (reference
   *  ST_Perimeter semantics). Throws on malformed bytes. */
  def perimeter(b: Array[Byte]): Double = scanLen(ByteBuffer.wrap(b), forPerimeter = true)

  private def scanLen(buf: ByteBuffer, forPerimeter: Boolean): Double = {
    buf.order(if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    var t = buf.getInt()
    var hasZ = (t & 0x80000000) != 0
    var hasM = (t & 0x40000000) != 0
    val hasSrid = (t & 0x20000000) != 0
    t &= 0x0fffffff
    if (hasSrid) buf.getInt()
    if (t >= 3000) { hasZ = true; hasM = true; t -= 3000 }
    else if (t >= 2000) { hasM = true; t -= 2000 }
    else if (t >= 1000) { hasZ = true; t -= 1000 }
    val skip = (if (hasZ) 8 else 0) + (if (hasM) 8 else 0)
    def skipCoords(n: Int): Unit = buf.position(buf.position() + n * (16 + skip))
    // Math.sqrt like JTS Length.ofLine, for bit parity with the JTS path
    def pathLen(): Double = {
      val n = buf.getInt()
      if (n == 0) return 0.0
      var px = buf.getDouble(); var py = buf.getDouble()
      if (skip > 0) buf.position(buf.position() + skip)
      var s = 0.0
      var i = 1
      while (i < n) {
        val x = buf.getDouble(); val y = buf.getDouble()
        if (skip > 0) buf.position(buf.position() + skip)
        val dx = x - px; val dy = y - py
        s += math.sqrt(dx * dx + dy * dy)
        px = x; py = y
        i += 1
      }
      s
    }
    def skipPath(): Unit = skipCoords(buf.getInt())
    t match {
      case 1 => skipCoords(1); 0.0
      case 2 => if (forPerimeter) { skipPath(); 0.0 } else pathLen()
      case 3 =>
        var rings = buf.getInt()
        var s = 0.0
        while (rings > 0) {
          if (forPerimeter) s += pathLen() else skipPath()
          rings -= 1
        }
        s
      case 4 | 5 | 6 | 7 =>
        var n = buf.getInt()
        var acc = 0.0
        while (n > 0) {
          val o = buf.order()
          acc += scanLen(buf, forPerimeter)
          buf.order(o)
          n -= 1
        }
        acc
      case other => throw new IllegalArgumentException(s"WKB length: unknown type $other")
    }
  }

  private def scanEnv(buf: ByteBuffer, env: Array[Double]): Unit = {
    buf.order(if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    var t = buf.getInt()
    // EWKB flag bits
    var hasZ = (t & 0x80000000) != 0
    var hasM = (t & 0x40000000) != 0
    val hasSrid = (t & 0x20000000) != 0
    t &= 0x0fffffff
    if (hasSrid) buf.getInt()
    // ISO dimension encoding
    if (t >= 3000) { hasZ = true; hasM = true; t -= 3000 }
    else if (t >= 2000) { hasM = true; t -= 2000 }
    else if (t >= 1000) { hasZ = true; t -= 1000 }
    val skip = (if (hasZ) 8 else 0) + (if (hasM) 8 else 0)
    def coord(): Unit = {
      val x = buf.getDouble(); val y = buf.getDouble()
      if (skip > 0) buf.position(buf.position() + skip)
      if (!x.isNaN && !y.isNaN) {
        if (x < env(0)) env(0) = x
        if (y < env(1)) env(1) = y
        if (x > env(2)) env(2) = x
        if (y > env(3)) env(3) = y
      }
    }
    t match {
      case 1 => coord()
      case 2 =>
        var n = buf.getInt(); while (n > 0) { coord(); n -= 1 }
      case 3 =>
        var rings = buf.getInt()
        while (rings > 0) {
          var n = buf.getInt(); while (n > 0) { coord(); n -= 1 }
          rings -= 1
        }
      case 4 | 5 | 6 | 7 =>
        var n = buf.getInt()
        while (n > 0) {
          val saved = buf.order()
          scanEnv(buf, env)
          buf.order(saved)
          n -= 1
        }
      case other => throw new IllegalArgumentException(s"WKB envelope: unknown type $other")
    }
  }
}

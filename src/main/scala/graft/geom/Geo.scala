package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.{ByteOrderValues, Ordinate, WKBReader, WKBWriter, WKTReader}
import java.util.EnumSet

/**
 * Geometry codec + per-thread caches.
 *
 * The engine's `GEOMETRY` column type is standard little-endian (E)WKB bytes in a
 * Spark `BinaryType` column (reference models it as a custom blob over BLOB,
 * `/root/reference/spatial/src/spatial/core/geometry/geometry_serialization.cpp:13-37`;
 * we use ISO WKB so the bytes are directly interoperable with GeoParquet/PostGIS).
 *
 * Per-call deserialization cost is mitigated the same way the reference mitigates
 * GEOS conversion (per-thread arenas + prepared geometries for constant args,
 * `/root/reference/spatial/src/spatial/geos/geos_executor.hpp:28-31`): a per-thread
 * last-value cache keyed on byte-array *reference* identity. Catalyst literals hand
 * the same Array[Byte] instance to every row, so a constant argument hits the cache
 * on every call after the first.
 */
object Geo {

  val factory = new GeometryFactory(new PrecisionModel(PrecisionModel.FLOATING), 0)

  private final class Caches {
    val reader = new WKBReader(factory)
    val wktReader = new WKTReader(factory)
    // two-slot reference-identity memo (binary predicates have two args)
    var k0: AnyRef = _; var v0: Geometry = _
    var k1: AnyRef = _; var v1: Geometry = _
    var pk: AnyRef = _; var pv: PreparedGeometry = _
  }
  private val tl = ThreadLocal.withInitial[Caches](() => new Caches)

  def read(wkb: Array[Byte]): Geometry = {
    val c = tl.get()
    if (wkb eq c.k0) return c.v0
    if (wkb eq c.k1) return c.v1
    val g = c.reader.read(wkb)
    c.k1 = c.k0; c.v1 = c.v0
    c.k0 = wkb; c.v0 = g
    g
  }

  /** PreparedGeometry for repeated predicate evaluation against a constant side. */
  def prepared(wkb: Array[Byte]): PreparedGeometry = {
    val c = tl.get()
    if (wkb eq c.pk) return c.pv
    val p = PreparedGeometryFactory.prepare(read(wkb))
    c.pk = wkb; c.pv = p
    p
  }

  private def ordinatesOf(g: Geometry): (Int, Boolean, Boolean) = {
    var hasZ = false; var hasM = false
    g.apply(new CoordinateSequenceFilter {
      private var d = false
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        if (seq.hasZ) hasZ = true
        if (seq.hasM) hasM = true
        d = true
      }
      override def isDone: Boolean = d
      override def isGeometryChanged: Boolean = false
    })
    val dim = 2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)
    (dim, hasZ, hasM)
  }

  def write(g: Geometry): Array[Byte] = {
    val (dim, hasZ, hasM) = ordinatesOf(g)
    val w = new WKBWriter(dim, ByteOrderValues.LITTLE_ENDIAN, false)
    if (dim > 2) {
      val ords = EnumSet.of(Ordinate.X, Ordinate.Y)
      if (hasZ) ords.add(Ordinate.Z)
      if (hasM) ords.add(Ordinate.M)
      w.setOutputOrdinates(ords)
    }
    w.write(g)
  }

  def fromWkt(wkt: String): Geometry = tl.get().wktReader.read(wkt)

  def point(x: Double, y: Double): Geometry =
    factory.createPoint(new Coordinate(x, y))

  def box(minX: Double, minY: Double, maxX: Double, maxY: Double): Geometry = {
    val cs = Array(
      new Coordinate(minX, minY), new Coordinate(maxX, minY),
      new Coordinate(maxX, maxY), new Coordinate(minX, maxY),
      new Coordinate(minX, minY))
    factory.createPolygon(cs)
  }

  /** Format a double the way DuckDB renders WKT coordinates: integral values
   *  print without a decimal part. */
  def fmt(d: Double): String = {
    if (d == Math.rint(d) && !d.isInfinite && Math.abs(d) < 1e15) {
      String.valueOf(d.toLong)
    } else String.valueOf(d)
  }
}

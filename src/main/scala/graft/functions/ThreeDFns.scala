package graft.functions

import graft.geom.{Geo, Wkb}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.GeometryEditor
import org.locationtech.jts.operation.distance3d.Distance3DOp

/**
 * 3D measures + coordinate-editing utilities — PostGIS parity the reference
 * lacks (its measures are planar-only). All row-local kernels.
 *
 *  - ST_3DDistance: minimum euclidean XYZ distance (JTS Distance3DOp;
 *    missing Z treated as 0, PostGIS behavior).
 *  - ST_3DLength / ST_3DPerimeter: arc length / ring perimeter summed with
 *    the Z deltas included; Z-less input degrades to the 2D value.
 *  - ST_ShiftLongitude: x < 0 -> x + 360 (the -180..180 <-> 0..360 toggle).
 *  - ST_SwapOrdinates(geom, 'xy'|'xz'|'xm'|'yz'|'ym'|'zm'): exchanges the
 *    named ordinate pair; referencing Z or M the geometry lacks is a loud
 *    error (PostGIS lwgeom_swap_ordinates).
 */
object ThreeDFns {

  private val B = BinaryType
  private val D = DoubleType
  private val S = StringType

  private def fn(name: String, out: DataType, in: Seq[DataType]*)(eval: Array[Any] => Any): Unit =
    FnRegistry.add(FnSpec(name, in.map(s => s.length -> s).toMap, out, _ => eval))

  private def rg(a: Any): Geometry = a match {
    case b: Array[Byte] => Geo.read(b)
    case g: Geometry => g
  }
  private def w(g: Geometry): Array[Byte] = Wkb.write(g)
  private def dbl(a: Any): Double = a.asInstanceOf[Double]
  private val f: GeometryFactory = Geo.factory

  private def z(cs: CoordinateSequence, i: Int): Double = {
    if (!cs.hasZ) return 0.0
    val v = cs.getZ(i)
    if (java.lang.Double.isNaN(v)) 0.0 else v
  }

  private def length3(cs: CoordinateSequence): Double = {
    var total = 0.0
    var i = 0
    while (i < cs.size - 1) {
      val dx = cs.getX(i + 1) - cs.getX(i)
      val dy = cs.getY(i + 1) - cs.getY(i)
      val dz = z(cs, i + 1) - z(cs, i)
      total += math.sqrt(dx * dx + dy * dy + dz * dz)
      i += 1
    }
    total
  }

  /** Sum of 3D lengths of every linear component. */
  def length3d(g: Geometry): Double = g match {
    case l: LineString => length3(l.getCoordinateSequence)
    case c: GeometryCollection =>
      var t = 0.0
      (0 until c.getNumGeometries).foreach(i => t += length3d(c.getGeometryN(i)))
      t
    case _ => 0.0 // points and polygons have zero length (PostGIS)
  }

  /** Sum of 3D ring perimeters of every polygonal component. */
  def perimeter3d(g: Geometry): Double = g match {
    case p: Polygon =>
      var t = length3(p.getExteriorRing.getCoordinateSequence)
      (0 until p.getNumInteriorRing).foreach(i => t += length3(p.getInteriorRingN(i).getCoordinateSequence))
      t
    case c: GeometryCollection =>
      var t = 0.0
      (0 until c.getNumGeometries).foreach(i => t += perimeter3d(c.getGeometryN(i)))
      t
    case _ => 0.0
  }

  /** Swap the named ordinate pair; loud when the geometry lacks one. */
  def swapOrdinates(g: Geometry, spec: String): Geometry = {
    val s = spec.toLowerCase
    if (s.length != 2 || s.exists(c => "xyzm".indexOf(c) < 0) || s(0) == s(1))
      throw new IllegalArgumentException(
        s"ST_SwapOrdinates: spec must name two distinct ordinates from x,y,z,m — got '$spec'")
    val ed = new GeometryEditor(f)
    ed.edit(g, new GeometryEditor.CoordinateSequenceOperation {
      override def edit(cs: CoordinateSequence, geom: Geometry): CoordinateSequence = {
        def idx(c: Char): Int = c match {
          case 'x' => 0
          case 'y' => 1
          case 'z' =>
            if (!cs.hasZ) throw new IllegalArgumentException(
              "ST_SwapOrdinates: geometry has no Z ordinate")
            2
          case 'm' =>
            if (!cs.hasM) throw new IllegalArgumentException(
              "ST_SwapOrdinates: geometry has no M ordinate")
            if (cs.hasZ) 3 else 2
        }
        val i0 = idx(s(0)); val i1 = idx(s(1))
        val out = f.getCoordinateSequenceFactory.create(cs.size, cs.getDimension, cs.getMeasures)
        var i = 0
        while (i < cs.size) {
          var d = 0
          while (d < cs.getDimension) {
            val src = if (d == i0) i1 else if (d == i1) i0 else d
            out.setOrdinate(i, d, cs.getOrdinate(i, src))
            d += 1
          }
          i += 1
        }
        out
      }
    })
  }

  /** PostGIS ST_SnapToGrid(geom, [originX, originY,] sizeX, sizeY): every
   *  coordinate moves to the nearest grid node (rint — round-half-even,
   *  the C library convention PostGIS uses); consecutive duplicate points
   *  collapse; components degenerating below their minimum vertex count
   *  (2 for lines, 4 for rings) drop to EMPTY / are removed, matching
   *  PostGIS's collapse behavior. Z/M pass through untouched. */
  def snapToGrid(g: Geometry, ox: Double, oy: Double, sx: Double, sy: Double): Geometry = {
    if (sx < 0 || sy < 0)
      throw new IllegalArgumentException(s"ST_SnapToGrid: sizes must be >= 0, got ($sx, $sy)")
    def snap(v: Double, o: Double, s: Double): Double =
      if (s == 0) v else math.rint((v - o) / s) * s + o
    def snapSeq(cs: CoordinateSequence): Array[Coordinate] = {
      val out = new scala.collection.mutable.ArrayBuffer[Coordinate]()
      var i = 0
      while (i < cs.size) {
        val c = cs.getCoordinate(i).copy()
        c.setX(snap(c.getX, ox, sx)); c.setY(snap(c.getY, oy, sy))
        if (out.isEmpty || out.last.getX != c.getX || out.last.getY != c.getY) out += c
        i += 1
      }
      out.toArray
    }
    def walk(gg: Geometry): Geometry = gg match {
      case p: Point =>
        if (p.isEmpty) p
        else {
          val c = p.getCoordinate.copy()
          c.setX(snap(c.getX, ox, sx)); c.setY(snap(c.getY, oy, sy))
          f.createPoint(c)
        }
      case l: LineString =>
        val pts = snapSeq(l.getCoordinateSequence)
        if (pts.length < 2) f.createLineString(Array.empty[Coordinate])
        else f.createLineString(pts)
      case p: Polygon =>
        def ring(r: LineString): Option[LinearRing] = {
          var pts = snapSeq(r.getCoordinateSequence)
          if (pts.length > 1 && (pts.head.getX != pts.last.getX || pts.head.getY != pts.last.getY))
            pts = pts :+ pts.head.copy()
          if (pts.length < 4) None else Some(f.createLinearRing(pts))
        }
        ring(p.getExteriorRing) match {
          case None => f.createPolygon()
          case Some(shell) =>
            val holes = (0 until p.getNumInteriorRing).flatMap(i => ring(p.getInteriorRingN(i)))
            f.createPolygon(shell, holes.toArray)
        }
      case c: GeometryCollection =>
        val parts = (0 until c.getNumGeometries).map(i => walk(c.getGeometryN(i))).filter(!_.isEmpty)
        c match {
          case _: MultiPoint => f.createMultiPoint(parts.map(_.asInstanceOf[Point]).toArray)
          case _: MultiLineString => f.createMultiLineString(parts.map(_.asInstanceOf[LineString]).toArray)
          case _: MultiPolygon => f.createMultiPolygon(parts.map(_.asInstanceOf[Polygon]).toArray)
          case _ => f.createGeometryCollection(parts.toArray)
        }
    }
    walk(g)
  }

  /** x < 0 -> x + 360 on every coordinate (PostGIS ST_ShiftLongitude). */
  def shiftLongitude(g: Geometry): Geometry = {
    val ed = new GeometryEditor(f)
    ed.edit(g, new GeometryEditor.CoordinateSequenceOperation {
      override def edit(cs: CoordinateSequence, geom: Geometry): CoordinateSequence = {
        val out = f.getCoordinateSequenceFactory.create(cs.size, cs.getDimension, cs.getMeasures)
        var i = 0
        while (i < cs.size) {
          val x = cs.getX(i)
          out.setOrdinate(i, 0, if (x < 0) x + 360.0 else x)
          var d = 1
          while (d < cs.getDimension) { out.setOrdinate(i, d, cs.getOrdinate(i, d)); d += 1 }
          i += 1
        }
        out
      }
    })
  }

  def load(): Unit = {
    fn("st_3ddistance", D, Seq(B, B))(a => Distance3DOp.distance(rg(a(0)), rg(a(1))))
    fn("st_3dlength", D, Seq(B))(a => length3d(rg(a(0))))
    fn("st_3dperimeter", D, Seq(B))(a => perimeter3d(rg(a(0))))
    fn("st_shiftlongitude", B, Seq(B))(a => w(shiftLongitude(rg(a(0)))))
    fn("st_snaptogrid", B, Seq(B, D), Seq(B, D, D), Seq(B, D, D, D, D)) { a =>
      val g = rg(a(0))
      a.length match {
        case 2 => w(snapToGrid(g, 0, 0, dbl(a(1)), dbl(a(1))))
        case 3 => w(snapToGrid(g, 0, 0, dbl(a(1)), dbl(a(2))))
        case _ => w(snapToGrid(g, dbl(a(1)), dbl(a(2)), dbl(a(3)), dbl(a(4))))
      }
    }
    fn("st_swapordinates", B, Seq(B, S))(a =>
      w(swapOrdinates(rg(a(0)), a(1).asInstanceOf[UTF8String].toString)))
  }
}

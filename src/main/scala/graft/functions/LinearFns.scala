package graft.functions

import graft.geom.{Geo, Wkb}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.GeometryEditor

/**
 * Linear referencing (ST_LineInterpolatePoint / ST_LineSubstring /
 * ST_LineLocatePoint / ST_Azimuth) and affine transforms (ST_Affine /
 * ST_Translate / ST_Scale / ST_Rotate) — PostGIS-standard surface the
 * reference does not carry (bonus coverage beyond docs/functions.md).
 * All row-local, codegen-friendly, no shuffle implications.
 *
 * Interpolation walks segments with plain IEEE arithmetic
 * (t = (target - cum) / segLen; p = p0 + t * (p1 - p0)) so a plain-SQL
 * oracle mirroring the same formulas lands within an ulp — exact after
 * round(x, 6).
 */
object LinearFns {

  private val B = BinaryType
  private val D = DoubleType

  private def fn(name: String, out: DataType, in: Seq[DataType]*)(eval: Array[Any] => Any): Unit =
    FnRegistry.add(FnSpec(name, in.map(s => s.length -> s).toMap, out, _ => eval))

  private def rg(a: Any): Geometry = a match {
    case b: Array[Byte] => Geo.read(b)
    case s: UTF8String => Geo.fromWkt(s.toString)
    case other => throw new IllegalArgumentException(s"not a geometry: ${other.getClass}")
  }
  private def w(g: Geometry): Array[Byte] = Wkb.write(g)
  private def dbl(a: Any): Double = a.asInstanceOf[Double]
  private val f: GeometryFactory = Geo.factory

  private def lineOf(g: Geometry, who: String): LineString = g match {
    case l: LineString => l
    case _ => throw new IllegalArgumentException(s"$who expects a LINESTRING, got ${g.getGeometryType}")
  }

  /** Per-segment lengths and the total. */
  private def segLens(cs: CoordinateSequence): (Array[Double], Double) = {
    val n = cs.size
    val lens = new Array[Double](math.max(n - 1, 0))
    var total = 0.0
    var i = 0
    while (i < n - 1) {
      val dx = cs.getX(i + 1) - cs.getX(i)
      val dy = cs.getY(i + 1) - cs.getY(i)
      lens(i) = math.sqrt(dx * dx + dy * dy)
      total += lens(i)
      i += 1
    }
    (lens, total)
  }

  /** Point at length `target` along the line (clamped to [0, total]). */
  private def pointAt(cs: CoordinateSequence, lens: Array[Double], target: Double): Coordinate = {
    var cum = 0.0
    var i = 0
    while (i < lens.length) {
      if (target <= cum + lens(i) && lens(i) > 0) {
        val t = (target - cum) / lens(i)
        return new Coordinate(
          cs.getX(i) + t * (cs.getX(i + 1) - cs.getX(i)),
          cs.getY(i) + t * (cs.getY(i + 1) - cs.getY(i)))
      }
      cum += lens(i)
      i += 1
    }
    new Coordinate(cs.getX(cs.size - 1), cs.getY(cs.size - 1))
  }

  def interpolate(line: LineString, frac: Double): Point = {
    require(frac >= 0.0 && frac <= 1.0, s"ST_LineInterpolatePoint: fraction $frac outside [0,1]")
    val cs = line.getCoordinateSequence
    if (cs.size == 0) return f.createPoint()
    val (lens, total) = segLens(cs)
    f.createPoint(pointAt(cs, lens, frac * total))
  }

  def substring(line: LineString, f1: Double, f2: Double): Geometry = {
    require(f1 >= 0.0 && f1 <= 1.0 && f2 >= 0.0 && f2 <= 1.0 && f1 <= f2,
      s"ST_LineSubstring: fractions ($f1, $f2) must satisfy 0 <= f1 <= f2 <= 1")
    val cs = line.getCoordinateSequence
    if (cs.size == 0) return line
    val (lens, total) = segLens(cs)
    val t1 = f1 * total
    val t2 = f2 * total
    if (t1 == t2) return f.createPoint(pointAt(cs, lens, t1))
    val coords = new scala.collection.mutable.ArrayBuffer[Coordinate]()
    coords += pointAt(cs, lens, t1)
    // interior vertices strictly inside (t1, t2) — exact-boundary corners are
    // already emitted as the start/end interpolants
    var cum = 0.0
    var i = 0
    while (i < lens.length) {
      cum += lens(i)
      if (cum > t1 && cum < t2) coords += new Coordinate(cs.getX(i + 1), cs.getY(i + 1))
      i += 1
    }
    coords += pointAt(cs, lens, t2)
    f.createLineString(coords.toArray)
  }

  def locate(line: LineString, pt: Point): Double = {
    val cs = line.getCoordinateSequence
    val (lens, total) = segLens(cs)
    if (total == 0.0 || cs.size < 2) return 0.0
    val px = pt.getX; val py = pt.getY
    var bestD2 = Double.MaxValue
    var bestLen = 0.0
    var cum = 0.0
    var i = 0
    while (i < cs.size - 1) {
      val x0 = cs.getX(i); val y0 = cs.getY(i)
      val dx = cs.getX(i + 1) - x0; val dy = cs.getY(i + 1) - y0
      val l2 = dx * dx + dy * dy
      val t = if (l2 == 0.0) 0.0 else math.max(0.0, math.min(1.0, ((px - x0) * dx + (py - y0) * dy) / l2))
      val qx = x0 + t * dx; val qy = y0 + t * dy
      val d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
      if (d2 < bestD2) { bestD2 = d2; bestLen = cum + t * lens(i) }
      cum += lens(i)
      i += 1
    }
    bestLen / total
  }

  /** North-based clockwise azimuth in radians, [0, 2*pi); null for identical
   *  points (PostGIS convention). */
  def azimuth(a: Point, b: Point): Any = {
    val dx = b.getX - a.getX
    val dy = b.getY - a.getY
    if (dx == 0.0 && dy == 0.0) null
    else {
      val az = math.atan2(dx, dy)
      if (az < 0) az + 2 * math.Pi else az
    }
  }

  /** 2D affine x' = a*x + b*y + xoff, y' = d*x + e*y + yoff; Z/M carried
   *  through untouched. The editor builds a new geometry — inputs from the
   *  shared parse memo are never mutated. */
  def affine(g: Geometry, a: Double, b: Double, d: Double, e: Double,
             xoff: Double, yoff: Double): Geometry = {
    val ed = new GeometryEditor(f)
    ed.edit(g, new GeometryEditor.CoordinateSequenceOperation {
      override def edit(cs: CoordinateSequence, geom: Geometry): CoordinateSequence = {
        val out = f.getCoordinateSequenceFactory.create(cs.size, cs.getDimension, cs.getMeasures)
        var i = 0
        while (i < cs.size) {
          val x = cs.getX(i); val y = cs.getY(i)
          out.setOrdinate(i, 0, a * x + b * y + xoff)
          out.setOrdinate(i, 1, d * x + e * y + yoff)
          var dim = 2
          while (dim < cs.getDimension) { out.setOrdinate(i, dim, cs.getOrdinate(i, dim)); dim += 1 }
          i += 1
        }
        out
      }
    })
  }

  /** 3D affine (PostGIS 12-argument ST_Affine): x' = a x + b y + c z + xoff,
   *  y' = d x + e y + f z + yoff, z' = g x + h y + i z + zoff. Z-less input
   *  uses z = 0 and stays 2D (the z row is ignored); M carried through. */
  def affine3d(geom: Geometry, a: Double, b: Double, c: Double,
               d: Double, e: Double, f0: Double, g0: Double, h: Double, i0: Double,
               xoff: Double, yoff: Double, zoff: Double): Geometry = {
    val ed = new GeometryEditor(f)
    ed.edit(geom, new GeometryEditor.CoordinateSequenceOperation {
      override def edit(cs: CoordinateSequence, gg: Geometry): CoordinateSequence = {
        val out = f.getCoordinateSequenceFactory.create(cs.size, cs.getDimension, cs.getMeasures)
        val zIdx = if (cs.hasZ) 2 else -1
        var i = 0
        while (i < cs.size) {
          val x = cs.getX(i); val y = cs.getY(i)
          val z = if (zIdx >= 0) { val v = cs.getZ(i); if (java.lang.Double.isNaN(v)) 0.0 else v } else 0.0
          out.setOrdinate(i, 0, a * x + b * y + c * z + xoff)
          out.setOrdinate(i, 1, d * x + e * y + f0 * z + yoff)
          if (zIdx >= 0) out.setOrdinate(i, 2, g0 * x + h * y + i0 * z + zoff)
          var dim = if (zIdx >= 0) 3 else 2
          while (dim < cs.getDimension) { out.setOrdinate(i, dim, cs.getOrdinate(i, dim)); dim += 1 }
          i += 1
        }
        out
      }
    })
  }

  def load(): Unit = {
    fn("st_lineinterpolatepoint", B, Seq(B, D))(a =>
      w(interpolate(lineOf(rg(a(0)), "ST_LineInterpolatePoint"), dbl(a(1)))))
    fn("st_line_interpolate_point", B, Seq(B, D))(a =>
      w(interpolate(lineOf(rg(a(0)), "ST_LineInterpolatePoint"), dbl(a(1)))))
    fn("st_linesubstring", B, Seq(B, D, D))(a =>
      w(substring(lineOf(rg(a(0)), "ST_LineSubstring"), dbl(a(1)), dbl(a(2)))))
    fn("st_line_substring", B, Seq(B, D, D))(a =>
      w(substring(lineOf(rg(a(0)), "ST_LineSubstring"), dbl(a(1)), dbl(a(2)))))
    fn("st_linelocatepoint", D, Seq(B, B)) { a =>
      val pt = rg(a(1)) match {
        case p: Point => p
        case g => throw new IllegalArgumentException(s"ST_LineLocatePoint expects a POINT, got ${g.getGeometryType}")
      }
      locate(lineOf(rg(a(0)), "ST_LineLocatePoint"), pt)
    }
    fn("st_line_locate_point", D, Seq(B, B)) { a =>
      val pt = rg(a(1)) match {
        case p: Point => p
        case g => throw new IllegalArgumentException(s"ST_LineLocatePoint expects a POINT, got ${g.getGeometryType}")
      }
      locate(lineOf(rg(a(0)), "ST_LineLocatePoint"), pt)
    }
    fn("st_azimuth", D, Seq(B, B)) { a =>
      (rg(a(0)), rg(a(1))) match {
        case (p1: Point, p2: Point) => azimuth(p1, p2)
        case (g1, g2) =>
          throw new IllegalArgumentException(
            s"ST_Azimuth expects two POINTs, got ${g1.getGeometryType}, ${g2.getGeometryType}")
      }
    }
    fn("st_affine", B, Seq(B, D, D, D, D, D, D),
       Seq(B, D, D, D, D, D, D, D, D, D, D, D, D)) { a =>
      if (a.length == 7)
        w(affine(rg(a(0)), dbl(a(1)), dbl(a(2)), dbl(a(3)), dbl(a(4)), dbl(a(5)), dbl(a(6))))
      else
        w(affine3d(rg(a(0)), dbl(a(1)), dbl(a(2)), dbl(a(3)), dbl(a(4)), dbl(a(5)), dbl(a(6)),
          dbl(a(7)), dbl(a(8)), dbl(a(9)), dbl(a(10)), dbl(a(11)), dbl(a(12))))
    }
    // axis rotations (PostGIS ST_RotateX/Y/Z; angles in radians, CCW)
    fn("st_rotatex", B, Seq(B, D)) { a =>
      val c = math.cos(dbl(a(1))); val s = math.sin(dbl(a(1)))
      w(affine3d(rg(a(0)), 1, 0, 0, 0, c, -s, 0, s, c, 0, 0, 0))
    }
    fn("st_rotatey", B, Seq(B, D)) { a =>
      val c = math.cos(dbl(a(1))); val s = math.sin(dbl(a(1)))
      w(affine3d(rg(a(0)), c, 0, s, 0, 1, 0, -s, 0, c, 0, 0, 0))
    }
    fn("st_rotatez", B, Seq(B, D)) { a =>
      val c = math.cos(dbl(a(1))); val s = math.sin(dbl(a(1)))
      w(affine(rg(a(0)), c, -s, s, c, 0.0, 0.0))
    }
    fn("st_translate", B, Seq(B, D, D))(a =>
      w(affine(rg(a(0)), 1.0, 0.0, 0.0, 1.0, dbl(a(1)), dbl(a(2)))))
    fn("st_scale", B, Seq(B, D, D))(a =>
      w(affine(rg(a(0)), dbl(a(1)), 0.0, 0.0, dbl(a(2)), 0.0, 0.0)))
    fn("st_rotate", B, Seq(B, D)) { a =>
      // counter-clockwise about the origin (PostGIS ST_Rotate)
      val c = math.cos(dbl(a(1))); val s = math.sin(dbl(a(1)))
      w(affine(rg(a(0)), c, -s, s, c, 0.0, 0.0))
    }
    // nearest point ON g1 to g2 (the first endpoint of st_shortestline)
    fn("st_closestpoint", B, Seq(B, B)) { a =>
      val pts = org.locationtech.jts.operation.distance.DistanceOp.nearestPoints(rg(a(0)), rg(a(1)))
      w(f.createPoint(pts(0)))
    }
    // planar projection of a point by distance along a north-based azimuth
    // (the planar analogue of PostGIS ST_Project)
    fn("st_project", B, Seq(B, D, D)) { a =>
      val p = rg(a(0)) match {
        case pt: Point => pt
        case g => throw new IllegalArgumentException(s"ST_Project expects a POINT, got ${g.getGeometryType}")
      }
      val d = dbl(a(1)); val az = dbl(a(2))
      w(f.createPoint(new Coordinate(p.getX + d * math.sin(az), p.getY + d * math.cos(az))))
    }
  }
}

package graft.functions

import graft.geom.{Geo, Wkb}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}
import org.locationtech.jts.geom._

/**
 * Measure-coordinate (M) linear referencing — the PostGIS surface
 * ST_AddMeasure / ST_LocateAlong / ST_LocateBetween / ST_InterpolatePoint.
 * Not in the reference's docs/functions.md (it stores M but has no locate
 * functions); provided as beyond-reference parity: M-keyed event location
 * (mileposts, timestamps along tracks) is a row-local kernel that scales
 * embarrassingly.
 *
 * Semantics follow PostGIS lwgeom_functions_lrs.c:
 *  - AddMeasure: LINESTRING/MULTILINESTRING only; measures interpolated by
 *    cumulative 2D arc length over the TOTAL length (continuing across the
 *    parts of a multiline); Z carried through; existing M overwritten.
 *  - LocateAlong: POINT(M)/LINESTRING(M) families; every segment whose
 *    [m0,m1] span (either direction) contains m yields one interpolated
 *    point; constant-M segments equal to m yield both endpoints; points
 *    match on exact M equality. `offset` displaces results to the LEFT of
 *    the line direction (negative = right); zero-length segments take no
 *    offset (no direction).
 *  - LocateBetween: segments clipped to the measure window; full segments
 *    kept, partial segments interpolated; isolated single-vertex touches
 *    emit points. Result is MULTILINESTRING, or GEOMETRYCOLLECTION when
 *    point touches survive alongside lines.
 *  - InterpolatePoint: M at the line's closest approach to the point.
 */
object MeasureFns {

  private val B = BinaryType
  private val D = DoubleType

  private def fn(name: String, out: DataType, in: Seq[DataType]*)(eval: Array[Any] => Any): Unit =
    FnRegistry.add(FnSpec(name, in.map(s => s.length -> s).toMap, out, _ => eval))

  private def rg(a: Any): Geometry = a match {
    case b: Array[Byte] => Geo.read(b)
    case g: Geometry => g
  }
  private def w(g: Geometry): Array[Byte] = Wkb.write(g)
  private def dbl(a: Any): Double = a.asInstanceOf[Double]
  private val f: GeometryFactory = Geo.factory

  private def mOf(cs: CoordinateSequence, i: Int): Double =
    if (cs.hasM) cs.getM(i) else Double.NaN

  private def requireM(g: Geometry, who: String): Unit = {
    val cs = g match {
      case l: LineString => l.getCoordinateSequence
      case p: Point => p.getCoordinateSequence
      case mg: GeometryCollection if mg.getNumGeometries > 0 =>
        return requireM(mg.getGeometryN(0), who)
      case _ => null
    }
    if (cs == null || !cs.hasM)
      throw new IllegalArgumentException(s"$who requires a geometry with M (measure) values")
  }

  /** ST_AddMeasure: measures m0..m1 by cumulative length over total length. */
  def addMeasure(g: Geometry, m0: Double, m1: Double): Geometry = {
    val lines: Seq[LineString] = g match {
      case l: LineString => Seq(l)
      case ml: MultiLineString => (0 until ml.getNumGeometries).map(ml.getGeometryN(_).asInstanceOf[LineString])
      case other => throw new IllegalArgumentException(
        s"ST_AddMeasure supports LINESTRING and MULTILINESTRING, got ${other.getGeometryType}")
    }
    var total = 0.0
    lines.foreach(l => total += l.getLength)
    var cum = 0.0
    val outLines = lines.map { l =>
      val cs = l.getCoordinateSequence
      val n = cs.size
      val hasZ = cs.hasZ
      val dim = if (hasZ) 4 else 3
      val out = f.getCoordinateSequenceFactory.create(n, dim, 1)
      var i = 0
      while (i < n) {
        if (i > 0) {
          val dx = cs.getX(i) - cs.getX(i - 1)
          val dy = cs.getY(i) - cs.getY(i - 1)
          cum += math.sqrt(dx * dx + dy * dy)
        }
        out.setOrdinate(i, 0, cs.getX(i))
        out.setOrdinate(i, 1, cs.getY(i))
        if (hasZ) out.setOrdinate(i, 2, cs.getZ(i))
        val m = if (total == 0.0) m0 else m0 + (m1 - m0) * (cum / total)
        out.setOrdinate(i, if (hasZ) 3 else 2, m)
        i += 1
      }
      f.createLineString(out)
    }
    g match {
      case _: LineString => outLines.head
      case _ => f.createMultiLineString(outLines.toArray)
    }
  }

  private def pointM(x: Double, y: Double, m: Double): Point = {
    val cs = f.getCoordinateSequenceFactory.create(1, 3, 1)
    cs.setOrdinate(0, 0, x); cs.setOrdinate(0, 1, y); cs.setOrdinate(0, 2, m)
    f.createPoint(cs)
  }

  /** Points on `g` where M == m, offset to the left by `offset`. */
  def locateAlong(g: Geometry, m: Double, offset: Double): Geometry = {
    requireM(g, "ST_LocateAlong")
    val out = new scala.collection.mutable.ArrayBuffer[Point]()
    def scanLine(l: LineString): Unit = {
      val cs = l.getCoordinateSequence
      var i = 0
      while (i < cs.size - 1) {
        val m0 = mOf(cs, i); val m1 = mOf(cs, i + 1)
        val lo = math.min(m0, m1); val hi = math.max(m0, m1)
        if (m >= lo && m <= hi) {
          val x0 = cs.getX(i); val y0 = cs.getY(i)
          val dx = cs.getX(i + 1) - x0; val dy = cs.getY(i + 1) - y0
          val len = math.sqrt(dx * dx + dy * dy)
          val (ox, oy) = if (offset != 0.0 && len > 0) (-dy / len * offset, dx / len * offset) else (0.0, 0.0)
          if (m1 == m0) {
            // constant-M segment at m: both endpoints (PostGIS emits the span ends)
            out += pointM(x0 + ox, y0 + oy, m)
            out += pointM(cs.getX(i + 1) + ox, cs.getY(i + 1) + oy, m)
          } else {
            val t = (m - m0) / (m1 - m0)
            out += pointM(x0 + t * dx + ox, y0 + t * dy + oy, m)
          }
        }
        i += 1
      }
    }
    def scan(gg: Geometry): Unit = gg match {
      case p: Point =>
        if (mOf(p.getCoordinateSequence, 0) == m) out += pointM(p.getX, p.getY, m)
      case l: LineString => scanLine(l)
      case c: GeometryCollection => (0 until c.getNumGeometries).foreach(i => scan(c.getGeometryN(i)))
      case other => throw new IllegalArgumentException(
        s"ST_LocateAlong supports POINT and LINESTRING families, got ${other.getGeometryType}")
    }
    scan(g)
    f.createMultiPoint(out.toArray)
  }

  /** Parts of `g` whose M lies within [mStart, mEnd]. */
  def locateBetween(g: Geometry, mStart: Double, mEnd: Double, offset: Double): Geometry = {
    if (mEnd < mStart)
      throw new IllegalArgumentException(s"ST_LocateBetween: measure window ($mStart, $mEnd) is inverted")
    requireM(g, "ST_LocateBetween")
    val lines = new scala.collection.mutable.ArrayBuffer[LineString]()
    val points = new scala.collection.mutable.ArrayBuffer[Point]()

    def offsetPts(pts: Seq[(Double, Double, Double)], dx: Double, dy: Double): Seq[(Double, Double, Double)] =
      if (offset == 0.0) pts
      else {
        val len = math.sqrt(dx * dx + dy * dy)
        if (len == 0) pts
        else pts.map { case (x, y, m) => (x - dy / len * offset, y + dx / len * offset, m) }
      }

    def scanLine(l: LineString): Unit = {
      val cs = l.getCoordinateSequence
      var run = new scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]()
      def flush(): Unit = {
        if (run.length >= 2) {
          val out = f.getCoordinateSequenceFactory.create(run.length, 3, 1)
          var i = 0
          while (i < run.length) {
            out.setOrdinate(i, 0, run(i)._1); out.setOrdinate(i, 1, run(i)._2); out.setOrdinate(i, 2, run(i)._3)
            i += 1
          }
          lines += f.createLineString(out)
        } else if (run.length == 1) {
          points += pointM(run(0)._1, run(0)._2, run(0)._3)
        }
        run = new scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]()
      }
      def push(x: Double, y: Double, m: Double): Unit =
        if (run.isEmpty || run.last != ((x, y, m))) run += ((x, y, m))
      var i = 0
      while (i < cs.size - 1) {
        val x0 = cs.getX(i); val y0 = cs.getY(i); val m0 = mOf(cs, i)
        val x1 = cs.getX(i + 1); val y1 = cs.getY(i + 1); val m1 = mOf(cs, i + 1)
        val dx = x1 - x0; val dy = y1 - y0
        // clip the segment's measure span to the window
        val in0 = m0 >= mStart && m0 <= mEnd
        val in1 = m1 >= mStart && m1 <= mEnd
        def at(m: Double): (Double, Double, Double) = {
          val t = (m - m0) / (m1 - m0)
          (x0 + t * dx, y0 + t * dy, m)
        }
        if (in0 && in1) {
          offsetPts(Seq((x0, y0, m0), (x1, y1, m1)), dx, dy).foreach(p => push(p._1, p._2, p._3))
        } else if (m0 == m1) {
          // constant-M segment outside the window: contributes nothing
          flush()
        } else {
          val lo = math.min(m0, m1); val hi = math.max(m0, m1)
          val cLo = math.max(lo, mStart); val cHi = math.min(hi, mEnd)
          if (cLo <= cHi) {
            val (mA, mB) = if (m0 < m1) (cLo, cHi) else (cHi, cLo) // in segment direction
            val pA = if (mA == m0) (x0, y0, m0) else at(mA)
            val pB = if (mB == m1) (x1, y1, m1) else at(mB)
            if (!in0) flush() // entering the window mid-segment starts a new run
            offsetPts(Seq(pA, pB), dx, dy).foreach(p => push(p._1, p._2, p._3))
            if (!in1) flush() // leaving the window mid-segment ends the run
          } else flush()
        }
        i += 1
      }
      flush()
    }
    def scan(gg: Geometry): Unit = gg match {
      case p: Point =>
        val m = mOf(p.getCoordinateSequence, 0)
        if (m >= mStart && m <= mEnd) points += pointM(p.getX, p.getY, m)
      case l: LineString => scanLine(l)
      case c: GeometryCollection => (0 until c.getNumGeometries).foreach(i => scan(c.getGeometryN(i)))
      case other => throw new IllegalArgumentException(
        s"ST_LocateBetween supports POINT and LINESTRING families, got ${other.getGeometryType}")
    }
    scan(g)
    if (points.isEmpty) f.createMultiLineString(lines.toArray)
    else if (lines.isEmpty && (g.isInstanceOf[Point] || g.isInstanceOf[MultiPoint])) f.createMultiPoint(points.toArray)
    else if (lines.isEmpty) f.createGeometryCollection(points.toArray[Geometry])
    else f.createGeometryCollection((lines ++ points).toArray[Geometry])
  }

  /** M value at the line's closest approach to `pt`. */
  def interpolatePoint(line: Geometry, pt: Geometry): Double = {
    val l = line match {
      case ls: LineString => ls
      case other => throw new IllegalArgumentException(
        s"ST_InterpolatePoint expects a LINESTRING, got ${other.getGeometryType}")
    }
    val p = pt match {
      case pp: Point => pp
      case other => throw new IllegalArgumentException(
        s"ST_InterpolatePoint expects a POINT, got ${other.getGeometryType}")
    }
    requireM(l, "ST_InterpolatePoint")
    val cs = l.getCoordinateSequence
    if (cs.size == 0) return Double.NaN
    if (cs.size == 1) return mOf(cs, 0)
    val px = p.getX; val py = p.getY
    var bestD2 = Double.MaxValue
    var bestM = mOf(cs, 0)
    var i = 0
    while (i < cs.size - 1) {
      val x0 = cs.getX(i); val y0 = cs.getY(i)
      val dx = cs.getX(i + 1) - x0; val dy = cs.getY(i + 1) - y0
      val l2 = dx * dx + dy * dy
      val t = if (l2 == 0.0) 0.0 else math.max(0.0, math.min(1.0, ((px - x0) * dx + (py - y0) * dy) / l2))
      val qx = x0 + t * dx; val qy = y0 + t * dy
      val d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
      if (d2 < bestD2) {
        bestD2 = d2
        bestM = mOf(cs, i) + t * (mOf(cs, i + 1) - mOf(cs, i))
      }
      i += 1
    }
    bestM
  }

  /** PostGIS ST_FilterByM: keep vertices whose M lies in [mMin, mMax];
   *  points/lines only (PostGIS errors on polygons — dropping ring
   *  vertices breaks topology); lines left with < 2 vertices go EMPTY.
   *  M drops from the output unless returnM (PostGIS default false). */
  def filterByM(g: Geometry, mMin: Double, mMax: Double, returnM: Boolean): Geometry = {
    requireM(g, "ST_FilterByM")
    def keepPt(x: Double, y: Double, m: Double): Point =
      if (returnM) pointM(x, y, m) else f.createPoint(new Coordinate(x, y))
    def line(l: LineString): LineString = {
      val cs = l.getCoordinateSequence
      val kept = (0 until cs.size).filter(i => { val m = mOf(cs, i); m >= mMin && m <= mMax })
      if (kept.length < 2) f.createLineString(Array.empty[Coordinate])
      else {
        val out = f.getCoordinateSequenceFactory.create(kept.length, if (returnM) 3 else 2,
          if (returnM) 1 else 0)
        kept.zipWithIndex.foreach { case (src, dst) =>
          out.setOrdinate(dst, 0, cs.getX(src)); out.setOrdinate(dst, 1, cs.getY(src))
          if (returnM) out.setOrdinate(dst, 2, mOf(cs, src))
        }
        f.createLineString(out)
      }
    }
    g match {
      case p: Point =>
        val m = mOf(p.getCoordinateSequence, 0)
        if (m >= mMin && m <= mMax) keepPt(p.getX, p.getY, m) else f.createPoint()
      case mp: MultiPoint =>
        val kept = (0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Point])
          .filter(p => { val m = mOf(p.getCoordinateSequence, 0); m >= mMin && m <= mMax })
        f.createMultiPoint(kept.map(p => keepPt(p.getX, p.getY, mOf(p.getCoordinateSequence, 0))).toArray)
      case l: LineString => line(l)
      case ml: MultiLineString =>
        f.createMultiLineString((0 until ml.getNumGeometries)
          .map(i => line(ml.getGeometryN(i).asInstanceOf[LineString])).filter(!_.isEmpty).toArray)
      case other => throw new IllegalArgumentException(
        s"ST_FilterByM supports POINT and LINESTRING families, got ${other.getGeometryType}")
    }
  }

  /** PostGIS ST_Scroll: rotate a CLOSED linestring's start to the given
   *  vertex (which must be an existing vertex of the ring). */
  def scroll(g: Geometry, pt: Geometry): Geometry = {
    val l = g match {
      case ls: LineString if ls.isClosed && ls.getNumPoints >= 4 => ls
      case _ => throw new IllegalArgumentException(
        "ST_Scroll expects a closed LINESTRING with at least 4 points")
    }
    val p = pt match {
      case pp: Point => pp.getCoordinate
      case other => throw new IllegalArgumentException(
        s"ST_Scroll expects a POINT, got ${other.getGeometryType}")
    }
    val cs = l.getCoordinates // closing vertex duplicated at the end
    val n = cs.length - 1
    val at = (0 until n).indexWhere(i => cs(i).getX == p.getX && cs(i).getY == p.getY)
    if (at < 0)
      throw new IllegalArgumentException("ST_Scroll: the point is not a vertex of the line")
    val rotated = ((at until n) ++ (0 until at)).map(i => cs(i).copy()).toArray
    f.createLineString(rotated :+ rotated.head.copy())
  }

  def load(): Unit = {
    fn("st_addmeasure", B, Seq(B, D, D))(a => w(addMeasure(rg(a(0)), dbl(a(1)), dbl(a(2)))))
    fn("st_locatealong", B, Seq(B, D), Seq(B, D, D))(a =>
      w(locateAlong(rg(a(0)), dbl(a(1)), if (a.length > 2) dbl(a(2)) else 0.0)))
    fn("st_locatebetween", B, Seq(B, D, D), Seq(B, D, D, D))(a =>
      w(locateBetween(rg(a(0)), dbl(a(1)), dbl(a(2)), if (a.length > 3) dbl(a(3)) else 0.0)))
    fn("st_interpolatepoint", D, Seq(B, B))(a => interpolatePoint(rg(a(0)), rg(a(1))))
    fn("st_filterbym", B, Seq(B, D), Seq(B, D, D), Seq(B, D, D, org.apache.spark.sql.types.BooleanType)) { a =>
      val mMin = dbl(a(1))
      val mMax = if (a.length > 2) dbl(a(2)) else Double.MaxValue
      val retM = if (a.length > 3) a(3).asInstanceOf[Boolean] else false
      w(filterByM(rg(a(0)), mMin, mMax, retM))
    }
    fn("st_scroll", B, Seq(B, B))(a => w(scroll(rg(a(0)), rg(a(1)))))
  }
}

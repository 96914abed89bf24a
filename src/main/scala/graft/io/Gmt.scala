package graft.io

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, LinearRing, Polygon}

/** GMT ASCII vector format (.gmt) — OGR's "GMT ASCII Vectors" driver in
  * the reference's table (internals.md; gdal.org/drivers/vector/gmt.html).
  * Text format: `# @V` version header, `# @G<TYPE>` geometry type,
  * `# @N<f1>|<f2>` field names with `# @T<t1>|<t2>` types, then
  * `# FEATURE_DATA`; each `>` line opens a segment, `# @D<v1>|<v2>`
  * carries that feature's attribute values (strings double-quoted), and
  * coordinate lines are whitespace-separated lon lat pairs. Multi-part
  * geometries continue across `>` segments without a new `@D`; polygon
  * segments flag perimeters with `# @P` and holes with `# @H`. */
object Gmt {

  private val f = new GeometryFactory()

  // ------------------------------------------------------------------ read

  private final case class Seg(d: Option[String], marker: Option[Char],
                               coords: Array[Coordinate])

  def features(path: String): Iterator[GeoJsonFile.Feature] = {
    val br = GeoFiles.textReader(path)
    val lines = try {
      Iterator.continually(br.readLine()).takeWhile(_ != null).toVector
    } finally br.close()

    var gtype = "LINESTRING"
    var names: Array[String] = Array.empty
    val segs = Vector.newBuilder[Seg]
    var curD: Option[String] = None
    var curMarker: Option[Char] = None
    var curCoords = Array.newBuilder[Coordinate]
    var open = false
    def flush(): Unit = {
      if (open) { segs += Seg(curD, curMarker, curCoords.result()); curCoords.clear() }
      open = false; curD = None; curMarker = None
    }
    lines.foreach { raw =>
      val line = raw.trim
      if (line.startsWith("# @D") || line.startsWith("#@D")) {
        curD = Some(line.substring(line.indexOf("@D") + 2))
      } else if (line.startsWith("# @N") || line.startsWith("#@N")) {
        names = line.dropWhile(_ != 'N').drop(1).split("\\|").map(_.trim)
      } else if (line.startsWith("# @P") || line.startsWith("#@P")) {
        curMarker = Some('P')
      } else if (line.startsWith("# @H") || line.startsWith("#@H")) {
        curMarker = Some('H')
      } else if (line.startsWith("#") && line.contains("@G")) {
        // the type token rides the version line ("# @VGMT1.0 @GPOINT") or
        // stands alone ("# @GLINESTRING")
        gtype = line.substring(line.indexOf("@G") + 2).split("\\s+")(0).trim.toUpperCase
      } else if (line.startsWith(">")) {
        flush(); open = true
      } else if (line.nonEmpty && !line.startsWith("#")) {
        if (!open) open = true // headerless single-segment files
        val parts = line.split("[\\s,]+")
        if (parts.length >= 2)
          curCoords += new Coordinate(parts(0).toDouble, parts(1).toDouble)
      }
    }
    flush()

    def props(d: Option[String]): Map[String, String] = d match {
      case None => Map.empty
      case Some(s) =>
        // pipe-separated; strings are double-quoted (embedded "" = quote)
        val vals = Vector.newBuilder[String]
        var i = 0; val sb = new java.lang.StringBuilder; var inQ = false
        while (i < s.length) {
          val c = s.charAt(i)
          if (inQ) {
            if (c == '"') {
              if (i + 1 < s.length && s.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
              else inQ = false
            } else sb.append(c)
          } else if (c == '"') inQ = true
          else if (c == '|') { vals += sb.toString; sb.setLength(0) }
          else sb.append(c)
          i += 1
        }
        vals += sb.toString
        names.zip(vals.result()).toMap
    }

    // group segments into features: a segment with @D always opens a new
    // feature (the writer emits an empty "# @D" as delimiter even for
    // attribute-less frames). Without @D, single-part types start a new
    // feature at every non-@H segment — an attribute-less LINESTRING file
    // is one feature per segment, and @P/@H still assemble holes — while
    // MULTI* types accumulate segments into the open feature.
    val multiType = gtype == "MULTILINESTRING" || gtype == "MULTIPOLYGON" ||
      gtype == "MULTIPOINT"
    val groups = Vector.newBuilder[Vector[Seg]]
    var cur = Vector.newBuilder[Seg]
    var any = false
    segs.result().foreach { s =>
      if (s.coords.isEmpty && s.d.isEmpty) () // empty separator segment
      else {
        val opensFeature = any &&
          (s.d.isDefined || (!multiType && !s.marker.contains('H')))
        if (opensFeature) { groups += cur.result(); cur = Vector.newBuilder }
        cur += s; any = true
      }
    }
    if (any) groups += cur.result()

    def ring(cs0: Array[Coordinate]): LinearRing = {
      val cs = if (cs0.length >= 3 && cs0.head.equals2D(cs0.last)) cs0 else cs0 :+ cs0.head.copy()
      f.createLinearRing(cs)
    }

    groups.result().iterator.flatMap { g =>
      val pm = props(g.head.d)
      gtype match {
        case "POINT" | "MULTIPOINT" =>
          val cs = g.flatMap(_.coords)
          if (gtype == "POINT" && cs.length == 1)
            Iterator.single(GeoJsonFile.Feature(null, f.createPoint(cs.head), pm))
          else if (gtype == "POINT")
            // a POINT file's segment may carry several one-coordinate features
            cs.iterator.map(c => GeoJsonFile.Feature(null, f.createPoint(c), pm))
          else Iterator.single(GeoJsonFile.Feature(null,
            f.createMultiPoint(cs.map(f.createPoint).toArray), pm))
        case "LINESTRING" =>
          Iterator.single(GeoJsonFile.Feature(null, f.createLineString(g.head.coords), pm))
        case "MULTILINESTRING" =>
          Iterator.single(GeoJsonFile.Feature(null,
            f.createMultiLineString(g.map(s => f.createLineString(s.coords)).toArray), pm))
        case "POLYGON" | "MULTIPOLYGON" =>
          val polys = Vector.newBuilder[Polygon]
          var shell: LinearRing = null
          var holes = Vector.newBuilder[LinearRing]
          g.foreach { s =>
            if (s.marker.contains('H') && shell != null) holes += ring(s.coords)
            else {
              if (shell != null) polys += f.createPolygon(shell, holes.result().toArray)
              shell = ring(s.coords); holes = Vector.newBuilder
            }
          }
          if (shell != null) polys += f.createPolygon(shell, holes.result().toArray)
          val ps = polys.result()
          val geom: Geometry = if (ps.length == 1 && gtype == "POLYGON") ps.head
                               else f.createMultiPolygon(ps.toArray)
          Iterator.single(GeoJsonFile.Feature(null, geom, pm))
        case t => throw new IllegalArgumentException(s"GMT: unsupported @G type '$t' in $path")
      }
    }
  }

  // ----------------------------------------------------------------- write

  def render(gtype: String, names: Seq[String], types: Seq[String],
             feats: Iterator[(Geometry, Seq[String])], out: java.io.PrintWriter): Unit = {
    out.println("# @VGMT1.0 @G" + gtype.toUpperCase)
    if (names.nonEmpty) {
      out.println("# @N" + names.mkString("|"))
      out.println("# @T" + types.mkString("|"))
    }
    out.println("# FEATURE_DATA")
    def fmtV(v: String, t: String): String =
      if (v == null) "" else if (t == "string") "\"" + v.replace("\"", "\"\"") + "\"" else v
    feats.foreach { case (g, vals) =>
      // always emitted — an empty "# @D" delimits features in
      // attribute-less MULTI* files (the reader keys feature starts on it)
      val d = Some("# @D" + vals.zip(types).map { case (v, t) => fmtV(v, t) }.mkString("|"))
      def seg(marker: Option[Char], cs: Array[Coordinate], withD: Boolean): Unit = {
        out.println(">")
        if (withD) d.foreach(out.println)
        marker.foreach(m => out.println(s"# @$m"))
        cs.foreach(c => out.println(s"${graft.geom.Geo.fmt(c.x)} ${graft.geom.Geo.fmt(c.y)}"))
      }
      g.getGeometryType match {
        case "Point" | "MultiPoint" => seg(None, g.getCoordinates, withD = true)
        case "LineString" => seg(None, g.getCoordinates, withD = true)
        case "MultiLineString" =>
          (0 until g.getNumGeometries).foreach(i =>
            seg(None, g.getGeometryN(i).getCoordinates, withD = i == 0))
        case "Polygon" | "MultiPolygon" =>
          var first = true
          (0 until g.getNumGeometries).foreach { i =>
            val p = g.getGeometryN(i).asInstanceOf[Polygon]
            seg(Some('P'), p.getExteriorRing.getCoordinates, withD = first)
            first = false
            (0 until p.getNumInteriorRing).foreach(j =>
              seg(Some('H'), p.getInteriorRingN(j).getCoordinates, withD = false))
          }
        case t => throw new IllegalArgumentException(s"GMT writer: unsupported geometry $t")
      }
    }
  }
}

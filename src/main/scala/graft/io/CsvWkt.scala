package graft.io

import graft.geom.Geo
import org.locationtech.jts.geom.Geometry

/**
 * CSV-with-WKT reader (the reference reads CSV through GDAL's CSV driver
 * with GEOM_POSSIBLE_NAMES; same convention here): the geometry column is
 * the first header named wkt/geometry/geom/the_geom/wkb_geometry
 * (case-insensitive). Attribute columns surface as strings — this is a
 * geometry carrier, not a type-sniffing CSV engine. RFC-4180 quoting
 * (embedded commas, doubled quotes, newlines inside quotes) is handled.
 */
object CsvWkt {

  private val GeomNames = Set("wkt", "geometry", "geom", "the_geom", "wkb_geometry")

  /** `overrideName` = the GEOM_COLUMN open_option: an explicit header name
    * replaces the GEOM_POSSIBLE_NAMES-style sniff entirely. */
  def geomColumn(header: Seq[String], overrideName: Option[String] = None): Int =
    overrideName match {
      case Some(n) =>
        val i = header.indexWhere(_.trim.equalsIgnoreCase(n.trim))
        require(i >= 0, s"open_options GEOM_COLUMN='$n' not in CSV header $header")
        i
      case None =>
        val i = header.indexWhere(h => GeomNames.contains(h.trim.toLowerCase))
        require(i >= 0, s"CSV has no geometry column (looked for ${GeomNames.mkString("/")}) in $header")
        i
    }

  /** split one logical CSV record (quotes already balanced) into fields */
  def splitLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0; var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.toString; sb.setLength(0)
        case _ => sb.append(c)
      }
      i += 1
    }
    out += sb.toString
    out.toArray
  }

  /** read logical records (joining physical lines while quotes are open) */
  private def records(path: String, encoding: Option[String] = None): Iterator[String] = {
    val br = GeoFiles.textReader(path, encoding.getOrElse("UTF-8"))
    new Iterator[String] {
      private var nextRec: String = advance()
      private def advance(): String = {
        val first = br.readLine()
        if (first == null) { br.close(); return null }
        var rec = first
        while (rec.count(_ == '"') % 2 == 1) {
          val more = br.readLine()
          if (more == null) return rec
          rec = rec + "\n" + more
        }
        rec
      }
      override def hasNext: Boolean = nextRec != null
      override def next(): String = { val r = nextRec; nextRec = advance(); r }
    }
  }

  def header(path: String, encoding: Option[String] = None): Array[String] = {
    val it = records(path, encoding)
    require(it.hasNext, s"empty CSV: $path")
    splitLine(it.next())
  }

  /** (attribute values in header order minus the geometry column, geometry) */
  def rows(path: String, overrideName: Option[String] = None,
           encoding: Option[String] = None): Iterator[(Array[String], Geometry)] = {
    val it = records(path, encoding)
    if (!it.hasNext) return Iterator.empty
    val hdr = splitLine(it.next())
    val gi = geomColumn(hdr.toSeq, overrideName)
    it.map { rec =>
      val fields = splitLine(rec)
      val geomText = if (gi < fields.length) fields(gi) else ""
      val g = if (geomText.trim.isEmpty) null else Geo.fromWkt(geomText)
      val attrs = fields.zipWithIndex.collect { case (v, i) if i != gi => v }
      (attrs, g)
    }
  }
}

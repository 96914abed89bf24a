package graft.io

import graft.geom.Geo
import org.locationtech.jts.geom.Geometry
import java.nio.{ByteBuffer, ByteOrder}

/**
 * GeoPackage reader over the [[Sqlite]] parser (OGC GeoPackage spec):
 * feature tables discovered via `gpkg_contents` / `gpkg_geometry_columns`,
 * geometry decoded from the standard GPKG blob (magic "GP", flags with
 * envelope size + endianness, srs_id, envelope, WKB body).
 */
object GeoPackage {

  /** pkIndex: INTEGER PRIMARY KEY column (sqlite stores it as the rowid; the
    * record slot holds NULL and the value must be substituted from rowid). */
  final case class FeatureTable(name: String, geomColumn: String,
                                columns: Seq[(String, String)], rootPage: Long, pkIndex: Int)

  /** "organization:code" from gpkg_spatial_ref_sys (first user row), for
   *  ST_Read_Meta's CRS report (st_read_meta.cpp surfaces the same via GDAL). */
  def srsInfo(path: String): Option[String] =
    srsDetail(path).map { case (_, org, code, _) => s"$org:$code" }

  /** (srs_name, organization, code, definition WKT) of the first user SRS row. */
  def srsDetail(path: String): Option[(String, String, String, String)] = {
    val db = new Sqlite.Db(path)
    db.master().find(m => m._1 == "table" && m._2 == "gpkg_spatial_ref_sys").map(_._4).flatMap { root =>
      val rows = db.scanTable(root).map(_._2).toSeq // srs table: a handful of rows
      // prefer a row that isn't the undefined -1/0 placeholders
      val r = rows.find(r => r(1) match {
        case l: Long => l > 0
        case _ => false
      }).orElse(rows.headOption)
      r.map(v => (String.valueOf(v(0)), String.valueOf(v(2)), String.valueOf(v(3)),
        v(4) match { case s: String => s; case _ => null }))
    }
  }

  def featureTables(path: String): Seq[FeatureTable] = {
    val db = new Sqlite.Db(path)
    val master = db.master()
    def rootOf(table: String): Option[Long] =
      master.find(m => m._1 == "table" && m._2 == table).map(_._4)

    val contents = rootOf("gpkg_contents").toSeq.flatMap(db.scanTable(_).map(_._2))
      .filter(r => r(1) == "features").map(_(0).asInstanceOf[String])
    val geomCols: Map[String, String] = rootOf("gpkg_geometry_columns").toSeq
      .flatMap(db.scanTable(_).map(_._2))
      .map(r => r(0).asInstanceOf[String] -> r(1).asInstanceOf[String]).toMap

    contents.flatMap { table =>
      master.find(m => m._1 == "table" && m._2 == table).map { m =>
        val cols = parseColumns(m._5)
        val pk = cols.indexWhere(_._2.contains("#PK"))
        FeatureTable(table, geomCols.getOrElse(table, "geom"),
          cols.map { case (n, t) => (n, t.replace("#PK", "")) }, m._4, pk)
      }
    }
  }

  /** naive CREATE TABLE column parsing: name + declared type per entry */
  private def parseColumns(sql: String): Seq[(String, String)] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    // split on commas not inside parens
    val parts = ArrayOps.splitTop(body)
    parts.flatMap { raw =>
      val p = raw.trim
      val up = p.toUpperCase
      if (up.startsWith("PRIMARY") || up.startsWith("FOREIGN") || up.startsWith("UNIQUE") ||
        up.startsWith("CHECK") || up.startsWith("CONSTRAINT")) None
      else {
        val toks = p.split("\\s+")
        val name = toks(0).stripPrefix("\"").stripSuffix("\"").stripPrefix("`").stripSuffix("`")
        val typ0 = if (toks.length > 1) toks(1).toUpperCase else "TEXT"
        val typ = if (up.contains("PRIMARY KEY") && typ0.startsWith("INT")) typ0 + "#PK" else typ0
        Some(name -> typ)
      }
    }
  }

  private object ArrayOps {
    def splitTop(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var depth = 0
      val cur = new StringBuilder
      s.foreach {
        case '(' => depth += 1; cur.append('(')
        case ')' => depth -= 1; cur.append(')')
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c => cur.append(c)
      }
      if (cur.nonEmpty) out += cur.toString
      out.result()
    }
  }

  /** rows of one feature table: column values with the geometry decoded to JTS. */
  def scan(path: String, table: FeatureTable): Iterator[(Long, Array[Any], Geometry)] =
    rows(new Sqlite.Db(path).scanTable(table.rootPage), table)

  /** The table's root-level B-tree subtrees — disjoint rowid ranges that let a
    * multi-GB feature table scan as parallel tasks (one task per page group). */
  def subtreeRoots(path: String, table: FeatureTable): Seq[Long] =
    new Sqlite.Db(path).topLevelChildren(table.rootPage)

  /** Partition scan: only the given subtrees (from [[subtreeRoots]]). */
  def scanPages(path: String, table: FeatureTable, pages: Seq[Long]): Iterator[(Long, Array[Any], Geometry)] =
    rows(new Sqlite.Db(path).scanSubtrees(pages), table)

  private def rows(cells: Iterator[(Long, Array[Any])],
                   table: FeatureTable): Iterator[(Long, Array[Any], Geometry)] = {
    val geomIdx = table.columns.indexWhere(_._1 == table.geomColumn)
    cells.map { case (rowid, cols) =>
      if (table.pkIndex >= 0 && table.pkIndex < cols.length && cols(table.pkIndex) == null)
        cols(table.pkIndex) = rowid
      val geom = if (geomIdx >= 0 && geomIdx < cols.length) cols(geomIdx) match {
        case b: Array[Byte] => decodeGpkgBlob(b)
        case _ => null
      } else null
      (rowid, cols, geom)
    }
  }

  /** keep_wkb scan: the GeoPackageBinary body sliced out verbatim as
    * standard WKB — no JTS decode/validate/re-encode per feature (reference:
    * st_read keep_wkb). Header flags are still checked (extended-type blobs
    * cannot be passed through; they are not WKB). */
  def scanPagesWkb(path: String, table: FeatureTable,
                   pages: Seq[Long]): Iterator[(Long, Array[Any], Array[Byte])] = {
    val geomIdx = table.columns.indexWhere(_._1 == table.geomColumn)
    new Sqlite.Db(path).scanSubtrees(pages).map { case (rowid, cols) =>
      if (table.pkIndex >= 0 && table.pkIndex < cols.length && cols(table.pkIndex) == null)
        cols(table.pkIndex) = rowid
      val wkb = if (geomIdx >= 0 && geomIdx < cols.length) cols(geomIdx) match {
        case b: Array[Byte] => rawWkbBody(b)
        case _ => null
      } else null
      (rowid, cols, wkb)
    }
  }

  /** raw standard-WKB body of a GeoPackageBinary blob; null for non-GP bytes */
  def rawWkbBody(b: Array[Byte]): Array[Byte] = {
    val env = wkbOffset(b)
    if (env < 0) null else java.util.Arrays.copyOfRange(b, env, b.length)
  }

  /** offset of the WKB body inside a GeoPackageBinary blob, -1 if invalid */
  private def wkbOffset(b: Array[Byte]): Int = {
    if (b.length < 8 || b(0) != 'G' || b(1) != 'P') return -1
    val flags = b(3) & 0xff
    // bit 0x20 = extended-type (X) GeoPackageBinary: body is not standard WKB
    if ((flags & 0x20) != 0)
      throw new IllegalArgumentException("extended GeoPackageBinary (flags bit X) is not supported")
    val envSize = ((flags >> 1) & 0x7) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case _ => return -1
    }
    8 + envSize
  }

  def decodeGpkgBlob(b: Array[Byte]): Geometry = {
    val wkbStart = wkbOffset(b)
    if (wkbStart < 0) return null
    val flags = b(3) & 0xff
    val body = java.util.Arrays.copyOfRange(b, wkbStart, b.length)
    // bit 0x10 = empty-geometry (E) flag; the spec still mandates a typed WKB
    // body, which decodes to the right EMPTY geometry — fall back if absent.
    if ((flags & 0x10) != 0) {
      try { val g = Geo.read(body); if (g != null) g else Geo.factory.createGeometryCollection() }
      catch { case _: Exception => Geo.factory.createGeometryCollection() }
    } else Geo.read(body)
  }
}

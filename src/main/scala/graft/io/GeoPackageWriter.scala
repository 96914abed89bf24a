package graft.io

import graft.geom.{Geo, Wkb}
import org.locationtech.jts.geom.Geometry
import java.nio.{ByteBuffer, ByteOrder}

/**
 * GeoPackage writer (OGC GeoPackage 1.3 subset) on [[SqliteWriter]]: one
 * feature table + the required gpkg_spatial_ref_sys / gpkg_contents /
 * gpkg_geometry_columns metadata, geometries as standard GeoPackageBinary
 * blobs (magic GP, little-endian flag, 32-byte XY envelope, ISO WKB body).
 * Round-trips through [[GeoPackage]]'s reader.
 */
object GeoPackageWriter {

  def gpkgBlob(g: Geometry, srsId: Int): Array[Byte] = {
    val wkb = Wkb.write(g)
    val empty = g == null || g.isEmpty
    val envSize = if (empty) 0 else 32
    val bb = ByteBuffer.allocate(8 + envSize + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('G'.toByte).put('P'.toByte).put(0.toByte)
    // flags: bit0 little-endian; envelope indicator 1 (XY) in bits 3-1 → 0x02;
    // empty geometries set the E flag (0x10) and carry no envelope
    bb.put((if (empty) 0x01 | 0x10 else 0x01 | 0x02).toByte)
    bb.putInt(srsId)
    if (!empty) {
      val e = g.getEnvelopeInternal
      bb.putDouble(e.getMinX); bb.putDouble(e.getMaxX)
      bb.putDouble(e.getMinY); bb.putDouble(e.getMaxY)
    }
    bb.put(wkb)
    bb.array()
  }

  /** SQL identifier body escaping: a `"` inside a double-quoted identifier
   *  is written as `""` — without this a quote in a layer/column name would
   *  corrupt the CREATE TABLE text in sqlite_master. */
  private def qid(name: String): String = name.replace("\"", "\"\"")

  /** columns: (name, sqliteType) for the attribute columns (geometry and fid
   *  are added by the writer). `rows`: (geometry, attribute values). */
  def write(path: String, table: String, columns: Seq[(String, String)],
            rows: Iterator[(Geometry, Array[Any])], srsId: Int = 4326,
            open: String => java.io.OutputStream =
              p => new java.io.BufferedOutputStream(new java.io.FileOutputStream(p), 1 << 16),
            srsDef: Option[(String, String)] = None,
            srsOrg: String = "EPSG"): Long =
    writeMulti(path, Seq((table, columns, rows)), srsId, open, srsDef, srsOrg)

  /** Multi-layer GeoPackage: one feature table per entry (a GeoPackage is a
   *  container of layers — reference reads them via st_read's `layer` option,
   *  st_read.cpp:623-631). Returns total feature count. */
  def writeMulti(path: String,
                 tables: Seq[(String, Seq[(String, String)], Iterator[(Geometry, Array[Any])])],
                 srsId: Int = 4326,
                 open: String => java.io.OutputStream =
                   p => new java.io.BufferedOutputStream(new java.io.FileOutputStream(p), 1 << 16),
                 /** (srs_name, WKT definition) for gpkg_spatial_ref_sys when
                   * srsId != 4326 (COPY `SRS` option; Proj.toWkt1 supplies it) */
                 srsDef: Option[(String, String)] = None,
                 /** gpkg_spatial_ref_sys.organization — "EPSG" only when the
                   * id really is an EPSG code; "NONE" for custom definitions */
                 srsOrg: String = "EPSG"): Long = {
    val db = new SqliteWriter.Db
    var total = 0L
    val perTable = tables.map { case (table, columns, rows) =>
      var count = 0L
      var minX = Double.MaxValue; var minY = Double.MaxValue
      var maxX = -Double.MaxValue; var maxY = -Double.MaxValue
      val recs = rows.map { case (g, attrs) =>
        count += 1
        if (g != null && !g.isEmpty) {
          val e = g.getEnvelopeInternal
          minX = math.min(minX, e.getMinX); minY = math.min(minY, e.getMinY)
          maxX = math.max(maxX, e.getMaxX); maxY = math.max(maxY, e.getMaxY)
        }
        // fid = INTEGER PRIMARY KEY → stored as NULL, value is the rowid
        val vals: Seq[Any] = null +: attrs.toSeq :+ (if (g == null) null else gpkgBlob(g, srsId))
        (count, SqliteWriter.record(vals))
      }
      // single streaming pass: rows spill to the page file as they arrive, and
      // count/bounds are final once writeTable returns (consumed before the
      // contents/srs tables below read them)
      val featRoot = db.writeTable(recs)
      total += count
      val bounds =
        if (count == 0 || minX > maxX) (0.0, 0.0, 0.0, 0.0) else (minX, minY, maxX, maxY)
      (table, columns, featRoot, bounds)
    }

    val (srsName, srsWkt) = srsDef.getOrElse(
      ("WGS 84 geodetic",
        "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\",SPHEROID[\"WGS 84\",6378137,298.257223563]]]"))
    val srsRoot = db.writeTable(Seq(
      1L -> SqliteWriter.record(Seq(srsName, srsId.toLong, srsOrg, srsId.toLong, srsWkt, null))))
    val contentsRoot = db.writeTable(perTable.zipWithIndex.map { case ((table, _, _, b), i) =>
      (i + 1L) -> SqliteWriter.record(Seq(table, "features", table, "", "2026-01-01T00:00:00.000Z",
        b._1, b._2, b._3, b._4, srsId.toLong))
    })
    val geomColsRoot = db.writeTable(perTable.zipWithIndex.map { case ((table, _, _, _), i) =>
      (i + 1L) -> SqliteWriter.record(Seq(table, "geom", "GEOMETRY", srsId.toLong, 0L, 0L))
    })

    val featMaster = perTable.map { case (table, columns, featRoot, _) =>
      val colSql = columns.map { case (n, t) => s""""${qid(n)}" $t""" }.mkString(", ")
      (table, featRoot,
        s"""CREATE TABLE "${qid(table)}" (fid INTEGER PRIMARY KEY${if (colSql.isEmpty) "" else ", " + colSql}, geom GEOMETRY)""")
    }
    db.finish(path, open = open, master = Seq(
      // NOTE: srs_id INTEGER PRIMARY KEY is the rowid alias (no autoindex
      // b-tree needed); a TEXT PRIMARY KEY would imply a sqlite_autoindex
      // tree this writer doesn't emit, so table_name is NOT NULL instead
      ("gpkg_spatial_ref_sys", srsRoot,
        "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT, srs_id INTEGER PRIMARY KEY, organization TEXT, organization_coordsys_id INTEGER, definition TEXT, description TEXT)"),
      ("gpkg_contents", contentsRoot,
        "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL, data_type TEXT, identifier TEXT, description TEXT, last_change DATETIME, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"),
      ("gpkg_geometry_columns", geomColsRoot,
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT)")) ++ featMaster)
    total
  }

  def sqliteType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.BooleanType => "INTEGER"
    case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType => "DOUBLE"
    case org.apache.spark.sql.types.BinaryType => "BLOB"
    case _ => "TEXT"
  }
}

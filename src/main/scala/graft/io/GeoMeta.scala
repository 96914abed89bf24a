package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.Paths
import scala.jdk.CollectionConverters._

/**
 * Metadata table functions — the Spark equivalents of ST_Read_Meta,
 * ST_Drivers, Shapefile_Meta, and the R-tree introspection pragmas
 * (/root/reference/spatial/src/spatial/gdal/functions/st_read_meta.cpp,
 * st_drivers.cpp, read_shapefile_meta.cpp:166, rtree_index_pragmas.cpp:236).
 */
object GeoMeta {

  /** ST_Drivers equivalent: the formats this engine reads/writes natively. */
  def drivers(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row("shapefile", "ESRI Shapefile (.shp/.shx/.dbf/.cpg)", true, false),
      Row("geojson", "GeoJSON FeatureCollection (RFC 7946; single-document writer)", true, true),
      Row("geojsonl", "Newline-delimited GeoJSON", true, true),
      Row("osmpbf", "OpenStreetMap PBF (block-parallel)", true, false),
      Row("flatgeobuf", "FlatGeobuf (native flatbuffers decoder)", true, false),
      Row("geopackage", "GeoPackage (read-only sqlite B-tree scan)", true, false),
      Row("kml", "OGC KML Placemarks (StAX streaming parse; Placemark/ExtendedData writer)", true, true),
      Row("gpx", "GPX waypoints/tracks/routes (StAX streaming parse; wpt/trk writer)", true, true),
      Row("csvwkt", "CSV with a WKT geometry column (RFC-4180 reader/writer)", true, true),
      Row("xlsx", "Office Open XML spreadsheet (attribute tables; pure-JVM zip+StAX)", true, true),
      Row("geoparquet", "Parquet + WKB geometry + bbox stats + GeoParquet 1.1 metadata (clustered writer)", true, true))
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("short_name", StringType),
      StructField("description", StringType),
      StructField("can_read", BooleanType),
      StructField("can_write", BooleanType))))
  }

  /** Shapefile_Meta equivalent. */
  def shapefileMeta(spark: SparkSession, path: String): DataFrame = {
    val m = Shapefile.readMeta(path)
    val rows = Seq(Row(path, m.shapeType, m.recordCount,
      m.bbox._1, m.bbox._2, m.bbox._3, m.bbox._4, m.encoding,
      m.fields.map(f => Row(f.name, f.typ.toString, f.width, f.decimals))))
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("path", StringType),
      StructField("shape_type", IntegerType),
      StructField("record_count", IntegerType),
      StructField("min_x", DoubleType), StructField("min_y", DoubleType),
      StructField("max_x", DoubleType), StructField("max_y", DoubleType),
      StructField("encoding", StringType),
      StructField("fields", ArrayType(StructType(Seq(
        StructField("name", StringType), StructField("type", StringType),
        StructField("width", IntegerType), StructField("decimals", IntegerType))))))))
  }

  /** CRS struct matching the reference's geometry-field CRS shape
    * (st_read_meta.cpp:29-37): name, auth_name, auth_code, wkt, proj4,
    * projjson — nulls where a source doesn't carry the representation. */
  private case class CrsDetail(name: String = null, authName: String = null,
                               authCode: String = null, wkt: String = null,
                               proj4: String = null, projjson: String = null) {
    def row: Row = Row(name, authName, authCode, wkt, proj4, projjson)
  }

  private val Crs84Proj4 = "+proj=longlat +datum=WGS84 +no_defs"

  /** name + top-level AUTHORITY from a WKT1 CRS definition. */
  private def fromWkt1(wkt: String): CrsDetail = {
    if (wkt == null || wkt.isEmpty) return CrsDetail()
    val name = "^\\s*\\w+\\[\"([^\"]+)\"".r.findFirstMatchIn(wkt).map(_.group(1)).orNull
    // the outermost authority is the LAST in WKT1 text
    val auth = "AUTHORITY\\[\"([^\"]+)\"\\s*,\\s*\"?([^\"\\]]+)\"?\\]".r
      .findAllMatchIn(wkt).toSeq.lastOption
    CrsDetail(name, auth.map(_.group(1)).orNull, auth.map(_.group(2)).orNull, wkt,
      proj4 = auth.collect { case m if m.group(1) == "EPSG" && m.group(2) == "4326" => Crs84Proj4 }.orNull)
  }

  private def fromProjjson(json: String): CrsDetail = {
    if (json == null) return CrsDetail()
    def f(re: String) = re.r.findFirstMatchIn(json)
    CrsDetail(
      name = f("\"name\"\\s*:\\s*\"([^\"]+)\"").map(_.group(1)).orNull,
      authName = f("\"authority\"\\s*:\\s*\"([^\"]+)\"").map(_.group(1)).orNull,
      authCode = f("\"code\"\\s*:\\s*\"?(\\d+)\"?").map(_.group(1)).orNull,
      projjson = json)
  }

  private val Crs84Detail = CrsDetail("WGS 84 longitude-latitude", "OGC", "CRS84",
    proj4 = Crs84Proj4)

  /** ST_Read_Meta equivalent: schema + counts for any geo path. For parquet
   *  inputs the GeoParquet `geo` footer metadata is surfaced (reference:
   *  st_read_meta.cpp reports layer/CRS detail through GDAL). */
  def readMeta(spark: SparkSession, path: String): DataFrame = {
    val isParquet = path.toLowerCase.stripSuffix("/").endsWith(".parquet") || {
      val p = Paths.get(path.stripPrefix("file:"))
      java.nio.file.Files.isDirectory(p) &&
        java.nio.file.Files.list(p).iterator().asScala.exists(_.toString.endsWith(".parquet"))
    }
    val (fmt, fields, fileCount, geo, crs, detail) =
      if (isParquet) {
        val df = spark.read.parquet(path)
        val n = GeoFiles.expand0(path).count(_.endsWith(".parquet")) max 1
        val g = GeoParquet.readGeo(spark.sessionState.newHadoopConf(), path.stripPrefix("file:"))
        val projjson = g.flatMap { j =>
          "\"crs\"\\s*:\\s*(\\{.*)".r.findFirstMatchIn(j).map(m => balanced(m.group(1)))
        }
        // GeoParquet 1.1: absent "crs" member means OGC:CRS84
        ("geoparquet", df.schema.fields, n, g.orNull,
          g.map(j => if (j.contains("\"crs\"")) null else "OGC:CRS84").orNull,
          projjson.map(fromProjjson).getOrElse(if (g.isDefined) Crs84Detail else CrsDetail()))
      } else {
        val paths = GeoFiles.expand(path)
        val f = GeoFiles.formatOf(paths, None)
        val (crs, detail) = f match {
          case "shapefile" =>
            val prj = java.nio.file.Paths.get(Shapefile.basePath(paths.head) + ".prj")
            if (java.nio.file.Files.exists(prj)) {
              val wkt = new String(java.nio.file.Files.readAllBytes(prj), "UTF-8").trim
              (wkt, fromWkt1(wkt))
            } else (null, CrsDetail())
          case "flatgeobuf" =>
            val h = FlatGeobuf.readHeader(paths.head)
            val base = fromWkt1(h.crsWkt)
            val Array(org, code) = (Option(h.crs).getOrElse(":") + ":").split(":", -1).take(2)
            (h.crs, base.copy(
              name = Option(h.crsName).getOrElse(base.name),
              authName = if (org.nonEmpty) org else base.authName,
              authCode = if (code.nonEmpty) code else base.authCode))
          case "geopackage" =>
            GeoPackage.srsDetail(paths.head) match {
              case Some((name, org, code, wkt)) =>
                (s"$org:$code", fromWkt1(wkt).copy(name = name, authName = org, authCode = code))
              case None => (null, CrsDetail())
            }
          case "geojson" | "geojsonl" | "kml" | "gpx" =>
            ("OGC:CRS84", Crs84Detail) // spec-fixed CRSes
          case _ => (null, CrsDetail())
        }
        (f, GeoFiles.schemaFor(f, paths).fields, paths.length, null, crs, detail)
      }
    val rows = Seq(Row(path, fmt, fileCount,
      fields.map(f => Row(f.name, f.dataType.simpleString)), geo, crs, detail.row))
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("path", StringType),
      StructField("driver", StringType),
      StructField("file_count", IntegerType),
      StructField("fields", ArrayType(StructType(Seq(
        StructField("name", StringType), StructField("type", StringType))))),
      StructField("geo_metadata", StringType),
      StructField("crs", StringType),
      StructField("crs_detail", StructType(Seq(
        StructField("name", StringType), StructField("auth_name", StringType),
        StructField("auth_code", StringType), StructField("wkt", StringType),
        StructField("proj4", StringType), StructField("projjson", StringType)))))))
  }

  /** first balanced {...} prefix of s */
  private def balanced(s: String): String = {
    var depth = 0
    var i = 0
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '"' && s.charAt(i - 1) != '\\') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) return s.substring(0, i + 1)
        case _ =>
      }
      i += 1
    }
    s
  }

  /** Introspection of a clustered-parquet layout (rtree pragma equivalent):
   *  per-file bbox ranges straight from the Parquet footers — the stats that
   *  drive row-group skipping. */
  def clusterInfo(spark: SparkSession, path: String, geomCol: String = "geom"): DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    val rows = files.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        blocks.zipWithIndex.map { case (b, i) =>
          def stat(col: String): (Double, Double) =
            b.getColumns.asScala
              .find(_.getPath.toDotString == s"${geomCol}_bbox.$col")
              .map { c =>
                val st = c.getStatistics
                (st.genericGetMin.asInstanceOf[Double], st.genericGetMax.asInstanceOf[Double])
              }.getOrElse((Double.NaN, Double.NaN))
          val (minxLo, _) = stat("min_x")
          val (_, maxxHi) = stat("max_x")
          val (minyLo, _) = stat("min_y")
          val (_, maxyHi) = stat("max_y")
          Row(f.getName, i, b.getRowCount, minxLo, minyLo, maxxHi, maxyHi)
        }.toSeq
      } finally reader.close()
    }
    spark.createDataFrame(rows.toSeq.asJava, StructType(Seq(
      StructField("file", StringType),
      StructField("row_group", IntegerType),
      StructField("rows", LongType),
      StructField("min_x", DoubleType), StructField("min_y", DoubleType),
      StructField("max_x", DoubleType), StructField("max_y", DoubleType))))
  }
}

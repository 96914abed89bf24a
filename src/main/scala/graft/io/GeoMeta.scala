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
      Row("kml", "OGC KML Placemarks (StAX streaming parse)", true, false),
      Row("gpx", "GPX waypoints/tracks/routes (StAX streaming parse)", true, false),
      Row("csvwkt", "CSV with a WKT geometry column", true, false),
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

  /** ST_Read_Meta equivalent: schema + counts for any geo path. For parquet
   *  inputs the GeoParquet `geo` footer metadata is surfaced (reference:
   *  st_read_meta.cpp reports layer/CRS detail through GDAL). */
  def readMeta(spark: SparkSession, path: String): DataFrame = {
    val isParquet = path.toLowerCase.stripSuffix("/").endsWith(".parquet") || {
      val p = Paths.get(path.stripPrefix("file:"))
      java.nio.file.Files.isDirectory(p) &&
        java.nio.file.Files.list(p).iterator().asScala.exists(_.toString.endsWith(".parquet"))
    }
    val (fmt, fields, fileCount, geo, crs) =
      if (isParquet) {
        val df = spark.read.parquet(path)
        val n = GeoFiles.expand0(path).count(_.endsWith(".parquet")) max 1
        val g = GeoParquet.readGeo(spark.sessionState.newHadoopConf(), path.stripPrefix("file:"))
        // GeoParquet 1.1: absent "crs" member means OGC:CRS84
        ("geoparquet", df.schema.fields, n, g.orNull,
          g.map(j => if (j.contains("\"crs\"")) null else "OGC:CRS84").orNull)
      } else {
        val paths = GeoFiles.expand(path)
        val f = GeoFiles.formatOf(paths, None)
        val crs = f match {
          case "shapefile" =>
            val prj = java.nio.file.Paths.get(Shapefile.basePath(paths.head) + ".prj")
            if (java.nio.file.Files.exists(prj))
              new String(java.nio.file.Files.readAllBytes(prj), "UTF-8").trim
            else null
          case "flatgeobuf" => FlatGeobuf.readHeader(paths.head).crs
          case "geopackage" => GeoPackage.srsInfo(paths.head).orNull
          case "geojson" | "geojsonl" | "kml" | "gpx" => "OGC:CRS84" // spec-fixed CRSes
          case _ => null
        }
        (f, GeoFiles.schemaFor(f, paths).fields, paths.length, null, crs)
      }
    val rows = Seq(Row(path, fmt, fileCount,
      fields.map(f => Row(f.name, f.dataType.simpleString)), geo, crs))
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("path", StringType),
      StructField("driver", StringType),
      StructField("file_count", IntegerType),
      StructField("fields", ArrayType(StructType(Seq(
        StructField("name", StringType), StructField("type", StringType))))),
      StructField("geo_metadata", StringType),
      StructField("crs", StringType))))
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

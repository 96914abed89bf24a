package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/**
 * Spatial write paths.
 *
 * `geojsonl` replaces the reference's GDAL COPY sink (st_write.cpp) — but
 * per-partition files instead of its single global-mutex writer (st_write.cpp:46-55),
 * so the sink scales with the cluster.
 *
 * All binary sinks (shapefile / FlatGeobuf / GeoPackage) write through the
 * Hadoop FileSystem API, so on a real cluster output lands on the shared FS
 * (HDFS/object store), not executor-local disk. `singleFile = true` matches
 * the reference's one-file COPY semantics (st_write.cpp:559-570) by
 * coalescing to one partition first — convenient for interop, inherently
 * serial; the default per-partition layout is the scalable path.
 *
 * Memory bound: these formats need their record count / extent in the header,
 * so each task buffers ONE partition's encoded bytes before writing (the
 * header prefixes data it summarizes). Size partitions accordingly (~100-500
 * MB); the parquet path has no such bound and is the scale-out format.
 *
 * `clusteredParquet` is the R-tree replacement (SURVEY §4.3): rows are
 * Hilbert-ordered on the geometry centroid and written with a sibling
 * `<geom>_bbox` struct column, so Parquet row-group min/max statistics give
 * index-grade pruning (the declarative equivalent of
 * rtree_index_create_logical.cpp's sort-tile-recursive bulk load), and
 * [[graft.plans.BboxSkippingRule]] derives pushable bbox predicates from
 * spatial filters automatically. Files are stamped with GeoParquet 1.1 `geo`
 * footer metadata so DuckDB/GDAL/QGIS recognize the geometry column.
 */
object GeoWriter {

  /** Hadoop Configuration is a Writable, not Serializable; this wrapper ships
   *  it into foreachPartition closures. */
  private[io] final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  private def hconfOf(df: DataFrame) =
    new SerializableHadoopConf(df.sparkSession.sessionState.newHadoopConf())

  private def hadoopOpen(hc: SerializableHadoopConf)(path: String): java.io.OutputStream = {
    val p = new org.apache.hadoop.fs.Path(path)
    new java.io.BufferedOutputStream(p.getFileSystem(hc.value).create(p, true), 1 << 16)
  }

  private def mkdirs(hc: SerializableHadoopConf, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(hc.value).mkdirs(p)
  }

  /** (organization, numeric id) for an SRS spelling. Only a true
   *  `AUTHORITY:nnnn` code keeps its organization and number; anything else
   *  (a `+proj=` string, inline WKT, `OGC:CRS84`) gets organization "NONE"
   *  with id 0 — GPKG/FGB catalog entries must not claim an EPSG identity
   *  for a definition that is not the EPSG one (GPKG spec's undefined-SRS
   *  convention). */
  private[io] def srsOrgId(code: String): (String, Int) = {
    val m = "^([A-Za-z_]+):(\\d+)$".r.findFirstMatchIn(code.trim)
    m.map(g => (g.group(1).toUpperCase(java.util.Locale.ROOT), g.group(2).toInt))
      .getOrElse(("NONE", 0))
  }

  /** COPY-TO dispatch with the reference's option surface (st_write.cpp
   *  Bind, :68-140): `DRIVER` (GDAL or short spelling; else sniffed from the
   *  extension), `LAYER_NAME` (GeoPackage feature table), `GEOMETRY_TYPE`
   *  (singles promote to a requested MULTI type; residual mismatches raise
   *  per feature — OGR's stance), `SRS` (stamped where the format records a
   *  CRS: shapefile `.prj` sidecars, GeoPackage srs table; WGS84-by-spec
   *  formats reject anything else loudly), `SINGLE_FILE` (the reference's
   *  one-file COPY semantics). Unknown options fail loudly like the
   *  reference's BinderException. */
  def copy(df: DataFrame, geomCol: String, path: String,
           options: Map[String, String] = Map.empty): Unit = {
    val opts = options.map { case (k, v) => k.toUpperCase(java.util.Locale.ROOT) -> v }
    val known = Set("DRIVER", "LAYER_NAME", "GEOMETRY_TYPE", "SRS", "SINGLE_FILE")
    val unknown = opts.keySet -- known
    require(unknown.isEmpty,
      s"COPY: unknown option(s) ${unknown.mkString(", ")} (supported: ${known.toSeq.sorted.mkString(", ")})")

    val lower = path.toLowerCase(java.util.Locale.ROOT)
    val driver = opts.get("DRIVER").map(_.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "esri shapefile" | "shapefile" | "shp" => "shp"
      case "geojsonseq" | "geojsonl" | "ndjson" => "geojsonl"
      case "geojson" => "geojson"
      case "flatgeobuf" | "fgb" => "fgb"
      case "gpkg" | "geopackage" => "gpkg"
      case "kml" | "libkml" => "kml"
      case "kmz" => "kmz"
      case "gpx" => "gpx"
      case "gml" => "gml"
      case "georss" => "georss"
      case "dxf" => "dxf"
      case "mapinfo file" | "mapinfo" | "mif" => "mif"
      case "gmt" => "gmt"
      case "ods" => "ods"
      case "pgdump" => "pgdump"
      case "csv" => "csv"
      case "xlsx" => "xlsx"
      case "parquet" | "geoparquet" => "parquet"
      case d => throw new IllegalArgumentException(
        s"COPY: unsupported DRIVER '$d' — run st_drivers() for the writable set " +
          "(MVT tiles go through GeoWriter.mvt/mvtPyramid: a tile needs an envelope)")
    }).getOrElse {
      val exts = Seq("geojsonl" -> "geojsonl", "ndjson" -> "geojsonl", "jsonl" -> "geojsonl",
        "geojson" -> "geojson", "json" -> "geojson", "shp" -> "shp", "fgb" -> "fgb",
        "gpkg" -> "gpkg", "kml" -> "kml", "kmz" -> "kmz", "gpx" -> "gpx", "gml" -> "gml",
        "rss" -> "georss", "atom" -> "georss", "dxf" -> "dxf", "mif" -> "mif",
        "gmt" -> "gmt", "ods" -> "ods", "sql" -> "pgdump", "csv" -> "csv",
        "xlsx" -> "xlsx", "parquet" -> "parquet")
      exts.collectFirst { case (e, d) if lower.endsWith("." + e) => d }.getOrElse(
        throw new IllegalArgumentException(
          s"COPY: cannot infer a driver from '$path' — pass DRIVER explicitly"))
    }

    val typed = opts.get("GEOMETRY_TYPE").map(_.trim.toUpperCase(java.util.Locale.ROOT)) match {
      case None => df
      case Some(t) =>
        val allowed = Set("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
          "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION")
        require(allowed.contains(t),
          s"COPY: unknown GEOMETRY_TYPE '$t', expected one of ${allowed.toSeq.sorted.mkString(", ")}")
        graft.Graft.register(df.sparkSession)
        val g = s"`$geomCol`"
        val promoted = if (t.startsWith("MULTI")) s"st_multi($g)" else g
        df.withColumn(geomCol, expr(
          s"CASE WHEN $g IS NULL THEN $g WHEN st_geometrytype($promoted) = '$t' THEN $promoted " +
            s"ELSE raise_error(concat('COPY: feature geometry type ', st_geometrytype($g), " +
            s"' does not match GEOMETRY_TYPE $t')) END"))
    }

    val srsCode = opts.get("SRS").map(_.trim).map(s => if (s.forall(_.isDigit)) s"EPSG:$s" else s)
    val wgs84Only = Set("geojsonl", "geojson", "kml", "kmz", "gpx", "georss")
    val stampable = Set("shp", "gpkg", "fgb", "parquet")
    srsCode.foreach { c =>
      if (wgs84Only.contains(driver))
        require(Set("EPSG:4326", "OGC:CRS84", "CRS84").contains(c.toUpperCase(java.util.Locale.ROOT)),
          s"COPY: the $driver format is WGS 84 by specification — SRS '$c' cannot be " +
            "stamped; st_transform the geometry first")
      else require(stampable.contains(driver),
        s"COPY: SRS stamping is supported for ${stampable.toSeq.sorted.mkString(", ")} " +
          s"(and ${wgs84Only.toSeq.sorted.mkString(", ")} accept only WGS 84)")
    }
    // resolve eagerly so an unknown code fails before any data moves:
    // WKT1 for .prj/gpkg/fgb stamps, PROJJSON for the GeoParquet footer
    val srsWkt = srsCode.filter(_ => stampable.contains(driver) && driver != "parquet").map { c =>
      graft.geom.Proj.toWkt1(c).getOrElse(throw new IllegalArgumentException(
        s"COPY: SRS '$c' is not resolvable in the EPSG registry (st_list_proj_crs()) " +
          "or has no WKT1 form (grid-shift datums)"))
    }
    val srsProjjson = srsCode.filter(_ => driver == "parquet").map { c =>
      graft.geom.Proj.toProjjson(c).getOrElse(throw new IllegalArgumentException(
        s"COPY: SRS '$c' has no PROJJSON form here (unknown code, grid datum, " +
          "or a method outside the PROJJSON mapping)"))
    }

    val layer = opts.get("LAYER_NAME")
    require(layer.isEmpty || driver == "gpkg",
      "COPY: LAYER_NAME applies to the GPKG driver (layer-bearing container)")
    val single = opts.get("SINGLE_FILE").exists(v => v == "1" || v.equalsIgnoreCase("true"))

    driver match {
      case "geojsonl" => geojsonl(typed, geomCol, path, single)
      case "geojson" => geojson(typed, geomCol, path)
      case "shp" =>
        shapefile(typed, geomCol, path, single)
        srsWkt.foreach(w => writePrjSidecars(hconfOf(df), path, single, w))
      case "fgb" =>
        val fgbCrs = srsWkt.map { w =>
          val (org, code) = srsOrgId(srsCode.get)
          (org, code, graft.geom.Proj.lookup(srsCode.get).map(_.name).getOrElse(srsCode.get), w)
        }
        flatgeobuf(typed, geomCol, path, single, fgbCrs)
      case "gpkg" =>
        val (srsOrg, srsId) = srsCode.map(srsOrgId).getOrElse(("EPSG", 4326))
        val srsDef = srsWkt.map(w => (graft.geom.Proj.lookup(srsCode.get).map(_.name)
          .getOrElse(srsCode.get), w))
        geopackage(typed, geomCol, path, layer.getOrElse("features"), single, srsId, srsDef,
          srsOrg)
      case "kml" => kml(typed, geomCol, path, single)
      case "kmz" => kmz(typed, geomCol, path, single)
      case "gpx" => gpx(typed, geomCol, path, single)
      case "gml" => gml(typed, geomCol, path, single)
      case "georss" => georss(typed, geomCol, path, single)
      case "dxf" => dxf(typed, geomCol, path, single)
      case "mif" => mif(typed, geomCol, path, single)
      case "gmt" => gmt(typed, geomCol, path, single)
      case "ods" => ods(typed, path, single)
      case "pgdump" => pgdump(typed, geomCol, path)
      case "csv" => csvWkt(typed, geomCol, path, single)
      case "xlsx" => xlsx(typed, path, single)
      case "parquet" => clusteredParquet(typed, geomCol, path, crs = srsProjjson)
    }
  }

  /** `.prj` sidecars for every emitted `.shp` (COPY `SRS` stamping). */
  private def writePrjSidecars(hc: SerializableHadoopConf, path: String,
                               singleFile: Boolean, wkt: String): Unit = {
    def put(prjPath: String): Unit = {
      val os = hadoopOpen(hc)(prjPath)
      try os.write(wkt.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally os.close()
    }
    if (singleFile) put(path.stripSuffix(".shp") + ".prj")
    else {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(hc.value)
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.toString
        if (n.endsWith(".shp")) put(n.stripSuffix(".shp") + ".prj")
      }
    }
  }

  /** Write `df` as newline-delimited GeoJSON features. All non-geometry
   *  columns become properties (JSON-typed via to_json). */
  def geojsonl(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit = {
    graft.Graft.register(df.sparkSession)
    val props = df.columns.filter(_ != geomCol)
    val line = concat(
      lit("""{"type":"Feature","geometry":"""),
      expr(s"st_asgeojson(`$geomCol`)"),
      lit(""","properties":"""),
      to_json(struct(props.map(col).toIndexedSeq: _*)),
      lit("}"))
    val lines = df.select(line.as("value"))
    if (singleFile) { // one exact-path file (reference COPY GeoJSONSeq semantics)
      val hc = hconfOf(df)
      lines.coalesce(1).foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val out = new java.io.PrintWriter(hadoopOpen(hc)(path))
        try it.foreach(r => out.println(r.getString(0))) finally out.close()
      }
    } else lines.write.mode("overwrite").text(path)
  }

  /** Hive-style partitioned geojsonl tree: rows land in
    * `path/k1=v1/.../part-<task>.geojsonl` with the partition columns
    * DROPPED from the feature properties (they live in the path — the same
    * semantics as Spark's parquet `partitionBy`, and exactly the layout the
    * geo reader's partition discovery + file-level pruning consumes).
    * One shuffle on the partition keys; within a task one lazily-opened
    * writer per distinct combo. Null values write the
    * `__HIVE_DEFAULT_PARTITION__` sentinel; everything else is %XX-escaped
    * per UTF-8 byte (the reader's decode mirror). */
  def geojsonlPartitioned(df: DataFrame, geomCol: String, path: String,
                          partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "partitionBy must be non-empty")
    require(!partitionBy.contains(geomCol), "cannot partition by the geometry column")
    partitionBy.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    graft.Graft.register(df.sparkSession)
    val hc = hconfOf(df)
    val props = df.columns.filterNot(c => c == geomCol || partitionBy.contains(c))
    val line = concat(
      lit("""{"type":"Feature","geometry":"""),
      expr(s"st_asgeojson(`$geomCol`)"),
      lit(""","properties":"""),
      to_json(struct(props.map(col).toIndexedSeq: _*)),
      lit("}"))
    df.select(struct(partitionBy.map(col).toIndexedSeq: _*).as("__part"), line.as("value"))
      .repartition(col("__part"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val writers = scala.collection.mutable.Map.empty[String, java.io.PrintWriter]
        try {
          it.foreach { r =>
            val part = r.getStruct(0)
            val rel = partitionBy.indices.map { idx =>
              val v = part.get(idx)
              s"${partitionBy(idx)}=${escapePartValue(if (v == null) null else v.toString)}"
            }.mkString("/")
            val w = writers.getOrElseUpdate(rel, {
              mkdirs(hc, s"$path/$rel")
              new java.io.PrintWriter(hadoopOpen(hc)(f"$path/$rel/part-$pid%05d.geojsonl"))
            })
            w.println(r.getString(1))
          }
        } finally writers.values.foreach(_.close())
        ()
      }
  }

  /** Hive path escaping: %XX per UTF-8 byte outside [A-Za-z0-9._-] */
  private def escapePartValue(v: String): String =
    if (v == null) "__HIVE_DEFAULT_PARTITION__"
    else {
      val sb = new java.lang.StringBuilder
      v.getBytes("UTF-8").foreach { b =>
        val c = (b & 0xff).toChar
        if (c.isLetterOrDigit && b >= 0 || c == '.' || c == '-' || c == '_') sb.append(c)
        else sb.append(f"%%${b & 0xff}%02X")
      }
      sb.toString
    }

  /** Write `df` as a single GeoJSON FeatureCollection document (the
   *  reference's GDAL 'GeoJSON' COPY driver semantics; 'GeoJSONSeq' maps to
   *  [[geojsonl]]). One file — inherently serial like any single-document
   *  format; use geojsonl or parquet for the scale path. */
  def geojson(df: DataFrame, geomCol: String, path: String): Unit = {
    graft.Graft.register(df.sparkSession)
    val hc = hconfOf(df)
    val props = df.columns.filter(_ != geomCol)
    val line = concat(
      lit("""{"type":"Feature","geometry":"""),
      expr(s"st_asgeojson(`$geomCol`)"),
      lit(""","properties":"""),
      to_json(struct(props.map(col).toIndexedSeq: _*)),
      lit("}"))
    df.select(line.as("value")).coalesce(1).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val out = new java.io.PrintWriter(hadoopOpen(hc)(path))
        try {
          out.print("""{"type":"FeatureCollection","features":[""")
          var first = true
          it.foreach { r =>
            if (!first) out.print(",")
            out.print("\n")
            out.print(r.getString(0))
            first = false
          }
          out.print("\n]}\n")
        } finally out.close()
    }
  }

  /** Shared per-partition (or coalesced single-file) text sink through the
   *  Hadoop FileSystem; `render` writes one whole file from one partition. */
  private def writeTextFiles(df: DataFrame, path: String, ext: String, singleFile: Boolean)(
      render: (Iterator[org.apache.spark.sql.Row], java.io.PrintWriter) => Unit): Unit = {
    val hc = hconfOf(df)
    val target = if (singleFile) df.coalesce(1) else { mkdirs(hc, path); df }
    target.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext || singleFile) {
        val dest = if (singleFile) path else f"$path/part-$pid%05d.$ext"
        val out = new java.io.PrintWriter(hadoopOpen(hc)(dest))
        try render(it, out) finally out.close()
      }
      ()
    }
  }

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  private def kmlCoord(c: org.locationtech.jts.geom.Coordinate): String = {
    val base = s"${graft.geom.Geo.fmt(c.x)},${graft.geom.Geo.fmt(c.y)}"
    if (c.getZ.isNaN) base else base + "," + graft.geom.Geo.fmt(c.getZ)
  }

  private def kmlGeometry(g: org.locationtech.jts.geom.Geometry, sb: java.lang.StringBuilder): Unit = {
    import org.locationtech.jts.geom._
    g match {
      case p: Point =>
        sb.append("<Point><coordinates>")
        if (!p.isEmpty) sb.append(kmlCoord(p.getCoordinate))
        sb.append("</coordinates></Point>")
      case l: LineString =>
        sb.append("<LineString><coordinates>")
          .append(l.getCoordinates.map(kmlCoord).mkString(" "))
          .append("</coordinates></LineString>")
      case p: Polygon =>
        sb.append("<Polygon><outerBoundaryIs><LinearRing><coordinates>")
          .append(p.getExteriorRing.getCoordinates.map(kmlCoord).mkString(" "))
          .append("</coordinates></LinearRing></outerBoundaryIs>")
        (0 until p.getNumInteriorRing).foreach { i =>
          sb.append("<innerBoundaryIs><LinearRing><coordinates>")
            .append(p.getInteriorRingN(i).getCoordinates.map(kmlCoord).mkString(" "))
            .append("</coordinates></LinearRing></innerBoundaryIs>")
        }
        sb.append("</Polygon>")
      case gc: GeometryCollection =>
        sb.append("<MultiGeometry>")
        (0 until gc.getNumGeometries).foreach(i => kmlGeometry(gc.getGeometryN(i), sb))
        sb.append("</MultiGeometry>")
      case other =>
        throw new IllegalArgumentException(s"KML cannot represent ${other.getGeometryType}")
    }
  }

  /** Write `df` as KML documents (reference: GDAL KML driver via COPY):
   *  a `name` column becomes the Placemark name; every other non-geometry
   *  column goes to ExtendedData (the [[XmlGeo]] reader round-trips both). */
  def kml(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit =
    writeTextFiles(df, path, "kml", singleFile)(kmlRenderer(df.schema, geomCol))

  /** Write `df` as KMZ archives (doc.kml inside a zip — OGC KML 2.2 §10.2);
   *  otherwise identical to the [[kml]] sink. */
  def kmz(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit = {
    val hc = hconfOf(df)
    val render = kmlRenderer(df.schema, geomCol)
    val target = if (singleFile) df.coalesce(1) else { mkdirs(hc, path); df }
    target.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext || singleFile) {
        val dest = if (singleFile) path else f"$path/part-$pid%05d.kmz"
        val zos = new java.util.zip.ZipOutputStream(hadoopOpen(hc)(dest))
        try {
          zos.putNextEntry(new java.util.zip.ZipEntry("doc.kml"))
          val pw = new java.io.PrintWriter(new java.io.OutputStreamWriter(zos, "UTF-8"))
          render(it, pw)
          pw.flush()
          zos.closeEntry()
        } finally zos.close()
      }
      ()
    }
  }

  private def kmlRenderer(schema: org.apache.spark.sql.types.StructType, geomCol: String):
      (Iterator[org.apache.spark.sql.Row], java.io.PrintWriter) => Unit = {
    val geomIdx = schema.fieldIndex(geomCol)
    val nameIdx = schema.fieldNames.indexWhere(_.equalsIgnoreCase("name"))
    val attrIdx = schema.fields.indices.filter(i => i != geomIdx && i != nameIdx)
    val attrNames = attrIdx.map(schema.fields(_).name)
    (it, out) => {
      out.println("""<?xml version="1.0" encoding="UTF-8"?>""")
      out.println("""<kml xmlns="http://www.opengis.net/kml/2.2"><Document>""")
      it.foreach { r =>
        val sb = new java.lang.StringBuilder("<Placemark>")
        if (nameIdx >= 0 && !r.isNullAt(nameIdx))
          sb.append("<name>").append(xmlEsc(String.valueOf(r.get(nameIdx)))).append("</name>")
        if (attrIdx.nonEmpty) {
          sb.append("<ExtendedData>")
          attrIdx.zip(attrNames).foreach { case (i, n) =>
            if (!r.isNullAt(i))
              sb.append(s"""<Data name="${xmlEsc(n)}"><value>""")
                .append(xmlEsc(String.valueOf(r.get(i)))).append("</value></Data>")
          }
          sb.append("</ExtendedData>")
        }
        r.get(geomIdx) match {
          case b: Array[Byte] => kmlGeometry(graft.geom.Geo.read(b), sb)
          case _ =>
        }
        sb.append("</Placemark>")
        out.println(sb.toString)
      }
      out.println("</Document></kml>")
    }
  }

  private def gmlPos(cs: Array[org.locationtech.jts.geom.Coordinate]): String = {
    val dim = if (cs.exists(c => !c.getZ.isNaN)) 3 else 2
    val txt = cs.map { c =>
      val base = s"${graft.geom.Geo.fmt(c.x)} ${graft.geom.Geo.fmt(c.y)}"
      if (dim == 3) base + " " + graft.geom.Geo.fmt(if (c.getZ.isNaN) 0.0 else c.getZ) else base
    }.mkString(" ")
    s"""<gml:posList srsDimension="$dim">$txt</gml:posList>"""
  }

  private def gmlGeometry(g: org.locationtech.jts.geom.Geometry, sb: java.lang.StringBuilder): Unit = {
    import org.locationtech.jts.geom._
    g match {
      case p: Point =>
        sb.append("<gml:Point>")
        if (!p.isEmpty) {
          val c = p.getCoordinate
          val z = if (c.getZ.isNaN) "" else " " + graft.geom.Geo.fmt(c.getZ)
          sb.append(s"<gml:pos>${graft.geom.Geo.fmt(c.x)} ${graft.geom.Geo.fmt(c.y)}$z</gml:pos>")
        }
        sb.append("</gml:Point>")
      case l: LineString =>
        sb.append("<gml:LineString>").append(gmlPos(l.getCoordinates)).append("</gml:LineString>")
      case p: Polygon =>
        sb.append("<gml:Polygon><gml:exterior><gml:LinearRing>")
          .append(gmlPos(p.getExteriorRing.getCoordinates))
          .append("</gml:LinearRing></gml:exterior>")
        (0 until p.getNumInteriorRing).foreach { i =>
          sb.append("<gml:interior><gml:LinearRing>")
            .append(gmlPos(p.getInteriorRingN(i).getCoordinates))
            .append("</gml:LinearRing></gml:interior>")
        }
        sb.append("</gml:Polygon>")
      case m: MultiPoint =>
        sb.append("<gml:MultiPoint>")
        (0 until m.getNumGeometries).foreach { i =>
          sb.append("<gml:pointMember>"); gmlGeometry(m.getGeometryN(i), sb); sb.append("</gml:pointMember>")
        }
        sb.append("</gml:MultiPoint>")
      case m: MultiLineString =>
        sb.append("<gml:MultiCurve>")
        (0 until m.getNumGeometries).foreach { i =>
          sb.append("<gml:curveMember>"); gmlGeometry(m.getGeometryN(i), sb); sb.append("</gml:curveMember>")
        }
        sb.append("</gml:MultiCurve>")
      case m: MultiPolygon =>
        sb.append("<gml:MultiSurface>")
        (0 until m.getNumGeometries).foreach { i =>
          sb.append("<gml:surfaceMember>"); gmlGeometry(m.getGeometryN(i), sb); sb.append("</gml:surfaceMember>")
        }
        sb.append("</gml:MultiSurface>")
      case gc: GeometryCollection =>
        sb.append("<gml:MultiGeometry>")
        (0 until gc.getNumGeometries).foreach(i => gmlGeometry(gc.getGeometryN(i), sb))
        sb.append("</gml:MultiGeometry>")
    }
  }

  /** Write `df` as a GML 3 feature collection (the write half of the GML
   *  reader in [[XmlGeo.gmlFeatures]]): one `gml:featureMember` per row
   *  wrapping a `graft:feature` element; non-geometry columns become leaf
   *  text properties; the geometry emits as posList/pos with srsDimension. */
  def gml(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit = {
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filter(_ != geomIdx)
    val attrNames = attrIdx.map(schema.fields(_).name)
    writeTextFiles(df, path, "gml", singleFile) { (it, out) =>
      out.println("""<?xml version="1.0" encoding="UTF-8"?>""")
      out.println("""<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml" xmlns:graft="urn:graft">""")
      var n = 0
      it.foreach { r =>
        n += 1
        val sb = new java.lang.StringBuilder(s"""<gml:featureMember><graft:feature gml:id="f$n">""")
        attrIdx.zip(attrNames).foreach { case (i, name) =>
          if (!r.isNullAt(i))
            sb.append(s"<graft:${xmlEsc(name)}>").append(xmlEsc(String.valueOf(r.get(i))))
              .append(s"</graft:${xmlEsc(name)}>")
        }
        r.get(geomIdx) match {
          case b: Array[Byte] =>
            sb.append("<graft:geom>"); gmlGeometry(graft.geom.Geo.read(b), sb); sb.append("</graft:geom>")
          case _ =>
        }
        sb.append("</graft:feature></gml:featureMember>")
        out.println(sb.toString)
      }
      out.println("</gml:FeatureCollection>")
    }
  }

  /** Write `df` as GeoRSS-Simple (RSS 2.0 items): Point → `georss:point`,
   *  LineString → `georss:line`, Polygon exterior → `georss:polygon` —
   *  lat-lon pair order per the GeoRSS spec (flipped back to x=lon by the
   *  reader). A `title` column becomes the item title; every other
   *  non-geometry column becomes an element the reader surfaces (title,
   *  description, link, category, author). Other geometry types are rejected
   *  rather than silently mangled (the Simple encoding has no Multi*). */
  def georss(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit = {
    import org.locationtech.jts.geom._
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filter(_ != geomIdx)
    val attrNames = attrIdx.map(schema.fields(_).name)
    writeTextFiles(df, path, "rss", singleFile) { (it, out) =>
      out.println("""<?xml version="1.0" encoding="UTF-8"?>""")
      out.println("""<rss version="2.0" xmlns:georss="http://www.georss.org/georss"><channel>""")
      def fmt(d: Double) = graft.geom.Geo.fmt(d)
      def pairs(cs: Array[Coordinate]): String =
        cs.map(c => s"${fmt(c.y)} ${fmt(c.x)}").mkString(" ")
      it.foreach { r =>
        val sb = new java.lang.StringBuilder("<item>")
        attrIdx.zip(attrNames).foreach { case (i, n) =>
          if (!r.isNullAt(i))
            sb.append(s"<${xmlEsc(n)}>").append(xmlEsc(String.valueOf(r.get(i)))).append(s"</${xmlEsc(n)}>")
        }
        r.get(geomIdx) match {
          case b: Array[Byte] => graft.geom.Geo.read(b) match {
            case p: Point if !p.isEmpty =>
              sb.append(s"<georss:point>${fmt(p.getY)} ${fmt(p.getX)}</georss:point>")
            case l: LineString =>
              sb.append(s"<georss:line>${pairs(l.getCoordinates)}</georss:line>")
            case p: Polygon =>
              sb.append(s"<georss:polygon>${pairs(p.getExteriorRing.getCoordinates)}</georss:polygon>")
            case g if g.isEmpty =>
            case other =>
              throw new IllegalArgumentException(s"GeoRSS-Simple cannot represent ${other.getGeometryType}")
          }
          case _ =>
        }
        sb.append("</item>")
        out.println(sb.toString)
      }
      out.println("</channel></rss>")
    }
  }

  /** Write `df` as ASCII DXF ENTITIES: Point → POINT, LineString →
   *  LWPOLYLINE (closed rings carry the closed flag), Polygon → one closed
   *  LWPOLYLINE per ring, Multi* recurse per part. A `layer` column sets the
   *  entity layer (default "0"). The [[Dxf]] reader round-trips the output. */
  def dxf(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit = {
    import org.locationtech.jts.geom._
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val layerIdx = schema.fieldNames.indexWhere(_.equalsIgnoreCase("layer"))
    writeTextFiles(df, path, "dxf", singleFile) { (it, out) =>
      out.print("0\nSECTION\n2\nENTITIES\n")
      def fmt(d: Double) = graft.geom.Geo.fmt(d)
      def lwpoly(layer: String, cs: Array[Coordinate], closed: Boolean, sb: java.lang.StringBuilder): Unit = {
        // a closed ring's repeated last vertex is carried by the flag instead
        val pts = if (closed && cs.length >= 2 && cs.head.equals2D(cs.last)) cs.dropRight(1) else cs
        sb.append("0\nLWPOLYLINE\n8\n").append(layer).append('\n')
          .append("90\n").append(pts.length).append("\n70\n").append(if (closed) 1 else 0).append('\n')
        pts.foreach(c => sb.append("10\n").append(fmt(c.x)).append("\n20\n").append(fmt(c.y)).append('\n'))
      }
      def entity(layer: String, g: Geometry, sb: java.lang.StringBuilder): Unit = g match {
        case p: Point if !p.isEmpty =>
          sb.append("0\nPOINT\n8\n").append(layer).append('\n')
            .append("10\n").append(fmt(p.getX)).append("\n20\n").append(fmt(p.getY)).append('\n')
        case l: LineString => lwpoly(layer, l.getCoordinates, closed = false, sb)
        case p: Polygon =>
          lwpoly(layer, p.getExteriorRing.getCoordinates, closed = true, sb)
          (0 until p.getNumInteriorRing).foreach(i =>
            lwpoly(layer, p.getInteriorRingN(i).getCoordinates, closed = true, sb))
        case gc: GeometryCollection =>
          (0 until gc.getNumGeometries).foreach(i => entity(layer, gc.getGeometryN(i), sb))
        case _ =>
      }
      it.foreach { r =>
        val layer = if (layerIdx >= 0 && !r.isNullAt(layerIdx)) String.valueOf(r.get(layerIdx)) else "0"
        r.get(geomIdx) match {
          case b: Array[Byte] =>
            val sb = new java.lang.StringBuilder
            entity(layer, graft.geom.Geo.read(b), sb)
            out.print(sb)
          case _ =>
        }
      }
      out.print("0\nENDSEC\n0\nEOF\n")
    }
  }

  /** Write `df` as GPX: Point rows → `<wpt>` (with optional name/ele columns),
   *  LineString rows → `<trk>` with one `<trkseg>`, MultiLineString → one
   *  `<trk>` with a `<trkseg>` per part. GPX has no polygon concept — other
   *  types are rejected rather than silently mangled. */
  def gpx(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit = {
    import org.locationtech.jts.geom._
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val nameIdx = schema.fieldNames.indexWhere(_.equalsIgnoreCase("name"))
    val eleIdx = schema.fieldNames.indexWhere(_.equalsIgnoreCase("ele"))
    writeTextFiles(df, path, "gpx", singleFile) { (it, out) =>
      out.println("""<?xml version="1.0" encoding="UTF-8"?>""")
      out.println("""<gpx version="1.1" creator="graft" xmlns="http://www.topografix.com/GPX/1/1">""")
      def fmt(d: Double) = graft.geom.Geo.fmt(d)
      it.foreach { r =>
        val name = if (nameIdx >= 0 && !r.isNullAt(nameIdx)) String.valueOf(r.get(nameIdx)) else null
        def nameEl = if (name != null) s"<name>${xmlEsc(name)}</name>" else ""
        def trkseg(l: LineString): String =
          "<trkseg>" + l.getCoordinates.map(c =>
            s"""<trkpt lat="${fmt(c.y)}" lon="${fmt(c.x)}"/>""").mkString + "</trkseg>"
        r.get(geomIdx) match {
          case b: Array[Byte] => graft.geom.Geo.read(b) match {
            case p: Point if !p.isEmpty =>
              val ele = if (eleIdx >= 0 && !r.isNullAt(eleIdx))
                s"<ele>${String.valueOf(r.get(eleIdx))}</ele>" else ""
              out.println(s"""<wpt lat="${fmt(p.getY)}" lon="${fmt(p.getX)}">$nameEl$ele</wpt>""")
            case l: LineString =>
              out.println(s"<trk>$nameEl${trkseg(l)}</trk>")
            case m: MultiLineString =>
              val segs = (0 until m.getNumGeometries)
                .map(i => trkseg(m.getGeometryN(i).asInstanceOf[LineString])).mkString
              out.println(s"<trk>$nameEl$segs</trk>")
            case other =>
              throw new IllegalArgumentException(s"GPX cannot represent ${other.getGeometryType}")
          }
          case _ =>
        }
      }
      out.println("</gpx>")
    }
  }

  /** Write `df` as CSV with a WKT geometry column (RFC-4180 quoting). The
   *  geometry header keeps the column's name when [[CsvWkt]] recognizes it,
   *  else `wkt`, so graft's own reader round-trips the output. */
  def csvWkt(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit = {
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filter(_ != geomIdx)
    val geomHeader =
      if (Set("wkt", "geometry", "geom", "the_geom", "wkb_geometry").contains(geomCol.toLowerCase)) geomCol
      else "wkt"
    def quote(s: String): String =
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val header = (attrIdx.map(schema.fields(_).name) :+ geomHeader).map(quote).mkString(",")
    writeTextFiles(df, path, "csv", singleFile) { (it, out) =>
      out.println(header)
      it.foreach { r =>
        val attrs = attrIdx.map(i => if (r.isNullAt(i)) "" else quote(String.valueOf(r.get(i))))
        val wkt = r.get(geomIdx) match {
          case b: Array[Byte] => quote(graft.geom.Wkt.write(graft.geom.Geo.read(b)))
          case _ => ""
        }
        out.println((attrs :+ wkt).mkString(","))
      }
    }
  }

  /** Write `df` as MapInfo Interchange MIF/MID pairs (one pair per
   *  partition, or `<path>`(.mif)+sibling .mid when `singleFile = true`).
   *  Non-geometry columns become MID attributes with MIF-typed columns
   *  (Integer for integral Spark types, Float for fractional, Char(254)
   *  otherwise); [[MapInfoMif.features]] round-trips the output. */
  def mif(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit = {
    val hc = hconfOf(df)
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filter(_ != geomIdx)
    val colDefs = attrIdx.map { i =>
      val f = schema.fields(i)
      val t = f.dataType match {
        case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.ShortType => "Integer"
        case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType => "Float"
        case _ => "Char(254)"
      }
      s"  ${f.name} $t"
    }
    def fmt(d: Double): String = graft.geom.Geo.fmt(d)
    def ringTxt(cs: Array[org.locationtech.jts.geom.Coordinate], sb: java.lang.StringBuilder): Unit = {
      sb.append("  ").append(cs.length).append('\n')
      cs.foreach(c => sb.append(fmt(c.x)).append(' ').append(fmt(c.y)).append('\n'))
    }
    def geomTxt(g: org.locationtech.jts.geom.Geometry, sb: java.lang.StringBuilder): Unit = {
      import org.locationtech.jts.geom._
      g match {
        case g if g.isEmpty => sb.append("None\n")
        case p: Point => sb.append("Point ").append(fmt(p.getX)).append(' ').append(fmt(p.getY)).append('\n')
        case mp: MultiPoint =>
          sb.append("Multipoint ").append(mp.getNumGeometries).append('\n')
          (0 until mp.getNumGeometries).foreach { i =>
            val p = mp.getGeometryN(i).asInstanceOf[Point]
            sb.append(fmt(p.getX)).append(' ').append(fmt(p.getY)).append('\n')
          }
        case l: LineString =>
          sb.append("Pline")
          ringTxt(l.getCoordinates, sb)
        case ml: MultiLineString =>
          sb.append("Pline Multiple ").append(ml.getNumGeometries).append('\n')
          (0 until ml.getNumGeometries).foreach(i => ringTxt(ml.getGeometryN(i).getCoordinates, sb))
        case p: Polygon =>
          sb.append("Region ").append(1 + p.getNumInteriorRing).append('\n')
          ringTxt(p.getExteriorRing.getCoordinates, sb)
          (0 until p.getNumInteriorRing).foreach(i => ringTxt(p.getInteriorRingN(i).getCoordinates, sb))
        case mp: MultiPolygon =>
          val rings = (0 until mp.getNumGeometries).map(_.toInt).flatMap { i =>
            val p = mp.getGeometryN(i).asInstanceOf[Polygon]
            p.getExteriorRing.getCoordinates +:
              (0 until p.getNumInteriorRing).map(j => p.getInteriorRingN(j).getCoordinates)
          }
          sb.append("Region ").append(rings.length).append('\n')
          rings.foreach(ringTxt(_, sb))
        case gc: GeometryCollection =>
          sb.append("Collection ").append(gc.getNumGeometries).append('\n')
          (0 until gc.getNumGeometries).foreach(i => geomTxt(gc.getGeometryN(i), sb))
      }
    }
    def midField(v: Any): String = {
      val s = String.valueOf(v)
      if (s.exists(c => c == ',' || c == '"')) "\"" + s.replace("\"", "") + "\"" else s
    }
    val target = if (singleFile) df.coalesce(1) else { mkdirs(hc, path); df }
    target.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext || singleFile) {
        val stem = if (singleFile) path.stripSuffix(".mif") else f"$path/part-$pid%05d"
        val mifOut = new java.io.PrintWriter(hadoopOpen(hc)(stem + ".mif"))
        val midOut = new java.io.PrintWriter(hadoopOpen(hc)(stem + ".mid"))
        try {
          mifOut.println("Version 300")
          mifOut.println("Charset \"Neutral\"")
          mifOut.println("Delimiter \",\"")
          mifOut.println(s"Columns ${colDefs.length}")
          colDefs.foreach(mifOut.println)
          mifOut.println("Data")
          it.foreach { r =>
            val sb = new java.lang.StringBuilder
            r.get(geomIdx) match {
              case b: Array[Byte] => geomTxt(graft.geom.Geo.read(b), sb)
              case _ => sb.append("None\n")
            }
            mifOut.print(sb)
            midOut.println(attrIdx.map(i => if (r.isNullAt(i)) "" else midField(r.get(i))).mkString(","))
          }
        } finally { mifOut.close(); midOut.close() }
      }
      ()
    }
  }

  /** Write `df` as a single-sheet XLSX workbook (no geometry — the
   *  attribute-table format of the family; reference reaches it via GDAL's
   *  xlsx driver). Numeric Spark columns store as numbers, the rest as
   *  inline strings. */
  def xlsx(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val hc = hconfOf(df)
    val schema = df.schema
    val numeric = schema.fields.map(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val target = if (singleFile) df.coalesce(1) else { mkdirs(hc, path); df }
    target.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext || singleFile) {
        val dest = if (singleFile) path else f"$path/part-$pid%05d.xlsx"
        val out = hadoopOpen(hc)(dest)
        try Xlsx.write(out, schema.fieldNames.toSeq,
          it.map(r => schema.fields.indices.map(i => r.get(i))), i => numeric(i))
        finally out.close()
      }
      ()
    }
  }

  /** Write `df` (attribute table, no geometry column expected — stringify
    * geometries upstream) as single-sheet ODS spreadsheets, mirroring the
    * [[xlsx]] sink. */
  def ods(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val hc = hconfOf(df)
    val schema = df.schema
    val target = if (singleFile) df.coalesce(1) else { mkdirs(hc, path); df }
    target.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext || singleFile) {
        val dest = if (singleFile) path else f"$path/part-$pid%05d.ods"
        val out = hadoopOpen(hc)(dest)
        try Ods.write(out, "Sheet1",
          Iterator.single(schema.fieldNames.toSeq) ++
            it.map(r => schema.fields.indices.map(i =>
              if (r.isNullAt(i)) null else String.valueOf(r.get(i)))))
        finally out.close()
      }
      ()
    }
  }

  /** Write `df` as GMT ASCII vector files (OGR GMT driver semantics:
    * `# @VGMT1.0 @G<TYPE>` header, `# @N`/`# @T` field declarations,
    * `# @D` per-feature values, `# @P`/`# @H` polygon ring markers). The
    * geometry type is taken from the first row. */
  def gmt(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit = {
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filterNot(_ == geomIdx)
    val names = attrIdx.map(schema.fields(_).name)
    val types = attrIdx.map(i => schema.fields(i).dataType match {
      case _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => "integer"
      case _: org.apache.spark.sql.types.NumericType => "double"
      case _ => "string"
    })
    writeTextFiles(df, path, "gmt", singleFile) { (it0, out) =>
      val it = it0.buffered
      val gtype = if (it.hasNext) it.head.get(geomIdx) match {
        case b: Array[Byte] => graft.geom.Geo.read(b).getGeometryType.toUpperCase
        case _ => "POINT"
      } else "POINT"
      Gmt.render(gtype, names, types,
        it.flatMap { r =>
          r.get(geomIdx) match {
            case b: Array[Byte] =>
              Some((graft.geom.Geo.read(b),
                attrIdx.map(i => if (r.isNullAt(i)) null else String.valueOf(r.get(i)))))
            case _ => None
          }
        }, out)
    }
  }

  /** Write `df` as a PostgreSQL SQL dump (the reference's PGDUMP driver:
    * a psql-runnable script — CREATE TABLE + COPY FROM STDIN with
    * hex-WKB geometry, which PostGIS's geometry input accepts directly).
    * COPY text-format escaping per the PostgreSQL documentation:
    * backslash, tab, newline escaped; NULL spelled `\N`. */
  def pgdump(df: DataFrame, geomCol: String, path: String,
             table: String = "graft_export", singleFile: Boolean = true): Unit = {
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"pgdump: table name '$table' must be a plain SQL identifier")
    def sqlType(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case org.apache.spark.sql.types.IntegerType => "INTEGER"
      case org.apache.spark.sql.types.LongType => "BIGINT"
      case org.apache.spark.sql.types.FloatType => "REAL"
      case org.apache.spark.sql.types.DoubleType => "DOUBLE PRECISION"
      case org.apache.spark.sql.types.BooleanType => "BOOLEAN"
      case _: org.apache.spark.sql.types.DecimalType => "NUMERIC"
      case org.apache.spark.sql.types.TimestampType => "TIMESTAMP"
      case org.apache.spark.sql.types.DateType => "DATE"
      case org.apache.spark.sql.types.BinaryType => "BYTEA"
      case _ => "TEXT"
    }
    val cols = schema.fields.map { f0 =>
      if (f0.name == geomCol) s""""${f0.name}" GEOMETRY""" else s""""${f0.name}" ${sqlType(f0.dataType)}"""
    }
    def copyEsc(s: String): String = {
      val sb = new java.lang.StringBuilder
      s.foreach {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      sb.toString
    }
    val hexDigits = "0123456789ABCDEF"
    def hex(b: Array[Byte]): String = {
      val out = new Array[Char](b.length * 2)
      var i = 0
      while (i < b.length) {
        out(2 * i) = hexDigits((b(i) >> 4) & 0xF)
        out(2 * i + 1) = hexDigits(b(i) & 0xF)
        i += 1
      }
      new String(out)
    }
    writeTextFiles(df, path, "sql", singleFile) { (it, out) =>
      out.println("SET standard_conforming_strings = ON;")
      out.println("BEGIN;")
      out.println(s"""CREATE TABLE "$table" (${cols.mkString(", ")});""")
      out.println(s"""COPY "$table" (${schema.fieldNames.map(n => s""""$n"""").mkString(", ")}) FROM STDIN;""")
      it.foreach { r =>
        val vals = schema.fields.indices.map { i =>
          if (r.isNullAt(i)) "\\N"
          else r.get(i) match {
            // PostGIS GEOMETRY input accepts bare hex WKB; a plain BYTEA
            // column needs PostgreSQL's \x hex form (backslash doubled in
            // COPY text format)
            case b: Array[Byte] if i == geomIdx => hex(b)
            case b: Array[Byte] => "\\\\x" + hex(b)
            case v => copyEsc(String.valueOf(v))
          }
        }
        out.println(vals.mkString("\t"))
      }
      out.println("\\.")
      out.println("COMMIT;")
    }
  }

  /** Write `df` as shapefiles: a directory of per-partition part-N.shp/.shx/
   *  .dbf/.cpg (default), or one `<path>`-rooted shapefile when
   *  `singleFile = true` (path may end in .shp). Geometry column must be WKB
   *  binary; other columns become DBF attributes. */
  def shapefile(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false): Unit = {
    val hc = hconfOf(df)
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filter(_ != geomIdx)
    val fields = attrIdx.map { i =>
      val f = schema.fields(i)
      f.dataType match {
        case org.apache.spark.sql.types.LongType => ShapefileWriter.Field(f.name, 'N', 18, 0)
        case org.apache.spark.sql.types.IntegerType => ShapefileWriter.Field(f.name, 'N', 9, 0)
        case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
          ShapefileWriter.Field(f.name, 'N', 20, 8)
        case org.apache.spark.sql.types.BooleanType => ShapefileWriter.Field(f.name, 'L', 1, 0)
        case _ => ShapefileWriter.Field(f.name, 'C', 80, 0)
      }
    }
    val (target, base) =
      if (singleFile) (df.coalesce(1), path.stripSuffix(".shp"))
      else { mkdirs(hc, path); (df, path) }
    target.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext) {
        val rows = it.map { r =>
          val g = r.get(geomIdx) match {
            case b: Array[Byte] => graft.geom.Geo.read(b)
            case _ => null
          }
          (g, attrIdx.map(i => r.get(i)).toArray[Any])
        }
        val dest = if (singleFile) base else f"$base/part-$pid%05d"
        ShapefileWriter.write(dest, fields, rows, hadoopOpen(hc))
      }
      ()
    }
  }

  /** Write `df` as FlatGeobuf: per-partition part-N.fgb files (default) or a
   *  single `<path>` file when `singleFile = true`. */
  def flatgeobuf(df: DataFrame, geomCol: String, path: String, singleFile: Boolean = false,
                 crs: Option[(String, Int, String, String)] = None): Unit = {
    val hc = hconfOf(df)
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filter(_ != geomIdx)
    val fields = attrIdx.map { i =>
      val f = schema.fields(i)
      FlatGeobufWriter.FgbField(f.name, FlatGeobufWriter.fgbType(f.dataType))
    }
    val target = if (singleFile) df.coalesce(1) else { mkdirs(hc, path); df }
    target.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext) {
        val rows = it.map { r =>
          val g = r.get(geomIdx) match {
            case b: Array[Byte] => graft.geom.Geo.read(b)
            case _ => null
          }
          (g, attrIdx.map(i => r.get(i)).toArray[Any])
        }
        // geometry type 0 (Unknown) + per-feature type tags handles mixed input
        val dest = if (singleFile) path else f"$path/part-$pid%05d.fgb"
        FlatGeobufWriter.write(dest, 0, fields, rows, hadoopOpen(hc), crs = crs)
      }
      ()
    }
  }

  /** Write `df` as GeoPackage: per-partition part-N.gpkg files (default,
   *  single feature table per file, hand-rolled sqlite pages — no sqlite
   *  dependency) or a single `<path>` file when `singleFile = true`. */
  def geopackage(df: DataFrame, geomCol: String, path: String, table: String = "features",
                 singleFile: Boolean = false, srsId: Int = 4326,
                 srsDef: Option[(String, String)] = None,
                 srsOrg: String = "EPSG"): Unit = {
    val hc = hconfOf(df)
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filter(_ != geomIdx)
    val cols = attrIdx.map { i =>
      val f = schema.fields(i)
      (f.name, GeoPackageWriter.sqliteType(f.dataType))
    }
    val target = if (singleFile) df.coalesce(1) else { mkdirs(hc, path); df }
    target.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext) {
        val rows = it.map { r =>
          val g = r.get(geomIdx) match {
            case b: Array[Byte] => graft.geom.Geo.read(b)
            case _ => null
          }
          val attrs = attrIdx.map(i => r.get(i) match {
            case b: Boolean => if (b) 1L else 0L
            case x: Int => x.toLong
            case x: Float => x.toDouble
            case other => other
          }).toArray[Any]
          (g, attrs)
        }
        val dest = if (singleFile) path else f"$path/part-$pid%05d.gpkg"
        GeoPackageWriter.write(dest, table, cols, rows, srsId, open = hadoopOpen(hc),
          srsDef = srsDef, srsOrg = srsOrg)
      }
      ()
    }
  }

  /** Multi-layer GeoPackage export: one feature table per distinct value of
   *  `layerCol` in a single `.gpkg` file — the write-side mirror of the
   *  reader's `layer` option (reference: a GDAL multi-layer dataset,
   *  st_read.cpp:623-631). Layers stream one at a time through
   *  toLocalIterator (one small job per layer; driver memory stays
   *  row-bounded) — an export/interchange utility, not a bulk path: for
   *  bulk output use the per-partition `geopackage` writer. */
  /** Write one Mapbox Vector Tile (spec 2.1) containing `df` as a single
    * layer. A tile is a bounded artifact by construction, so this is a
    * driver-assembled export like [[geopackageLayers]], with the same hard
    * row bound. Geometries are taken in EPSG:3857 when `tile` (z, x, y) is
    * given — they are snapped onto the tile's integer grid — otherwise they
    * must already be tile-local integers (0..extent, y down). Attribute
    * columns become string-valued layer properties. */
  def mvt(df: DataFrame, geomCol: String, path: String, layerName: String = "layer",
          extent: Int = 4096, tile: Option[(Int, Int, Int)] = None): Unit = {
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filterNot(_ == geomIdx)
    val attrNames = attrIdx.map(schema.fields(_).name)
    val maxRows = 5000000L
    val world = 2 * math.Pi * 6378137.0
    val toLocal: org.locationtech.jts.geom.Geometry => org.locationtech.jts.geom.Geometry =
      tile match {
        case Some((z, x, y)) =>
          val t = world / (1 << z)
          val x0 = -world / 2 + x * t
          val y0 = world / 2 - y * t
          g => {
            val out = g.copy()
            out.apply(new org.locationtech.jts.geom.CoordinateFilter {
              override def filter(c: org.locationtech.jts.geom.Coordinate): Unit = {
                c.x = (c.x - x0) / t * extent
                c.y = (y0 - c.y) / t * extent
              }
            })
            out.geometryChanged()
            out
          }
        case None => identity
      }
    // single pass: the row bound is enforced while draining the iterator
    // (no extra count() job over the upstream query)
    val feats = df.toLocalIterator().asScala.zipWithIndex.map { case (r, i) =>
      require(i < maxRows,
        s"mvt: more than $maxRows rows in a single-tile export; a vector tile " +
        "holds one tile's worth of data — filter to the tile extent first")
      (r, i)
    }.flatMap { case (r, i) =>
      r.get(geomIdx) match {
        case b: Array[Byte] =>
          val props = attrIdx.zip(attrNames).collect {
            case (ai, n) if !r.isNullAt(ai) => n -> String.valueOf(r.get(ai))
          }
          Some((i + 1L, toLocal(graft.geom.Geo.read(b)), props.toSeq))
        case _ => None
      }
    }.toSeq
    val bytes = Mvt.writeTile(layerName, extent, feats)
    val out = hadoopOpen(hconfOf(df))(path)
    try out.write(bytes) finally out.close()
  }

  /** Write a full `{z}/{x}/{y}.mvt` tile pyramid of `df` (geometries in
    * EPSG:3857) — the distributed completion of [[mvt]] and the write-side
    * mirror of the pyramid reader (reference: GDAL's MVT dataset-creation
    * behavior, internals.md driver table; [[mvt]] covers the one-tile case).
    *
    * Scale shape: each feature is simplified map-side to the zoom's grid
    * resolution (one tile-grid unit), clipped map-side to every tile (plus
    * `buffer` grid units of margin) its envelope overlaps, shuffled ONCE on
    * the tile address, and every tile file is encoded and written
    * executor-side. No driver collect, no per-tile job: shuffle volume is
    * bounded by features × overlapped tiles of *clipped* geometry, and tile
    * groups spread across the cluster. A feature overlapping more than
    * `maxTilesPerFeature` tiles at one zoom fails loudly (lower `maxZoom`
    * or pre-split with st_subdivide) instead of silently exploding the
    * shuffle.
    *
    * Per-TILE budget: `maxFeaturesPerTile` (GDAL MVT's MAX_FEATURES
    * dataset-creation option; default matches GDAL's 200000) bounds every
    * tile with deterministic thinning — features rank by clipped size
    * (area, then length) descending with a stable hash tiebreak, and only
    * the top `maxFeaturesPerTile` survive, the same keep-the-biggest policy
    * as tippecanoe's drop-smallest. Without it, the z0/0/0 group at planet
    * scale holds every (simplified, clipped) feature in the dataset in one
    * encode buffer. The rank is a `row_number` window on the same
    * (z, x, y) key the write needs anyway, so the pyramid still costs ONE
    * shuffle: the window's hash-partition + sort replaces the former
    * repartition + sortWithinPartitions, rows stay contiguous per tile, and
    * the executor-side encode buffer is bounded by the budget (the sort
    * itself spills to disk under Spark's window operator rather than
    * accumulating on the heap). */
  def mvtPyramid(df: DataFrame, geomCol: String, path: String,
                 layerName: String = "layer", extent: Int = 4096,
                 minZoom: Int = 0, maxZoom: Int = 5, buffer: Int = 64,
                 maxTilesPerFeature: Long = 65536L,
                 maxFeaturesPerTile: Int = 200000): Unit = {
    require(minZoom >= 0 && maxZoom <= 22 && minZoom <= maxZoom,
      s"mvtPyramid: zoom range [$minZoom, $maxZoom] out of [0, 22]")
    require(maxFeaturesPerTile > 0,
      s"mvtPyramid: maxFeaturesPerTile must be positive (got $maxFeaturesPerTile)")
    val sess = df.sparkSession
    import sess.implicits._
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filterNot(_ == geomIdx)
    val attrNames = attrIdx.map(schema.fields(_).name)
    val hc = hconfOf(df)
    val world = 2 * math.Pi * 6378137.0
    val half = world / 2
    val zooms = minZoom to maxZoom
    val (ext, bufU, layer, maxTiles) = (extent, buffer, layerName, maxTilesPerFeature)

    val exploded = df.mapPartitions { (it: Iterator[org.apache.spark.sql.Row]) =>
      val gf = new org.locationtech.jts.geom.GeometryFactory()
      it.flatMap { r =>
        r.get(geomIdx) match {
          case b: Array[Byte] =>
            val g0 = graft.geom.Geo.read(b)
            val pk = Array.newBuilder[String]; val pv = Array.newBuilder[String]
            attrIdx.zip(attrNames).foreach { case (ai, n) =>
              if (!r.isNullAt(ai)) { pk += n; pv += String.valueOf(r.get(ai)) }
            }
            val (pks, pvs) = (pk.result().toSeq, pv.result().toSeq)
            zooms.iterator.flatMap { z =>
              val t = world / (1 << z)
              val tol = t / ext
              val g =
                if (g0.getDimension == 0) g0
                else org.locationtech.jts.simplify.TopologyPreservingSimplifier
                  .simplify(g0, tol)
              if (g.isEmpty) Iterator.empty
              else {
                val env = g.getEnvelopeInternal
                val bufM = bufU.toDouble * t / ext
                val n = 1L << z
                def clampT(v: Double): Long =
                  math.max(0L, math.min(n - 1, math.floor(v).toLong))
                val tx0 = clampT((env.getMinX + half - bufM) / t)
                val tx1 = clampT((env.getMaxX + half + bufM) / t)
                val ty0 = clampT((half - env.getMaxY - bufM) / t)
                val ty1 = clampT((half - env.getMinY + bufM) / t)
                val ntiles = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
                require(ntiles <= maxTiles,
                  s"mvtPyramid: one feature overlaps $ntiles tiles at z=$z " +
                  s"(cap $maxTiles); lower maxZoom or pre-split the geometry")
                for {
                  tx <- (tx0 to tx1).iterator
                  ty <- (ty0 to ty1).iterator
                  clipped <- {
                    val te = new org.locationtech.jts.geom.Envelope(
                      -half + tx * t - bufM, -half + (tx + 1) * t + bufM,
                      half - (ty + 1) * t - bufM, half - ty * t + bufM)
                    val c =
                      if (te.covers(env)) g
                      else try g.intersection(gf.toGeometry(te))
                      catch { case _: org.locationtech.jts.geom.TopologyException =>
                        g.buffer(0).intersection(gf.toGeometry(te))
                      }
                    if (c.isEmpty) None else Some(c)
                  }
                } yield (z, tx.toInt, ty.toInt, graft.geom.Geo.write(clipped), pks, pvs,
                         clipped.getArea + clipped.getLength)
              }
            }
          case _ => Iterator.empty
        }
      }
    }

    // ONE shuffle: the budget window hash-partitions on (z, x, y) and sorts
    // within partitions on (z, x, y, prio desc, hash) — exactly the layout
    // the streaming per-tile encode below needs, so no extra repartition.
    // Thinning is deterministic: biggest clipped geometry first (tippecanoe
    // drop-smallest), xxhash64 of the WKB then the WKB itself break ties.
    val tileWindow = org.apache.spark.sql.expressions.Window
      .partitionBy("z", "x", "y")
      .orderBy(col("prio").desc, xxhash64(col("wkb")), col("wkb"))
    exploded.toDF("z", "x", "y", "wkb", "pk", "pv", "prio")
      .withColumn("rk", row_number().over(tileWindow))
      .where(col("rk") <= maxFeaturesPerTile)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        var cur: (Int, Int, Int) = null
        val feats = scala.collection.mutable.ArrayBuffer
          .empty[(Long, org.locationtech.jts.geom.Geometry, Seq[(String, String)])]
        def flush(): Unit = if (cur != null && feats.nonEmpty) {
          val (z, x, y) = cur
          val t = world / (1 << z)
          val x0 = -half + x * t
          val y0 = half - y * t
          val local = feats.zipWithIndex.map { case ((_, g, props), i) =>
            val out = g.copy()
            out.apply(new org.locationtech.jts.geom.CoordinateFilter {
              override def filter(c: org.locationtech.jts.geom.Coordinate): Unit = {
                c.x = (c.x - x0) / t * ext
                c.y = (y0 - c.y) / t * ext
              }
            })
            out.geometryChanged()
            (i + 1L, out, props)
          }.toSeq
          val bytes = Mvt.writeTile(layer, ext, local)
          val out = hadoopOpen(hc)(s"$path/$z/$x/$y.mvt")
          try out.write(bytes) finally out.close()
          feats.clear()
        }
        it.foreach { r =>
          val key = (r.getInt(0), r.getInt(1), r.getInt(2))
          if (key != cur) { flush(); cur = key }
          val props = r.getSeq[String](4).zip(r.getSeq[String](5))
          feats += ((0L, graft.geom.Geo.read(r.getAs[Array[Byte]](3)), props))
        }
        flush()
      }
  }

  def geopackageLayers(df: DataFrame, geomCol: String, layerCol: String, path: String): Unit = {
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val layerIdx = schema.fieldIndex(layerCol)
    val attrIdx = schema.fields.indices.filterNot(i => i == geomIdx || i == layerIdx)
    val cols = attrIdx.map { i =>
      val f = schema.fields(i)
      (f.name, GeoPackageWriter.sqliteType(f.dataType))
    }
    // NULL layer values have no table name to map to; String.valueOf would
    // silently send them to a "null" table whose `=== "null"` filter never
    // matches SQL NULL (rows dropped, empty table written) — fail fast.
    val nullLayers = df.where(org.apache.spark.sql.functions.col(layerCol).isNull).count()
    require(nullLayers == 0,
      s"geopackageLayers: $nullLayers row(s) have NULL '$layerCol'; filter them out " +
      "or coalesce to an explicit layer name first")
    // Driver-streamed export path — bound the total row count so a misuse on
    // a big table fails loudly instead of running a one-row-at-a-time export.
    val maxRows = 5000000L
    val totalRows = df.count()
    require(totalRows <= maxRows,
      s"geopackageLayers: $totalRows rows exceeds the $maxRows-row export bound; " +
      "this is a driver-streamed interchange utility — use the per-partition " +
      "`geopackage` writer for bulk output")
    val layers = df.select(layerCol).distinct().collect()
      .map(r => String.valueOf(r.get(0))).sorted
    require(layers.nonEmpty, "geopackageLayers: no rows to write")
    val tables = layers.toSeq.map { l =>
      val rows = df.where(org.apache.spark.sql.functions.col(layerCol) === l)
        .toLocalIterator().asScala.map { r =>
          val g = r.get(geomIdx) match {
            case b: Array[Byte] => graft.geom.Geo.read(b)
            case _ => null
          }
          val attrs = attrIdx.map(i => r.get(i) match {
            case b: Boolean => if (b) 1L else 0L
            case x: Int => x.toLong
            case x: Float => x.toDouble
            case other => other
          }).toArray[Any]
          (g, attrs)
        }
      (l, cols, rows)
    }
    GeoPackageWriter.writeMulti(path, tables)
  }

  /** Hilbert-clustered parquet with bbox stats column and GeoParquet 1.1
   *  `geo` footer metadata. Bounds are taken from the data (one cheap
   *  aggregate) unless given. */
  def clusteredParquet(
      df: DataFrame,
      geomCol: String,
      path: String,
      bounds: Option[(Double, Double, Double, Double)] = None,
      targetPartitions: Int = 0,
      /** PROJJSON for the footer's `crs` member (COPY `SRS`; GeoParquet 1.1
        * reads absence as OGC:CRS84) */
      crs: Option[String] = None): Unit = {
    graft.Graft.register(df.sparkSession)
    val (minX, minY, maxX, maxY) = bounds.getOrElse {
      val r = df.selectExpr(
        s"min(st_xmin($geomCol))", s"min(st_ymin($geomCol))",
        s"max(st_xmax($geomCol))", s"max(st_ymax($geomCol))").collect()(0)
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val withKeys = df
      .withColumn(s"${geomCol}_bbox", expr(s"st_extent($geomCol)"))
      .withColumn("__hilbert", expr(
        s"st_hilbert($geomCol, ${minX}d, ${minY}d, ${maxX}d, ${maxY}d)"))
    val parts = if (targetPartitions > 0) targetPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    withKeys
      .repartitionByRange(parts, col("__hilbert"))
      .sortWithinPartitions("__hilbert")
      .drop("__hilbert")
      .write.mode("overwrite").parquet(path)
    // GeoParquet interop: without the `geo` footer entry DuckDB/GDAL/QGIS
    // treat the geometry column as opaque binary (metadata-sized rewrite
    // per part file; data pages untouched)
    GeoParquet.stampGeoDir(
      df.sparkSession.sessionState.newHadoopConf(), path,
      GeoParquet.geoJson(geomCol, (minX, minY, maxX, maxY), Some(s"${geomCol}_bbox"), crs))
  }

  /** Compaction story for the R-tree replacement: the Hilbert-clustered
   *  layout is write-once, so plain appends land spatially-unsorted files
   *  whose wide bboxes defeat skipping until rewritten. This helper appends
   *  `df` to the dataset at `path` and restores index-grade pruning by
   *  re-clustering the union into a fresh layout, then atomically swapping
   *  directories (write to a sibling temp dir, delete, rename — Hadoop
   *  FileSystem API, so any supported FS works). The new rows are aligned to
   *  the existing schema by name; the bbox sidecar and GeoParquet footer are
   *  regenerated. Equivalent of an OPTIMIZE/re-index pass — run it after
   *  append batches, not per append. */
  def appendAndRecluster(
      df: DataFrame,
      geomCol: String,
      path: String,
      bounds: Option[(Double, Double, Double, Double)] = None,
      targetPartitions: Int = 0): Unit = {
    val spark = df.sparkSession
    graft.Graft.register(spark)
    val hasBboxSidecar = spark.read.parquet(path).columns.contains(s"${geomCol}_bbox")
    if (!hasBboxSidecar) { fullRecluster(df, geomCol, path, bounds, targetPartitions); return }
    // INCREMENTAL compaction (reference analogue: the R-tree insert path,
    // rtree_index_create_physical.cpp, touches only the subtree an insert
    // lands in): re-sort ONLY the clustered files whose bbox coverage
    // intersects the append's extent, together with the new rows; every
    // other file — its bytes, its Hilbert order, its bbox stats, even its
    // mtime — is untouched. At 100 TB this is the difference between a
    // bounded compaction job and re-sorting the world per batch.
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    import org.apache.spark.sql.functions.{col => c, input_file_name, min => mn, max => mx}
    val existingCols = spark.read.parquet(path).drop(s"${geomCol}_bbox").columns
    val incoming = df.selectExpr(existingCols.map(x => s"`$x`"): _*)
    val extRow = incoming.selectExpr(
      s"min(st_xmin($geomCol))", s"min(st_ymin($geomCol))",
      s"max(st_xmax($geomCol))", s"max(st_ymax($geomCol))").collect()(0)
    if (extRow.isNullAt(0)) return // empty append: nothing to do
    val (ax0, ay0, ax1, ay1) =
      (extRow.getDouble(0), extRow.getDouble(1), extRow.getDouble(2), extRow.getDouble(3))
    // per-file coverage from the bbox sidecar (columnar scan of 4 doubles —
    // metadata-scale next to the data), plus row counts for density
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(mn(c(s"${geomCol}_bbox.min_x")).as("x0"), mn(c(s"${geomCol}_bbox.min_y")).as("y0"),
           mx(c(s"${geomCol}_bbox.max_x")).as("x1"), mx(c(s"${geomCol}_bbox.max_y")).as("y1"),
           org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
    val overlapping = stats.filter(r => !r.isNullAt(1) &&
      r.getDouble(1) <= ax1 && r.getDouble(3) >= ax0 &&
      r.getDouble(2) <= ay1 && r.getDouble(4) >= ay0).map(_.getString(0))
    // Hilbert key space: caller bounds; else the layout's own footer bbox
    // (so in-bounds appends change NO untouched footer, preserving mtimes)
    // unioned with the append extent; else derive from coverage stats
    val oldGeo = GeoParquet.readGeo(conf, path.stripPrefix("file:"))
    val gb = bounds.getOrElse {
      val base = oldGeo.flatMap(GeoParquet.parseBbox).getOrElse {
        val xs0 = stats.filter(!_.isNullAt(1)).map(_.getDouble(1)) :+ ax0
        val ys0 = stats.filter(!_.isNullAt(2)).map(_.getDouble(2)) :+ ay0
        val xs1 = stats.filter(!_.isNullAt(3)).map(_.getDouble(3)) :+ ax1
        val ys1 = stats.filter(!_.isNullAt(4)).map(_.getDouble(4)) :+ ay1
        (xs0.min, ys0.min, xs1.max, ys1.max)
      }
      (math.min(base._1, ax0), math.min(base._2, ay0),
       math.max(base._3, ax1), math.max(base._4, ay1))
    }
    val subset =
      if (overlapping.isEmpty) incoming
      else spark.read.parquet(overlapping.toIndexedSeq: _*)
        .drop(s"${geomCol}_bbox")
        .selectExpr(existingCols.map(x => s"`$x`"): _*)
        .unionByName(incoming)
    // keep the layout's file density: rows-per-file from the untouched
    // files' own stats (fallback: one file per overlapped file + 1)
    val totalRows = stats.map(_.getLong(5)).sum
    val rowsPerFile = if (stats.nonEmpty && totalRows > 0) math.max(1L, totalRows / stats.length)
      else Long.MaxValue
    val subsetRows = overlapping.length.toLong * rowsPerFile + incoming.count()
    val nOut = math.max(1L, math.min(10000L, (subsetRows + rowsPerFile - 1) / rowsPerFile)).toInt
    val tmp = path.stripSuffix("/") + "__recluster_tmp"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    // the tmp write materializes the subset (reading the overlapped files)
    // BEFORE any original is touched; only then swap
    clusteredParquet(subset, geomCol, tmp, Some(gb), nOut,
      crs = oldGeo.flatMap(GeoParquet.parseCrs))
    overlapping.foreach { f =>
      val orig = new org.apache.hadoop.fs.Path(new java.net.URI(f).getPath)
      if (!fs.delete(orig, false))
        throw new java.io.IOException(s"appendAndRecluster: could not remove $orig")
    }
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val dest = new org.apache.hadoop.fs.Path(path)
    fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .zipWithIndex.foreach { case (s0, i) =>
        val to = new org.apache.hadoop.fs.Path(dest, f"part-inc$stamp-$i%05d.parquet")
        if (!fs.rename(s0.getPath, to))
          throw new java.io.IOException(s"appendAndRecluster: could not move ${s0.getPath}")
      }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    // footer: the new files were already stamped by clusteredParquet with
    // gb's bbox. Untouched files keep their original footer — UNLESS the
    // global bbox grew past what those footers advertise, in which case a
    // metadata-sized restamp of every file keeps interop readers honest
    // (the one case where untouched-file mtimes legitimately move).
    // a crs member stamped at create time survives the restamp
    val wantGeo = GeoParquet.geoJson(geomCol, gb, Some(s"${geomCol}_bbox"),
      oldGeo.flatMap(GeoParquet.parseCrs))
    if (!oldGeo.contains(wantGeo)) GeoParquet.stampGeoDir(conf, path, wantGeo)
  }

  /** The pre-round-8 whole-layout rewrite — still the right tool when the
    * target has no bbox sidecar to plan an incremental pass from. */
  private def fullRecluster(
      df: DataFrame,
      geomCol: String,
      path: String,
      bounds: Option[(Double, Double, Double, Double)],
      targetPartitions: Int): Unit = {
    val spark = df.sparkSession
    val existing = spark.read.parquet(path).drop(s"${geomCol}_bbox")
    val incoming = df.selectExpr(existing.columns.map(c => s"`$c`"): _*)
    val union = existing.unionByName(incoming)
    val tmp = path.stripSuffix("/") + "__recluster_tmp"
    val oldCrs = GeoParquet.readGeo(spark.sessionState.newHadoopConf(),
      path.stripPrefix("file:")).flatMap(GeoParquet.parseCrs)
    // writing tmp materializes the union (reading the old files) BEFORE the
    // old directory is touched; only then swap
    clusteredParquet(union, geomCol, tmp, bounds, targetPartitions, crs = oldCrs)
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val t = new org.apache.hadoop.fs.Path(tmp)
    val fs = p.getFileSystem(conf)
    if (!fs.delete(p, true))
      throw new java.io.IOException(s"appendAndRecluster: could not remove old layout at $path")
    if (!fs.rename(t, p))
      throw new java.io.IOException(s"appendAndRecluster: could not move $tmp into place")
  }

  /** Delete story for the clustered layout (reference CRUD parity:
   *  test/sql/index/rtree_crud.test — its R-tree absorbs DELETEs in place).
   *  Partition-rewrite deletes: only the part files that actually CONTAIN
   *  matching rows are rewritten (matched via input_file_name, a metadata-
   *  sized driver list); every other file — and therefore its Hilbert order
   *  and bbox stats — is untouched, so pruning quality survives without a
   *  re-sort. Each rewritten file swaps in atomically (write sibling, rename
   *  over). Rows where the predicate is NULL are KEPT (SQL DELETE semantics).
   *  Returns the number of rows removed. */
  def deleteWhere(spark: org.apache.spark.sql.SparkSession, path: String,
                  predicate: String): Long = {
    graft.Graft.register(spark)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val affected = spark.read.parquet(path)
      .where(predicate)
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().collect().map(_.getString(0))
    // capture the geo footer up front; only REWRITTEN files get restamped —
    // untouched files keep their bytes (and mtimes) exactly
    val geoJson = GeoParquet.readGeo(conf, path.stripPrefix("file:"))
    var removed = 0L
    rewriteAffected(spark, fs, affected, geoJson) { one =>
      val kept = one.where(s"NOT ($predicate) OR ($predicate) IS NULL")
      removed += one.count() - kept.count()
      kept
    }
    removed
  }

  /** UPDATE for the clustered layout (reference CRUD parity:
   *  test/sql/index/rtree_crud.test UPDATE rows). Same partition-rewrite
   *  shape as [[deleteWhere]]: only files containing matching rows rewrite;
   *  `assignments` maps column name → SQL expression applied WHERE the
   *  predicate holds (other rows pass through unchanged). Geometry updates
   *  that move rows far out of their file's Hilbert band degrade that file's
   *  bbox tightness — run `appendAndRecluster` after bulk spatial updates,
   *  exactly like the OPTIMIZE half of a table format. Returns rows updated. */
  def updateWhere(spark: org.apache.spark.sql.SparkSession, path: String,
                  predicate: String, assignments: Map[String, String]): Long = {
    graft.Graft.register(spark)
    require(assignments.nonEmpty, "updateWhere: no assignments")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val cols = spark.read.parquet(path).columns
    assignments.keys.foreach(k => require(cols.contains(k),
      s"updateWhere: no column '$k' in $path (have ${cols.mkString(", ")})"))
    // An assignment that rewrites a geometry column must also rewrite its
    // `<col>_bbox` sidecar in the same pass — BboxSkippingRule conjoins
    // row-level range predicates on that struct, so a stale bbox is not
    // merely loose pruning, it silently EXCLUDES rows whose geometry moved
    // into a query window. (Explicit user assignments to the bbox win.)
    val withBbox = assignments ++ assignments.collect {
      case (g, _) if cols.contains(s"${g}_bbox") && !assignments.contains(s"${g}_bbox") =>
        // evaluated only WHERE the predicate holds (the rewrite wraps every
        // assignment in CASE WHEN predicate), against the ORIGINAL row — so
        // the geom expression can be reused verbatim
        s"${g}_bbox" -> s"st_extent(${assignments(g)})"
    }
    val affected = spark.read.parquet(path)
      .where(predicate)
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().collect().map(_.getString(0))
    val geoJson = GeoParquet.readGeo(conf, path.stripPrefix("file:"))
    var updated = 0L
    rewriteAffected(spark, fs, affected, geoJson) { one =>
      updated += one.where(predicate).count()
      one.selectExpr(cols.map { c =>
        withBbox.get(c) match {
          case Some(e) => s"CASE WHEN ($predicate) THEN ($e) ELSE `$c` END AS `$c`"
          case None => s"`$c`"
        }
      }: _*)
    }
    updated
  }

  /** Shared per-file rewrite machinery: read each affected file, apply
   *  `rewrite`, swap atomically (write sibling dir, rename over), restamp
   *  the geo footer; a file whose rewrite is empty is deleted. */
  private def rewriteAffected(spark: org.apache.spark.sql.SparkSession,
                              fs: org.apache.hadoop.fs.FileSystem,
                              affected: Seq[String], geoJson: Option[String])(
                              rewrite: DataFrame => DataFrame): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    affected.foreach { fileUri =>
      val one = spark.read.parquet(fileUri)
      val out = rewrite(one)
      val outN = out.count()
      val orig = new org.apache.hadoop.fs.Path(new java.net.URI(fileUri).getPath)
      if (outN == 0) {
        if (!fs.delete(orig, false))
          throw new java.io.IOException(s"rewriteAffected: could not remove $orig")
      } else {
        val tmpDir = new org.apache.hadoop.fs.Path(orig.getParent,
          s".${orig.getName}__rewrite_tmp")
        // the rewrite job reads the original file while writing the sibling;
        // only after a successful write does the swap touch the original
        out.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
        val part = fs.listStatus(tmpDir).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new java.io.IOException(s"rewriteAffected: no output part in $tmpDir"))
        if (!fs.delete(orig, false))
          throw new java.io.IOException(s"rewriteAffected: could not remove $orig")
        if (!fs.rename(part, orig))
          throw new java.io.IOException(s"rewriteAffected: could not move $part into place")
        fs.delete(tmpDir, true)
        geoJson.foreach(g => GeoParquet.stampGeo(conf, orig, g))
      }
    }
  }
}

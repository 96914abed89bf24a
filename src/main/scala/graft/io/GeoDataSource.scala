package graft.io

import graft.geom.Wkb
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Paths}
import java.util.{Collections => JCollections}
import scala.jdk.CollectionConverters._

/**
 * `spark.read.format("geo").load(path)` — DataSourceV2 reader for the spatial
 * file formats the reference reads natively (SURVEY §2.4): shapefile
 * (.shp+.dbf+.shx+.cpg), GeoJSON (FeatureCollection + newline-delimited), and
 * OSM PBF (block-parallel). Format is inferred from the extension or forced
 * with option("format", "shapefile"|"geojson"|"osmpbf").
 *
 * Scale design: every file (or OSM blob run) is its own InputPartition, read
 * independently on executors — strictly more parallel than the reference's
 * single GDAL stream (st_read.cpp:381-444). Column pruning is pushed down.
 */
class GeoDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "geo"

  private def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    // load(a, b, ...) arrives as a JSON string array under "paths";
    // load(a) as a plain string under "path"
    val raw = Option(options.get("path")).toSeq ++
      Option(options.get("paths")).map(GeoFiles.parseJsonStringArray).getOrElse(Seq.empty)
    if (raw.isEmpty) throw new IllegalArgumentException("geo source requires a path")
    val expanded = raw.distinct.flatMap(GeoFiles.expand).distinct
    if (expanded.isEmpty) throw new IllegalArgumentException(
      s"geo source: no files match ${raw.mkString(", ")}")
    expanded
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = pathsOf(options)
    val layer = Option(options.get("layer"))
    val opts = GeoReadOptions.from(options)
    val fmt = GeoFiles.formatOf(paths, Option(options.get("format")))
    GeoFiles.requireAllowedDriver(fmt, opts)
    val base = GeoFiles.schemaFor(fmt, paths, layer, opts)
    // Hive-style partition columns appended after the data columns; a path
    // key shadowed by a data column of the same name is dropped (data wins)
    GeoFiles.partitionSpec(paths)
      .filterNot(p => base.fieldNames.contains(p._1))
      .foldLeft(base)((s, p) => s.add(p._1, p._2, nullable = true))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val paths = pathsOf(options)
    // reference's st_read spatial_filter_box named param (st_read.cpp:623-631):
    // a bind-time query window — index-backed formats (FlatGeobuf packed
    // R-tree) prune features before they are materialized. The exact
    // predicate still belongs in .where(); this is the coarse pre-filter.
    val bbox = Option(options.get("bbox")).map { s =>
      val p = s.split(",").map(_.trim.toDouble)
      require(p.length == 4, s"bbox option expects 'minx,miny,maxx,maxy', got '$s'")
      (p(0), p(1), p(2), p(3))
    }
    val opts = GeoReadOptions.from(options)
    val fmt = GeoFiles.formatOf(paths, Option(options.get("format")))
    GeoFiles.requireAllowedDriver(fmt, opts)
    // an exact spatial_filter implies its envelope as the coarse bbox
    // prefilter (index-backed formats prune on it before materializing)
    val bboxEff = bbox.orElse(opts.spatialFilter.map { w =>
      val e = graft.geom.Geo.fromWkt(w).getEnvelopeInternal
      (e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
    })
    new GeoTable(schema, paths, fmt,
      bbox = bboxEff, rawPath = Option(options.get("path")), layer = Option(options.get("layer")),
      opts = opts)
  }

  override def supportsExternalMetadata(): Boolean = true
}

/** Reader-level options (reference: st_read's `keep_wkb` + GDAL
  * `open_options`, st_read.cpp:623-631).
  *
  * - `keep_wkb=true`: skip the decode→validate→re-encode round trip on scan
  *   for formats whose on-disk geometry already IS standard WKB (GeoPackage:
  *   the GeoPackageBinary body is sliced out verbatim). Formats with native
  *   encodings (shapefile, FlatGeobuf, GeoJSON, …) must decode regardless —
  *   the option is accepted as a no-op there; the output column is WKB
  *   either way, so the schema never changes.
  * - `open_options=K=V,K2=V2`: per-driver knobs. Supported:
  *   `GEOM_COLUMN` (csvwkt — override the wkt/geom/… header sniff, GDAL's
  *   GEOM_POSSIBLE_NAMES) and `ENCODING` (csvwkt text charset; shapefile
  *   DBF charset, overriding the .cpg sidecar). Unknown keys fail fast —
  *   a typo'd option silently ignored is worse than an error. */
final case class GeoReadOptions(keepWkb: Boolean = false,
                                open: Map[String, String] = Map.empty,
                                spatialFilter: Option[String] = None,
                                allowedDrivers: Seq[String] = Nil) {
  def geomColumn: Option[String] = open.get("GEOM_COLUMN")
  def encoding: Option[String] = open.get("ENCODING")
}
object GeoReadOptions {
  val default: GeoReadOptions = GeoReadOptions()
  private val knownKeys = Set("GEOM_COLUMN", "ENCODING")
  def from(options: CaseInsensitiveStringMap): GeoReadOptions = {
    val keep = Option(options.get("keep_wkb")).exists(_.trim.toBoolean)
    val oo = Option(options.get("open_options")).map { s =>
      s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"open_options entries are KEY=VALUE, got '$kv'")
        val k = kv.substring(0, i).trim.toUpperCase
        require(knownKeys.contains(k),
          s"unknown open_options key '$k' (supported: ${knownKeys.toSeq.sorted.mkString(", ")})")
        k -> kv.substring(i + 1).trim
      }.toMap
    }.getOrElse(Map.empty[String, String])
    // reference st_read named params beyond layer/bbox (st_read.cpp:623-631):
    // spatial_filter = EXACT geometry window (WKT here; envelope prefilter +
    // prepared-intersects per feature); allowed_drivers = restrict which
    // format may resolve; sequential_layer_scan / max_batch_size are GDAL
    // scheduling hints with no meaning for partition-parallel executors —
    // accepted as documented no-ops so existing call sites port verbatim.
    val sf = Option(options.get("spatial_filter")).map(_.trim).filter(_.nonEmpty)
    sf.foreach(w => graft.geom.Geo.fromWkt(w)) // fail fast on bad WKT at bind
    val drivers = Option(options.get("allowed_drivers")).toSeq
      .flatMap(_.split(",")).map(_.trim.toLowerCase).filter(_.nonEmpty)
    GeoReadOptions(keep, oo, sf, drivers)
  }
}

object GeoFiles {
  /** The 100 TB ingest shapes: a single file, a directory tree (recursive,
    * known-geo-extension filtered — `data/year=2024/part-0.geojsonl` layouts
    * just work), or a glob (`*`/`?`/`[..]` within a segment, `**` across
    * segments, java.nio PathMatcher semantics). Listing is names-only on the
    * driver; file CONTENT is only ever read on executors, one InputPartition
    * per file (or per intra-file split). */
  def expand(path: String): Seq[String] = {
    // GDAL's /vsicurl/ spelling is a no-op prefix on a plain URL
    val p0 = {
      val s = path.stripPrefix("file:")
      if (s.startsWith("/vsicurl/")) s.stripPrefix("/vsicurl/") else s
    }
    // GDAL's /vsizip/ spelling → zip-virtual path `archive.zip!inner`;
    // /vsizip//vsicurl/http://… chains to a REMOTE archive
    val vsz =
      if (p0.startsWith("/vsizip/")) {
        val rest0 = p0.stripPrefix("/vsizip")
        val rest =
          if (rest0.startsWith("//vsicurl/")) rest0.stripPrefix("//vsicurl/")
          else if (rest0.startsWith("/vsicurl/")) rest0.stripPrefix("/vsicurl/")
          else rest0
        val zi = rest.toLowerCase.indexOf(".zip")
        require(zi > 0, s"/vsizip/ path must contain a .zip archive: $path")
        val inner = rest.substring(zi + 4).stripPrefix("/")
        if (inner.isEmpty) rest.substring(0, zi + 4) else rest.substring(0, zi + 4) + "!" + inner
      } else p0
    if (isRemote(vsz)) {
      // remote inputs (reference: GDAL /vsicurl/, test/sql/gdal/gdal_vsi
      // .test): the URL itself is the partition path — each executor
      // localizes its own copy in [[local]]. No globbing over HTTP (there
      // is no portable remote listing); a bare remote .zip enumerates its
      // entries by localizing the archive once on the driver, and the
      // partitions carry REMOTE-virtual `url!entry` paths so a cluster
      // never depends on the driver's cache directory.
      requireExternalAccess(vsz)
      if (isZipVirtual(vsz)) return Seq(vsz)
      if (stripQuery(vsz).toLowerCase.endsWith(".zip"))
        return expand(local(vsz)).map(l => vsz + "!" + l.substring(l.indexOf('!') + 1))
      return Seq(vsz)
    }
    if (isZipVirtual(vsz)) { requireExternalAccess(vsz); return Seq(vsz) }
    if (vsz.toLowerCase.endsWith(".zip") && Files.isRegularFile(Paths.get(vsz))) {
      requireExternalAccess(vsz)
      // a bare archive expands to every known-geo-extension entry, same
      // stance as a directory tree
      val zf = new java.util.zip.ZipFile(vsz)
      try {
        val names = zf.entries().asScala
          .filter(e => !e.isDirectory && known(e.getName))
          .map(_.getName).toVector.sorted
        if (names.isEmpty) throw new IllegalArgumentException(
          s"no known geo entries inside $vsz")
        // one archive = one dataset: mixed formats can't share a schema —
        // demand an explicit entry instead of misparsing the tail
        val fmts = names.map(n => formatOf(Seq(n), None)).distinct
        if (fmts.length > 1) throw new IllegalArgumentException(
          s"mixed formats inside $vsz (${fmts.mkString(", ")}); " +
            s"read one entry via '$vsz!<entry>' — entries: ${names.take(10).mkString(", ")}")
        return names.map(vsz + "!" + _)
      } finally zf.close()
    }
    // accept GDAL's /vsigzip/ virtual-fs spelling; .gz is handled natively
    val cleaned = vsz.replaceFirst("^/vsigzip/", "")
    if (cleaned.exists(c => c == '*' || c == '?' || c == '[' || c == '{')) {
      val sep = java.io.File.separatorChar
      val segs = cleaned.split(sep)
      val firstGlobSeg = segs.indexWhere(_.exists(c => c == '*' || c == '?' || c == '[' || c == '{'))
      // walk from the deepest literal prefix directory ("." for a pattern
      // that globs from its first segment)
      val root = Paths.get(
        if (firstGlobSeg <= 0) "."
        else segs.take(firstGlobSeg).mkString(sep.toString) match { case "" => sep.toString; case r => r })
      if (!Files.isDirectory(root)) return Seq.empty
      val pattern = if (firstGlobSeg <= 0) s".$sep$cleaned" else cleaned
      val m = java.nio.file.FileSystems.getDefault.getPathMatcher("glob:" + pattern)
      val st = Files.walk(root)
      try st.iterator().asScala
        .filter(p => m.matches(p) && Files.isRegularFile(p))
        .map(_.toString).toVector.sorted
      finally st.close()
    } else {
      val p = Paths.get(cleaned)
      if (Files.isDirectory(p)) {
        val st = Files.walk(p)
        try st.iterator().asScala
          .filter(f => Files.isRegularFile(f) && known(f.toString))
          .map(_.toString).toVector.sorted
        finally st.close()
      } else Seq(p.toString)
    }
  }

  // ----------------------------------------------------- zip virtual paths
  /** `/vsizip/`-equivalent input (reference: test/sql/gdal/gdal_vsi.test reads
    * zipped datasets through GDAL's virtual filesystem). A path INTO an
    * archive is spelled `archive.zip!inner/file.ext` (GDAL's
    * /vsizip/archive.zip/inner form is accepted and rewritten); a bare *.zip
    * expands to every known-extension entry. Entries are extracted lazily to
    * a per-JVM cache keyed by archive identity (path+size+mtime), so on a
    * cluster each executor localizes its own partitions' entries — the same
    * model as Spark's --archives distribution; nothing round-trips through
    * the driver. */
  def isZipVirtual(p: String): Boolean = {
    val i = p.indexOf('!')
    i > 0 && stripQuery(p.substring(0, i)).toLowerCase.endsWith(".zip")
  }

  // ------------------------------------------------------- remote (http) IO
  /** `http(s)://` inputs (reference: GDAL's /vsicurl/ virtual filesystem,
    * gdal_vsi.test): localized to a per-JVM cache on first open — on a
    * cluster each EXECUTOR downloads the objects its partitions read, the
    * same distribution model as the zip cache / Spark `--archives`; nothing
    * round-trips through the driver. */
  def isRemote(p: String): Boolean = {
    val l = p.toLowerCase
    l.startsWith("http://") || l.startsWith("https://")
  }

  /** a path that must resolve through [[local]] before it can be opened */
  def needsLocal(p: String): Boolean = isZipVirtual(p) || isRemote(p)

  /** reference st_read `allowed_drivers`: the resolved format must be in
    * the caller's allowlist (GDAL semantics: restrict which driver may
    * open the path) */
  def requireAllowedDriver(fmt: String, opts: GeoReadOptions): Unit =
    require(opts.allowedDrivers.isEmpty || opts.allowedDrivers.contains(fmt),
      s"allowed_drivers: resolved format '$fmt' is not in [${opts.allowedDrivers.mkString(", ")}]")

  /** query strings never participate in extension sniffing */
  private def stripQuery(p: String): String = {
    val i = p.indexOf('?')
    if (i >= 0 && p.contains("://")) p.substring(0, i) else p
  }

  private val httpCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def download(url: String): String = httpCache.computeIfAbsent(url, _ => {
    requireExternalAccess(url)
    val u = java.net.URI.create(url).toURL
    // identity probe: object length + last-modified keyed into the cache
    // directory so a republished object re-downloads; servers that reject
    // HEAD degrade to a URL-only key (first fetch wins for the JVM's life)
    val (len, lm) =
      try {
        val h = u.openConnection().asInstanceOf[java.net.HttpURLConnection]
        h.setRequestMethod("HEAD"); h.setConnectTimeout(15000); h.setReadTimeout(15000)
        val r = (h.getContentLengthLong, h.getLastModified)
        h.disconnect(); r
      } catch { case scala.util.control.NonFatal(_) => (-1L, 0L) }
    val urlPath = u.getPath
    val name0 = urlPath.substring(urlPath.lastIndexOf('/') + 1)
    val name = if (name0.isEmpty) "download" else name0
    val key = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(url)) + s"_${len}_$lm"
    val root = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_http_$key")
    Files.createDirectories(root)
    val dest = root.resolve(name)
    if (!Files.exists(dest)) fetch(u, dest)
    // a remote shapefile is a file FAMILY: localize the sidecars beside the
    // .shp (required .dbf/.shx fail loudly; optional .cpg/.prj tolerated)
    if (name.toLowerCase.endsWith(".shp")) {
      for (ext <- Seq(".dbf", ".shx", ".cpg", ".prj")) {
        val sDest = root.resolve(name.dropRight(4) + ext)
        if (!Files.exists(sDest)) {
          val sUrl = url.patch(url.toLowerCase.lastIndexOf(".shp"), ext, 4)
          try fetch(java.net.URI.create(sUrl).toURL, sDest)
          catch {
            case scala.util.control.NonFatal(e) if ext == ".cpg" || ext == ".prj" => // optional
            case scala.util.control.NonFatal(e) =>
              throw new java.io.IOException(s"remote shapefile sidecar $sUrl: ${e.getMessage}", e)
          }
        }
      }
    }
    dest.toString
  })

  private def fetch(u: java.net.URL, dest: java.nio.file.Path): Unit = {
    val conn = u.openConnection()
    conn.setConnectTimeout(15000); conn.setReadTimeout(120000)
    val in = conn.getInputStream
    val tmp = dest.resolveSibling(dest.getFileName.toString + "." +
      Thread.currentThread().getId + ".tmp")
    try {
      Files.copy(in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      try Files.move(tmp, dest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
    } finally { in.close(); Files.deleteIfExists(tmp) }
  }

  /** reference's sandbox switch (config.cpp enable_external_access): archive
    * indirection counts as external access, checked where a session is
    * visible (driver-side expand; executor threads have no active session) */
  private def requireExternalAccess(what: String): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession.foreach { s =>
      if (!s.conf.get("enable_external_access", "true").toBoolean)
        throw new SecurityException(
          s"reading $what: External access is disabled by configuration")
    }

  private val zipCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Resolve a (possibly zip-virtual) path to a readable local file. The
    * cache key carries the archive's length+mtime so a rewritten archive at
    * the same path is re-extracted, never served stale. */
  def local(p: String): String =
    if (isRemote(p)) {
      val bang = p.indexOf('!')
      if (bang > 0 && stripQuery(p.substring(0, bang)).toLowerCase.endsWith(".zip"))
        local(download(p.substring(0, bang)) + p.substring(bang)) // remote archive → local zip-virtual
      else download(p)
    } else if (!isZipVirtual(p)) p
    else {
      val f = new java.io.File(p.substring(0, p.indexOf('!')).stripPrefix("file:"))
      zipCache.computeIfAbsent(p + "@" + f.length() + ":" + f.lastModified(),
        _ => extractEntry(p))
    }

  private def extractEntry(virtual: String): String = {
    val bang = virtual.indexOf('!')
    val archive = new java.io.File(virtual.substring(0, bang).stripPrefix("file:"))
    val entry = virtual.substring(bang + 1)
    // the driver-side gate in expand() has already run; re-check when a
    // session is visible (extraction on the driver path)
    requireExternalAccess(archive.toString)
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(
      archive.getAbsolutePath)) + "_" + archive.length() + "_" + archive.lastModified()
    val root = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_zip_$key")
    // entry paths flatten ('/'→'_') so one cache dir holds a whole archive;
    // sidecars keep their shared stem, which is what Shapefile.basePath needs
    def flat(name: String) = name.replace('/', '_')
    val zf = new java.util.zip.ZipFile(archive)
    try {
      // a shapefile is a file FAMILY: extract every same-stem sibling too
      val stem =
        if (entry.toLowerCase.endsWith(".shp")) Some(entry.dropRight(4) + ".") else None
      val wanted = zf.entries().asScala.filter { e =>
        !e.isDirectory && (e.getName == entry || stem.exists(e.getName.startsWith))
      }.toSeq
      require(wanted.exists(_.getName == entry), s"no entry '$entry' in $archive")
      java.nio.file.Files.createDirectories(root)
      wanted.foreach { e =>
        val dest = root.resolve(flat(e.getName))
        if (!Files.exists(dest)) {
          val tmp = root.resolve(flat(e.getName) + "." + Thread.currentThread().getId + ".tmp")
          val in = zf.getInputStream(e)
          try Files.copy(in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          try Files.move(tmp, dest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
        }
      }
      root.resolve(flat(entry)).toString
    } finally zf.close()
  }

  // ------------------------------------------------- Hive-style partitions

  /** Hive-style partition columns for a file set: `k=v` directory segments
    * present in EVERY path, in first-path order. The standard 100 TB layout
    * (`source=web/year=2024/part-0.geojsonl`) becomes typed columns that
    * prune at the FILE level before any byte is read. Types mirror Spark's
    * partition discovery: LongType when every value parses as a long,
    * DoubleType when double, else StringType. */
  def partitionSpec(paths: Seq[String]): Seq[(String, DataType)] = {
    if (paths.isEmpty) return Seq.empty
    val kvs = paths.map(p => partitionValuesOf(p).toMap)
    val keys = partitionValuesOf(paths.head).map(_._1).distinct
      .filter(k => kvs.forall(_.contains(k)))
    keys.map { k =>
      val vs = kvs.flatMap(_.get(k)).filter(_ != null)
      val t: DataType =
        if (vs.nonEmpty && vs.forall(v => v.nonEmpty && scala.util.Try(v.toLong).isSuccess)) LongType
        else if (vs.nonEmpty && vs.forall(v => v.nonEmpty && scala.util.Try(v.toDouble).isSuccess)) DoubleType
        else StringType
      (k, t)
    }
  }

  /** ordered key→value pairs from one path's `k=v` directory segments
    * (%XX-unescaped; `__HIVE_DEFAULT_PARTITION__` → null) */
  def partitionValuesOf(path: String): Seq[(String, String)] =
    path.stripPrefix("file:").split(java.io.File.separatorChar).dropRight(1).toSeq.flatMap { seg =>
      val i = seg.indexOf('=')
      if (i <= 0) None
      else {
        val v = unescapePathValue(seg.drop(i + 1))
        Some(seg.take(i) -> (if (v == "__HIVE_DEFAULT_PARTITION__") null else v))
      }
    }

  /** Hive path escaping is %XX only ('+' stays literal, unlike URL forms) */
  private def unescapePathValue(s: String): String = {
    if (!s.contains('%')) return s
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        try { out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3 }
        catch { case _: NumberFormatException => out.write(c.toInt); i += 1 }
      } else { out.write(s.substring(i, i + 1).getBytes("UTF-8")); i += 1 }
    }
    new String(out.toByteArray, "UTF-8")
  }

  /** convert a raw partition-value string to the Catalyst-internal value */
  def partitionValue(raw: String, t: DataType): Any =
    if (raw == null) null
    else t match {
      case LongType => java.lang.Long.valueOf(raw.toLong)
      case DoubleType => java.lang.Double.valueOf(raw.toDouble)
      case _ => UTF8String.fromString(raw)
    }

  /** Parse the DSv2 `paths` option: a JSON array of strings with standard
    * escapes (what DataFrameReader.load(paths: _*) emits). */
  def parseJsonStringArray(json: String): Seq[String] = {
    val s = json.trim
    if (!s.startsWith("[")) return Seq(s)
    val out = Vector.newBuilder[String]
    var i = 1
    while (i < s.length && s.charAt(i) != ']') {
      while (i < s.length && (s.charAt(i).isWhitespace || s.charAt(i) == ',')) i += 1
      if (i < s.length && s.charAt(i) == '"') {
        i += 1
        val sb = new java.lang.StringBuilder
        while (i < s.length && s.charAt(i) != '"') {
          val c = s.charAt(i)
          if (c == '\\' && i + 1 < s.length) {
            s.charAt(i + 1) match {
              case 'u' if i + 5 < s.length =>
                sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
              case 'n' => sb.append('\n'); i += 2
              case 't' => sb.append('\t'); i += 2
              case other => sb.append(other); i += 2
            }
          } else { sb.append(c); i += 1 }
        }
        i += 1 // closing quote
        out += sb.toString
      } else if (i < s.length && s.charAt(i) != ']') {
        throw new IllegalArgumentException(s"geo source: malformed paths option '$json'")
      }
    }
    out.result()
  }

  /** like expand but without the known-geo-extension filter (any file) */
  def expand0(path: String): Seq[String] = {
    val p = Paths.get(path.stripPrefix("file:"))
    if (Files.isDirectory(p)) Files.list(p).iterator().asScala.map(_.toString).toSeq.sorted
    else Seq(p.toString)
  }

  /** trailing .gz is transparent for the text formats */
  private def degz(l: String): String = if (l.endsWith(".gz")) l.dropRight(3) else l

  /** A bare `.json` can be GeoJSON, TopoJSON, or ESRIJSON — GDAL sniffs,
    * and so do we: a bounded head read looking for the discriminating
    * members (`"type": "Topology"` / ESRI's `geometryType`-or-`attributes`
    * shape). GeoJSON remains the default on ambiguity. */
  private def sniffJson(path: String): String = {
    try {
      val r = GeoFiles.textReader(path)
      val head = try {
        val buf = new Array[Char](8192)
        val n = r.read(buf)
        if (n <= 0) "" else new String(buf, 0, n)
      } finally r.close()
      val compact = head.replaceAll("\\s", "")
      if (compact.contains("\"type\":\"Topology\"")) "topojson"
      else if (compact.contains("\"geometryType\":\"esriGeometry") ||
               (compact.contains("\"attributes\":") && !compact.contains("\"properties\":")))
        "esrijson"
      else "geojson"
    } catch { case scala.util.control.NonFatal(_) => "geojson" }
  }

  private def known(f: String): Boolean = {
    val l = degz(stripQuery(f).toLowerCase)
    l.endsWith(".shp") || l.endsWith(".geojson") || l.endsWith(".json") ||
      l.endsWith(".ndjson") || l.endsWith(".geojsonl") || l.endsWith(".osm.pbf") ||
      l.endsWith(".fgb") || l.endsWith(".gpkg") || l.endsWith(".kml") ||
      l.endsWith(".gpx") || l.endsWith(".gml") || l.endsWith(".csv") || l.endsWith(".xlsx") ||
      l.endsWith(".kmz") || l.endsWith(".mif") || l.endsWith(".rss") || l.endsWith(".atom") ||
      l.endsWith(".georss") || l.endsWith(".dxf") ||
      l.endsWith(".topojson") || l.endsWith(".esrijson") || l.endsWith(".mvt") ||
      l.endsWith(".gmt") || l.endsWith(".ods")
  }

  def formatOf(paths: Seq[String], forced: Option[String]): String = forced.map(_.toLowerCase).getOrElse {
    val l = degz(stripQuery(paths.head).toLowerCase)
    if (l.endsWith(".shp")) "shapefile"
    else if (l.endsWith(".fgb")) "flatgeobuf"
    else if (l.endsWith(".gpkg")) "geopackage"
    else if (l.endsWith(".osm.pbf")) "osmpbf"
    else if (l.endsWith(".ndjson") || l.endsWith(".geojsonl")) "geojsonl"
    else if (l.endsWith(".geojson")) "geojson"
    else if (l.endsWith(".json")) sniffJson(paths.head)
    else if (l.endsWith(".kml")) "kml"
    else if (l.endsWith(".gpx")) "gpx"
    else if (l.endsWith(".gml")) "gml"
    else if (l.endsWith(".csv")) "csvwkt"
    else if (l.endsWith(".xlsx")) "xlsx"
    else if (l.endsWith(".kmz")) "kmz"
    else if (l.endsWith(".mif")) "mapinfo"
    else if (l.endsWith(".rss") || l.endsWith(".atom") || l.endsWith(".georss")) "georss"
    else if (l.endsWith(".dxf")) "dxf"
    else if (l.endsWith(".topojson")) "topojson"
    else if (l.endsWith(".esrijson")) "esrijson"
    else if (l.endsWith(".mvt")) "mvt"
    else if (l.endsWith(".gmt")) "gmt"
    else if (l.endsWith(".ods")) "ods"
    else throw new IllegalArgumentException(s"cannot infer geo format from ${paths.head}")
  }

  /** Lines whose first byte lies in [from, to) — the standard split contract
    * for newline-delimited text (Hadoop TextInputFormat semantics): a range
    * starting past 0 skips the partial line it lands in; the line straddling
    * `to` belongs to the range that contains its first byte. Byte-counted on
    * the raw stream ('\n' = 0x0A never occurs inside a UTF-8 multibyte
    * sequence), so ranges compose exactly regardless of character content. */
  def lineRange(path: String, from: Long, until: Long): Iterator[String] = {
    val fis = new java.io.FileInputStream(path)
    // start one byte early and always skip through the first '\n': if byte
    // from-1 IS a newline, only that byte is consumed and the line starting
    // exactly at `from` is kept — otherwise we'd drop boundary-aligned lines
    // (both this range and the previous one would skip them)
    if (from > 0) fis.getChannel.position(from - 1)
    val in = new java.io.BufferedInputStream(fis, 1 << 16)
    var pos = from
    if (from > 0) {
      pos = from - 1
      var b = in.read()
      while (b != -1 && b != '\n') { pos += 1; b = in.read() }
      if (b != -1) pos += 1
    }
    new Iterator[String] {
      private var nextLine: String = null
      private var closed = false
      private def advance(): Unit = {
        if (closed || nextLine != null) return
        if (pos >= until) { close(); return }
        val buf = new java.io.ByteArrayOutputStream(256)
        var b = in.read()
        if (b == -1) { close(); return }
        while (b != -1 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
        if (b != -1) pos += 1
        val bytes = buf.toByteArray
        val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1 else bytes.length
        nextLine = new String(bytes, 0, n, java.nio.charset.StandardCharsets.UTF_8)
      }
      private def close(): Unit = { closed = true; try in.close() catch { case _: Exception => } }
      override def hasNext: Boolean = { advance(); nextLine != null }
      override def next(): String = {
        advance()
        if (nextLine == null) throw new NoSuchElementException
        val l = nextLine; nextLine = null; l
      }
    }
  }

  /** Reader for a possibly-gzipped text file. */
  def textReader(path: String, charset: String = "UTF-8"): java.io.BufferedReader = {
    val in: java.io.InputStream = {
      val fis = Files.newInputStream(Paths.get(path))
      if (path.toLowerCase.endsWith(".gz")) new java.util.zip.GZIPInputStream(fis, 1 << 16) else fis
    }
    new java.io.BufferedReader(new java.io.InputStreamReader(in, charset), 1 << 16)
  }

  /** whole-document text read for the single-shared-structure formats
    * (TopoJSON topologies, ESRIJSON feature sets) */
  def readAllText(path: String): String = {
    val r = textReader(path)
    try {
      val sb = new java.lang.StringBuilder
      val buf = new Array[Char](1 << 16)
      var n = r.read(buf)
      while (n >= 0) { sb.append(buf, 0, n); n = r.read(buf) }
      sb.toString
    } finally r.close()
  }

  val geojsonSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("geom", BinaryType),
    StructField("properties", MapType(StringType, StringType))))

  /** GeoJSON property promotion (reference: GDAL's OGRGeoJSON promotes every
    * property to a column): keys seen in a bounded head sample of the first
    * file become string columns after the stable fields, so `SELECT kind …`
    * works like the reference while `properties` map access stays intact. */
  def geojsonSchemaFor(format: String, paths: Seq[String]): StructType = {
    val keys = scala.collection.mutable.LinkedHashSet.empty[String]
    try {
      val sample: Iterator[GeoJsonFile.Feature] = format match {
        case "geojson" => GeoJsonFile.streamDocument(textReader(paths.head))
        case _ =>
          val br = textReader(paths.head)
          Iterator.continually(br.readLine()).takeWhile(_ != null).flatMap(GeoJsonFile.parseLine)
      }
      sample.take(200).foreach(f => keys ++= f.properties.keys)
    } catch { case scala.util.control.NonFatal(_) => }
    val reserved = Set("id", "geom", "properties")
    StructType(geojsonSchema.fields ++
      keys.toSeq.filterNot(reserved).map(StructField(_, StringType)))
  }

  val osmSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("id", LongType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("refs", ArrayType(LongType)),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("ref_roles", ArrayType(StringType)),
    StructField("ref_types", ArrayType(StringType))))

  def dbfFieldType(f: Shapefile.DbfField): DataType = f.typ match {
    case 'N' if f.decimals == 0 && f.width < 10 => IntegerType
    case 'N' if f.decimals == 0 && f.width < 19 => LongType
    case 'N' | 'F' => DoubleType
    case 'D' => DateType
    case 'L' => BooleanType
    case _ => StringType
  }

  def shapefileSchema(path: String): StructType = {
    val meta = Shapefile.readMeta(path)
    // dedupe names like the reference (read_shapefile.cpp:164-172)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val fields = meta.fields.map { f =>
      val n = seen.get(f.name) match {
        case None => seen(f.name) = 1; f.name
        case Some(c) => seen(f.name) = c + 1; s"${f.name}_$c"
      }
      StructField(n, dbfFieldType(f))
    }
    StructType(fields :+ StructField("geom", BinaryType))
  }

  def flatgeobufSchema(path: String): StructType = {
    val h = FlatGeobuf.readHeader(path)
    // property values surface as strings (same dynamic-schema stance as geojson)
    StructType(h.columns.map(c => StructField(c.name, StringType)) :+ StructField("geom", BinaryType))
  }

  def sqliteToSpark(declared: String, isGeom: Boolean): DataType =
    if (isGeom) BinaryType
    else if (declared.startsWith("INT") || declared == "MEDIUMINT" || declared == "BOOLEAN") LongType
    else if (declared.startsWith("REAL") || declared.startsWith("DOUBLE") || declared.startsWith("FLOAT")) DoubleType
    else if (declared == "BLOB") BinaryType
    else StringType

  /** Multi-layer dataset selection (reference: st_read.cpp:623-631 `layer`
    * open option): a GeoPackage is a container of feature tables; `layer`
    * names the one to read, default = the first registered table. */
  def geopackageTable(path: String, layer: Option[String] = None): GeoPackage.FeatureTable = {
    val tables = GeoPackage.featureTables(path)
    require(tables.nonEmpty, s"no GeoPackage feature tables in $path")
    layer match {
      case None => tables.head
      case Some(name) => tables.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"layer '$name' not found in $path; available layers: ${tables.map(_.name).mkString(", ")}"))
    }
  }

  def geopackageSchema(path: String, layer: Option[String] = None): StructType = {
    val t = geopackageTable(path, layer)
    StructType(t.columns.map { case (n, typ) =>
      StructField(n, sqliteToSpark(typ, n == t.geomColumn))
    })
  }

  /** Formats with a real sub-dataset concept; anything else rejects `layer`
    * loudly instead of silently reading the whole file. */
  private val layeredFormats = Set("geopackage", "kml", "kmz", "dxf", "topojson", "mvt")
  def requireLayerSupported(format: String, layer: Option[String]): Unit =
    layer.foreach { l =>
      require(layeredFormats.contains(format),
        s"format '$format' has no layers (requested layer '$l'); " +
          s"layer selection applies to ${layeredFormats.mkString("/")}")
    }

  def xlsxSchema(path: String): StructType = {
    val hdr = Xlsx.rows(path).headOption.getOrElse(Array.empty[String])
    StructType(hdr.zipWithIndex.map { case (h, i) =>
      StructField(if (h == null || h.isEmpty) s"col$i" else h.trim, StringType)
    }.toIndexedSeq)
  }

  def odsSchema(path: String): StructType = {
    val hdr = Ods.rows(path).headOption.getOrElse(Array.empty[String])
    StructType(hdr.zipWithIndex.map { case (h, i) =>
      StructField(if (h == null || h.isEmpty) s"col$i" else h.trim, StringType)
    }.toIndexedSeq)
  }

  def mifSchema(path: String): StructType = {
    val m = MapInfoMif.meta(path)
    // attribute values surface as strings (same dynamic-schema stance as fgb)
    StructType(m.columns.map(StructField(_, StringType)) :+ StructField("geom", BinaryType))
  }

  def csvSchema(path: String, opts: GeoReadOptions = GeoReadOptions.default): StructType = {
    val hdr = CsvWkt.header(path, opts.encoding)
    val gi = CsvWkt.geomColumn(hdr.toSeq, opts.geomColumn)
    StructType(hdr.zipWithIndex.collect {
      case (h, i) if i != gi => StructField(h.trim, StringType)
    } :+ StructField("geom", BinaryType))
  }

  def schemaFor(format: String, paths0: Seq[String], layer: Option[String] = None,
                opts: GeoReadOptions = GeoReadOptions.default): StructType = {
    requireLayerSupported(format, layer)
    val paths = paths0.map(local)
    format match {
      case "shapefile" => shapefileSchema(paths.head)
      case "geojson" | "geojsonl" => geojsonSchemaFor(format, paths)
      case "kml" | "gpx" | "gml" | "kmz" | "georss" | "dxf" | "topojson" | "esrijson" | "mvt" | "gmt" => geojsonSchema
      case "mapinfo" => mifSchema(paths.head)
      case "osmpbf" => osmSchema
      case "flatgeobuf" => flatgeobufSchema(paths.head)
      case "geopackage" => geopackageSchema(paths.head, layer)
      case "csvwkt" => csvSchema(paths.head, opts)
      case "xlsx" => xlsxSchema(paths.head)
      case "ods" => odsSchema(paths.head)
      case other => throw new IllegalArgumentException(s"unknown geo format $other")
    }
  }
}

class GeoTable(schema: StructType, paths: Seq[String], val format: String,
               val bbox: Option[(Double, Double, Double, Double)] = None,
               val rawPath: Option[String] = None,
               val layer: Option[String] = None,
               val opts: GeoReadOptions = GeoReadOptions.default)
    extends Table with SupportsRead {
  /** Hive-style partition columns carried by the path layout: keys present
    * in every file's path whose name made it into the schema as a NON-data
    * column. Empty (zero IO) for unpartitioned layouts. */
  lazy val partCols: Seq[(String, DataType)] = {
    val spec = GeoFiles.partitionSpec(paths)
    if (spec.isEmpty) Seq.empty
    else {
      val dataNames = GeoFiles.schemaFor(format, paths, layer).fieldNames.toSet
      spec.filter(p => !dataNames.contains(p._1) && schema.fieldNames.contains(p._1))
    }
  }
  override def name(): String =
    s"geo($format:${paths.headOption.getOrElse("")})" +
      bbox.map(b => s" bbox=[${b._1},${b._2},${b._3},${b._4}]").getOrElse("")
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = new java.util.HashSet[TableCapability]()
    caps.add(TableCapability.BATCH_READ)
    if (rawPath.isDefined) caps.add(TableCapability.MICRO_BATCH_READ)
    caps
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeoScanBuilder(schema, paths, format, bbox, rawPath, partCols, layer, opts)
  /** same table narrowed to a query window (index-backed formats prune) */
  def withBbox(b: (Double, Double, Double, Double)): GeoTable =
    new GeoTable(schema, paths, format, Some(b), rawPath, layer, opts)
}

class GeoScanBuilder(fullSchema: StructType, paths: Seq[String], format: String,
                     bbox: Option[(Double, Double, Double, Double)],
                     rawPath: Option[String] = None,
                     partCols: Seq[(String, DataType)] = Seq.empty,
                     layer: Option[String] = None,
                     opts: GeoReadOptions = GeoReadOptions.default)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = fullSchema
  private var prunedPaths: Seq[String] = paths
  private var accepted: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }

  /** Partition pruning: a conjunct referencing ONLY partition columns and
    * evaluable per file drops non-matching FILES from the scan — the DSv2
    * analogue of parquet partition pruning, applied before any byte of
    * content is read. Exactly-satisfied conjuncts are consumed (not
    * re-evaluated above); anything else stays residual. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    if (partCols.isEmpty) return filters
    val types = partCols.toMap
    val residual = Array.newBuilder[org.apache.spark.sql.sources.Filter]
    val ok = Array.newBuilder[org.apache.spark.sql.sources.Filter]
    var keep = prunedPaths
    filters.foreach { f =>
      if (f.references.nonEmpty && f.references.forall(types.contains)) {
        // evaluate against every path; any undecidable file → leave residual
        val verdicts = keep.map { p =>
          GeoPartFilter.eval(f, GeoFiles.partitionValuesOf(p).toMap, types)
        }
        if (verdicts.forall(_.isDefined)) {
          keep = keep.zip(verdicts).collect { case (p, Some(true)) => p }
          ok += f
        } else residual += f
      } else residual += f
    }
    prunedPaths = keep
    accepted = ok.result()
    residual.result()
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = accepted

  override def build(): Scan =
    new GeoScan(fullSchema, required, prunedPaths, format, bbox, rawPath, partCols, layer, opts)
}

/** Evaluates a source Filter against one file's partition values (raw
  * strings + declared types). None = undecidable (unsupported shape or a
  * value that fails to convert) — the caller then keeps the filter residual. */
object GeoPartFilter {
  import org.apache.spark.sql.sources._
  def eval(f: Filter, kv: Map[String, String], types: Map[String, DataType]): Option[Boolean] = {
    def cmp(attr: String, v: Any): Option[Int] = {
      val raw = kv.getOrElse(attr, null)
      if (raw == null || v == null) None
      else scala.util.Try {
        types(attr) match {
          case LongType => java.lang.Long.compare(raw.toLong, v.toString.toLong)
          case DoubleType => java.lang.Double.compare(raw.toDouble, v.toString.toDouble)
          case _ => raw.compareTo(v.toString)
        }
      }.toOption
    }
    f match {
      case EqualTo(a, v) => cmp(a, v).map(_ == 0)
      case EqualNullSafe(a, v) =>
        val raw = kv.getOrElse(a, null)
        if (raw == null || v == null) Some(raw == null && v == null) else cmp(a, v).map(_ == 0)
      case In(a, vs) =>
        val rs = vs.toSeq.map(v => cmp(a, v))
        if (rs.exists(r => r.contains(0))) Some(true)
        else if (rs.forall(_.isDefined)) Some(false) else None
      case GreaterThan(a, v) => cmp(a, v).map(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).map(_ >= 0)
      case LessThan(a, v) => cmp(a, v).map(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v).map(_ <= 0)
      case IsNull(a) => Some(kv.getOrElse(a, null) == null)
      case IsNotNull(a) => Some(kv.getOrElse(a, null) != null)
      case StringStartsWith(a, p) => Option(kv.getOrElse(a, null)).map(_.startsWith(p))
      case StringEndsWith(a, p) => Option(kv.getOrElse(a, null)).map(_.endsWith(p))
      case StringContains(a, p) => Option(kv.getOrElse(a, null)).map(_.contains(p))
      case And(l, r) => (eval(l, kv, types), eval(r, kv, types)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval(l, kv, types), eval(r, kv, types)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => eval(c, kv, types).map(!_)
      case _ => None
    }
  }
}

class GeoScan(fullSchema: StructType, required: StructType, paths: Seq[String], format: String,
              bbox: Option[(Double, Double, Double, Double)] = None,
              rawPath: Option[String] = None,
              partCols: Seq[(String, DataType)] = Seq.empty,
              layer: Option[String] = None,
              opts: GeoReadOptions = GeoReadOptions.default)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** File-size (and, where a header carries it, row-count) statistics so
    * Catalyst can pick broadcast joins over geo scans — without this every
    * DSv2 relation defaults to "unknown/huge" and a small .shp lookup table
    * shuffles instead of broadcasting. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val localPaths = paths.map(GeoFiles.local)
    private val bytes: Long = localPaths.map { p =>
      val f = new java.io.File(p.stripPrefix("file:"))
      // shapefile payloads live beside the .shp in .dbf; count the family
      if (format == "shapefile") {
        val base = Shapefile.basePath(p)
        Seq(".shp", ".dbf", ".shx").map(e => new java.io.File(base + e).length()).sum
      } else f.length()
    }.sum
    private val rows: java.util.OptionalLong = format match {
      case "shapefile" =>
        try java.util.OptionalLong.of(localPaths.map(p => Shapefile.readMeta(p).recordCount.toLong).sum)
        catch { case scala.util.control.NonFatal(_) => java.util.OptionalLong.empty() }
      case "flatgeobuf" =>
        try {
          val counts = localPaths.map(p => FlatGeobuf.readHeader(p).featuresCount)
          if (counts.forall(_ > 0)) java.util.OptionalLong.of(counts.sum)
          else java.util.OptionalLong.empty()
        } catch { case scala.util.control.NonFatal(_) => java.util.OptionalLong.empty() }
      case _ => java.util.OptionalLong.empty()
    }
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(math.max(bytes, 1L))
    override def numRows(): java.util.OptionalLong = rows
  }

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GeoMicroBatchStream(fullSchema, required, format,
      rawPath.getOrElse(throw new IllegalArgumentException(
        "geo streaming requires a directory path")), checkpointLocation, partCols)

  override def planInputPartitions(): Array[InputPartition] =
    GeoScan.partitionsFor(format, paths, layer)

  override def createReaderFactory(): PartitionReaderFactory =
    new GeoReaderFactory(fullSchema, required, format, bbox, partCols, layer, opts)
}

object GeoScan {
  /** Partition planning shared by the batch Scan and the micro-batch stream:
    * every format splits intra-file where its container allows it. */
  def partitionsFor(format: String, paths: Seq[String],
                    layer: Option[String] = None): Array[InputPartition] = format match {
    case "osmpbf" =>
      // blob-parallel: runs of 16 blobs per partition (st_read_osm.cpp parallel model)
      paths.flatMap { p =>
        OsmPbf.indexBlobs(GeoFiles.local(p)).grouped(16)
          .map(g => OsmPartition(p, g.toArray): InputPartition)
      }.toArray
    case "shapefile" =>
      // intra-file splits from the .shx record index: one 20 GB .shp becomes
      // ~300 range partitions instead of one task. Partitions carry the
      // VIRTUAL path (zip entries localize executor-side); split planning
      // reads the localized copy.
      val targetBytes = 64L << 20
      paths.flatMap { p =>
        val lp = GeoFiles.local(p)
        val meta = Shapefile.readMeta(lp)
        val n = meta.recordCount
        if (n == 0) Seq(ShpRangePartition(p, 0, 0): InputPartition)
        else {
          val totalBytes = new java.io.File(Shapefile.basePath(lp) + ".shp").length()
          val chunks = math.max(1, math.min(n.toLong, totalBytes / targetBytes + 1)).toInt
          val per = (n + chunks - 1) / chunks
          (0 until n by per).map(s => ShpRangePartition(p, s, math.min(n, s + per)): InputPartition)
        }
      }.toArray
    case "flatgeobuf" =>
      // intra-file splits via the packed index's leaf offsets: a 10 GB .fgb
      // becomes ~160 range partitions instead of one task (unindexed files
      // stay one range — length-prefixed features aren't seekable blind)
      val target =
        try org.apache.spark.sql.internal.SQLConf.get
          .getConfString("spark.graft.fgb.splitBytes", (64L << 20).toString).toLong
        catch { case _: Exception => 64L << 20 }
      paths.flatMap { p =>
        FlatGeobuf.splitOffsets(GeoFiles.local(p), target).map { case (from, to) =>
          FgbRangePartition(p, from, to): InputPartition
        }
      }.toArray
    case "geopackage" =>
      // intra-file splits over the feature table's root-level B-tree
      // subtrees: a multi-GB .gpkg scans as ~64 MB page-group tasks (the
      // balanced tree makes equal child counts ≈ equal bytes)
      val target = 64L << 20
      paths.flatMap { p =>
        val lp = GeoFiles.local(p)
        val table = GeoFiles.geopackageTable(lp, layer)
        val roots = GeoPackage.subtreeRoots(lp, table)
        val bytes = new java.io.File(lp.stripPrefix("file:")).length()
        val chunks = math.max(1, math.min(roots.size.toLong, bytes / target + 1)).toInt
        val per = (roots.size + chunks - 1) / chunks
        roots.grouped(per).map(g => GpkgPartition(p, g.toArray): InputPartition)
      }.toArray
    case "geojsonl" =>
      // newline-aligned byte-range splits: a 10 GB .geojsonl becomes ~160
      // tasks. Gzipped files aren't seekable — they stay one task each.
      val target =
        try org.apache.spark.sql.internal.SQLConf.get
          .getConfString("spark.graft.jsonl.splitBytes", (64L << 20).toString).toLong
        catch { case _: Exception => 64L << 20 }
      paths.flatMap { p =>
        if (p.toLowerCase.endsWith(".gz")) Seq(FilePartition(p): InputPartition)
        else {
          val len = new java.io.File(GeoFiles.local(p)).length()
          if (len == 0) Seq(JsonlRangePartition(p, 0L, 0L): InputPartition)
          else (0L until len by target).map(s =>
            JsonlRangePartition(p, s, math.min(len, s + target)): InputPartition)
        }
      }.toArray
    case _ => paths.map(p => FilePartition(p): InputPartition).toArray
  }
}

case class FilePartition(path: String) extends InputPartition
case class JsonlRangePartition(path: String, fromOff: Long, toOff: Long) extends InputPartition
case class GpkgPartition(path: String, subtreeRoots: Array[Long]) extends InputPartition
case class FgbRangePartition(path: String, fromOff: Long, toOff: Long) extends InputPartition
case class ShpRangePartition(path: String, startRec: Int, endRec: Int) extends InputPartition
case class OsmPartition(path: String, blobs: Array[OsmPbf.BlobRef]) extends InputPartition

class GeoReaderFactory(fullSchema0: StructType, required0: StructType, format: String,
                       bbox: Option[(Double, Double, Double, Double)] = None,
                       partCols: Seq[(String, DataType)] = Seq.empty,
                       layer: Option[String] = None,
                       opts: GeoReadOptions = GeoReadOptions.default)
    extends PartitionReaderFactory {
  override def createReader(partition0: InputPartition): PartitionReader[InternalRow] = {
    // zip-virtual paths localize HERE — on the executor that owns the
    // partition — so archive entries are extracted where they are read
    val partition = partition0 match {
      case FilePartition(p) if GeoFiles.needsLocal(p) => FilePartition(GeoFiles.local(p))
      case JsonlRangePartition(p, a, b) if GeoFiles.needsLocal(p) =>
        JsonlRangePartition(GeoFiles.local(p), a, b)
      case GpkgPartition(p, r) if GeoFiles.needsLocal(p) => GpkgPartition(GeoFiles.local(p), r)
      case FgbRangePartition(p, a, b) if GeoFiles.needsLocal(p) =>
        FgbRangePartition(GeoFiles.local(p), a, b)
      case ShpRangePartition(p, a, b) if GeoFiles.needsLocal(p) =>
        ShpRangePartition(GeoFiles.local(p), a, b)
      case OsmPartition(p, blobs) if GeoFiles.needsLocal(p) => OsmPartition(GeoFiles.local(p), blobs)
      case other => other
    }
    // format readers see DATA columns only; Hive-style partition columns are
    // appended afterwards as per-file constants parsed from the path
    val partNames = partCols.map(_._1).toSet
    val fullSchema =
      if (partNames.isEmpty) fullSchema0
      else StructType(fullSchema0.fields.filterNot(f => partNames.contains(f.name)))
    val required1 =
      if (partNames.isEmpty) required0
      else StructType(required0.fields.filterNot(f => partNames.contains(f.name)))
    // spatial_filter_box semantics: features whose envelope misses the window
    // are excluded for EVERY format (fgb additionally prunes via its packed
    // index before materializing). If projection pruned the geometry away
    // (e.g. count(*)), read it internally and drop it after the filter.
    val geomName = fullSchema.fields.find(f =>
      f.dataType == BinaryType && (f.name == "geom" || f.name == "geometry"))
      .map(_.name).orNull
    val (required, bboxGeomIdx, dropBboxGeom) = bbox match {
      case Some(_) if geomName != null =>
        val gi = required1.fieldNames.indexOf(geomName)
        if (gi >= 0) (required1, gi, false)
        else (StructType(required1.fields :+ fullSchema(geomName)), required1.length, true)
      case _ => (required1, -1, false)
    }
    val rows0: Iterator[InternalRow] = (format, partition) match {
      case ("shapefile", ShpRangePartition(p, s, e)) =>
        GeoRows.shapefileRows(p, s, e, fullSchema, required, opts.encoding)
      case ("geojson", FilePartition(p)) =>
        // stream the FeatureCollection: a multi-GB document must not be
        // materialized as one String/byte[]
        GeoJsonFile.streamDocument(GeoFiles.textReader(p)).map(GeoRows.featureRow(_, required))
      case ("geojsonl", JsonlRangePartition(p, from, to)) =>
        GeoFiles.lineRange(p, from, to)
          .flatMap(GeoJsonFile.parseLine)
          .map(GeoRows.featureRow(_, required))
      case ("geojsonl", FilePartition(p)) => // gzipped: not seekable, one task
        val br = GeoFiles.textReader(p)
        Iterator.continually(br.readLine()).takeWhile(_ != null)
          .flatMap(GeoJsonFile.parseLine)
          .map(GeoRows.featureRow(_, required))
      case ("osmpbf", OsmPartition(p, blobs)) =>
        blobs.iterator.flatMap(b => OsmPbf.readBlob(p, b)).map(GeoRows.osmRow(_, required))
      case ("flatgeobuf", FgbRangePartition(p, from, to)) =>
        // packed-index pruning when a query window was pushed down; the
        // exact spatial predicate remains in the residual Filter above
        val feats = bbox match {
          case Some((x0, y0, x1, y1)) =>
            FlatGeobuf.searchIndex(p, x0, y0, x1, y1) match {
              case Some(offsets) =>
                FlatGeobuf.readFeaturesAt(p,
                  offsets.filter(o => o >= from && (to < 0 || o < to)))
              case None => FlatGeobuf.readFeaturesRange(p, from, to)
            }
          case None => FlatGeobuf.readFeaturesRange(p, from, to)
        }
        feats.map(GeoRows.fgbRow(_, required))
      case ("geopackage", GpkgPartition(p, roots)) =>
        GeoRows.gpkgRows(p, roots, required, layer, keepWkb = opts.keepWkb)
      case ("kml", FilePartition(p)) =>
        XmlGeo.kmlFeatures(p, layer).map(GeoRows.featureRow(_, required))
      case ("gpx", FilePartition(p)) =>
        XmlGeo.gpxFeatures(p).map(GeoRows.featureRow(_, required))
      case ("gml", FilePartition(p)) =>
        XmlGeo.gmlFeatures(p).map(GeoRows.featureRow(_, required))
      case ("kmz", FilePartition(p)) =>
        XmlGeo.kmzFeatures(p, layer).map(GeoRows.featureRow(_, required))
      case ("georss", FilePartition(p)) =>
        XmlGeo.georssFeatures(p).map(GeoRows.featureRow(_, required))
      case ("mapinfo", FilePartition(p)) =>
        MapInfoMif.features(p).map(GeoRows.featureRow(_, required))
      case ("dxf", FilePartition(p)) =>
        // DXF layers = entity layer codes; the `layer` property always carries it
        val feats = Dxf.features(p)
        layer.fold(feats)(l => feats.filter(_.properties.get("layer").contains(l)))
          .map(GeoRows.featureRow(_, required))
      case ("topojson", FilePartition(p)) =>
        // TopoJSON layers = named topology objects
        TopoJson.features(p, layer).map(GeoRows.featureRow(_, required))
      case ("esrijson", FilePartition(p)) =>
        EsriJson.features(p).map(GeoRows.featureRow(_, required))
      case ("mvt", FilePartition(p)) =>
        // MVT layers = tile layers; z/x/y paths georeference to EPSG:3857
        Mvt.features(p, layer).map(GeoRows.featureRow(_, required))
      case ("csvwkt", FilePartition(p)) =>
        GeoRows.csvRows(p, fullSchema, required, opts)
      case ("xlsx", FilePartition(p)) =>
        GeoRows.xlsxRows(p, fullSchema, required)
      case ("ods", FilePartition(p)) =>
        GeoRows.odsRows(p, fullSchema, required)
      case ("gmt", FilePartition(p)) =>
        Gmt.features(p).map(GeoRows.featureRow(_, required))
      case other => throw new IllegalArgumentException(s"bad partition $other")
    }
    val rows0b: Iterator[InternalRow] =
      if (bboxGeomIdx < 0) rows0
      else {
        val Some((x0, y0, x1, y1)) = bbox
        val envFiltered = rows0.filter { r =>
          !r.isNullAt(bboxGeomIdx) && {
            val e = graft.geom.Wkb.envelope(r.getBinary(bboxGeomIdx))
            e != null && e(0) <= x1 && e(2) >= x0 && e(1) <= y1 && e(3) >= y0
          }
        }
        // exact spatial_filter (reference st_read named param): features
        // surviving the envelope prefilter are tested against the PREPARED
        // filter geometry — one prepared build per partition reader
        opts.spatialFilter match {
          case Some(wkt) =>
            val prepared = org.locationtech.jts.geom.prep.PreparedGeometryFactory
              .prepare(graft.geom.Geo.fromWkt(wkt))
            envFiltered.filter { r =>
              val g = try graft.geom.Geo.read(r.getBinary(bboxGeomIdx))
                      catch { case scala.util.control.NonFatal(_) => null }
              g != null && prepared.intersects(g)
            }
          case None => envFiltered
        }
      }
    val rows: Iterator[InternalRow] =
      if (partNames.isEmpty && !dropBboxGeom) rows0b
      else {
        // every InputPartition's first element is its file path; use the
        // ORIGINAL (possibly zip-virtual) path — extracted copies flatten
        // the k=v directory segments away
        val path = partition0.asInstanceOf[Product].productElement(0).toString
        val kv = GeoFiles.partitionValuesOf(path).toMap
        val dataIdx = required.fieldNames.zipWithIndex.toMap
        val cells: Array[Either[Int, Any]] = required0.fields.map { f =>
          dataIdx.get(f.name) match {
            case Some(i) => Left(i)
            case None =>
              val t = partCols.collectFirst { case (n, tp) if n == f.name => tp }.get
              Right(GeoFiles.partitionValue(kv.getOrElse(f.name, null), t))
          }
        }
        val dataTypes = required.fields.map(_.dataType)
        rows0b.map { r =>
          val out = new Array[Any](cells.length)
          var i = 0
          while (i < cells.length) {
            out(i) = cells(i) match {
              case Left(j) => if (r.isNullAt(j)) null else r.get(j, dataTypes(j))
              case Right(c) => c
            }
            i += 1
          }
          new GenericInternalRow(out)
        }
      }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { if (rows.hasNext) { current = rows.next(); true } else false }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

object GeoRows {
  private def utf(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)

  def featureRow(f: GeoJsonFile.Feature, required: StructType): InternalRow = {
    val vals = required.fields.map { field =>
      field.name match {
        // a Feature-level id wins; round-tripped files carry it as a property
        case "id" => if (f.id != null) utf(f.id) else f.properties.get("id").map(utf).orNull
        case "geom" => if (f.geom == null) null else Wkb.write(f.geom)
        case "properties" => ArrayBasedMapData(f.properties, (k: Any) => utf(k.asInstanceOf[String]), (v: Any) => utf(v.asInstanceOf[String]))
        case promoted => f.properties.get(promoted).map(utf).orNull
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  def osmRow(e: OsmPbf.Entity, required: StructType): InternalRow = {
    val vals = required.fields.map { field =>
      (field.name match {
        case "kind" => utf(e.kind)
        case "id" => e.id
        case "tags" => ArrayBasedMapData(e.tags, (k: Any) => utf(k.asInstanceOf[String]), (v: Any) => utf(v.asInstanceOf[String]))
        case "refs" => new GenericArrayData(e.refs.map(x => x: Any))
        case "lat" => e.lat
        case "lon" => e.lon
        case "ref_roles" => new GenericArrayData(e.refRoles.map(utf): Array[Any])
        case "ref_types" => new GenericArrayData(e.refTypes.map(utf): Array[Any])
        case _ => null
      }): Any
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  def fgbRow(f: FlatGeobuf.FgbFeature, required: StructType): InternalRow = {
    val vals = required.fields.map { field =>
      (if (field.name == "geom") {
        if (f.geom == null) null else Wkb.write(f.geom)
      } else f.properties.get(field.name).map(utf).orNull): Any
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  def gpkgRows(path: String, subtreeRoots: Array[Long], required: StructType,
               layer: Option[String] = None, keepWkb: Boolean = false): Iterator[InternalRow] = {
    val t = GeoFiles.geopackageTable(path, layer)
    val colIdx = t.columns.map(_._1).zipWithIndex.toMap
    // keep_wkb: the GeoPackageBinary body is ALREADY standard WKB — slice it
    // out verbatim instead of decode→validate→re-encode through JTS (the
    // reference's st_read keep_wkb). Identical output bytes for well-formed
    // data; malformed WKB surfaces at first use instead of at scan.
    val scan =
      if (keepWkb) GeoPackage.scanPagesWkb(path, t, subtreeRoots.toSeq)
      else GeoPackage.scanPages(path, t, subtreeRoots.toSeq)
        .map { case (rid, cols, g) => (rid, cols, if (g == null) null else Wkb.write(g)) }
    scan.map { case (_, cols, wkb) =>
      val vals = required.fields.map { field =>
        (if (field.name == t.geomColumn) {
          wkb
        } else {
          val v = colIdx.get(field.name).map(cols(_)).orNull
          (v, field.dataType) match {
            case (null, _) => null
            case (x: Long, LongType) => x
            case (x: Long, DoubleType) => x.toDouble
            case (x: Double, DoubleType) => x
            case (x: Double, LongType) => x.toLong
            case (x: String, StringType) => utf(x)
            case (x: Array[Byte], BinaryType) => x
            case (x, StringType) => utf(String.valueOf(x))
            case _ => null
          }
        }): Any
      }
      new GenericInternalRow(vals.asInstanceOf[Array[Any]])
    }
  }

  def xlsxRows(path: String, fullSchema: StructType, required: StructType): Iterator[InternalRow] = {
    val idx = fullSchema.fieldNames.zipWithIndex.toMap
    Xlsx.rows(path).iterator.drop(1).map { cells =>
      val vals = required.fields.map { field =>
        (idx.get(field.name) match {
          case Some(i) if i < cells.length && cells(i) != null => utf(cells(i))
          case _ => null
        }): Any
      }
      new GenericInternalRow(vals.asInstanceOf[Array[Any]])
    }
  }

  def odsRows(path: String, fullSchema: StructType, required: StructType): Iterator[InternalRow] = {
    val idx = fullSchema.fieldNames.zipWithIndex.toMap
    Ods.rows(path).iterator.drop(1).map { cells =>
      val vals = required.fields.map { field =>
        (idx.get(field.name) match {
          case Some(i) if i < cells.length && cells(i) != null => utf(cells(i))
          case _ => null
        }): Any
      }
      new GenericInternalRow(vals.asInstanceOf[Array[Any]])
    }
  }

  def csvRows(path: String, fullSchema: StructType, required: StructType,
              opts: GeoReadOptions = GeoReadOptions.default): Iterator[InternalRow] = {
    // fullSchema = attribute columns in header order + trailing geom
    val attrIndex = fullSchema.fieldNames.zipWithIndex.toMap
    CsvWkt.rows(path, opts.geomColumn, opts.encoding).map { case (attrs, geom) =>
      val vals = required.fields.map { field =>
        (if (field.name == "geom") {
          if (geom == null) null else Wkb.write(geom)
        } else attrIndex.get(field.name) match {
          case Some(i) if i < attrs.length => utf(attrs(i))
          case _ => null
        }): Any
      }
      new GenericInternalRow(vals.asInstanceOf[Array[Any]])
    }
  }

  def shapefileRows(path: String, startRec: Int, endRec: Int,
                    fullSchema: StructType, required: StructType,
                    encoding: Option[String] = None): Iterator[InternalRow] = {
    val meta = Shapefile.readMeta(path)
    // fullSchema order = dbf fields then geom; map required names to indices
    val attrIndex = fullSchema.fieldNames.zipWithIndex.toMap
    Shapefile.readRecordRange(path, startRec, endRec, encoding).map { case (geom, attrs) =>
      val vals = required.fields.map { field =>
        (if (field.name == "geom") {
          if (geom == null) null else Wkb.write(geom)
        } else {
          val i = attrIndex(field.name)
          convertDbf(attrs(i), meta.fields(i), field.dataType)
        }): Any
      }
      new GenericInternalRow(vals.asInstanceOf[Array[Any]])
    }
  }

  private def convertDbf(raw: String, f: Shapefile.DbfField, dt: DataType): Any = {
    if (raw == null || raw.isEmpty || raw == "*") return null
    try dt match {
      case StringType => utf(raw)
      case IntegerType => raw.trim.toInt
      case LongType => raw.trim.toLong
      case DoubleType => raw.trim.toDouble
      case BooleanType => "TtYy".indexOf(raw.trim.headOption.getOrElse('?')) >= 0
      case DateType =>
        // YYYYMMDD → days since epoch
        val d = java.time.LocalDate.of(raw.substring(0, 4).toInt, raw.substring(4, 6).toInt, raw.substring(6, 8).toInt)
        d.toEpochDay.toInt
      case _ => utf(raw)
    } catch { case _: Exception => null }
  }
}

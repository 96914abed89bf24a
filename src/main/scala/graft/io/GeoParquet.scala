package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.{FileMetaData, KeyValue, Util}

/**
 * GeoParquet 1.1 interop metadata (public spec: geoparquet.org; reference
 * consumes/produces it through GDAL in st_read.cpp / st_write.cpp).
 *
 * Spark's parquet writer offers no hook to add file-level key-value metadata,
 * so we stamp the `geo` entry after the fact by rewriting each part file's
 * footer tail: the thrift FileMetaData sits between the data pages and the
 * trailing [4-byte length]["PAR1"], and row-group offsets point backwards, so
 * appending a key-value pair and rewriting only the tail leaves every data
 * page untouched. This is a metadata-sized operation per file (one footer
 * read + write), not a data rewrite — safe to run from the driver even for
 * thousands of part files.
 */
object GeoParquet {

  /** The `geo` JSON for a single WKB geometry column with a bbox covering
   *  struct (GeoParquet 1.1.0). */
  def geoJson(geomCol: String, bbox: (Double, Double, Double, Double),
              bboxCol: Option[String],
              /** PROJJSON for the column's `crs` member (GeoParquet 1.1:
                * absent means OGC:CRS84); Proj.toProjjson supplies it */
              crs: Option[String] = None): String = {
    val covering = bboxCol.map { bc =>
      s""","covering":{"bbox":{"xmin":["$bc","min_x"],"ymin":["$bc","min_y"],"xmax":["$bc","max_x"],"ymax":["$bc","max_y"]}}"""
    }.getOrElse("")
    val crsMember = crs.map(j => s""","crs":$j""").getOrElse("")
    s"""{"version":"1.1.0","primary_column":"$geomCol","columns":{"$geomCol":{""" +
      s""""encoding":"WKB","geometry_types":[],""" +
      s""""bbox":[${bbox._1},${bbox._2},${bbox._3},${bbox._4}]$covering$crsMember}}}"""
  }

  /** `crs` PROJJSON member back out of a footer string (balanced braces) */
  def parseCrs(geo: String): Option[String] = {
    val i = geo.indexOf("\"crs\":")
    if (i < 0) None
    else {
      val start = geo.indexOf('{', i)
      if (start < 0) None
      else {
        var depth = 0; var j = start
        while (j < geo.length && (depth > 0 || j == start)) {
          geo.charAt(j) match { case '{' => depth += 1; case '}' => depth -= 1; case _ => }
          j += 1
        }
        if (depth == 0) Some(geo.substring(start, j)) else None
      }
    }
  }

  /** bbox back out of a [[geoJson]] footer string (None if absent/odd) */
  def parseBbox(geo: String): Option[(Double, Double, Double, Double)] = {
    val m = """"bbox":\[([-0-9.eE]+),([-0-9.eE]+),([-0-9.eE]+),([-0-9.eE]+)\]""".r
      .findFirstMatchIn(geo)
    m.map(x => (x.group(1).toDouble, x.group(2).toDouble, x.group(3).toDouble, x.group(4).toDouble))
  }

  private val Magic = "PAR1".getBytes("ASCII")

  /** Add (or replace) the `geo` key-value entry in a parquet file's footer.
   *  Rewrites only the footer tail; data pages and row-group offsets are
   *  unchanged. Works through the Hadoop FileSystem API: the tail is
   *  re-written via truncate+append when the FS supports it, else by a
   *  stream copy (still driver-cheap relative to the write that produced
   *  the file). */
  def stampGeo(conf: Configuration, file: Path, geoJson: String): Unit = {
    val fs = file.getFileSystem(conf)
    val len = fs.getFileStatus(file).getLen
    val in = fs.open(file)
    val (md, footerStart) =
      try {
        val tail = new Array[Byte](8)
        in.readFully(len - 8, tail)
        require(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1',
          s"$file is not a parquet file")
        val footerLen = java.lang.Integer.toUnsignedLong(
          (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) | ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24))
        val start = len - 8 - footerLen
        val buf = new Array[Byte](footerLen.toInt)
        in.readFully(start, buf)
        (Util.readFileMetaData(new java.io.ByteArrayInputStream(buf)), start)
      } finally in.close()

    val kvs = Option(md.getKey_value_metadata)
      .map(l => new java.util.ArrayList[KeyValue](l))
      .getOrElse(new java.util.ArrayList[KeyValue]())
    kvs.removeIf(kv => kv.getKey == "geo")
    val geo = new KeyValue("geo"); geo.setValue(geoJson)
    kvs.add(geo)
    md.setKey_value_metadata(kvs)

    val out = new java.io.ByteArrayOutputStream()
    Util.writeFileMetaData(md, out)
    val footer = out.toByteArray
    val tail = java.nio.ByteBuffer.allocate(footer.length + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tail.put(footer).putInt(footer.length).put(Magic)

    // Fast path: local files rewrite the tail in place.
    if ("file" == Option(file.toUri.getScheme).getOrElse("file")) {
      val raf = new java.io.RandomAccessFile(new java.io.File(file.toUri.getPath), "rw")
      try {
        raf.seek(footerStart)
        raf.write(tail.array())
        raf.setLength(footerStart + tail.array().length)
      } finally raf.close()
      // the in-place rewrite invalidates Hadoop's checksum sidecar — drop it
      val crc = new Path(file.getParent, s".${file.getName}.crc")
      if (fs.exists(crc)) fs.delete(crc, false)
    } else {
      // Generic FS: copy data prefix + new tail to a temp sibling, then swap.
      val tmp = new Path(file.getParent, s".${file.getName}.geo.tmp")
      val src = fs.open(file)
      val dst = fs.create(tmp, true)
      try {
        val buf = new Array[Byte](1 << 20)
        var remaining = footerStart
        while (remaining > 0) {
          val n = src.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
          require(n > 0, s"unexpected EOF copying $file")
          dst.write(buf, 0, n); remaining -= n
        }
        dst.write(tail.array())
      } finally { src.close(); dst.close() }
      fs.delete(file, false)
      fs.rename(tmp, file)
    }
  }

  /** Stamp every part file of a parquet directory (or a single file). */
  def stampGeoDir(conf: Configuration, dir: String, geoJson: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val targets =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".parquet")).toSeq
      else Seq(p)
    targets.foreach(stampGeo(conf, _, geoJson))
  }

  /** Read the `geo` metadata JSON from a parquet file's footer, if present. */
  def readGeo(conf: Configuration, path: String): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).find(_.getName.endsWith(".parquet"))
          .getOrElse(return None)
      else p
    val in = fs.open(file)
    try {
      val len = fs.getFileStatus(file).getLen
      val tail = new Array[Byte](8)
      in.readFully(len - 8, tail)
      if (!(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1')) return None
      val footerLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) | ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
      val buf = new Array[Byte](footerLen)
      in.readFully(len - 8 - footerLen, buf)
      val md = Util.readFileMetaData(new java.io.ByteArrayInputStream(buf))
      Option(md.getKey_value_metadata).flatMap { kvs =>
        val it = kvs.iterator()
        var found: Option[String] = None
        while (it.hasNext && found.isEmpty) {
          val kv = it.next()
          if (kv.getKey == "geo") found = Option(kv.getValue)
        }
        found
      }
    } finally in.close()
  }
}

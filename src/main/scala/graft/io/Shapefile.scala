package graft.io

import graft.geom.Geo
import org.locationtech.jts.geom._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/**
 * Native shapefile (.shp/.shx/.dbf/.cpg) parser — public ESRI whitepaper
 * format, mirroring the reference's native reader semantics
 * (/root/reference/spatial/src/spatial/core/io/shapefile/read_shapefile.cpp:
 * schema from DBF fields + `geom GEOMETRY` last, .cpg encoding override,
 * N fields → BIGINT when precision=0 else DOUBLE, D → DATE, L → BOOLEAN).
 */
object Shapefile {

  final case class DbfField(name: String, typ: Char, width: Int, decimals: Int)
  final case class Meta(
      shapeType: Int,
      bbox: (Double, Double, Double, Double),
      recordCount: Int,
      fields: Seq[DbfField],
      encoding: String)

  def basePath(path: String): String = {
    val p = path.stripPrefix("file:")
    val i = p.lastIndexOf('.')
    if (i < 0) p else p.substring(0, i)
  }

  def readMeta(path: String): Meta = {
    val base = basePath(path)
    val shp = ByteBuffer.wrap(Files.readAllBytes(Paths.get(base + ".shp")))
    require(shp.getInt(0) == 9994, s"not a shapefile (bad magic): $path")
    shp.order(ByteOrder.LITTLE_ENDIAN)
    val shapeType = shp.getInt(32)
    val bbox = (shp.getDouble(36), shp.getDouble(44), shp.getDouble(52), shp.getDouble(60))
    val (fields, recordCount) = {
      val dbf = Files.readAllBytes(Paths.get(base + ".dbf"))
      val bb = ByteBuffer.wrap(dbf).order(ByteOrder.LITTLE_ENDIAN)
      val n = bb.getInt(4)
      val headerLen = bb.getShort(8) & 0xffff
      val fs = Seq.newBuilder[DbfField]
      var off = 32
      while (off < headerLen - 1 && dbf(off) != 0x0d) {
        val nameEnd = {
          var e = off
          while (e < off + 11 && dbf(e) != 0) e += 1
          e
        }
        fs += DbfField(new String(dbf, off, nameEnd - off, "ASCII"),
          dbf(off + 11).toChar, dbf(off + 16) & 0xff, dbf(off + 17) & 0xff)
        off += 32
      }
      (fs.result(), n)
    }
    val encoding = {
      val cpg = Paths.get(base + ".cpg")
      if (Files.exists(cpg)) {
        val s = new String(Files.readAllBytes(cpg), "ASCII").trim.toLowerCase
        if (s.contains("utf")) "UTF-8" else "ISO-8859-1"
      } else "ISO-8859-1" // standards default, like the reference
    }
    Meta(shapeType, bbox, recordCount, fields, encoding)
  }

  /** Iterate (geometryOrNull, attributeStrings) over all records. */
  def readRecords(path: String): Iterator[(Geometry, Array[String])] =
    readRecordRange(path, 0, readMeta(path).recordCount)

  /** Record-range slice of the .shx index: (shpStartByte, shpEndByte) for
   *  records [startRec, endRec). The .shx is 8 bytes/record — reading it is
   *  cheap even for multi-GB .shp files. */
  def shxRange(path: String, startRec: Int, endRec: Int): (Long, Long) = {
    val base = basePath(path)
    val raf = new java.io.RandomAccessFile(base + ".shx", "r")
    try {
      def entry(rec: Int): (Long, Long) = {
        raf.seek(100L + 8L * rec)
        val off = raf.readInt().toLong * 2
        val len = raf.readInt().toLong * 2
        (off, len)
      }
      val (s, _) = entry(startRec)
      val (lo, ll) = entry(endRec - 1)
      (s, lo + 8 + ll)
    } finally raf.close()
  }

  /** Read records [startRec, endRec) touching only the needed byte ranges of
   *  .shp and .dbf — the unit of intra-file parallelism for big shapefiles
   *  (the .shx record index is the natural split table; the reference reads
   *  the whole file through one GDAL stream, read_shapefile.cpp). */
  def readRecordRange(path: String, startRec: Int, endRec: Int,
                      encodingOverride: Option[String] = None): Iterator[(Geometry, Array[String])] = {
    // ENCODING open_option outranks the .cpg sidecar (GDAL's SHAPE_ENCODING)
    val base = basePath(path)
    val meta = readMeta(path)
    val enc = encodingOverride.getOrElse(meta.encoding)
    val end = math.min(endRec, meta.recordCount)
    if (startRec >= end) return Iterator.empty
    val (shpFrom, shpTo) = shxRange(path, startRec, end)
    val shp = readSlice(base + ".shp", shpFrom, shpTo)
    val dbfHeader = readSlice(base + ".dbf", 0, 32)
    val bb0 = ByteBuffer.wrap(dbfHeader).order(ByteOrder.LITTLE_ENDIAN)
    val dbfHeaderLen = bb0.getShort(8) & 0xffff
    val dbfRecLen = bb0.getShort(10) & 0xffff
    val dbf = readSlice(base + ".dbf",
      dbfHeaderLen.toLong + startRec.toLong * dbfRecLen,
      dbfHeaderLen.toLong + end.toLong * dbfRecLen)

    new Iterator[(Geometry, Array[String])] {
      private var shpOff = 0
      private var rec = startRec
      override def hasNext: Boolean = rec < end && shpOff + 8 <= shp.length
      override def next(): (Geometry, Array[String]) = {
        // 8-byte big-endian record header: record number, content length (16-bit words)
        val contentLen = ByteBuffer.wrap(shp, shpOff + 4, 4).getInt * 2
        val geom = parseShape(shp, shpOff + 8, contentLen)
        shpOff += 8 + contentLen
        // DBF record: 1 deletion byte + fixed-width fields
        val attrs = new Array[String](meta.fields.length)
        var off = (rec - startRec) * dbfRecLen + 1
        var i = 0
        meta.fields.foreach { f =>
          attrs(i) = new String(dbf, off, f.width, enc).trim
          off += f.width
          i += 1
        }
        rec += 1
        (geom, attrs)
      }
    }
  }

  private def readSlice(path: String, from: Long, to: Long): Array[Byte] = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val end = math.min(to, raf.length())
      val len = math.max(0L, end - from).toInt
      val out = new Array[Byte](len)
      raf.seek(from)
      raf.readFully(out)
      out
    } finally raf.close()
  }

  // ---------------------------------------------------------------- shapes
  private def parseShape(buf: Array[Byte], off: Int, len: Int): Geometry = {
    val bb = ByteBuffer.wrap(buf, off, len).order(ByteOrder.LITTLE_ENDIAN)
    val f = Geo.factory
    val shapeType = bb.getInt
    shapeType match {
      case 0 => null // null shape
      case 1 | 11 | 21 => // Point / PointZ / PointM
        val x = bb.getDouble; val y = bb.getDouble
        if (shapeType == 11) {
          val z = bb.getDouble
          f.createPoint(new Coordinate(x, y, z))
        } else f.createPoint(new Coordinate(x, y))
      case 8 | 18 | 28 => // MultiPoint[Z|M]
        bb.position(bb.position() + 32) // bbox
        val n = bb.getInt
        val pts = Array.fill(n)(new Coordinate(bb.getDouble, bb.getDouble))
        if (shapeType == 18) {
          bb.getDouble; bb.getDouble // z range
          var i = 0
          while (i < n) { pts(i).setZ(bb.getDouble); i += 1 }
        }
        f.createMultiPoint(pts.map(f.createPoint))
      case 3 | 13 | 23 => // PolyLine[Z|M]
        val (parts, pts) = readParts(bb)
        readZ(bb, shapeType == 13, pts)
        val lines = sliceParts(parts, pts).map(f.createLineString)
        if (lines.length == 1) lines(0) else f.createMultiLineString(lines)
      case 5 | 15 | 25 => // Polygon[Z|M]: rings CW=shell, CCW=hole; assemble
        val (parts, pts) = readParts(bb)
        readZ(bb, shapeType == 15, pts)
        assemblePolygons(sliceParts(parts, pts))
      case other => throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  private def readParts(bb: ByteBuffer): (Array[Int], Array[Coordinate]) = {
    bb.position(bb.position() + 32) // bbox
    val numParts = bb.getInt
    val numPoints = bb.getInt
    val parts = Array.fill(numParts)(bb.getInt)
    val pts = Array.fill(numPoints)(new Coordinate(bb.getDouble, bb.getDouble))
    (parts, pts)
  }

  private def readZ(bb: ByteBuffer, hasZ: Boolean, pts: Array[Coordinate]): Unit =
    if (hasZ && bb.remaining() >= 16 + pts.length * 8) {
      bb.getDouble; bb.getDouble // z range
      var i = 0
      while (i < pts.length) { pts(i).setZ(bb.getDouble); i += 1 }
    }

  private def sliceParts(parts: Array[Int], pts: Array[Coordinate]): Array[Array[Coordinate]] =
    parts.indices.map { i =>
      val from = parts(i)
      val until = if (i + 1 < parts.length) parts(i + 1) else pts.length
      pts.slice(from, until)
    }.toArray

  /** Shapefile winding: clockwise = shell, counter-clockwise = hole. Holes are
   *  assigned to the smallest containing shell. */
  private def assemblePolygons(rings: Array[Array[Coordinate]]): Geometry = {
    val f = Geo.factory
    val closed = rings.filter(_.length >= 4).map { r =>
      if (r.head.equals2D(r.last)) r else r :+ r.head.copy()
    }
    val linear = closed.map(f.createLinearRing)
    val shells = linear.filterNot(r => org.locationtech.jts.algorithm.Orientation.isCCW(r.getCoordinateSequence))
    val holes = linear.filter(r => org.locationtech.jts.algorithm.Orientation.isCCW(r.getCoordinateSequence))
    if (shells.isEmpty) {
      // degenerate: treat all rings as shells
      val polys = linear.map(r => f.createPolygon(r))
      return if (polys.length == 1) polys(0) else f.createMultiPolygon(polys)
    }
    val shellPolys = shells.map(s => f.createPolygon(s))
    val assigned = Array.fill(shells.length)(List.empty[LinearRing])
    holes.foreach { h =>
      val pt = f.createPoint(h.getCoordinateN(0))
      val candidates = shellPolys.zipWithIndex.filter { case (sp, _) => sp.getEnvelopeInternal.covers(pt.getEnvelopeInternal) && sp.covers(pt) }
      if (candidates.nonEmpty) {
        val (_, idx) = candidates.minBy(_._1.getArea)
        assigned(idx) = h :: assigned(idx)
      }
    }
    val polys = shells.indices.map(i => f.createPolygon(shells(i), assigned(i).toArray)).toArray
    if (polys.length == 1) polys(0) else f.createMultiPolygon(polys)
  }
}

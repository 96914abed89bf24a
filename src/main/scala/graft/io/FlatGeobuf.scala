package graft.io

import graft.geom.Geo
import org.locationtech.jts.geom._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/**
 * FlatGeobuf reader — public spec (flatgeobuf.org, BSD): magic
 * `fgb\x03fgb\x00`, flatbuffers Header (schema + feature count + index node
 * size), optional packed Hilbert R-tree, then length-prefixed Feature
 * flatbuffers. Implemented with a minimal flatbuffers wire decoder (vtables +
 * offsets) — no codegen, no dependency. The reference reads .fgb through GDAL
 * (st_read.cpp); this is a native, splittable reader.
 */
object FlatGeobuf {

  // ------------------------------------------------------ flatbuffers wire
  private final class Fb(val buf: ByteBuffer) {
    def u32(p: Int): Long = buf.getInt(p).toLong & 0xffffffffL
    /** table position from an indirect offset slot */
    def indirect(p: Int): Int = p + buf.getInt(p)
    /** absolute position of field `id`'s slot in table at `t`, or -1 */
    def slot(t: Int, id: Int): Int = {
      val vt = t - buf.getInt(t)
      val vtLen = buf.getShort(vt) & 0xffff
      val off = 4 + 2 * id
      if (off >= vtLen) return -1
      val voff = buf.getShort(vt + off) & 0xffff
      if (voff == 0) -1 else t + voff
    }
    def byteField(t: Int, id: Int, dflt: Int): Int = {
      val s = slot(t, id); if (s < 0) dflt else buf.get(s) & 0xff
    }
    def shortField(t: Int, id: Int, dflt: Int): Int = {
      val s = slot(t, id); if (s < 0) dflt else buf.getShort(s) & 0xffff
    }
    def longField(t: Int, id: Int, dflt: Long): Long = {
      val s = slot(t, id); if (s < 0) dflt else buf.getLong(s)
    }
    def intField(t: Int, id: Int, dflt: Int): Int = {
      val s = slot(t, id); if (s < 0) dflt else buf.getInt(s)
    }
    def string(t: Int, id: Int): String = {
      val s = slot(t, id)
      if (s < 0) null
      else {
        val p = indirect(s)
        val len = u32(p).toInt
        val arr = new Array[Byte](len)
        val dup = buf.duplicate(); dup.position(p + 4); dup.get(arr)
        new String(arr, "UTF-8")
      }
    }
    /** vector of scalars: returns (elementsStart, length) or null */
    def vector(t: Int, id: Int): (Int, Int) = {
      val s = slot(t, id)
      if (s < 0) null
      else {
        val p = indirect(s)
        (p + 4, u32(p).toInt)
      }
    }
    def tableField(t: Int, id: Int): Int = {
      val s = slot(t, id); if (s < 0) -1 else indirect(s)
    }
  }

  // ------------------------------------------------------------- header
  final case class FgbColumn(name: String, typ: Int)
  final case class FgbHeader(
      name: String, geometryType: Int, hasZ: Boolean, hasM: Boolean,
      columns: Seq[FgbColumn], featuresCount: Long, indexNodeSize: Int,
      dataStart: Long, crs: String = null, crsName: String = null, crsWkt: String = null)

  def readHeader(path: String): FgbHeader = {
    val bytes = Files.readAllBytes(Paths.get(path.stripPrefix("file:")))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 12 && bytes(0) == 'f' && bytes(1) == 'g' && bytes(2) == 'b',
      s"not a FlatGeobuf file: $path")
    val headerLen = bb.getInt(8)
    val fb = new Fb(bb)
    val root = 12 + bb.getInt(12)
    val geometryType = fb.byteField(root, 2, 0)
    val hasZ = fb.byteField(root, 3, 0) != 0
    val hasM = fb.byteField(root, 4, 0) != 0
    val featuresCount = fb.longField(root, 8, 0)
    val indexNodeSize = fb.shortField(root, 9, 16)
    val columns = fb.vector(root, 7) match {
      case null => Seq.empty
      case (start, n) =>
        (0 until n).map { i =>
          val ct = fb.indirect(start + 4 * i)
          FgbColumn(fb.string(ct, 0), fb.byteField(ct, 1, 0))
        }
    }
    val indexSize =
      if (indexNodeSize > 0 && featuresCount > 0) packedIndexSize(featuresCount, indexNodeSize)
      else 0L
    // Crs table: org(0) code(1) name(2) description(3) wkt(4)
    val (crs, crsName, crsWkt) = {
      val t = fb.tableField(root, 10)
      if (t < 0) (null, null, null)
      else {
        val org = Option(fb.string(t, 0)).getOrElse("EPSG")
        val code = fb.intField(t, 1, 0)
        val wkt = fb.string(t, 4)
        (if (code != 0) s"$org:$code" else wkt, fb.string(t, 2), wkt)
      }
    }
    FgbHeader(fb.string(root, 0), geometryType, hasZ, hasM, columns, featuresCount,
      indexNodeSize, 12L + headerLen + indexSize, crs, crsName, crsWkt)
  }

  /** size in bytes of the packed Hilbert R-tree (spec: 40-byte nodes). */
  private def packedIndexSize(numItems: Long, nodeSize: Int): Long = {
    // do-while semantics: even featuresCount==1 gets a root level (spec's
    // packedrtree generateLevelBounds), so a single-feature indexed file
    // carries 2 nodes / 80 bytes, not 1 node.
    var n = numItems
    var numNodes = n
    var done = false
    while (!done) {
      n = (n + nodeSize - 1) / nodeSize
      numNodes += n
      done = n == 1
    }
    numNodes * 40L
  }

  // ------------------------------------------------------------- features
  final case class FgbFeature(geom: Geometry, properties: Map[String, String])

  def readFeatures(path: String): Iterator[FgbFeature] = {
    val header = readHeader(path)
    val bytes = Files.readAllBytes(Paths.get(path.stripPrefix("file:")))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val fb = new Fb(bb)
    new Iterator[FgbFeature] {
      private var pos = header.dataStart.toInt
      override def hasNext: Boolean = pos + 4 <= bytes.length
      override def next(): FgbFeature = {
        val size = bb.getInt(pos)
        val f = decodeFeatureAt(fb, bb, pos, header)
        pos += 4 + size
        f
      }
    }
  }

  private def decodeFeatureAt(fb: Fb, bb: ByteBuffer, pos: Int, header: FgbHeader): FgbFeature = {
    val t = (pos + 4) + bb.getInt(pos + 4)
    val geomT = fb.tableField(t, 0)
    val geom = if (geomT < 0) null else decodeGeometry(fb, geomT, header.geometryType, header.hasZ, header.hasM)
    val props = fb.vector(t, 1) match {
      case null => Map.empty[String, String]
      case (start, len) => decodeProperties(bb, start, len, header.columns)
    }
    FgbFeature(geom, props)
  }

  // ------------------------------------------------------- packed R-tree
  /** Traverse the packed Hilbert R-tree and return the byte offsets (relative
   *  to the data section) of candidate features whose bbox intersects the
   *  query window. None when the file carries no index. Reads only the
   *  header + index region (spec layout: 40-byte nodes, levels root-first,
   *  internal `offset` = node index of first child, leaf `offset` = feature
   *  byte offset — reference consumes the same structure via GDAL). */
  def searchIndex(path: String, minX: Double, minY: Double,
                  maxX: Double, maxY: Double): Option[Seq[Long]] = {
    val header = readHeader(path)
    if (header.indexNodeSize == 0 || header.featuresCount == 0) return None
    val n = header.featuresCount.toInt
    val nodeSize = header.indexNodeSize
    val sizes = scala.collection.mutable.ArrayBuffer(n)
    var m = n
    while (m != 1) { m = (m + nodeSize - 1) / nodeSize; sizes += m }
    val rootFirst = sizes.reverse
    val starts = rootFirst.scanLeft(0)(_ + _).dropRight(1)
    val numNodes = rootFirst.sum
    val leafStart = numNodes - n

    // read only the index region
    val raf = new java.io.RandomAccessFile(path.stripPrefix("file:"), "r")
    val nodes =
      try {
        val headerLen = {
          val hb = new Array[Byte](4); raf.seek(8); raf.readFully(hb)
          ByteBuffer.wrap(hb).order(ByteOrder.LITTLE_ENDIAN).getInt(0)
        }
        val buf = new Array[Byte](numNodes * 40)
        raf.seek(12L + headerLen)
        raf.readFully(buf)
        ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      } finally raf.close()

    def levelOf(idx: Int): Int = {
      var l = rootFirst.length - 1
      while (starts(l) > idx) l -= 1
      l
    }
    val results = scala.collection.mutable.ArrayBuffer.empty[Long]
    val queue = scala.collection.mutable.Queue(0)
    while (queue.nonEmpty) {
      val idx = queue.dequeue()
      val p = idx * 40
      val nMinX = nodes.getDouble(p); val nMinY = nodes.getDouble(p + 8)
      val nMaxX = nodes.getDouble(p + 16); val nMaxY = nodes.getDouble(p + 24)
      if (nMinX <= maxX && nMaxX >= minX && nMinY <= maxY && nMaxY >= minY) {
        val off = nodes.getLong(p + 32)
        if (idx >= leafStart) results += off
        else {
          val childLevel = levelOf(idx) + 1
          val childEnd = starts(childLevel) + rootFirst(childLevel)
          val first = off.toInt
          var c = first
          val end = math.min(first + nodeSize, childEnd)
          while (c < end) { queue += c; c += 1 }
        }
      }
    }
    Some(results.sorted.toSeq)
  }

  /** Intra-file split plan: byte ranges (relative to the data section,
   *  end = -1 → EOF) of roughly `targetBytes` each, cut at feature
   *  boundaries via the packed index's leaf offsets. A file without an index
   *  stays one range (features are length-prefixed, so arbitrary byte
   *  offsets aren't seekable) — the indexed writer is the scale path. */
  def splitOffsets(path: String, targetBytes: Long = 64L << 20): Seq[(Long, Long)] = {
    val header = readHeader(path)
    val p = Paths.get(path.stripPrefix("file:"))
    val dataSize = Files.size(p) - header.dataStart
    if (header.indexNodeSize == 0 || header.featuresCount == 0 || dataSize <= targetBytes)
      return Seq((0L, -1L))
    val n = header.featuresCount.toInt
    val chunks = math.max(1, math.min(n.toLong, dataSize / targetBytes + 1)).toInt
    val per = (n + chunks - 1) / chunks
    // leaf nodes sit at the tail of the index region; offset field at +32
    val sizes = scala.collection.mutable.ArrayBuffer(n)
    var m = n
    while (m != 1) { m = (m + header.indexNodeSize - 1) / header.indexNodeSize; sizes += m }
    val numNodes = sizes.sum
    val leafStart = numNodes - n
    val indexStart = header.dataStart - numNodes.toLong * 40
    val raf = new java.io.RandomAccessFile(p.toFile, "r")
    try {
      def offsetOfFeature(i: Int): Long = {
        raf.seek(indexStart + (leafStart + i).toLong * 40 + 32)
        java.lang.Long.reverseBytes(raf.readLong()) // file is little-endian
      }
      val bounds = (0 until n by per).map(offsetOfFeature)
      bounds.zipWithIndex.map { case (s, i) =>
        (s, if (i + 1 < bounds.length) bounds(i + 1) else -1L)
      }
    } finally raf.close()
  }

  /** Stream features whose byte offset lies in [fromOff, toOff) of the data
   *  section (toOff = -1 → EOF). */
  def readFeaturesRange(path: String, fromOff: Long, toOff: Long): Iterator[FgbFeature] = {
    val header = readHeader(path)
    val p = Paths.get(path.stripPrefix("file:"))
    val fileLen = Files.size(p)
    val end = if (toOff < 0) fileLen else header.dataStart + toOff
    val raf = new java.io.RandomAccessFile(p.toFile, "r")
    raf.seek(header.dataStart + fromOff)
    var pos = header.dataStart + fromOff
    var closed = false
    new Iterator[FgbFeature] {
      override def hasNext: Boolean = {
        val h = pos + 4 <= end
        if (!h && !closed) { closed = true; raf.close() }
        h
      }
      override def next(): FgbFeature = {
        val szb = new Array[Byte](4); raf.readFully(szb)
        val size = ByteBuffer.wrap(szb).order(ByteOrder.LITTLE_ENDIAN).getInt(0)
        val block = new Array[Byte](4 + size)
        System.arraycopy(szb, 0, block, 0, 4)
        raf.readFully(block, 4, size)
        pos += 4 + size
        val bb = ByteBuffer.wrap(block).order(ByteOrder.LITTLE_ENDIAN)
        decodeFeatureAt(new Fb(bb), bb, 0, header)
      }
    }
  }

  /** Index-pruned feature read: only candidate features are decoded (exact
   *  predicate evaluation stays with the caller). Falls back to a full scan
   *  when the file has no index. */
  def readFeaturesFiltered(path: String, minX: Double, minY: Double,
                           maxX: Double, maxY: Double): Iterator[FgbFeature] =
    searchIndex(path, minX, minY, maxX, maxY) match {
      case None => readFeatures(path)
      case Some(offsets) => readFeaturesAt(path, offsets)
    }

  /** Decode exactly the features at the given data-section byte offsets. */
  def readFeaturesAt(path: String, offsets: Seq[Long]): Iterator[FgbFeature] = {
    val header = readHeader(path)
    val raf = new java.io.RandomAccessFile(path.stripPrefix("file:"), "r")
    var closed = false
    val it = offsets.iterator.map { off =>
      val pos = header.dataStart + off
      raf.seek(pos)
      val szb = new Array[Byte](4); raf.readFully(szb)
      val size = ByteBuffer.wrap(szb).order(ByteOrder.LITTLE_ENDIAN).getInt(0)
      val block = new Array[Byte](4 + size)
      System.arraycopy(szb, 0, block, 0, 4)
      raf.readFully(block, 4, size)
      val bb = ByteBuffer.wrap(block).order(ByteOrder.LITTLE_ENDIAN)
      decodeFeatureAt(new Fb(bb), bb, 0, header)
    }
    new Iterator[FgbFeature] {
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !closed) { closed = true; raf.close() }
        h
      }
      override def next(): FgbFeature = it.next()
    }
  }

  private def coords(fb: Fb, geomT: Int, hasZ: Boolean, hasM: Boolean): Array[Coordinate] = {
    fb.vector(geomT, 1) match {
      case null => Array.empty
      case (start, n) =>
        val zVec = if (hasZ) fb.vector(geomT, 2) else null
        val mVec = if (hasM) fb.vector(geomT, 3) else null
        Array.tabulate(n / 2) { i =>
          val x = fb.buf.getDouble(start + 16 * i)
          val y = fb.buf.getDouble(start + 16 * i + 8)
          val z = if (zVec != null && i < zVec._2) fb.buf.getDouble(zVec._1 + 8 * i) else Double.NaN
          val m = if (mVec != null && i < mVec._2) fb.buf.getDouble(mVec._1 + 8 * i) else Double.NaN
          if (!z.isNaN && !m.isNaN) new CoordinateXYZM(x, y, z, m)
          else if (!m.isNaN) new CoordinateXYM(x, y, m)
          else if (!z.isNaN) new Coordinate(x, y, z)
          else new Coordinate(x, y)
        }
    }
  }

  private def ends(fb: Fb, geomT: Int): Array[Int] = fb.vector(geomT, 0) match {
    case null => Array.empty
    case (start, n) => Array.tabulate(n)(i => fb.buf.getInt(start + 4 * i))
  }

  private def decodeGeometry(fb: Fb, geomT: Int, headerType: Int, hasZ: Boolean, hasM: Boolean): Geometry = {
    val f = Geo.factory
    val typ = {
      val own = fb.byteField(geomT, 6, 0)
      if (own != 0) own else headerType
    }
    def rings(): Array[LinearRing] = {
      val cs = coords(fb, geomT, hasZ, hasM)
      val es = ends(fb, geomT)
      val bounds = if (es.isEmpty) Array(cs.length) else es
      var from = 0
      bounds.map { e =>
        val ring = f.createLinearRing(cs.slice(from, e))
        from = e
        ring
      }
    }
    typ match {
      case 1 => // Point
        val cs = coords(fb, geomT, hasZ, hasM)
        if (cs.isEmpty) f.createPoint() else f.createPoint(cs(0))
      case 2 => f.createLineString(coords(fb, geomT, hasZ, hasM))
      case 3 =>
        val rs = rings()
        if (rs.isEmpty) f.createPolygon() else f.createPolygon(rs.head, rs.tail)
      case 4 => f.createMultiPoint(coords(fb, geomT, hasZ, hasM).map(f.createPoint))
      case 5 =>
        val cs = coords(fb, geomT, hasZ, hasM)
        val es = ends(fb, geomT)
        val bounds = if (es.isEmpty) Array(cs.length) else es
        var from = 0
        f.createMultiLineString(bounds.map { e =>
          val l = f.createLineString(cs.slice(from, e)); from = e; l
        })
      case 6 | 7 => // MultiPolygon / GeometryCollection via parts
        fb.vector(geomT, 7) match {
          case null =>
            if (typ == 6) {
              val rs = rings()
              if (rs.isEmpty) f.createMultiPolygon(Array.empty)
              else f.createMultiPolygon(Array(f.createPolygon(rs.head, rs.tail)))
            } else f.createGeometryCollection()
          case (start, n) =>
            val parts = (0 until n).map { i =>
              val pt = fb.indirect(start + 4 * i)
              decodeGeometry(fb, pt, if (typ == 6) 3 else 0, hasZ, hasM)
            }.toArray
            if (typ == 6) f.createMultiPolygon(parts.map(_.asInstanceOf[Polygon]))
            else f.createGeometryCollection(parts)
        }
      case other => throw new IllegalArgumentException(s"FlatGeobuf geometry type $other not supported")
    }
  }

  /** properties buffer: repeated [uint16 column idx][typed value] */
  private def decodeProperties(bb: ByteBuffer, start: Int, len: Int,
                               columns: Seq[FgbColumn]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var p = start
    val end = start + len
    while (p + 2 <= end) {
      val idx = bb.getShort(p) & 0xffff
      p += 2
      if (idx >= columns.length) return out.result()
      val col = columns(idx)
      col.typ match {
        case 0 | 1 => out += (col.name -> (bb.get(p) & 0xff).toString); p += 1
        case 2 => out += (col.name -> (bb.get(p) != 0).toString); p += 1
        case 3 | 4 => out += (col.name -> bb.getShort(p).toString); p += 2
        case 5 | 6 => out += (col.name -> bb.getInt(p).toString); p += 4
        case 7 | 8 => out += (col.name -> bb.getLong(p).toString); p += 8
        case 9 => out += (col.name -> bb.getFloat(p).toString); p += 4
        case 10 => out += (col.name -> bb.getDouble(p).toString); p += 8
        case 11 | 12 | 13 | 14 => // String/Json/DateTime/Binary: u32 len + bytes
          val n = bb.getInt(p); p += 4
          val arr = new Array[Byte](n)
          val dup = bb.duplicate(); dup.position(p); dup.get(arr)
          out += (col.name -> new String(arr, "UTF-8"))
          p += n
        case other => return out.result() // unknown type: stop parsing safely
      }
    }
    out.result()
  }
}

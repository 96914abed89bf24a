package graft.io

import graft.geom.Geo
import org.locationtech.jts.geom._
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/**
 * Shapefile writer (.shp + .shx + .dbf + .cpg) — the write side of the ESRI
 * whitepaper format mirroring [[Shapefile]]'s reader. One call writes one
 * shapefile triple; the Spark sink drives it per partition (the reference
 * funnels every row group through a single GDAL dataset behind a mutex,
 * st_write.cpp:46-55 — per-partition files keep the sink parallel).
 *
 * Conventions: shells clockwise / holes counter-clockwise (spec winding),
 * Z written for Z geometries (types 11/13/15/18), attributes as DBF
 * C/N/L fields, UTF-8 with a .cpg sidecar.
 */
object ShapefileWriter {

  final case class Field(name: String, typ: Char, width: Int, decimals: Int)

  /** `open` abstracts the byte sink (default local file; the Spark sink passes
   *  a Hadoop FileSystem creator so output lands on the cluster FS). */
  def write(base: String, fields: Seq[Field],
            rows: Iterator[(Geometry, Array[Any])],
            open: String => java.io.OutputStream = defaultOpen): Int = {
    val shpRecs = new ByteArrayOutputStream()
    val shxRecs = new ByteArrayOutputStream()
    val dbfRecs = new ByteArrayOutputStream()
    var shapeType = 0
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue
    var minZ = Double.MaxValue; var maxZ = -Double.MaxValue
    var recNo = 0
    var offsetWords = 50 // 100-byte header

    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte, ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)

    rows.foreach { case (geom, attrs) =>
      recNo += 1
      val hasZ = geom != null && Geo.geomHasZ(geom)
      val body = encodeShape(geom, hasZ)
      if (geom != null && !geom.isEmpty) {
        // shapefiles are single-type: a mixed partition must fail loudly, not
        // emit a file whose records contradict the header type code
        val t = shapeTypeOf(geom, hasZ)
        if (shapeType == 0) shapeType = t
        else if (t != shapeType) throw new IllegalArgumentException(
          s"shapefile is single-type: record $recNo is ${geom.getGeometryType} " +
            s"(shape type $t) but file started as shape type $shapeType")
        val e = geom.getEnvelopeInternal
        minX = math.min(minX, e.getMinX); minY = math.min(minY, e.getMinY)
        maxX = math.max(maxX, e.getMaxX); maxY = math.max(maxY, e.getMaxY)
        if (hasZ) geom.apply(new CoordinateSequenceFilter {
          override def filter(seq: CoordinateSequence, i: Int): Unit = {
            val z = if (seq.hasZ) seq.getZ(i) else Double.NaN
            if (!z.isNaN) { minZ = math.min(minZ, z); maxZ = math.max(maxZ, z) }
          }
          override def isDone = false
          override def isGeometryChanged = false
        })
      }
      val words = body.length / 2
      shpRecs.write(be(recNo)); shpRecs.write(be(words)); shpRecs.write(body)
      shxRecs.write(be(offsetWords)); shxRecs.write(be(words))
      offsetWords += 4 + words
      // DBF record: space deletion flag + fixed-width fields
      dbfRecs.write(' ')
      fields.zipWithIndex.foreach { case (f, i) =>
        val v = if (i < attrs.length) attrs(i) else null
        dbfRecs.write(dbfValue(f, v))
      }
    }

    if (recNo == 0 || shapeType == 0) { minX = 0; minY = 0; maxX = 0; maxY = 0 }
    if (minZ > maxZ) { minZ = 0; maxZ = 0 }

    def shpHeader(totalWords: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(100)
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0, 9994)
      bb.putInt(24, totalWords)
      bb.order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(28, 1000)
      bb.putInt(32, shapeType)
      bb.putDouble(36, minX); bb.putDouble(44, minY)
      bb.putDouble(52, maxX); bb.putDouble(60, maxY)
      bb.putDouble(68, minZ); bb.putDouble(76, maxZ)
      bb.array()
    }
    writeFile(open, base + ".shp", shpHeader(50 + shpRecs.size() / 2), shpRecs.toByteArray)
    writeFile(open, base + ".shx", shpHeader(50 + shxRecs.size() / 2), shxRecs.toByteArray)

    // DBF: dBASE III header + field descriptors + records + EOF
    val headerLen = 32 + 32 * fields.length + 1
    val recLen = 1 + fields.map(_.width).sum
    val dh = ByteBuffer.allocate(headerLen).order(ByteOrder.LITTLE_ENDIAN)
    dh.put(0, 0x03.toByte)
    dh.put(1, 126.toByte); dh.put(2, 1.toByte); dh.put(3, 1.toByte) // update date (fixed: 2026-01-01)
    dh.putInt(4, recNo)
    dh.putShort(8, headerLen.toShort)
    dh.putShort(10, recLen.toShort)
    fields.zipWithIndex.foreach { case (f, i) =>
      val off = 32 + 32 * i
      val name = f.name.getBytes("ASCII").take(10)
      var j = 0
      while (j < name.length) { dh.put(off + j, name(j)); j += 1 }
      dh.put(off + 11, f.typ.toByte)
      dh.put(off + 16, f.width.toByte)
      dh.put(off + 17, f.decimals.toByte)
    }
    dh.put(headerLen - 1, 0x0d.toByte)
    val out = open(base + ".dbf")
    try { out.write(dh.array()); out.write(dbfRecs.toByteArray); out.write(0x1a) }
    finally out.close()
    writeFile(open, base + ".cpg", "UTF-8".getBytes("ASCII"), Array.empty)
    recNo
  }

  private def defaultOpen(path: String): java.io.OutputStream =
    new java.io.BufferedOutputStream(new FileOutputStream(path), 1 << 16)

  private def writeFile(open: String => java.io.OutputStream, path: String,
                        header: Array[Byte], body: Array[Byte]): Unit = {
    val out = open(path)
    try { out.write(header); out.write(body) } finally out.close()
  }

  private def dbfValue(f: Field, v: Any): Array[Byte] = {
    val s = f.typ match {
      case 'N' =>
        val txt = v match {
          case null => ""
          case d: java.lang.Double => if (f.decimals > 0) f"${d.doubleValue()}%.8f" else d.longValue().toString
          case fl: java.lang.Float => f"${fl.floatValue()}%.8f"
          case other => other.toString
        }
        val t = if (txt.length > f.width) "*" * f.width else txt
        (" " * (f.width - t.length)) + t // right-justified
      case 'L' => v match {
        case null => "?"
        case b: java.lang.Boolean => if (b) "T" else "F"
        case _ => "?"
      }
      case _ =>
        val txt = if (v == null) "" else v.toString
        val b = txt.getBytes("UTF-8")
        if (b.length > f.width) new String(b.take(f.width), "UTF-8") + "" else txt
    }
    val bytes = s.getBytes("UTF-8")
    val outBytes = new Array[Byte](f.width)
    java.util.Arrays.fill(outBytes, ' '.toByte)
    System.arraycopy(bytes, 0, outBytes, 0, math.min(bytes.length, f.width))
    outBytes
  }

  private def shapeTypeOf(g: Geometry, hasZ: Boolean): Int = g match {
    case _: Point => if (hasZ) 11 else 1
    case _: MultiPoint => if (hasZ) 18 else 8
    case _: LineString | _: MultiLineString => if (hasZ) 13 else 3
    case _: Polygon | _: MultiPolygon => if (hasZ) 15 else 5
    case _ => throw new IllegalArgumentException(
      s"shapefile cannot store ${g.getGeometryType} (no GeometryCollection shape type)")
  }

  private def encodeShape(g: Geometry, hasZ: Boolean): Array[Byte] = {
    if (g == null || g.isEmpty) {
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0) // null shape
      return bb.array()
    }
    val t = shapeTypeOf(g, hasZ)
    g match {
      case p: Point =>
        val bb = ByteBuffer.allocate(if (hasZ) 4 + 24 + 8 else 4 + 16).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(t); bb.putDouble(p.getX); bb.putDouble(p.getY)
        if (hasZ) { bb.putDouble(zOf(p.getCoordinate)); bb.putDouble(0.0) } // z + m slot
        bb.array()
      case mp: MultiPoint =>
        val cs = mp.getCoordinates
        val n = cs.length
        val size = 4 + 32 + 4 + 16 * n + (if (hasZ) 16 + 8 * n else 0)
        val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(t); putBox(bb, mp); bb.putInt(n)
        cs.foreach(c => { bb.putDouble(c.x); bb.putDouble(c.y) })
        if (hasZ) putZBlock(bb, cs)
        bb.array()
      case _ => // polyline / polygon family: parts + points
        val parts: Array[Array[Coordinate]] = g match {
          case l: LineString => Array(l.getCoordinates)
          case ml: MultiLineString =>
            Array.tabulate(ml.getNumGeometries)(i => ml.getGeometryN(i).getCoordinates)
          case p: Polygon => polyRings(p)
          case mp: MultiPolygon =>
            (0 until mp.getNumGeometries).flatMap(i => polyRings(mp.getGeometryN(i).asInstanceOf[Polygon])).toArray
          case other => throw new IllegalArgumentException(other.getGeometryType)
        }
        val all = parts.flatten
        val n = all.length
        val size = 4 + 32 + 8 + 4 * parts.length + 16 * n + (if (hasZ) 16 + 8 * n else 0)
        val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(t); putBox(bb, g); bb.putInt(parts.length); bb.putInt(n)
        var acc = 0
        parts.foreach { p => bb.putInt(acc); acc += p.length }
        all.foreach(c => { bb.putDouble(c.x); bb.putDouble(c.y) })
        if (hasZ) putZBlock(bb, all)
        bb.array()
    }
  }

  /** spec winding: exterior rings clockwise, holes counter-clockwise */
  private def polyRings(p: Polygon): Array[Array[Coordinate]] = {
    import org.locationtech.jts.algorithm.Orientation
    def oriented(cs: Array[Coordinate], ccw: Boolean): Array[Coordinate] =
      if (Orientation.isCCW(new org.locationtech.jts.geom.impl.CoordinateArraySequence(cs)) == ccw) cs
      else cs.reverse
    val shell = oriented(p.getExteriorRing.getCoordinates, ccw = false)
    val holes = Array.tabulate(p.getNumInteriorRing)(i =>
      oriented(p.getInteriorRingN(i).getCoordinates, ccw = true))
    shell +: holes
  }

  private def zOf(c: Coordinate): Double = { val z = c.getZ; if (z.isNaN) 0.0 else z }

  private def putBox(bb: ByteBuffer, g: Geometry): Unit = {
    val e = g.getEnvelopeInternal
    bb.putDouble(e.getMinX); bb.putDouble(e.getMinY)
    bb.putDouble(e.getMaxX); bb.putDouble(e.getMaxY)
  }

  private def putZBlock(bb: ByteBuffer, cs: Array[Coordinate]): Unit = {
    val zs = cs.map(zOf)
    bb.putDouble(if (zs.isEmpty) 0 else zs.min)
    bb.putDouble(if (zs.isEmpty) 0 else zs.max)
    zs.foreach(bb.putDouble)
  }
}

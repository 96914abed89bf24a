package graft.io

import graft.geom.Geo
import org.locationtech.jts.geom._
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/**
 * FlatGeobuf writer — the write side of [[FlatGeobuf]]'s reader, built on a
 * minimal back-to-front flatbuffers builder (public wire format:
 * google.github.io/flatbuffers/flatbuffers_internals.html). Features are
 * Hilbert-sorted and the spec's packed Hilbert R-tree (40-byte nodes,
 * node size 16) is emitted between header and data, so graft's own reader
 * and external FGB readers get bbox pruning (reference gets this via GDAL,
 * st_read.cpp:189-207). Pass `index = false` for the bare streaming layout.
 */
object FlatGeobufWriter {

  // ------------------------------------------------------- mini flatbuffers
  /** Back-to-front builder (canonical FlatBufferBuilder algorithm). All
   *  `offset` values are distances from the buffer end; relative offsets are
   *  computed exactly as the reader ([[FlatGeobuf.Fb]]) expects. Bytes are
   *  written high-to-low address per scalar, which lands them little-endian
   *  in the finished (address-increasing) buffer. */
  final class Fbb(initial: Int = 1024) {
    private var buf = new Array[Byte](initial)
    private var head = initial
    private var vtable: Array[Int] = _
    private var objectStart = 0

    def offset: Int = buf.length - head

    private def grow(): Unit = {
      val used = buf.length - head
      val nb = new Array[Byte](buf.length * 2)
      System.arraycopy(buf, head, nb, nb.length - used, used)
      head = nb.length - used
      buf = nb
    }
    /** pad so that a `size`-aligned write after `additional` more bytes is
     *  aligned relative to the buffer end, and ensure capacity. */
    private def prep(size: Int, additional: Int): Unit = {
      while (head < size + additional + 8) grow()
      while (((offset + additional) % size) != 0) { head -= 1; buf(head) = 0 }
    }
    private def raw(b: Byte): Unit = { if (head == 0) grow(); head -= 1; buf(head) = b }
    private def rawShort(v: Int): Unit = { raw((v >> 8).toByte); raw(v.toByte) }
    private def rawInt(v: Int): Unit = { raw((v >> 24).toByte); raw((v >> 16).toByte); raw((v >> 8).toByte); raw(v.toByte) }
    private def rawLong(v: Long): Unit = { var i = 7; while (i >= 0) { raw((v >> (8 * i)).toByte); i -= 1 } }

    def putByte(v: Byte): Unit = { prep(1, 0); raw(v) }
    def putShort(v: Short): Unit = { prep(2, 0); rawShort(v) }
    def putInt(v: Int): Unit = { prep(4, 0); rawInt(v) }
    def putLong(v: Long): Unit = { prep(8, 0); rawLong(v) }
    def putDouble(v: Double): Unit = putLong(java.lang.Double.doubleToLongBits(v))
    def putOffset(off: Int): Unit = { prep(4, 0); rawInt(offset + 4 - off) }

    def string(s: String): Int = {
      val bytes = s.getBytes("UTF-8")
      prep(4, bytes.length + 1) // length prefix must be 4-aligned; no inner pad
      raw(0) // null terminator
      var i = bytes.length - 1
      while (i >= 0) { raw(bytes(i)); i -= 1 }
      rawInt(bytes.length)
      offset
    }
    def doubleVector(xs: Array[Double]): Int = {
      prep(4, 8 * xs.length)
      prep(8, 8 * xs.length)
      var i = xs.length - 1
      while (i >= 0) { rawLong(java.lang.Double.doubleToLongBits(xs(i))); i -= 1 }
      rawInt(xs.length)
      offset
    }
    def uintVector(xs: Array[Int]): Int = {
      prep(4, 4 * xs.length)
      var i = xs.length - 1
      while (i >= 0) { rawInt(xs(i)); i -= 1 }
      rawInt(xs.length)
      offset
    }
    def byteVector(xs: Array[Byte]): Int = {
      prep(4, xs.length)
      var i = xs.length - 1
      while (i >= 0) { raw(xs(i)); i -= 1 }
      rawInt(xs.length)
      offset
    }
    def offsetVector(offs: Array[Int]): Int = {
      prep(4, 4 * offs.length)
      var i = offs.length - 1
      while (i >= 0) { rawInt(offset + 4 - offs(i)); i -= 1 }
      rawInt(offs.length)
      offset
    }

    def startTable(numFields: Int): Unit = {
      vtable = new Array[Int](numFields)
      objectStart = offset
    }
    def slotByte(id: Int, v: Int, dflt: Int): Unit =
      if (v != dflt) { putByte(v.toByte); vtable(id) = offset }
    def slotShort(id: Int, v: Int, dflt: Int, force: Boolean = false): Unit =
      if (force || v != dflt) { putShort(v.toShort); vtable(id) = offset }
    def slotInt(id: Int, v: Int, dflt: Int): Unit =
      if (v != dflt) { putInt(v); vtable(id) = offset }
    def slotLong(id: Int, v: Long, dflt: Long): Unit =
      if (v != dflt) { putLong(v); vtable(id) = offset }
    def slotOffset(id: Int, off: Int): Unit =
      if (off != 0) { putOffset(off); vtable(id) = offset }
    def endTable(): Int = {
      prep(4, 0); rawInt(0) // soffset placeholder
      val tableOff = offset
      val tableSize = tableOff - objectStart
      // vtable: [vtLen u16][tableSize u16][field voffs u16...] — prepend reversed
      var i = vtable.length - 1
      while (i >= 0) {
        prep(2, 0)
        rawShort(if (vtable(i) == 0) 0 else tableOff - vtable(i))
        i -= 1
      }
      prep(2, 0); rawShort(tableSize)
      prep(2, 0); rawShort(4 + 2 * vtable.length)
      val vtOff = offset
      // patch the placeholder: reader does vt = t - getInt(t)
      val addr = buf.length - tableOff
      val rel = vtOff - tableOff
      buf(addr) = rel.toByte; buf(addr + 1) = (rel >> 8).toByte
      buf(addr + 2) = (rel >> 16).toByte; buf(addr + 3) = (rel >> 24).toByte
      tableOff
    }
    def finish(rootOff: Int): Array[Byte] = {
      prep(4, 0); rawInt(offset + 4 - rootOff)
      java.util.Arrays.copyOfRange(buf, head, buf.length)
    }
  }

  // ------------------------------------------------------------ geometry
  final case class FgbField(name: String, typ: Int) // FGB ColumnType

  private val NodeSize = 16

  /** (position in the spill file, encoded length, bbox) — the only per-feature
    * state kept on the heap; encoded bytes spill to an executor-local temp
    * file so a huge partition costs ~48 heap bytes per feature, not its
    * serialized size. */
  private final case class FeatMeta(pos: Long, len: Int, env: Envelope)

  def write(path: String, geomType: Int, fields: Seq[FgbField],
            rows: Iterator[(Geometry, Array[Any])],
            open: String => java.io.OutputStream =
              p => new BufferedOutputStream(new FileOutputStream(p), 1 << 16),
            index: Boolean = true,
            /** (org, code, name, wkt) for the header Crs table — the
              * spec's org(0)/code(1)/name(2)/wkt(4) slots (COPY `SRS`) */
            crs: Option[(String, Int, String, String)] = None): Long = {
    val out = open(path)
    var anyZ = false; var anyM = false
    // the header needs count/anyZ/anyM and the index needs a Hilbert sort,
    // both only known after the last row — so features stream to a temp file
    // and are copied out (in index order) once the header can be written
    val spill = java.io.File.createTempFile("graft_fgb", ".feat")
    val metas = scala.collection.mutable.ArrayBuffer.empty[FeatMeta]
    try {
      val tout = new BufferedOutputStream(new FileOutputStream(spill), 1 << 16)
      var tpos = 0L
      try {
        rows.foreach { case (g, attrs) =>
          val fb = new Fbb(512)
          // per-feature Z/M presence; the header flags record whether any did
          val gz = g != null && Geo.geomHasZ(g)
          val gm = g != null && Geo.geomHasM(g)
          anyZ |= gz; anyM |= gm
          val geomOff = if (g == null) 0 else writeGeometry(fb, g, gz, gm)
          val propOff = writeProperties(fb, fields, attrs)
          fb.startTable(3)
          fb.slotOffset(0, geomOff)
          fb.slotOffset(1, propOff)
          val t = fb.endTable()
          val env = if (g == null || g.isEmpty) null else g.getEnvelopeInternal
          val bytes = fb.finish(t)
          tout.write(bytes)
          metas += FeatMeta(tpos, bytes.length, env)
          tpos += bytes.length
        }
      } finally tout.close()
      val count = metas.length.toLong
      val withIndex = index && count > 0

      val ordered: IndexedSeq[FeatMeta] = if (withIndex) {
        // spec ordering: features sorted by Hilbert value of their bbox center
        val ext = new Envelope()
        metas.foreach(m => if (m.env != null) ext.expandToInclude(m.env))
        if (ext.isNull) ext.expandToInclude(0, 0)
        metas.sortBy { m =>
          if (m.env == null) -1L
          else graft.geom.Curves.hilbert(
            (m.env.getMinX + m.env.getMaxX) / 2, (m.env.getMinY + m.env.getMaxY) / 2,
            ext.getMinX, ext.getMinY, math.max(ext.getMaxX, ext.getMinX + 1e-12),
            math.max(ext.getMaxY, ext.getMinY + 1e-12))
        }.toIndexedSeq
      } else metas.toIndexedSeq

      // header
      val hb = new Fbb(512)
      val colOffs = fields.map { f =>
        val nameOff = hb.string(f.name)
        hb.startTable(2)
        hb.slotOffset(0, nameOff)
        hb.slotByte(1, f.typ, 0)
        hb.endTable()
      }.toArray
      val colsVec = if (colOffs.isEmpty) 0 else hb.offsetVector(colOffs)
      // Crs sub-table (spec slots: org=0, code=1, name=2, wkt=4)
      val crsOff = crs.map { case (org, code, name, wkt) =>
        val orgOff = if (org != null) hb.string(org) else 0
        val crsNameOff = if (name != null) hb.string(name) else 0
        val wktOff = if (wkt != null) hb.string(wkt) else 0
        hb.startTable(5)
        hb.slotOffset(0, orgOff)
        hb.slotInt(1, code, 0)
        hb.slotOffset(2, crsNameOff)
        hb.slotOffset(4, wktOff)
        hb.endTable()
      }.getOrElse(0)
      val nameOff = hb.string("graft")
      hb.startTable(11)
      hb.slotOffset(0, nameOff)
      hb.slotByte(2, geomType, 0)
      hb.slotByte(3, if (anyZ) 1 else 0, 0)
      hb.slotByte(4, if (anyM) 1 else 0, 0)
      hb.slotOffset(7, colsVec)
      hb.slotLong(8, count, 0)
      hb.slotShort(9, if (withIndex) NodeSize else 0, 16, force = true)
      hb.slotOffset(10, crsOff)
      val ht = hb.endTable()
      val headerBytes = hb.finish(ht)
      out.write(Array[Byte]('f', 'g', 'b', 3, 'f', 'g', 'b', 0))
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(headerBytes.length).array())
      out.write(headerBytes)
      if (withIndex) out.write(packedRTree(ordered))
      val raf = new java.io.RandomAccessFile(spill, "r")
      try {
        ordered.foreach { m =>
          val bytes = new Array[Byte](m.len)
          raf.seek(m.pos)
          raf.readFully(bytes)
          out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(m.len).array())
          out.write(bytes)
        }
      } finally raf.close()
    } finally { out.close(); spill.delete() }
    metas.length.toLong
  }

  /** Packed Hilbert R-tree per the FlatGeobuf spec: 40-byte nodes (4 doubles
   *  + uint64), levels laid out root-first, leaf offsets = byte offsets into
   *  the data section, internal offsets = node index of the first child. */
  private def packedRTree(feats: scala.collection.Seq[FeatMeta]): Array[Byte] = {
    val n = feats.length
    // level sizes, leaf level first
    val sizes = scala.collection.mutable.ArrayBuffer(n)
    var m = n
    while (m != 1) { m = (m + NodeSize - 1) / NodeSize; sizes += m }
    val rootFirst = sizes.reverse // root level (size 1) first in the file
    val starts = rootFirst.scanLeft(0)(_ + _).dropRight(1)
    val numNodes = rootFirst.sum
    val leafStart = numNodes - n

    val minsX = Array.fill(numNodes)(Double.PositiveInfinity)
    val minsY = Array.fill(numNodes)(Double.PositiveInfinity)
    val maxsX = Array.fill(numNodes)(Double.NegativeInfinity)
    val maxsY = Array.fill(numNodes)(Double.NegativeInfinity)
    val offs = new Array[Long](numNodes)

    var off = 0L
    var i = 0
    while (i < n) {
      val m = feats(i)
      val e = m.env
      val idx = leafStart + i
      if (e != null) {
        minsX(idx) = e.getMinX; minsY(idx) = e.getMinY
        maxsX(idx) = e.getMaxX; maxsY(idx) = e.getMaxY
      }
      offs(idx) = off
      off += 4 + m.len
      i += 1
    }
    // aggregate upward: each level's parents cover runs of NodeSize children
    var level = rootFirst.length - 1 // leaf level index in rootFirst ordering
    while (level > 0) {
      val childStart = starts(level)
      val childEnd = childStart + rootFirst(level)
      val parentStart = starts(level - 1)
      var c = childStart
      var p = parentStart
      while (c < childEnd) {
        val cEnd = math.min(c + NodeSize, childEnd)
        offs(p) = c
        var j = c
        while (j < cEnd) {
          if (minsX(j) < minsX(p)) minsX(p) = minsX(j)
          if (minsY(j) < minsY(p)) minsY(p) = minsY(j)
          if (maxsX(j) > maxsX(p)) maxsX(p) = maxsX(j)
          if (maxsY(j) > maxsY(p)) maxsY(p) = maxsY(j)
          j += 1
        }
        c = cEnd; p += 1
      }
      level -= 1
    }
    val bb = ByteBuffer.allocate(numNodes * 40).order(ByteOrder.LITTLE_ENDIAN)
    i = 0
    while (i < numNodes) {
      bb.putDouble(minsX(i)); bb.putDouble(minsY(i))
      bb.putDouble(maxsX(i)); bb.putDouble(maxsY(i))
      bb.putLong(offs(i))
      i += 1
    }
    bb.array()
  }

  private def xys(g: Geometry): Array[Double] = {
    val cs = g.getCoordinates
    val out = new Array[Double](cs.length * 2)
    var i = 0
    while (i < cs.length) { out(2 * i) = cs(i).x; out(2 * i + 1) = cs(i).y; i += 1 }
    out
  }
  private def zs(g: Geometry): Array[Double] = g.getCoordinates.map(c => { val z = c.getZ; if (z.isNaN) 0.0 else z })
  private def ms(g: Geometry): Array[Double] = g.getCoordinates.map { c =>
    val m = c match {
      case zm: CoordinateXYZM => zm.getM
      case xm: CoordinateXYM => xm.getM
      case _ => Double.NaN
    }
    if (m.isNaN) 0.0 else m
  }

  /** Geometry table: ends(0) xy(1) z(2) m(3) type(6) parts(7). */
  private def writeGeometry(fb: Fbb, g: Geometry, hasZ: Boolean, hasM: Boolean): Int = {
    def leaf(typ: Int, geom: Geometry, ends: Array[Int]): Int = {
      val xyOff = fb.doubleVector(xys(geom))
      val zOff = if (hasZ) fb.doubleVector(zs(geom)) else 0
      val mOff = if (hasM) fb.doubleVector(ms(geom)) else 0
      val endsOff = if (ends.length > 1) fb.uintVector(ends) else 0
      fb.startTable(8)
      fb.slotOffset(0, endsOff)
      fb.slotOffset(1, xyOff)
      fb.slotOffset(2, zOff)
      fb.slotOffset(3, mOff)
      fb.slotByte(6, typ, 0)
      fb.endTable()
    }
    g match {
      case p: Point => leaf(1, p, Array.empty)
      case l: LineString => leaf(2, l, Array.empty)
      case p: Polygon =>
        val ends = ringEnds(p)
        leaf(3, p, ends)
      case mp: MultiPoint => leaf(4, mp, Array.empty)
      case ml: MultiLineString =>
        var acc = 0
        val ends = Array.tabulate(ml.getNumGeometries) { i => acc += ml.getGeometryN(i).getNumPoints; acc }
        leaf(5, ml, ends)
      case mp: MultiPolygon =>
        val parts = Array.tabulate(mp.getNumGeometries)(i =>
          writeGeometry(fb, mp.getGeometryN(i), hasZ, hasM))
        val partsVec = fb.offsetVector(parts)
        fb.startTable(8)
        fb.slotByte(6, 6, 0)
        fb.slotOffset(7, partsVec)
        fb.endTable()
      case gc: GeometryCollection =>
        val parts = Array.tabulate(gc.getNumGeometries)(i =>
          writeGeometry(fb, gc.getGeometryN(i), hasZ, hasM))
        val partsVec = fb.offsetVector(parts)
        fb.startTable(8)
        fb.slotByte(6, 7, 0)
        fb.slotOffset(7, partsVec)
        fb.endTable()
    }
  }

  private def ringEnds(p: Polygon): Array[Int] = {
    var acc = p.getExteriorRing.getNumPoints
    val out = Array.newBuilder[Int]
    out += acc
    var i = 0
    while (i < p.getNumInteriorRing) { acc += p.getInteriorRingN(i).getNumPoints; out += acc; i += 1 }
    out.result()
  }

  /** properties blob: repeated [u16 col idx][typed value] (little-endian). */
  private def writeProperties(fb: Fbb, fields: Seq[FgbField], attrs: Array[Any]): Int = {
    if (fields.isEmpty) return 0
    val bos = new java.io.ByteArrayOutputStream()
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (i < attrs.length) attrs(i) else null
      if (v != null) {
        u16(i)
        f.typ match {
          case 2 => bos.write(if (v.asInstanceOf[Boolean]) 1 else 0)
          case 5 => bb.clear(); bb.putInt(v.asInstanceOf[Number].intValue()); bos.write(bb.array(), 0, 4)
          case 7 => bb.clear(); bb.putLong(v.asInstanceOf[Number].longValue()); bos.write(bb.array(), 0, 8)
          case 10 => bb.clear(); bb.putDouble(v.asInstanceOf[Number].doubleValue()); bos.write(bb.array(), 0, 8)
          case _ => // string
            val sb = v.toString.getBytes("UTF-8")
            bb.clear(); bb.putInt(sb.length); bos.write(bb.array(), 0, 4); bos.write(sb)
        }
      }
    }
    val arr = bos.toByteArray
    if (arr.isEmpty) 0 else fb.byteVector(arr)
  }

  def fgbType(dt: org.apache.spark.sql.types.DataType): Int = dt match {
    case org.apache.spark.sql.types.BooleanType => 2
    case org.apache.spark.sql.types.IntegerType => 5
    case org.apache.spark.sql.types.LongType => 7
    case org.apache.spark.sql.types.DoubleType => 10
    case _ => 11
  }

  def geomTypeOf(g: Geometry): Int = g match {
    case _: Point => 1
    case _: LineString => 2
    case _: Polygon => 3
    case _: MultiPoint => 4
    case _: MultiLineString => 5
    case _: MultiPolygon => 6
    case _ => 7
  }
}

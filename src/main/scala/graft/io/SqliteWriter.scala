package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/**
 * Minimal sqlite3 database writer (public file format:
 * sqlite.org/fileformat2.html) — enough to author a valid GeoPackage: leaf +
 * interior table b-trees, overflow chains for large payloads, record serial
 * types, and the 100-byte header. Verified by round-tripping through
 * [[Sqlite.Db]] and external sqlite readers' documented behavior.
 */
object SqliteWriter {

  final val PageSize = 4096
  private val Usable = PageSize
  private val MaxLeafLocal = Usable - 35
  private val MinLocal = (Usable - 12) * 32 / 255 - 23

  def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v <= 127) return Array(v.toByte)
    // up to 9 bytes; bytes 0..n-2 carry 7 bits with continuation, last byte 7 bits
    val out = new ArrayBuffer[Byte](9)
    var x = v
    val stack = new ArrayBuffer[Byte](9)
    stack += (x & 0x7f).toByte
    x >>>= 7
    while (x != 0) { stack += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out ++= stack.reverse
    out.toArray
  }

  /** Record encoding: values may be null, Long, Double, String, Array[Byte]. */
  def record(values: Seq[Any]): Array[Byte] = {
    val types = new ArrayBuffer[Long]()
    val bodies = new ArrayBuffer[Array[Byte]]()
    values.foreach {
      case null =>
        types += 0; bodies += Array.empty
      case v: Long =>
        if (v == 0) { types += 8; bodies += Array.empty }
        else if (v == 1) { types += 9; bodies += Array.empty }
        else if (v >= Byte.MinValue && v <= Byte.MaxValue) { types += 1; bodies += Array(v.toByte) }
        else if (v >= Short.MinValue && v <= Short.MaxValue) {
          types += 2; bodies += ByteBuffer.allocate(2).putShort(v.toShort).array()
        } else if (v >= Int.MinValue && v <= Int.MaxValue) {
          types += 4; bodies += ByteBuffer.allocate(4).putInt(v.toInt).array()
        } else { types += 6; bodies += ByteBuffer.allocate(8).putLong(v).array() }
      case v: Int => return record(values.map { case i: Int => i.toLong; case o => o })
      case v: Double =>
        types += 7; bodies += ByteBuffer.allocate(8).putDouble(v).array()
      case v: String =>
        val b = v.getBytes("UTF-8"); types += b.length * 2L + 13; bodies += b
      case v: Array[Byte] =>
        types += v.length * 2L + 12; bodies += v
      case other => throw new IllegalArgumentException(s"unsupported sqlite value ${other.getClass}")
    }
    val typeBytes = types.flatMap(varint).toArray
    // header length varint includes itself; one extra byte is enough below 2^14
    var hdrLen = typeBytes.length + 1
    if (varint(hdrLen).length > 1) hdrLen = typeBytes.length + varint(typeBytes.length + 2).length
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(hdrLen))
    out.write(typeBytes)
    bodies.foreach(out.write)
    out.toByteArray
  }

  /** Database under construction. Page 1 is reserved for sqlite_master; data
   *  pages are appended from page 2 and SPILL TO A TEMP FILE as they fill.
   *
   *  The sqlite header needs the final page count and interiors are laid out
   *  after their leaves, but a packed page is never touched again except
   *  (a) the 4-byte next pointer of the previous overflow page and (b) page 1
   *  at finish — both patchable in the spill file. Heap cost is therefore
   *  O(1) pages per partition regardless of output size (a multi-GB
   *  singleFile GeoPackage no longer holds the whole database on the heap;
   *  leaf/interior bookkeeping is ~10 bytes per page). */
  final class Db {
    private val tmp = java.io.File.createTempFile("graft-sqlite-", ".pages")
    tmp.deleteOnExit()
    private val raf = new java.io.RandomAccessFile(tmp, "rw")
    private var nPages = 1 // page 1 kept in memory until finish
    private def alloc(): Int = { nPages += 1; nPages }
    private def putPage(p: Int, data: Array[Byte]): Unit = {
      raf.seek((p - 2).toLong * PageSize) // page 2 = spill offset 0
      raf.write(data)
    }
    private def patchInt(p: Int, off: Int, v: Int): Unit = {
      raf.seek((p - 2).toLong * PageSize + off)
      raf.writeInt(v)
    }

    /** Write a table from (rowid, record) pairs (rowids ascending); returns
     *  root page. Single pass over the iterator — records stream to the
     *  spill file and never accumulate. */
    def writeTable(records: Iterator[(Long, Array[Byte])]): Int = {
      if (records.isEmpty) { // empty leaf
        val p = alloc()
        val page = new Array[Byte](PageSize)
        leafHeader(page, 0, Usable, offset = 0)
        putPage(p, page)
        return p
      }
      // build leaf cells (+ overflow chains as needed)
      val leaves = ArrayBuffer.empty[(Int, Long)] // (pageNo, maxRowid)
      var cells = ArrayBuffer.empty[Array[Byte]]
      var cellsRowids = ArrayBuffer.empty[Long]
      def flushLeaf(): Unit = {
        if (cells.isEmpty) return
        val p = alloc()
        val page = new Array[Byte](PageSize)
        packLeaf(page, cells.toSeq, offset = 0)
        putPage(p, page)
        leaves += ((p, cellsRowids.last))
        cells = ArrayBuffer.empty; cellsRowids = ArrayBuffer.empty
      }
      var used = 8 // leaf header
      records.foreach { case (rowid, payload) =>
        val cell = leafCell(rowid, payload)
        val need = cell.length + 2
        if (cells.nonEmpty && used + need > Usable) { flushLeaf(); used = 8 }
        cells += cell; cellsRowids += rowid
        used += need
      }
      flushLeaf()
      if (leaves.length == 1) return leaves.head._1
      buildInterior(leaves.toSeq)
    }

    def writeTable(records: Seq[(Long, Array[Byte])]): Int = writeTable(records.iterator)

    private def buildInterior(children: Seq[(Int, Long)]): Int = {
      // interior cells: [u32 child][varint key=max rowid in child]; last child
      // goes in the header's rightmost pointer
      val parents = ArrayBuffer.empty[(Int, Long)]
      var group = ArrayBuffer.empty[(Int, Long)]
      var used = 12
      def flush(last: Boolean): Unit = {
        if (group.isEmpty) return
        val p = alloc()
        val page = new Array[Byte](PageSize)
        val cellData = group.init.map { case (child, key) =>
          val kv = varint(key)
          val bb = ByteBuffer.allocate(4 + kv.length)
          bb.putInt(child); bb.put(kv)
          bb.array()
        }
        packInterior(page, cellData.toSeq, rightMost = group.last._1)
        putPage(p, page)
        parents += ((p, group.last._2))
        group = ArrayBuffer.empty; used = 12
      }
      children.foreach { c =>
        val need = 4 + varint(c._2).length + 2
        if (group.length > 1 && used + need > Usable) flush(last = false)
        group += c; used += need
      }
      flush(last = true)
      if (parents.length == 1) parents.head._1 else buildInterior(parents.toSeq)
    }

    private def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
      val pl = payload.length
      val out = new java.io.ByteArrayOutputStream()
      out.write(varint(pl))
      out.write(varint(rowid))
      if (pl <= MaxLeafLocal) out.write(payload)
      else {
        val k = MinLocal + (pl - MinLocal) % (Usable - 4)
        val local = if (k <= MaxLeafLocal) k else MinLocal
        out.write(payload, 0, local)
        // overflow chain — each page spills immediately; the next pointer of
        // the previous page is patched in the spill file
        var off = local
        var firstPage = 0
        var prevNo = 0
        while (off < pl) {
          val p = alloc()
          val page = new Array[Byte](PageSize)
          if (prevNo != 0) patchInt(prevNo, 0, p) else firstPage = p
          val n = math.min(Usable - 4, pl - off)
          System.arraycopy(payload, off, page, 4, n)
          off += n
          putPage(p, page)
          prevNo = p
        }
        out.write(ByteBuffer.allocate(4).putInt(firstPage).array())
      }
      out.toByteArray
    }

    private def leafHeader(page: Array[Byte], nCells: Int, contentStart: Int, offset: Int): Unit = {
      val bb = ByteBuffer.wrap(page)
      bb.put(offset, 0x0d.toByte)
      bb.putShort(offset + 1, 0) // first freeblock
      bb.putShort(offset + 3, nCells.toShort)
      bb.putShort(offset + 5, (contentStart & 0xffff).toShort)
      bb.put(offset + 7, 0.toByte)
    }

    /** Pack pre-built cells into a leaf page; `offset` = 100 for page 1. */
    def packLeaf(page: Array[Byte], cells: Seq[Array[Byte]], offset: Int): Unit = {
      val bb = ByteBuffer.wrap(page)
      var top = Usable
      var ptr = offset + 8
      cells.foreach { c =>
        top -= c.length
        System.arraycopy(c, 0, page, top, c.length)
        bb.putShort(ptr, top.toShort)
        ptr += 2
      }
      leafHeader(page, cells.length, top, offset)
    }

    private def packInterior(page: Array[Byte], cells: Seq[Array[Byte]], rightMost: Int): Unit = {
      val bb = ByteBuffer.wrap(page)
      var top = Usable
      var ptr = 12
      cells.foreach { c =>
        top -= c.length
        System.arraycopy(c, 0, page, top, c.length)
        bb.putShort(ptr, top.toShort)
        ptr += 2
      }
      bb.put(0, 0x05.toByte)
      bb.putShort(1, 0)
      bb.putShort(3, cells.length.toShort)
      bb.putShort(5, (top & 0xffff).toShort)
      bb.put(7, 0.toByte)
      bb.putInt(8, rightMost)
    }

    /** master records: (name, rootPage, createSql); then write the file. */
    def finish(path: String, master: Seq[(String, Int, String)],
               open: String => java.io.OutputStream =
                 p => new java.io.BufferedOutputStream(new java.io.FileOutputStream(p), 1 << 16)): Unit = {
      val cells = master.zipWithIndex.map { case ((name, root, sql), i) =>
        leafCell(i + 1L, record(Seq("table", name, name, root.toLong, sql)))
      }
      require(cells.map(_.length + 2).sum + 108 <= Usable, "sqlite_master must fit page 1")
      val p1 = new Array[Byte](PageSize)
      packLeaf(p1, cells, offset = 100)
      val bb = ByteBuffer.wrap(p1).order(ByteOrder.BIG_ENDIAN)
      val magic = "SQLite format 3".getBytes("ASCII")
      System.arraycopy(magic, 0, p1, 0, magic.length); p1(15) = 0
      bb.putShort(16, PageSize.toShort)
      bb.put(18, 1.toByte); bb.put(19, 1.toByte)
      bb.put(21, 64.toByte); bb.put(22, 32.toByte); bb.put(23, 32.toByte)
      bb.putInt(24, 1) // change counter
      bb.putInt(28, nPages)
      bb.putInt(40, 1) // schema cookie
      bb.putInt(44, 4) // schema format
      bb.putInt(56, 1) // utf-8
      bb.putInt(68, 0x47504b47) // application_id "GPKG"
      bb.putInt(92, 1)
      bb.putInt(96, 3045000)
      val out = open(path)
      try {
        out.write(p1)
        raf.seek(0)
        val buf = new Array[Byte](PageSize)
        var remaining = (nPages - 1).toLong * PageSize
        while (remaining > 0) {
          val n = raf.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
          require(n > 0, "sqlite spill file truncated")
          out.write(buf, 0, n)
          remaining -= n
        }
      } finally {
        out.close()
        raf.close()
        tmp.delete()
      }
    }
  }
}

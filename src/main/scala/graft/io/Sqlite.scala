package graft.io

import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}
import scala.collection.mutable.ArrayBuffer

/**
 * Minimal read-only SQLite file parser (public file format,
 * sqlite.org/fileformat2): pager + table B-tree walk + record decoding,
 * including overflow-page chains. Just enough to scan GeoPackage feature
 * tables — no SQL, no indices, no writes.
 *
 * Scale design: the file is memory-mapped in 1 GiB windows (never read onto
 * the heap), positions are Long, and [[Db.topLevelChildren]] exposes the root
 * page's subtrees so a multi-GB table can be scanned by parallel tasks.
 * Every raw access is within one sqlite page (≤ 64 KiB) and windows are
 * page-aligned, so no access straddles a window boundary.
 */
object Sqlite {

  private final val Window = 1L << 30

  final class Db(path: String) {
    private val ch = FileChannel.open(Paths.get(path.stripPrefix("file:")), StandardOpenOption.READ)
    private val fileSize = ch.size()
    private val maps = Array.tabulate(((fileSize + Window - 1) / Window).toInt) { i =>
      ch.map(FileChannel.MapMode.READ_ONLY, i.toLong * Window, math.min(Window, fileSize - i.toLong * Window))
    }
    ch.close() // mappings stay valid after the channel closes

    private def buf(pos: Long) = maps((pos / Window).toInt)
    private def off(pos: Long): Int = (pos % Window).toInt
    private def u8(pos: Long): Int = buf(pos).get(off(pos)) & 0xff
    private def u16(pos: Long): Int = buf(pos).getShort(off(pos)) & 0xffff
    private def i32(pos: Long): Int = buf(pos).getInt(off(pos))
    private def u32(pos: Long): Long = i32(pos).toLong & 0xffffffffL
    private def copy(pos: Long, len: Int): Array[Byte] = {
      val out = new Array[Byte](len)
      val b = buf(pos).duplicate()
      b.position(off(pos))
      b.get(out)
      out
    }

    require(fileSize > 100 && new String(copy(0, 15), "ASCII") == "SQLite format 3",
      s"not a sqlite file: $path")
    val pageSize: Int = {
      val ps = u16(16)
      if (ps == 1) 65536 else ps
    }
    private val usable = pageSize - u8(20) // minus reserved space

    private def pageStart(pageNo: Long): Long = (pageNo - 1) * pageSize

    /** All (rowid, column values) of the table rooted at `rootPage`. */
    def scanTable(rootPage: Long): Iterator[(Long, Array[Any])] =
      leafCells(rootPage).map { case (rowid, payload) => (rowid, decodeRecord(payload)) }

    /** The root page's direct children (or the root itself when it is a leaf):
      * disjoint subtrees covering the whole table in rowid order, the natural
      * split points for parallel scans of one big table. */
    def topLevelChildren(rootPage: Long): Seq[Long] = {
      val base = pageStart(rootPage)
      val hdr = base + (if (rootPage == 1) 100 else 0)
      u8(hdr) match {
        case 5 =>
          val nCells = u16(hdr + 3)
          val rightMost = u32(hdr + 8)
          (0 until nCells).map { i =>
            u32(base + u16(hdr + 12 + 2 * i))
          } :+ rightMost
        case _ => Seq(rootPage)
      }
    }

    /** Scan a set of subtrees (from [[topLevelChildren]]) in the given order. */
    def scanSubtrees(pages: Seq[Long]): Iterator[(Long, Array[Any])] =
      pages.iterator.flatMap(scanTable)

    private def leafCells(pageNo: Long): Iterator[(Long, Array[Byte])] = {
      val base = pageStart(pageNo)
      val hdr = base + (if (pageNo == 1) 100 else 0)
      val typ = u8(hdr)
      val nCells = u16(hdr + 3)
      typ match {
        case 13 => // leaf table
          (0 until nCells).iterator.map { i =>
            val cellOff = base + u16(hdr + 8 + 2 * i)
            readLeafCell(cellOff)
          }
        case 5 => // interior table
          val rightMost = u32(hdr + 8)
          val children = (0 until nCells).map { i =>
            val cellOff = base + u16(hdr + 12 + 2 * i)
            u32(cellOff)
          } :+ rightMost
          children.iterator.flatMap(leafCells)
        case other => throw new IllegalArgumentException(s"unexpected sqlite page type $other")
      }
    }

    // sqlite varint: bytes 0-7 contribute 7 bits each; only byte index 8
    // contributes a full 8 bits (9-byte form). Length is 8 when byte 7 clears
    // the continuation bit.
    private def varint(pos: Long): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = u8(pos + i)
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      val b = u8(pos + 8)
      ((v << 8) | b, 9)
    }

    private def readLeafCell(cellOff: Long): (Long, Array[Byte]) = {
      var p = cellOff
      val (payloadLen, n1) = varint(p); p += n1
      val (rowid, n2) = varint(p); p += n2
      // overflow threshold for table leaves (sqlite fileformat2 §B-tree Pages)
      val maxLocal = usable - 35
      if (payloadLen <= maxLocal) {
        (rowid, copy(p, payloadLen.toInt))
      } else {
        val minLocal = (usable - 12) * 32 / 255 - 23
        val k = minLocal + ((payloadLen - minLocal) % (usable - 4)).toInt
        val local = if (k <= maxLocal) k else minLocal
        val out = new Array[Byte](payloadLen.toInt)
        System.arraycopy(copy(p, local), 0, out, 0, local)
        var written = local
        var overflowPage = u32(p + local)
        while (overflowPage != 0 && written < payloadLen) {
          val ps = pageStart(overflowPage)
          val next = u32(ps)
          val chunk = math.min(usable - 4, payloadLen.toInt - written)
          System.arraycopy(copy(ps + 4, chunk), 0, out, written, chunk)
          written += chunk
          overflowPage = next
        }
        (rowid, out)
      }
    }

    /** SQLite record → column values (Long / Double / String / Array[Byte] / null). */
    private def decodeRecord(payload: Array[Byte]): Array[Any] = {
      val pb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.BIG_ENDIAN)
      def vint(pos: Int): (Long, Int) = {
        var v = 0L
        var i = 0
        while (i < 8) {
          val b = payload(pos + i) & 0xff
          v = (v << 7) | (b & 0x7f)
          if ((b & 0x80) == 0) return (v, i + 1)
          i += 1
        }
        ((v << 8) | (payload(pos + 8) & 0xff), 9)
      }
      val (headerLen, n0) = vint(0)
      val serials = ArrayBuffer.empty[Long]
      var p = n0
      while (p < headerLen) {
        val (s, n) = vint(p)
        serials += s
        p += n
      }
      var dp = headerLen.toInt
      serials.map { s =>
        s match {
          case 0 => null
          case 1 => val v = payload(dp).toLong; dp += 1; v
          case 2 => val v = pb.getShort(dp).toLong; dp += 2; v
          case 3 =>
            val v = ((payload(dp).toLong << 16) | ((payload(dp + 1) & 0xffL) << 8) | (payload(dp + 2) & 0xffL))
            dp += 3; v
          case 4 => val v = pb.getInt(dp).toLong; dp += 4; v
          case 5 =>
            val v = ((pb.getShort(dp).toLong << 32) | (pb.getInt(dp + 2).toLong & 0xffffffffL))
            dp += 6; v
          case 6 => val v = pb.getLong(dp); dp += 8; v
          case 7 => val v = pb.getDouble(dp); dp += 8; v
          case 8 => 0L
          case 9 => 1L
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val v = new String(payload, dp, len, "UTF-8"); dp += len; v
          case n if n >= 12 =>
            val len = ((n - 12) / 2).toInt
            val v = java.util.Arrays.copyOfRange(payload, dp, dp + len); dp += len; v
        }
      }.toArray
    }

    /** sqlite_master rows: (type, name, tbl_name, rootpage, sql). */
    def master(): Seq[(String, String, String, Long, String)] =
      scanTable(1).map { case (_, cols) =>
        (cols(0).asInstanceOf[String], cols(1).asInstanceOf[String],
          cols(2).asInstanceOf[String], cols(3).asInstanceOf[Long],
          cols(4) match { case s: String => s; case _ => "" })
      }.toSeq
  }
}

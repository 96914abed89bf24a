package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

/**
 * Minimal read-only SQLite file parser (public file format,
 * sqlite.org/fileformat2): pager + table B-tree walk + record decoding,
 * including overflow-page chains. Just enough to scan GeoPackage feature
 * tables — no SQL, no indices, no writes.
 */
object Sqlite {

  final class Db(path: String) {
    private val bytes = Files.readAllBytes(Paths.get(path.stripPrefix("file:")))
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(bytes.length > 100 && new String(bytes, 0, 15, "ASCII") == "SQLite format 3",
      s"not a sqlite file: $path")
    val pageSize: Int = {
      val ps = bb.getShort(16) & 0xffff
      if (ps == 1) 65536 else ps
    }
    private val usable = pageSize - (bb.get(20) & 0xff) // minus reserved space

    private def pageStart(pageNo: Long): Int = ((pageNo - 1) * pageSize).toInt

    /** All (rowid, column values) of the table rooted at `rootPage`. */
    def scanTable(rootPage: Long): Iterator[(Long, Array[Any])] =
      leafCells(rootPage).map { case (rowid, payload) => (rowid, decodeRecord(payload)) }

    private def leafCells(pageNo: Long): Iterator[(Long, Array[Byte])] = {
      val base = pageStart(pageNo)
      val hdr = base + (if (pageNo == 1) 100 else 0)
      val typ = bb.get(hdr) & 0xff
      val nCells = bb.getShort(hdr + 3) & 0xffff
      typ match {
        case 13 => // leaf table
          (0 until nCells).iterator.map { i =>
            val cellOff = base + (bb.getShort(hdr + 8 + 2 * i) & 0xffff)
            readLeafCell(cellOff)
          }
        case 5 => // interior table
          val rightMost = bb.getInt(hdr + 8).toLong & 0xffffffffL
          val children = (0 until nCells).map { i =>
            val cellOff = base + (bb.getShort(hdr + 12 + 2 * i) & 0xffff)
            bb.getInt(cellOff).toLong & 0xffffffffL
          } :+ rightMost
          children.iterator.flatMap(leafCells)
        case other => throw new IllegalArgumentException(s"unexpected sqlite page type $other")
      }
    }

    // sqlite varint: bytes 0-7 contribute 7 bits each; only byte index 8
    // contributes a full 8 bits (9-byte form). Length is 8 when byte 7 clears
    // the continuation bit.
    private def varint(pos: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = bytes(pos + i) & 0xff
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      val b = bytes(pos + 8) & 0xff
      ((v << 8) | b, 9)
    }

    private def readLeafCell(cellOff: Int): (Long, Array[Byte]) = {
      var p = cellOff
      val (payloadLen, n1) = varint(p); p += n1
      val (rowid, n2) = varint(p); p += n2
      // overflow threshold for table leaves (sqlite fileformat2 §B-tree Pages)
      val maxLocal = usable - 35
      if (payloadLen <= maxLocal) {
        (rowid, java.util.Arrays.copyOfRange(bytes, p, p + payloadLen.toInt))
      } else {
        val minLocal = (usable - 12) * 32 / 255 - 23
        val k = minLocal + ((payloadLen - minLocal) % (usable - 4)).toInt
        val local = if (k <= maxLocal) k else minLocal
        val out = new Array[Byte](payloadLen.toInt)
        System.arraycopy(bytes, p, out, 0, local)
        var written = local
        var overflowPage = bb.getInt(p + local).toLong & 0xffffffffL
        while (overflowPage != 0 && written < payloadLen) {
          val ps = pageStart(overflowPage)
          val next = bb.getInt(ps).toLong & 0xffffffffL
          val chunk = math.min(usable - 4, payloadLen.toInt - written)
          System.arraycopy(bytes, ps + 4, out, written, chunk)
          written += chunk
          overflowPage = next
        }
        (rowid, out)
      }
    }

    /** SQLite record → column values (Long / Double / String / Array[Byte] / null). */
    private def decodeRecord(payload: Array[Byte]): Array[Any] = {
      val pb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
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

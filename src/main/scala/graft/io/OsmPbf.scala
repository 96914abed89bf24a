package graft.io

import java.io.RandomAccessFile
import java.nio.file.{Files, Paths}
import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/**
 * Native OSM PBF reader — hand-rolled varint/protobuf wire parsing of the
 * public OSM PBF format (fileformat.proto / osmformat.proto), mirroring the
 * reference's block-parallel native reader
 * (/root/reference/spatial/src/spatial/core/io/osm/st_read_osm.cpp: schema
 * kind/id/tags/refs/lat/lon/ref_roles/ref_types; zlib blob blocks decompressed
 * per thread). Blob boundaries are indexed cheaply up front so each blob
 * becomes an independent Spark InputPartition — embarrassingly parallel.
 */
object OsmPbf {

  final case class Entity(
      kind: String, // node | way | relation | changeset
      id: Long,
      tags: Map[String, String],
      refs: Array[Long],
      lat: java.lang.Double,
      lon: java.lang.Double,
      refRoles: Array[String],
      refTypes: Array[String])

  final case class BlobRef(offset: Long, headerSize: Int, dataSize: Int)

  /** Index OSMData blob positions (driver-side planning pass; reads headers only). */
  def indexBlobs(path: String): Seq[BlobRef] = {
    val raf = new RandomAccessFile(path.stripPrefix("file:"), "r")
    try {
      val out = ArrayBuffer.empty[BlobRef]
      var pos = 0L
      val len = raf.length()
      while (pos + 4 <= len) {
        raf.seek(pos)
        val hlen = raf.readInt() // 4-byte big-endian BlobHeader length
        val header = new Array[Byte](hlen)
        raf.readFully(header)
        val (typ, dataSize) = parseBlobHeader(header)
        if (typ == "OSMData") out += BlobRef(pos + 4 + hlen, hlen, dataSize)
        pos += 4 + hlen + dataSize
      }
      out.toSeq
    } finally raf.close()
  }

  /** Parse all entities of one blob. */
  def readBlob(path: String, blob: BlobRef): Iterator[Entity] = {
    val raf = new RandomAccessFile(path.stripPrefix("file:"), "r")
    val data =
      try {
        raf.seek(blob.offset)
        val b = new Array[Byte](blob.dataSize)
        raf.readFully(b)
        b
      } finally raf.close()
    val block = inflateBlob(data)
    parsePrimitiveBlock(block)
  }

  // ------------------------------------------------------------- wire format
  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = buf(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    def tag(): (Int, Int) = { val t = varint().toInt; (t >>> 3, t & 7) }
    def bytes(): (Int, Int) = { val n = varint().toInt; val s = pos; pos += n; (s, n) }
    def string(): String = { val (s, n) = bytes(); new String(buf, s, n, "UTF-8") }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
    def sub(): Reader = { val (s, n) = bytes(); new Reader(buf, s, s + n) }
  }

  private def parseBlobHeader(header: Array[Byte]): (String, Int) = {
    val r = new Reader(header, 0, header.length)
    var typ = ""
    var dataSize = 0
    while (r.hasMore) {
      val (f, w) = r.tag()
      f match {
        case 1 => typ = r.string()
        case 3 => dataSize = r.varint().toInt
        case _ => r.skip(w)
      }
    }
    (typ, dataSize)
  }

  private def inflateBlob(blobBytes: Array[Byte]): Array[Byte] = {
    val r = new Reader(blobBytes, 0, blobBytes.length)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: (Int, Int) = null
    while (r.hasMore) {
      val (f, w) = r.tag()
      f match {
        case 1 => val (s, n) = r.bytes(); raw = java.util.Arrays.copyOfRange(r.buf, s, s + n)
        case 2 => rawSize = r.varint().toInt
        case 3 => zlib = r.bytes()
        case _ => r.skip(w)
      }
    }
    if (raw != null) raw
    else if (zlib != null) {
      val inf = new Inflater()
      inf.setInput(blobBytes, zlib._1, zlib._2)
      val out = new Array[Byte](if (rawSize > 0) rawSize else zlib._2 * 8)
      var total = 0
      while (!inf.finished() && total < out.length) total += inf.inflate(out, total, out.length - total)
      inf.end()
      if (total == out.length) out else java.util.Arrays.copyOf(out, total)
    } else throw new IllegalArgumentException("OSM blob has neither raw nor zlib data")
  }

  private def parsePrimitiveBlock(block: Array[Byte]): Iterator[Entity] = {
    val r = new Reader(block, 0, block.length)
    var strings = Array.empty[String]
    val groups = ArrayBuffer.empty[(Int, Int)]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    while (r.hasMore) {
      val (f, w) = r.tag()
      f match {
        case 1 => // StringTable
          val st = r.sub()
          val ss = ArrayBuffer.empty[String]
          while (st.hasMore) {
            val (sf, sw) = st.tag()
            if (sf == 1) ss += st.string() else st.skip(sw)
          }
          strings = ss.toArray
        case 2 => groups += r.bytes()
        case 17 => granularity = r.varint()
        case 19 => latOffset = r.varint()
        case 20 => lonOffset = r.varint()
        case _ => r.skip(w)
      }
    }
    val s = strings
    groups.iterator.flatMap { case (off, len) =>
      parseGroup(new Reader(block, off, off + len), s, granularity, latOffset, lonOffset)
    }
  }

  private def coord(offset: Long, granularity: Long, raw: Long): Double =
    1e-9 * (offset + granularity * raw)

  private def packedLongs(r: Reader, zig: Boolean): Array[Long] = {
    val sub = r.sub()
    val out = ArrayBuffer.empty[Long]
    while (sub.hasMore) out += (if (zig) sub.zigzag() else sub.varint())
    out.toArray
  }

  private def parseGroup(r: Reader, s: Array[String], gran: Long, latOff: Long, lonOff: Long): Iterator[Entity] = {
    val out = ArrayBuffer.empty[Entity]
    while (r.hasMore) {
      val (f, w) = r.tag()
      f match {
        case 1 => // plain Node
          val nr = r.sub()
          var id = 0L; var lat = 0L; var lon = 0L
          var keys = Array.empty[Long]; var vals = Array.empty[Long]
          while (nr.hasMore) {
            val (nf, nw) = nr.tag()
            nf match {
              case 1 => id = nr.zigzag()
              case 2 => keys = packedLongs(nr, zig = false)
              case 3 => vals = packedLongs(nr, zig = false)
              case 8 => lat = nr.zigzag()
              case 9 => lon = nr.zigzag()
              case _ => nr.skip(nw)
            }
          }
          out += Entity("node", id, tagsOf(keys, vals, s), Array.empty,
            coord(latOff, gran, lat), coord(lonOff, gran, lon), Array.empty, Array.empty)
        case 2 => // DenseNodes
          val dr = r.sub()
          var ids = Array.empty[Long]; var lats = Array.empty[Long]; var lons = Array.empty[Long]
          var kvs = Array.empty[Long]
          while (dr.hasMore) {
            val (df, dw) = dr.tag()
            df match {
              case 1 => ids = packedLongs(dr, zig = true)
              case 8 => lats = packedLongs(dr, zig = true)
              case 9 => lons = packedLongs(dr, zig = true)
              case 10 => kvs = packedLongs(dr, zig = false)
              case _ => dr.skip(dw)
            }
          }
          var id = 0L; var la = 0L; var lo = 0L
          var kv = 0
          var i = 0
          while (i < ids.length) {
            id += ids(i); la += lats(i); lo += lons(i)
            val tags = Map.newBuilder[String, String]
            while (kv < kvs.length && kvs(kv) != 0) {
              tags += (s(kvs(kv).toInt) -> s(kvs(kv + 1).toInt))
              kv += 2
            }
            if (kv < kvs.length) kv += 1 // consume the 0 delimiter
            out += Entity("node", id, tags.result(), Array.empty,
              coord(latOff, gran, la), coord(lonOff, gran, lo), Array.empty, Array.empty)
            i += 1
          }
        case 3 => // Way
          val wr = r.sub()
          var id = 0L
          var keys = Array.empty[Long]; var vals = Array.empty[Long]; var refs = Array.empty[Long]
          while (wr.hasMore) {
            val (wf, ww) = wr.tag()
            wf match {
              case 1 => id = wr.varint()
              case 2 => keys = packedLongs(wr, zig = false)
              case 3 => vals = packedLongs(wr, zig = false)
              case 8 => refs = packedLongs(wr, zig = true)
              case _ => wr.skip(ww)
            }
          }
          var acc = 0L
          val absRefs = refs.map { d => acc += d; acc }
          out += Entity("way", id, tagsOf(keys, vals, s), absRefs, null, null, Array.empty, Array.empty)
        case 4 => // Relation
          val rr = r.sub()
          var id = 0L
          var keys = Array.empty[Long]; var vals = Array.empty[Long]
          var roles = Array.empty[Long]; var memids = Array.empty[Long]; var types = Array.empty[Long]
          while (rr.hasMore) {
            val (rf, rw) = rr.tag()
            rf match {
              case 1 => id = rr.varint()
              case 2 => keys = packedLongs(rr, zig = false)
              case 3 => vals = packedLongs(rr, zig = false)
              case 8 => roles = packedLongs(rr, zig = false)
              case 9 => memids = packedLongs(rr, zig = true)
              case 10 => types = packedLongs(rr, zig = false)
              case _ => rr.skip(rw)
            }
          }
          var acc = 0L
          val absIds = memids.map { d => acc += d; acc }
          val typeNames = types.map {
            case 0 => "node"
            case 1 => "way"
            case _ => "relation"
          }
          out += Entity("relation", id, tagsOf(keys, vals, s), absIds, null, null,
            roles.map(i => s(i.toInt)), typeNames)
        case _ => r.skip(w)
      }
    }
    out.iterator
  }

  private def tagsOf(keys: Array[Long], vals: Array[Long], s: Array[String]): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    var i = 0
    while (i < keys.length && i < vals.length) {
      b += (s(keys(i).toInt) -> s(vals(i).toInt))
      i += 1
    }
    b.result()
  }
}

package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column pipeline plumbing. Media is carried as opaque binary
 * columns with a typed metadata struct; the decode kernel is a clearly-marked
 * DETERMINISTIC STUB (this container ships no image/audio codecs) but the
 * Spark-side shape is real: batch iteration via mapPartitions (the Scala
 * analogue of the brief's mapInPandas — one JVM-side batch loop per
 * partition, codec state initialized once per partition, rows streamed).
 */
object MultiModal {

  final case class MediaMeta(width: Int, height: Int, channels: Int, format: String, nbytes: Long)
  final case class Decoded(id: Long, meta: MediaMeta, thumbnailStub: Array[Byte])

  /** STUB decode: derived deterministically from the bytes. Swap for a real
    * codec (e.g. TwelveMonkeys/javacv) without touching the pipeline shape. */
  def decodeStub(bytes: Array[Byte]): MediaMeta =
    MediaMeta((bytes.length % 640) + 1, ((bytes.length * 7) % 480) + 1, 3, "fake/rgb8", bytes.length.toLong)

  /** REAL container-header parse — pure JVM, no codec: PNG IHDR, JPEG SOF,
    * GIF logical screen descriptor, BMP BITMAPINFOHEADER (all public file
    * formats). Returns None for unrecognized blobs (caller falls back to the
    * stub for synthetic data). Header-only by design: a 100 TB media pipeline
    * reads dimensions without decoding pixels. */
  def decodeHeader(b: Array[Byte]): Option[MediaMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    // PNG: signature + IHDR (always the first chunk)
    if (b.length >= 29 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val channels = u8(25) match {
        case 0 => 1 case 2 => 3 case 3 => 1 case 4 => 2 case 6 => 4 case _ => 3
      }
      return Some(MediaMeta(be32(16), be32(20), channels, "image/png", b.length.toLong))
    }
    // JPEG: walk marker segments to the first SOFn
    if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var p = 2
      while (p + 3 < b.length) {
        if (u8(p) != 0xff) return None // corrupt stream
        val marker = u8(p + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) p += 2 // standalone
        else {
          val len = be16(p + 2)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof && p + 9 < b.length) {
            val h = be16(p + 5); val w = be16(p + 7); val nc = u8(p + 9)
            return Some(MediaMeta(w, h, nc, "image/jpeg", b.length.toLong))
          }
          p += 2 + len
        }
      }
      return None
    }
    // GIF: logical screen descriptor
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      return Some(MediaMeta(le16(6), le16(8), 3, "image/gif", b.length.toLong))
    // BMP: BITMAPINFOHEADER
    if (b.length >= 30 && b(0) == 'B' && b(1) == 'M') {
      val bpp = le16(28)
      return Some(MediaMeta(le32(18), math.abs(le32(22)), math.max(1, bpp / 8), "image/bmp", b.length.toLong))
    }
    None
  }

  /** Decode with the real header parser, stub fallback for synthetic blobs. */
  def decode(bytes: Array[Byte]): MediaMeta =
    decodeHeader(bytes).getOrElse(decodeStub(bytes))

  /** STUB resize: deterministic byte sampling standing in for a pixel resample. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(1, math.min(w * h, 64))
    Array.tabulate(n)(i => bytes(if (bytes.isEmpty) 0 else (i * 2654435761L % math.max(bytes.length, 1)).toInt.abs % math.max(bytes.length, 1)))
  }

  /** Batch decode over (id, media binary): per-partition codec init, streamed
    * rows, typed output — the production shape for 100 TB of media shards. */
  def decodeBatch(df: DataFrame, idCol: String, binCol: String): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec" initialization happens here (once), not per row
        rows.map { case (id, bytes) =>
          val meta = decodeStub(bytes)
          Decoded(id, meta, resizeStub(bytes, 8, 8))
        }
      }
  }
}

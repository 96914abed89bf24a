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

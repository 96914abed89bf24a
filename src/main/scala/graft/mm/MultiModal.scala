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

  final case class AudioMeta(sampleRate: Int, channels: Int, bits: Int,
                             nSamples: Long, durationMs: Double)
  final case class VideoMeta(width: Int, height: Int, timescale: Long,
                             duration: Long, durationMs: Double)

  /** REAL WAV (RIFF) header parse — pure JVM, public format: fmt chunk for
    * rate/channels/bits, data chunk size for sample count. None if not WAV. */
  def wavMeta(b: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3) << 24)).toLong & 0xffffffffL
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var p = 12L
    var rate = 0; var ch = 0; var bits = 0; var blockAlign = 0; var dataSize = -1L
    var corrupt = false
    while (!corrupt && p + 8 <= b.length) {
      val pi = p.toInt
      val id = new String(b, pi, 4, "ASCII")
      val size = le32(pi + 4)
      if (id == "fmt " && p + 24 <= b.length) {
        ch = le16(pi + 10); rate = le32(pi + 12).toInt
        blockAlign = le16(pi + 20); bits = le16(pi + 22)
      } else if (id == "data") dataSize = size
      // advance in Long space — a corrupt 32-bit size must not truncate to a
      // negative Int and walk the cursor backwards forever
      val next = p + 8 + size + (size & 1) // chunks are word-aligned
      if (next <= p) corrupt = true else p = next
    }
    if (rate <= 0 || blockAlign <= 0 || dataSize < 0) None
    else {
      val n = dataSize / blockAlign
      Some(AudioMeta(rate, ch, bits, n, n * 1000.0 / rate))
    }
  }

  /** REAL MP4 (ISO BMFF) box walk — mvhd for timescale/duration, first tkhd
    * for width/height (16.16 fixed point). None if no moov/mvhd found. */
  def mp4Meta(b: Array[Byte]): Option[VideoMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    var timescale = -1L; var duration = -1L; var w = 0; var h = 0
    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val size = be32(p)
        val typ = new String(b, p + 4, 4, "ASCII")
        if (size < 8 || p + size > to) return
        typ match {
          case "moov" | "trak" => walk(p + 8, (p + size).toInt)
          // bounds FIRST — an 8-byte box at the buffer end has no version byte
          case "mvhd" if p + 28 <= to && u8(p + 8) == 0 => // version 0
            timescale = be32(p + 20); duration = be32(p + 24)
          case "tkhd" if p + 92 <= to && u8(p + 8) == 0 && w == 0 =>
            w = (be32(p + 84) >> 16).toInt; h = (be32(p + 88) >> 16).toInt
          case _ => ()
        }
        p += size.toInt
      }
    }
    if (b.length >= 8) walk(0, b.length)
    if (timescale <= 0) None
    else Some(VideoMeta(w, h, timescale, duration, duration * 1000.0 / timescale))
  }

  // ---------------------------------------------------------------- pixels
  // Real pixel kernels on top of the JDK's built-in image readers
  // (PNG/JPEG/GIF/BMP — headless-safe, no external codecs). All math below
  // (bilinear resample, block means, average-hash) is our own deterministic
  // double arithmetic, so outputs are bit-stable across runs.

  System.setProperty("java.awt.headless", "true")
  javax.imageio.ImageIO.setUseCache(false) // no per-call temp-file cache

  /** Packed row-major RGB, 3 bytes per pixel. */
  final case class Pixels(width: Int, height: Int, rgb: Array[Byte]) {
    def r(x: Int, y: Int): Int = rgb((y * width + x) * 3) & 0xff
    def g(x: Int, y: Int): Int = rgb((y * width + x) * 3 + 1) & 0xff
    def b(x: Int, y: Int): Int = rgb((y * width + x) * 3 + 2) & 0xff
    /** Rec.601 luma in [0,255]. */
    def luma(x: Int, y: Int): Double = 0.299 * r(x, y) + 0.587 * g(x, y) + 0.114 * b(x, y)
  }

  private def toPixels(img: java.awt.image.BufferedImage): Pixels = {
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    val row = new Array[Int](w)
    var y = 0; var p = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val v = row(x)
        rgb(p) = (v >>> 16).toByte; rgb(p + 1) = (v >>> 8).toByte; rgb(p + 2) = v.toByte
        p += 3; x += 1
      }
      y += 1
    }
    Pixels(w, h, rgb)
  }

  /** REAL decode to packed RGB. The header parser gates the attempt (cheap
    * reject of non-image blobs); None on anything ImageIO cannot read. */
  def decodePixels(bytes: Array[Byte]): Option[Pixels] =
    if (decodeHeader(bytes).isEmpty) None
    else
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None else Some(toPixels(img))
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Bilinear resample (center-aligned sampling, clamped edges). Identity when
    * the size is unchanged. */
  def resizePixels(src: Pixels, ow: Int, oh: Int): Pixels = {
    val out = new Array[Byte](ow * oh * 3)
    val sx = src.width.toDouble / ow
    val sy = src.height.toDouble / oh
    var y = 0; var p = 0
    while (y < oh) {
      val fy = math.min(math.max((y + 0.5) * sy - 0.5, 0.0), src.height - 1.0)
      val y0 = fy.toInt; val y1 = math.min(y0 + 1, src.height - 1); val dy = fy - y0
      var x = 0
      while (x < ow) {
        val fx = math.min(math.max((x + 0.5) * sx - 0.5, 0.0), src.width - 1.0)
        val x0 = fx.toInt; val x1 = math.min(x0 + 1, src.width - 1); val dx = fx - x0
        var c = 0
        while (c < 3) {
          def at(xx: Int, yy: Int): Int = src.rgb((yy * src.width + xx) * 3 + c) & 0xff
          val top = at(x0, y0) * (1 - dx) + at(x1, y0) * dx
          val bot = at(x0, y1) * (1 - dx) + at(x1, y1) * dx
          out(p + c) = math.min(255, math.max(0, (top * (1 - dy) + bot * dy + 0.5).toInt)).toByte
          c += 1
        }
        p += 3; x += 1
      }
      y += 1
    }
    Pixels(ow, oh, out)
  }

  /** Exact area-mean luma of the block covering output cell (bx,by) of a
    * gw x gh grid (integer pixel partition, remainder pixels to the tail). */
  private def blockMeanLuma(px: Pixels, gw: Int, gh: Int, bx: Int, by: Int): Double = {
    val xs = bx * px.width / gw; val xe = math.max(xs + 1, (bx + 1) * px.width / gw)
    val ys = by * px.height / gh; val ye = math.max(ys + 1, (by + 1) * px.height / gh)
    var s = 0.0; var n = 0
    var y = ys
    while (y < ye && y < px.height) {
      var x = xs
      while (x < xe && x < px.width) { s += px.luma(x, y); n += 1; x += 1 }
      y += 1
    }
    if (n == 0) 0.0 else s / n
  }

  /** REAL feature embedding: dim block-mean lumas over a near-square grid,
    * mean-centered and L2-normalized (cosine-ready for the ANN pipeline). */
  def featurePixels(px: Pixels, dim: Int): Array[Double] = {
    val gw = math.ceil(math.sqrt(dim.toDouble)).toInt
    val gh = math.ceil(dim.toDouble / gw).toInt
    val v = Array.tabulate(dim)(i => blockMeanLuma(px, gw, gh, i % gw, i / gw) / 255.0)
    val mean = v.sum / dim
    var i = 0
    while (i < dim) { v(i) -= mean; i += 1 }
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n > 0) { i = 0; while (i < dim) { v(i) /= n; i += 1 } }
    v
  }

  /** REAL perceptual average-hash: 8x8 block-mean lumas thresholded at their
    * mean; bit (y*8+x) set when the block is at least as bright. Near-duplicate
    * images land within a small Hamming distance — group on the hash (or LSH
    * bands of it) for image near-dup at scale. */
  def ahashPixels(px: Pixels): Long = {
    val m = Array.tabulate(64)(i => blockMeanLuma(px, 8, 8, i % 8, i / 8))
    val mean = m.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) { if (m(i) >= mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** REAL frame extraction: n evenly-spaced frames from a multi-frame
    * container (animated GIF via the JDK reader; single-frame images yield
    * one frame), each re-encoded as PNG so downstream kernels can decode
    * frames independently. None when the blob is not a readable image. */
  def framePixels(bytes: Array[Byte], n: Int): Option[Array[Array[Byte]]] =
    if (decodeHeader(bytes).isEmpty) None
    else {
      var reader: javax.imageio.ImageReader = null
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        reader = readers.next()
        reader.setInput(iis)
        val total = reader.getNumImages(true)
        if (total <= 0) return None
        val k = math.min(math.max(1, n), total)
        Some(Array.tabulate(k) { i =>
          val img = reader.read((i.toLong * total / k).toInt)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        })
      } catch { case scala.util.control.NonFatal(_) => None }
      finally if (reader != null) reader.dispose()
    }

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

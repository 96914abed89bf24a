package graft

import graft.mm.MultiModal
import org.scalatest.funsuite.AnyFunSuite

/** Real container-header decode over bytes produced by the JDK's own image
  * writers — PNG/JPEG/GIF/BMP, color and grayscale (round-4: the decode step
  * stops being stub-only where pure-JVM parsing is possible). */
class MmDecodeSpec extends AnyFunSuite {

  System.setProperty("java.awt.headless", "true")

  private def img(w: Int, h: Int, fmt: String, gray: Boolean = false): Array[Byte] = {
    val typ = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
              else java.awt.image.BufferedImage.TYPE_INT_RGB
    val bi = new java.awt.image.BufferedImage(w, h, typ)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { bi.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  test("PNG: RGB and grayscale dimensions + channels from IHDR") {
    val rgb = MultiModal.decodeHeader(img(123, 45, "png")).get
    assert(rgb.width == 123 && rgb.height == 45 && rgb.format == "image/png" && rgb.channels == 3, rgb.toString)
    val gray = MultiModal.decodeHeader(img(9, 7, "png", gray = true)).get
    assert(gray.width == 9 && gray.height == 7 && gray.channels == 1, gray.toString)
  }

  test("JPEG: SOF scan finds dimensions for color and grayscale") {
    val rgb = MultiModal.decodeHeader(img(320, 200, "jpg")).get
    assert(rgb.width == 320 && rgb.height == 200 && rgb.format == "image/jpeg" && rgb.channels == 3, rgb.toString)
    val gray = MultiModal.decodeHeader(img(31, 13, "jpg", gray = true)).get
    assert(gray.width == 31 && gray.height == 13 && gray.channels == 1, gray.toString)
  }

  test("GIF and BMP headers") {
    val gif = MultiModal.decodeHeader(img(40, 30, "gif")).get
    assert(gif.width == 40 && gif.height == 30 && gif.format == "image/gif", gif.toString)
    val bmp = MultiModal.decodeHeader(img(17, 11, "bmp")).get
    assert(bmp.width == 17 && bmp.height == 11 && bmp.format == "image/bmp" && bmp.channels == 3, bmp.toString)
  }

  test("unrecognized blobs fall back to the deterministic stub") {
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(MultiModal.decodeHeader(junk).isEmpty)
    assert(MultiModal.decode(junk) == MultiModal.decodeStub(junk))
    assert(MultiModal.decodeHeader(Array.emptyByteArray).isEmpty)
    // truncated PNG signature must not throw
    assert(MultiModal.decodeHeader(Array[Byte](0x89.toByte, 'P', 'N', 'G')).isEmpty)
  }

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("wav meta: odd-size chunk padding, non-wav, truncated") {
    def le(v: Long, n: Int): String = (0 until n).map(i => f"${(v >> (8 * i)) & 0xff}%02x").mkString
    // 11025 Hz mono 8-bit, a 3-byte (odd) junk chunk before data, 7 samples
    val wav = "52494646" + le(60, 4) + "57415645" +
      "666d7420" + le(16, 4) + le(1, 2) + le(1, 2) + le(11025, 4) + le(11025, 4) + le(1, 2) + le(8, 2) +
      "6a756e6b" + le(3, 4) + "aabbcc" + "00" + // junk chunk, word-aligned pad
      "64617461" + le(7, 4) + "00" * 7
    val m = MultiModal.wavMeta(hex(wav)).get
    assert(m.sampleRate == 11025 && m.channels == 1 && m.bits == 8 && m.nSamples == 7)
    assert(math.abs(m.durationMs - 7000.0 / 11025) < 1e-9)
    assert(MultiModal.wavMeta("RIFFxxxxAVI LIST".getBytes("ASCII")).isEmpty)
    assert(MultiModal.wavMeta(hex(wav).take(20)).isEmpty)
  }

  test("corrupt containers terminate: huge wav chunk size, truncated mp4 box") {
    def le(v: Long, n: Int): String = (0 until n).map(i => f"${(v >> (8 * i)) & 0xff}%02x").mkString
    def be(v: Long, n: Int): String = (0 until n).reverse.map(i => f"${(v >> (8 * i)) & 0xff}%02x").mkString
    // chunk size 0xFFFFFFFF would truncate to -1 as Int and walk backwards
    val evil = "52494646" + le(100, 4) + "57415645" + "6a756e6b" + "ffffffff" + "00" * 8
    assert(MultiModal.wavMeta(hex(evil)).isEmpty) // terminates, no fmt/data found
    // an exactly-8-byte mvhd box ending at the buffer end has no version byte
    val stub = be(16, 4) + "66747970" + "69736f6d" + be(0, 4) + be(8, 4) + "6d766864"
    assert(MultiModal.mp4Meta(hex(stub)).isEmpty) // no OOB read
  }

  test("mp4 meta: box walk finds mvhd/tkhd, ignores version-1 and junk") {
    def be(v: Long, n: Int): String = (0 until n).reverse.map(i => f"${(v >> (8 * i)) & 0xff}%02x").mkString
    val matrix = "0001000000000000000000000000000000010000000000000000000000000000" + "40000000"
    val mvhd = be(108, 4) + "6d766864" + be(0, 4) + be(0, 4) + be(0, 4) +
      be(1000, 4) + be(4500, 4) + "00010000" + "0100" + "00" * 10 + matrix + "00" * 24 + be(2, 4)
    val tkhd = be(92, 4) + "746b6864" + be(0, 4) + be(0, 4) + be(0, 4) + be(1, 4) +
      be(0, 4) + be(4500, 4) + "00" * 8 + "00000000" + "00000000" + matrix +
      be(1280L << 16, 4) + be(720L << 16, 4)
    val moov = be(216, 4) + "6d6f6f76" + mvhd + be(100, 4) + "7472616b" + tkhd
    val m = MultiModal.mp4Meta(hex(be(16, 4) + "66747970" + "69736f6d" + be(0, 4) + moov)).get
    assert(m.width == 1280 && m.height == 720 && m.timescale == 1000 && m.duration == 4500)
    assert(m.durationMs == 4500.0)
    assert(MultiModal.mp4Meta("not an mp4 file at all".getBytes("ASCII")).isEmpty)
    assert(MultiModal.mp4Meta(Array.emptyByteArray).isEmpty)
  }
}

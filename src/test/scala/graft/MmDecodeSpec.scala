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
}

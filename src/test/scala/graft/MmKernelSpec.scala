package graft

import graft.mm.MultiModal
import org.scalatest.funsuite.AnyFunSuite

/** Real pixel kernels (round-4 follow-up): ImageIO decode to packed RGB, our
  * own bilinear resample, block-mean feature embedding, average-hash, and
  * multi-frame GIF extraction — all pure JVM, no external codecs. */
class MmKernelSpec extends AnyFunSuite {

  System.setProperty("java.awt.headless", "true")

  private def rgbImage(w: Int, h: Int)(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { bi.setRGB(x, y, f(x, y)); x += 1 }; y += 1 }
    bi
  }

  private def encode(bi: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  private def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("decodePixels: PNG is lossless — every pixel matches the pattern") {
    val bytes = encode(rgbImage(13, 7)((x, y) => ((x * 20) << 16) | ((y * 30) << 8) | (x + y)), "png")
    val px = MultiModal.decodePixels(bytes).get
    assert(px.width == 13 && px.height == 7)
    for (y <- 0 until 7; x <- 0 until 13) {
      assert(px.r(x, y) == x * 20 && px.g(x, y) == y * 30 && px.b(x, y) == x + y, s"($x,$y)")
    }
  }

  test("decodePixels: JPEG decodes with the right dimensions; junk is None") {
    val bytes = encode(rgbImage(32, 24)((x, y) => 0x808080), "jpg")
    val px = MultiModal.decodePixels(bytes).get
    assert(px.width == 32 && px.height == 24)
    assert(MultiModal.decodePixels("not an image".getBytes("UTF-8")).isEmpty)
    assert(MultiModal.decodePixels(Array.emptyByteArray).isEmpty)
  }

  test("resizePixels: identity at same size, exact means on aligned 2x downscale") {
    val src = MultiModal.decodePixels(
      encode(rgbImage(8, 8)((x, y) => ((x * 16) << 16) | ((y * 16) << 8) | 0x40), "png")).get
    val same = MultiModal.resizePixels(src, 8, 8)
    assert(java.util.Arrays.equals(same.rgb, src.rgb))
    // 2x downscale with center alignment samples exactly between the 2x2 block
    // pixels: output red at ox is the mean of reds 2*ox and 2*ox+1
    val half = MultiModal.resizePixels(src, 4, 4)
    for (ox <- 0 until 4) {
      val expected = ((2 * ox * 16) + (2 * ox + 1) * 16 + 1) / 2 // +0.5 rounding
      assert(half.r(ox, 0) == expected, s"ox=$ox got ${half.r(ox, 0)}")
    }
    assert(half.b(1, 1) == 0x40) // constant channel survives resampling
  }

  test("featurePixels: solid image → zero vector; structured image → unit L2") {
    val solid = MultiModal.decodePixels(encode(rgbImage(16, 16)((_, _) => 0x7f7f7f), "png")).get
    assert(MultiModal.featurePixels(solid, 8).forall(_ == 0.0))
    val grad = MultiModal.decodePixels(encode(rgbImage(16, 16)((x, _) => (x * 15) * 0x010101), "png")).get
    val f = MultiModal.featurePixels(grad, 8)
    assert(math.abs(math.sqrt(f.map(v => v * v).sum) - 1.0) < 1e-12)
    assert(f.head < f.last) // left of the gradient darker than the right
  }

  test("ahashPixels: half-black/half-white 16x16 pins the exact bit pattern") {
    val px = MultiModal.decodePixels(
      encode(rgbImage(16, 16)((x, _) => if (x < 8) 0x000000 else 0xffffff), "png")).get
    // right-half blocks (x-block 4..7 of each row) are >= mean → 0xF0 per row byte
    assert(MultiModal.ahashPixels(px) == 0xF0F0F0F0F0F0F0F0L)
  }

  test("ahash: near-duplicate images are Hamming-close, different are far") {
    def noisy(seed: Int): Array[Byte] = encode(rgbImage(32, 32) { (x, y) =>
      val base = if ((x / 8 + y / 8) % 2 == 0) 40 else 200
      val n = (x * 7 + y * 13 + seed) % 5 // tiny deterministic noise
      ((base + n) * 0x010101)
    }, "png")
    val a = MultiModal.ahashPixels(MultiModal.decodePixels(noisy(0)).get)
    val b = MultiModal.ahashPixels(MultiModal.decodePixels(noisy(2)).get)
    val inv = MultiModal.ahashPixels(MultiModal.decodePixels(
      encode(rgbImage(32, 32)((x, y) => if ((x / 8 + y / 8) % 2 == 0) 0xc8c8c8 else 0x282828), "png")).get)
    assert(java.lang.Long.bitCount(a ^ b) <= 4, s"near-dup hamming ${java.lang.Long.bitCount(a ^ b)}")
    assert(java.lang.Long.bitCount(a ^ inv) >= 32, s"inverted hamming ${java.lang.Long.bitCount(a ^ inv)}")
  }

  test("framePixels: animated GIF yields evenly-spaced decodable PNG frames") {
    // 4 frames with distinct solid gray levels (GIF palettes hold these exactly)
    val levels = Seq(0, 85, 170, 255)
    val gif = animatedGif(levels.map(l => rgbImage(10, 6)((_, _) => l * 0x010101)))
    val all = MultiModal.framePixels(gif, 4).get
    assert(all.length == 4)
    val decoded = all.map(f => MultiModal.decodePixels(f).get)
    assert(decoded.forall(p => p.width == 10 && p.height == 6))
    assert(decoded.map(_.r(0, 0)).toSeq == levels)
    // sampling 2 of 4 picks frames 0 and 2
    val two = MultiModal.framePixels(gif, 2).get
    assert(two.length == 2)
    assert(two.map(f => MultiModal.decodePixels(f).get.r(0, 0)).toSeq == Seq(0, 170))
    // n larger than the frame count clamps to the frame count
    assert(MultiModal.framePixels(gif, 9).get.length == 4)
  }

  test("framePixels: a still PNG is one frame; junk is None") {
    val png = encode(rgbImage(5, 4)((x, y) => (x + y) * 0x010101), "png")
    val frames = MultiModal.framePixels(png, 3).get
    assert(frames.length == 1)
    assert(MultiModal.decodePixels(frames(0)).get.width == 5)
    assert(MultiModal.framePixels("junk".getBytes("UTF-8"), 2).isEmpty)
  }
}

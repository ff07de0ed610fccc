package graft

import graft.ops.ImageCodec
import graft.ops.ImageCodec.ImageMeta
import org.scalatest.funsuite.AnyFunSuite

/** Header decoder checked against REAL encoders: the JDK's ImageIO
  * writes actual PNG/JPEG/GIF bytes (its own encoders, nothing shared
  * with our parser), and the parser must recover the dimensions. The
  * synthesized-header round-trip and negative shapes ride along.
  */
class ImageCodecSpec extends AnyFunSuite {

  private def realBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("ImageIO-encoded PNG/JPEG/GIF bytes decode to the right dimensions") {
    for ((w, h) <- Seq((1, 1), (17, 43), (300, 200), (641, 480))) {
      assert(ImageCodec.decodeMeta(realBytes("png", w, h))
        .contains(ImageMeta("png", w, h)))
      assert(ImageCodec.decodeMeta(realBytes("jpg", w, h))
        .contains(ImageMeta("jpeg", w, h)))
      assert(ImageCodec.decodeMeta(realBytes("gif", w, h))
        .contains(ImageMeta("gif", w, h)))
    }
  }

  test("synthesized headers round-trip, including >255 and >65535 dims") {
    for ((w, h) <- Seq((1, 1), (256, 300), (65534, 2), (70000, 80000))) {
      assert(ImageCodec.decodeMeta(ImageCodec.pngHeader(w, h))
        .contains(ImageMeta("png", w, h)))
    }
    // JPEG dimensions are u16
    for ((w, h) <- Seq((1, 1), (256, 300), (65535, 65535)))
      assert(ImageCodec.decodeMeta(ImageCodec.jpegHeader(w, h))
        .contains(ImageMeta("jpeg", w, h)))
  }

  test("non-images and truncated headers are rejected, not misread") {
    assert(ImageCodec.decodeMeta(null).isEmpty)
    assert(ImageCodec.decodeMeta(Array.emptyByteArray).isEmpty)
    assert(ImageCodec.decodeMeta("plain text document".getBytes).isEmpty)
    assert(ImageCodec.decodeMeta(ImageCodec.pngHeader(10, 10).take(20)).isEmpty)
    assert(ImageCodec.decodeMeta(ImageCodec.jpegHeader(10, 10).take(6)).isEmpty)
    // JPEG with EOI before any SOF
    assert(ImageCodec.decodeMeta(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    // zero-dimension images are invalid
    assert(ImageCodec.decodeMeta(ImageCodec.pngHeader(0, 10)).isEmpty)
  }
}

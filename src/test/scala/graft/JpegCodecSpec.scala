package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JpegCodec

/** The pure-JDK baseline JPEG codec (r8 verdict #5):
  *  - fixture streams (DC-only blocks, all-8s quant) decode to the
  *    EXACT closed form for both 1- and 3-component images — the
  *    property mm04/mm05's oracles rely on;
  *  - a REAL-WORLD JPEG — encoded by the JDK's own ImageIO encoder
  *    with its default quant/Huffman tables and non-trivial AC
  *    coefficients — decodes within the standard ±1 IDCT tolerance of
  *    ImageIO's own decoder, single- and multi-MCU;
  *  - ImageIO can read OUR fixture bytes back bit-exactly (any correct
  *    decoder recovers flat DC-only blocks exactly);
  *  - out-of-scope shapes (chroma-subsampled color) are refused, not
  *    mis-decoded.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def fixtureVal(id: Long)(bx: Int, by: Int, c: Int): Int =
    ((id * 31 + bx * 7 + by * 13 + c * 5) % 256).toInt

  private def clamp(v: Int) = math.max(0, math.min(255, v))

  private def rgbOf(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = (
    clamp(yv + Math.floorDiv(91881 * (cr - 128) + 32768, 65536)),
    clamp(yv - Math.floorDiv(22554 * (cb - 128) + 46802 * (cr - 128) + 32768, 65536)),
    clamp(yv + Math.floorDiv(116130 * (cb - 128) + 32768, 65536)))

  test("gray fixtures decode to the exact closed form (multi-MCU, DC prediction)") {
    for ((w, h) <- Seq((4, 4), (8, 8), (12, 15), (15, 9), (16, 16)); id <- Seq(3L, 9L, 123L)) {
      val bytes = JpegCodec.encodeFlatBlocks(w, h, 1,
        (bx, by, c) => fixtureVal(id)(bx, by, c) - 128)
      val Some((dw, dh, ch, px)) = JpegCodec.decodePixels(bytes)
      assert((dw, dh, ch) == (w, h, 1))
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xFF) == fixtureVal(id)(x / 8, y / 8, 0),
          s"($x,$y) id=$id ${w}x$h")
    }
  }

  test("3-component fixtures decode through the exact fixed-point RGB transform") {
    for ((w, h) <- Seq((6, 10), (15, 15)); id <- Seq(5L, 77L)) {
      val bytes = JpegCodec.encodeFlatBlocks(w, h, 3,
        (bx, by, c) => fixtureVal(id)(bx, by, c) - 128)
      val Some((dw, dh, ch, px)) = JpegCodec.decodePixels(bytes)
      assert((dw, dh, ch) == (w, h, 3))
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = rgbOf(fixtureVal(id)(x / 8, y / 8, 0),
          fixtureVal(id)(x / 8, y / 8, 1), fixtureVal(id)(x / 8, y / 8, 2))
        assert((px((y * w + x) * 3) & 0xFF) == r)
        assert((px((y * w + x) * 3 + 1) & 0xFF) == g)
        assert((px((y * w + x) * 3 + 2) & 0xFF) == b)
      }
    }
  }

  /** Raw raster samples throughout — getRGB/setRGB on TYPE_BYTE_GRAY
    * run a gray↔sRGB colorspace conversion (gamma), which is not part
    * of JPEG decoding and would skew the comparison by ~±60 levels. */
  private def imageIoGray(w: Int, h: Int, f: (Int, Int) => Int): (Array[Byte], Array[Int]) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JDK JPEG encoder unavailable")
    val bytes = bos.toByteArray
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val ref = Array.tabulate(w * h)(k => back.getRaster.getSample(k % w, k / w, 0))
    (bytes, ref)
  }

  test("real-world single-MCU JPEG (JDK encoder, real ACs): within ±1 of ImageIO's decode") {
    // an 8×8 gradient has energy in many AC coefficients — this drives
    // the full Huffman/dequant/IDCT path, not the DC-only fixture shape
    val (bytes, ref) = imageIoGray(8, 8, (x, y) => clamp(x * 29 + y * 17))
    val Some((w, h, ch, px)) = JpegCodec.decodePixels(bytes)
    assert((w, h, ch) == (8, 8, 1))
    for (k <- 0 until 64)
      assert(math.abs((px(k) & 0xFF) - ref(k)) <= 1, s"pixel $k: ${px(k) & 0xFF} vs ${ref(k)}")
  }

  test("real-world multi-MCU JPEG with edges: within ±1 of ImageIO's decode") {
    val (bytes, ref) = imageIoGray(24, 16,
      (x, y) => if ((x / 4 + y / 4) % 2 == 0) 40 else 210) // checkerboard: harsh ACs
    val Some((w, h, ch, px)) = JpegCodec.decodePixels(bytes)
    assert((w, h, ch) == (24, 16, 1))
    for (k <- 0 until w * h)
      assert(math.abs((px(k) & 0xFF) - ref(k)) <= 1)
  }

  test("ImageIO reads our fixture bytes back bit-exactly") {
    val id = 9L
    val (w, h) = (12, 15)
    val bytes = JpegCodec.encodeFlatBlocks(w, h, 1,
      (bx, by, c) => fixtureVal(id)(bx, by, c) - 128)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse our stream")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == fixtureVal(id)(x / 8, y / 8, 0))
  }

  /** Encode an RGB image with the JDK's default JPEG writer (which
    * 4:2:0-subsamples RGB input) and return (bytes, ImageIO's decoded
    * RGB reference, the SOF0 sampling byte of component 1). */
  private def imageIoColor(w: Int, h: Int,
      f: (Int, Int) => Int): (Array[Byte], Array[Int], Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JDK JPEG encoder unavailable")
    val bytes = bos.toByteArray
    // walk to SOF0 and read component 1's sampling factors
    var i = 2
    var samp = -1
    while (samp < 0 && i + 4 <= bytes.length) {
      val m = bytes(i + 1) & 0xFF
      val len = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
      if (m == 0xC0) samp = bytes(i + 4 + 6 + 1) & 0xFF
      i += 2 + len
    }
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val ref = new Array[Int](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, y)
      ref((y * w + x) * 3) = (rgb >> 16) & 0xFF
      ref((y * w + x) * 3 + 1) = (rgb >> 8) & 0xFF
      ref((y * w + x) * 3 + 2) = rgb & 0xFF
    }
    (bytes, ref, samp)
  }

  test("4:2:0 chroma-subsampled color (JDK RGB encode): within ±2 of ImageIO") {
    // r9 verdict #3: the web-dominant encoding must DECODE, not be
    // refused. Smooth gradient: chroma varies, every upsample path
    // (interior + all four edges) is exercised; odd dims hit the
    // cropped-MCU paths. Tolerance ±2, not ±1: both decoders are ±1
    // per COMPONENT sample (IDCT tolerance), and the color transform
    // multiplies the Cr deviation by 1.4 into R/G.
    for ((w, h) <- Seq((16, 16), (17, 13), (32, 24))) {
      val (bytes, ref, samp) = imageIoColor(w, h, (x, y) =>
        ((40 + 5 * x) min 255) << 16 | ((60 + 4 * y) min 255) << 8 | ((200 - 3 * x - 2 * y) max 0))
      assert(samp == 0x22, f"JDK encoder emitted sampling 0x$samp%02x, not 4:2:0")
      val Some((dw, dh, ch, px)) = JpegCodec.decodePixels(bytes)
      assert((dw, dh, ch) == (w, h, 3))
      for (k <- 0 until w * h * 3)
        assert(math.abs((px(k) & 0xFF) - ref(k)) <= 2,
          s"sample $k (${w}x$h): ${px(k) & 0xFF} vs ${ref(k)}")
    }
  }

  test("4:2:0 grayscale-content color stream: chroma flat, decode matches gray ±1") {
    // flat chroma makes fancy upsampling exact (all neighbors equal),
    // isolating the subsampled-MCU layout from the filter arithmetic
    val (bytes, ref, samp) = imageIoColor(24, 16, (x, y) => {
      val v = clamp(x * 7 + y * 9); v << 16 | v << 8 | v
    })
    assert(samp == 0x22)
    val Some((w, h, ch, px)) = JpegCodec.decodePixels(bytes)
    assert((w, h, ch) == (24, 16, 3))
    for (k <- 0 until w * h * 3)
      assert(math.abs((px(k) & 0xFF) - ref(k)) <= 1,
        s"sample $k: ${px(k) & 0xFF} vs ${ref(k)}")
  }
}

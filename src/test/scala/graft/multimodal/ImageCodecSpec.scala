package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the ImageIO-backed compressed codecs: lossless
  * PNG round-trips pixel-exact, lossy JPEG stays within tolerance,
  * hostile inputs (corrupt, truncated, decompression-bomb headers)
  * return None. */
class ImageCodecSpec extends AnyFunSuite {

  private def buffered(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("PNG round-trips pixel-exact into the shared RGB Image") {
    val src = buffered(5, 4)((x, y) => (x * 50 << 16) | (y * 60 << 8) | 77)
    val back = ImageCodec.decode(encode(src, "png"))
    assert(back.isDefined)
    val img = back.get
    assert(img.width == 5 && img.height == 4)
    for (y <- 0 until 4; x <- 0 until 5) {
      val i = (y * 5 + x) * 3
      val p = src.getRGB(x, y)
      assert((img.rgb(i) & 0xff) == ((p >> 16) & 0xff))
      assert((img.rgb(i + 1) & 0xff) == ((p >> 8) & 0xff))
      assert((img.rgb(i + 2) & 0xff) == (p & 0xff))
    }
  }

  test("JPEG decodes with exact dims and near-exact uniform content") {
    val back = ImageCodec.decode(encode(buffered(16, 16)((_, _) =>
      (120 << 16) | (130 << 8) | 140), "jpg"))
    assert(back.isDefined)
    val img = back.get
    assert(img.width == 16 && img.height == 16)
    // lossy but a uniform block survives within a small tolerance
    (0 until 16 * 16).foreach { p =>
      assert(math.abs((img.rgb(p * 3) & 0xff) - 120) <= 4)
      assert(math.abs((img.rgb(p * 3 + 1) & 0xff) - 130) <= 4)
      assert(math.abs((img.rgb(p * 3 + 2) & 0xff) - 140) <= 4)
    }
  }

  test("features flow through the shared pipeline like the PNM codecs") {
    val src = buffered(8, 8)((x, y) => (x * 30 << 16) | (y * 30 << 8))
    val viaPng = ImageCodec.decode(encode(src, "png")).get
    // same raster spelled as PPM decodes identically
    val raster = new Array[Byte](8 * 8 * 3)
    for (y <- 0 until 8; x <- 0 until 8) {
      val p = src.getRGB(x, y); val i = (y * 8 + x) * 3
      raster(i) = ((p >> 16) & 0xff).toByte
      raster(i + 1) = ((p >> 8) & 0xff).toByte
      raster(i + 2) = (p & 0xff).toByte
    }
    val viaPpm = Ppm.decode(Ppm.encode(Ppm.Image(8, 8, raster))).get
    assert(Ppm.features(viaPng).sameElements(Ppm.features(viaPpm)))
  }

  test("hostile inputs return None, never throw") {
    val good = encode(buffered(4, 4)((_, _) => 0x336699), "png")
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
    assert(ImageCodec.decode("not an image at all".getBytes).isEmpty)
    assert(ImageCodec.decode(good.take(12)).isEmpty)  // truncated header
    // corrupt payload past a valid signature
    val corrupt = good.clone(); corrupt(20) = 0x7f.toByte
    // (may or may not decode depending on which chunk got hit — must
    // not throw either way)
    ImageCodec.decode(corrupt)
    // decompression bomb: valid PNG signature + IHDR claiming
    // 1e9 x 1e9 — must be rejected from the header without allocating
    val bomb = good.clone()
    def put(at: Int, v: Int): Unit =
      (0 until 4).foreach(k => bomb(at + k) = (v >>> (24 - 8 * k)).toByte)
    put(16, 1000000000); put(20, 1000000000) // IHDR width/height
    assert(ImageCodec.decode(bomb).isEmpty)
    // jpeg truncated mid-scan: partial decode OR None are both
    // acceptable; the contract is no-throw (the call itself is the
    // assertion)
    val jpg = encode(buffered(16, 16)((x, y) => x * y * 999), "jpg")
    ImageCodec.decode(jpg.take(jpg.length / 2))
  }

  test("decodeImages chain picks up PNG/JPEG rows (mime + dims real)") {
    assert(Multimodal.sniffMime(encode(buffered(2, 2)((_, _) => 1), "png"))
      == "image/png")
    assert(Multimodal.sniffMime(encode(buffered(2, 2)((_, _) => 1), "jpg"))
      == "image/jpeg")
  }

  test("encodePng: write-side round-trip is pixel-exact and sniffable") {
    val rgb = Array.tabulate(4 * 3 * 3)(i => ((i * 37) % 256).toByte)
    val img = Ppm.Image(4, 3, rgb)
    val png = ImageCodec.encodePng(img)
    assert(Multimodal.sniffMime(png) == "image/png")
    val back = ImageCodec.decode(png).get
    assert(back.width == 4 && back.height == 3)
    assert(back.rgb.toSeq == rgb.toSeq, "PNG encode must be lossless")
  }
}

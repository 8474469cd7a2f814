package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** BMP codec ground truth: exact-pixel round trips (including the
  * 4-byte row padding odd widths exercise), top-down rasters, and
  * hostile headers that must decode to None, never throw. */
class BmpSpec extends AnyFunSuite {

  private def img(w: Int, h: Int): Ppm.Image =
    Ppm.Image(w, h, Array.tabulate(w * h * 3)(i => (i * 7 + 3).toByte))

  test("encode/decode round-trips exact pixels (odd widths hit padding)") {
    for ((w, h) <- Seq((1, 1), (2, 3), (3, 2), (5, 4), (7, 1))) {
      val src = img(w, h)
      val back = Bmp.decode(Bmp.encode(src))
      assert(back.isDefined, s"${w}x$h failed to decode")
      assert(back.get.width == w && back.get.height == h)
      assert(back.get.rgb.sameElements(src.rgb), s"${w}x$h pixels differ")
    }
  }

  test("property: 200 random rasters round-trip bit-exactly") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 200).foreach { _ =>
      val w = rnd.nextInt(16) + 1
      val h = rnd.nextInt(16) + 1
      val src = Ppm.Image(w, h, Array.fill(w * h * 3)(rnd.nextInt().toByte))
      val back = Bmp.decode(Bmp.encode(src))
      assert(back.exists(b => b.width == w && b.height == h &&
        b.rgb.sameElements(src.rgb)), s"${w}x$h")
    }
  }

  test("top-down raster (negative height) decodes to the same image") {
    val src = img(3, 2)
    val bu = Bmp.encode(src)
    // flip to top-down: negate height, reverse row order in the raster
    val rowBytes = (3 * 3 + 3) / 4 * 4
    val td = bu.clone()
    val negH = -2
    (0 until 4).foreach(k => td(22 + k) = (negH >> (8 * k)).toByte)
    System.arraycopy(bu, 54 + rowBytes, td, 54, rowBytes)
    System.arraycopy(bu, 54, td, 54 + rowBytes, rowBytes)
    val back = Bmp.decode(td)
    assert(back.exists(_.rgb.sameElements(src.rgb)))
  }

  test("hostile inputs return None, never throw") {
    val good = Bmp.encode(img(4, 4))
    assert(Bmp.decode(null).isEmpty)
    assert(Bmp.decode(Array.empty[Byte]).isEmpty)
    assert(Bmp.decode(good.take(53)).isEmpty) // truncated header
    assert(Bmp.decode(good.take(60)).isEmpty) // truncated raster
    def mut(at: Int, v: Seq[Int]): Array[Byte] = {
      val b = good.clone(); v.zipWithIndex.foreach { case (x, i) =>
        b(at + i) = x.toByte }; b
    }
    assert(Bmp.decode(mut(28, Seq(32, 0))).isEmpty)  // 32 bpp unsupported
    assert(Bmp.decode(mut(30, Seq(1, 0, 0, 0))).isEmpty) // RLE compression
    // hostile dimensions that would overflow Int arithmetic
    assert(Bmp.decode(mut(18, Seq(0xff, 0xff, 0xff, 0x7f))).isEmpty)
    assert(Bmp.decode(mut(22, Seq(0xff, 0xff, 0xff, 0x7f))).isEmpty)
    // BOTH dims huge: the size products themselves wrap Long — the
    // case the per-product guards missed (review finding)
    val bothHuge = {
      val b = good.clone()
      Seq(18, 22).foreach(o => (0 until 4).foreach(k =>
        b(o + k) = (if (k == 3) 0x7f else 0xff).toByte))
      b
    }
    assert(Bmp.decode(bothHuge).isEmpty)
    // data offset pointing past the file
    assert(Bmp.decode(mut(10, Seq(0xff, 0xff, 0, 0))).isEmpty)
  }

  test("sniffMime recognizes BMP and transcoded PPM content agrees") {
    val src = img(6, 5)
    assert(Multimodal.sniffMime(Bmp.encode(src)) == Multimodal.BmpMime)
    // PPM and BMP spellings of the same image decode identically
    val viaPpm = Ppm.decode(Ppm.encode(src)).get
    val viaBmp = Bmp.decode(Bmp.encode(src)).get
    assert(viaPpm.rgb.sameElements(viaBmp.rgb))
  }
}

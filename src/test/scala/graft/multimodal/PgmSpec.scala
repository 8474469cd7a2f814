package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** PGM (P5) codec ground truth: exact round trips into the shared RGB
  * Image, header-grammar tolerance, and hostile inputs that must
  * decode to None, never throw. */
class PgmSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => (i * 11 + 5).toByte)

  test("encode/decode round-trips with gray replicated into RGB") {
    for ((w, h) <- Seq((1, 1), (2, 3), (5, 4), (8, 8))) {
      val g = gray(w, h)
      val back = Pgm.decode(Pgm.encode(w, h, g))
      assert(back.isDefined, s"${w}x$h failed to decode")
      val img = back.get
      assert(img.width == w && img.height == h)
      (0 until w * h).foreach { p =>
        assert(img.rgb(3 * p) == g(p) && img.rgb(3 * p + 1) == g(p) &&
          img.rgb(3 * p + 2) == g(p), s"pixel $p")
      }
    }
  }

  test("property: 200 random rasters round-trip bit-exactly") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 200).foreach { _ =>
      val w = rnd.nextInt(16) + 1
      val h = rnd.nextInt(16) + 1
      val g = Array.fill(w * h)(rnd.nextInt().toByte)
      val back = Pgm.decode(Pgm.encode(w, h, g))
      assert(back.exists(b => b.width == w && b.height == h &&
        (0 until w * h).forall(p => b.rgb(3 * p) == g(p))), s"${w}x$h")
    }
  }

  test("header comments and extra whitespace are tolerated") {
    val g = gray(3, 2)
    val withComment =
      ("P5\n# a comment\n  3\t2 # trailing\n255\n"
        .getBytes("US-ASCII") ++ g)
    val back = Pgm.decode(withComment)
    assert(back.exists(b => b.width == 3 && b.height == 2 &&
      (0 until 6).forall(p => b.rgb(3 * p) == g(p))))
  }

  test("hostile inputs return None, never throw") {
    val good = Pgm.encode(4, 4, gray(4, 4))
    assert(Pgm.decode(null).isEmpty)
    assert(Pgm.decode(Array.empty[Byte]).isEmpty)
    assert(Pgm.decode("P6\n4 4\n255\n".getBytes("US-ASCII")).isEmpty) // wrong magic
    assert(Pgm.decode(good.take(8)).isEmpty)            // truncated header
    assert(Pgm.decode(good.dropRight(1)).isEmpty)       // truncated raster
    assert(Pgm.decode("P5\n0 4\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(Pgm.decode("P5\n4 4\n128\n".getBytes("US-ASCII")).isEmpty) // maxval
    // dimensions whose product wraps Int: w*h*3 must be Long-guarded
    assert(Pgm.decode(
      "P5\n46341 46341\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(Pgm.decode(
      "P5\n2000000000 2000000000\n255\n".getBytes("US-ASCII")).isEmpty)
    // header value that WRAPS 32-bit accumulation: 2^32+1 must not
    // parse as width 1 (review finding: Int digit accumulation)
    assert(Pgm.decode(
      ("P5\n4294967297 1\n255\n".getBytes("US-ASCII") ++
        Array[Byte](7, 7, 7)).toArray).isEmpty)
    assert(Ppm.decode(
      ("P6\n4294967297 1\n255\n".getBytes("US-ASCII") ++
        Array[Byte](7, 7, 7)).toArray).isEmpty)
    // both dims Int.MaxValue: w*h*3 wraps LONG negative and slipped
    // the old guards (review finding)
    assert(Ppm.decode(
      ("P6\n2147483647 2147483647\n255\n".getBytes("US-ASCII") ++
        Array[Byte](7, 7, 7)).toArray).isEmpty)
  }

  test("sniff + decodeImages chain picks up PGM rows") {
    assert(Multimodal.sniffMime(Pgm.encode(2, 2, gray(2, 2))) ==
      Multimodal.PgmMime)
    // PGM of a uniform gray equals PPM of the same gray in features
    val g = Array.fill(16)(100.toByte)
    val viaPgm = Pgm.decode(Pgm.encode(4, 4, g)).get
    val viaPpm = Ppm.decode(Ppm.encode(
      Ppm.Image(4, 4, Array.fill(48)(100.toByte)))).get
    assert(Ppm.features(viaPgm).sameElements(Ppm.features(viaPpm)))
  }
}

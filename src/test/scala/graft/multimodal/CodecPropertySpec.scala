package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the real codecs: encode∘decode is the identity
  * on arbitrary valid media, and decode never throws on arbitrary
  * garbage (corrupt blobs are data, not errors — the contract every
  * distributed decode operator above relies on). */
class CodecPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val genDims = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
  } yield (w, h)

  test("PPM roundtrip: decode(encode(img)) == img") {
    val gen = for {
      (w, h) <- genDims
      bytes <- Gen.listOfN(w * h * 3, Gen.choose(-128, 127).map(_.toByte))
    } yield Ppm.Image(w, h, bytes.toArray)
    sample(gen, 50).foreach { img =>
      val back = Ppm.decode(Ppm.encode(img)).get
      assert(back.width == img.width && back.height == img.height)
      assert(back.rgb.toSeq == img.rgb.toSeq)
    }
  }

  test("WAV roundtrip: decode(encode(audio)) == audio") {
    val gen = for {
      rate <- Gen.choose(800, 48000)
      ch <- Gen.choose(1, 2)
      n <- Gen.choose(0, 400)
      samples <- Gen.listOfN(n * ch,
        Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt).map(_.toShort))
    } yield Wav.Audio(rate, ch, samples.toArray)
    sample(gen, 50).foreach { a =>
      Wav.decode(Wav.encode(a)) match {
        case Some(back) =>
          assert(back.sampleRate == a.sampleRate && back.channels == a.channels)
          assert(back.samples.toSeq == a.samples.toSeq)
        case None => assert(a.samples.isEmpty) // empty data chunk → None is fine
      }
    }
  }

  test("Y4M roundtrip: decode(encode(video)) == video") {
    val gen = for {
      (w, h) <- genDims
      nf <- Gen.choose(1, 4)
      num <- Gen.choose(1, 60)
      frames <- Gen.listOfN(nf,
        Gen.listOfN(w * h * 3, Gen.choose(-128, 127).map(_.toByte))
          .map(_.toArray))
    } yield Y4m.Video(w, h, num, 1, "444", frames.toIndexedSeq)
    sample(gen, 30).foreach { v =>
      val back = Y4m.decode(Y4m.encode(v)).get
      assert(back.width == v.width && back.height == v.height)
      assert(back.frameCount == v.frameCount)
      assert(back.frames.zip(v.frames).forall { case (a, b) =>
        a.toSeq == b.toSeq
      })
    }
  }

  test("decode never throws on arbitrary garbage bytes") {
    val garbage = Gen.listOf(Gen.choose(-128, 127).map(_.toByte))
      .map(_.toArray)
    // plus adversarial prefixes that enter each parser's header path
    val prefixed = for {
      p <- Gen.oneOf("P6", "P6\n", "RIFF", "RIFFxxxxWAVE", "YUV4MPEG2 ",
        "YUV4MPEG2 W4 H4 F25:1\nFRAME\n")
      tail <- Gen.listOfN(16, Gen.choose(-128, 127).map(_.toByte))
    } yield p.getBytes("ISO-8859-1") ++ tail.toArray
    (sample(garbage, 100) ++ sample(prefixed, 100)).foreach { bytes =>
      Ppm.decode(bytes)   // must not throw
      Wav.decode(bytes)
      Y4m.decode(bytes)
    }
  }
}
